package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Entity-resolution "harvesting" (SURVEY §2.5).
  *
  * The reference's core entity-resolution primitive: an entity attribute
  * reported by many tables/years is kept only if its modal value is
  * sufficiently consistent across reports.
  */
object Harvest {

  /** Per entity: total occurrences, per-value occurrences, and the modal
    * value kept iff rate > strictness. Reference: `occurrence_consistency`
    * (`/root/reference/src/pudl/transform/eia.py:122-199`), strictness default
    * 0.7 (`harvest_entity_tables`, `:467-480`).
    *
    * Two hash aggregations + one windowed top-1 — all shuffles are on the
    * entity key; nothing is collected. Tiebreak on (count desc, value asc)
    * makes the modal choice deterministic (pandas relied on sort order).
    */
  def occurrenceConsistency(df: DataFrame, entityKeys: Seq[String],
                            valueCol: String, strictness: Double = 0.7): DataFrame = {
    val keyCols = entityKeys.map(col)
    val counts = df.where(col(valueCol).isNotNull)
      .groupBy(keyCols :+ col(valueCol): _*)
      .agg(count(lit(1)).as("value_count"))
    val w = Window.partitionBy(keyCols: _*)
    val ranked = counts
      .withColumn("total_count", sum(col("value_count")).over(w))
      .withColumn("__rk", row_number().over(
        w.orderBy(col("value_count").desc, col(valueCol).asc)))
    ranked.where(col("__rk") === 1)
      .withColumn("rate", col("value_count").cast("double") / col("total_count"))
      .withColumn(valueCol, when(col("rate") > strictness, col(valueCol)))
      .select(keyCols ++ Seq(col(valueCol), col("value_count"),
        col("total_count"), col("rate")): _*)
  }
}
