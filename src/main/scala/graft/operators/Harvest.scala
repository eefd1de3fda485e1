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

  /** Full multi-table harvest — `harvest_entity_tables`
    * (`/root/reference/src/pudl/transform/eia.py:396-700`): candidate
    * (entity, attribute) observations are unioned from every reporting
    * table that carries the attribute, each attribute runs
    * `occurrenceConsistency` with its own strictness override
    * (`:467-480`), and numeric attributes may be rounded before the
    * consistency vote (the lat/long special case, `:201-252`).
    *
    * `lastReported` is the second per-attribute special case
    * (`_last_operating_date`, `eia.py:253-328`): an attribute mapped to an
    * ordering column (report_date in the reference) falls back, for
    * entities whose modal vote FAILED strictness, to the last non-null
    * value in that ordering — the reference fills every record of the
    * entity with that value and re-votes, which trivially passes with
    * rate 1.0, so the rescued rows carry rate 1.0 here too. Ties on the
    * ordering column break on the larger value, deterministically.
    *
    * The harvested attribute frames are assembled into one entity table by
    * full-outer joins on the entity key.
    *
    * Scale: each attribute is an independent union → two aggregations on
    * the entity key (the rescue adds one more windowed top-1, still keyed
    * on the entity); the final assembly joins one row per entity per
    * attribute — all shuffle keys are the entity key.
    */
  def harvestEntityTables(tables: Seq[DataFrame], entityKeys: Seq[String],
                          attrs: Seq[String],
                          strictness: Map[String, Double] = Map.empty,
                          roundScale: Map[String, Int] = Map.empty,
                          lastReported: Map[String, String] = Map.empty): DataFrame = {
    val keyCols = entityKeys.map(col)
    val harvested = attrs.map { a =>
      val ordCols = lastReported.get(a).map(col).toSeq
      val cand = tables.filter(_.columns.contains(a)).map { tbl =>
        val c = roundScale.get(a) match {
          // + 0.0 normalizes IEEE -0.0 to +0.0 (engines differ on the sign
          // of zero out of round(); -0.0 + 0.0 = +0.0 always)
          case Some(s) => (round(col(a), s) + lit(0.0)).as(a)
          case None => col(a)
        }
        tbl.select(keyCols ++ Seq(c) ++ ordCols: _*)
      }.reduce(_.unionByName(_))
      val modal = occurrenceConsistency(cand, entityKeys, a,
        strictness.getOrElse(a, 0.7))
      lastReported.get(a) match {
        case None =>
          modal.select(keyCols :+ col(a) :+ col("rate").as(s"${a}_rate"): _*)
        case Some(ord) =>
          val w = Window.partitionBy(keyCols: _*)
            .orderBy(col(ord).desc, col(a).desc)
          val last = cand.where(col(a).isNotNull)
            .withColumn("__rn", row_number().over(w))
            .where(col("__rn") === 1)
            .select(keyCols :+ col(a).as("__last"): _*)
          modal.join(last, entityKeys, "left")
            .select(keyCols ++ Seq(
              coalesce(col(a), col("__last")).as(a),
              when(col(a).isNull && col("__last").isNotNull, lit(1.0))
                .otherwise(col("rate")).as(s"${a}_rate")): _*)
      }
    }
    harvested.reduce((x, y) => x.join(y, entityKeys, "full_outer"))
  }
}
