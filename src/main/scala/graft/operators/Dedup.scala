package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication / freshest-record selection (SURVEY §2.4).
  *
  * All variants are a single `row_number()` over a partitioned, *totally*
  * ordered window — one shuffle on the PK, no driver involvement, scales to
  * any number of groups. Callers MUST pass a deterministic total order
  * (pandas relied on implicit row order; SURVEY §7 hard-part #1).
  */
object Dedup {

  /** Keep exactly one row per key, the first under `order`.
    * Covers `filter_for_freshest_data_xbrl`'s latest-publication-wins
    * (`/root/reference/src/pudl/transform/ferc.py:91-146`),
    * `dedupe_on_category` (`helpers.py:1594-1617`) with a category-rank
    * ordering, `deduplicate_by_year` (`extract/dbf.py:766-785`), and top-1
    * best-match selection
    * (`analysis/record_linkage/eia_ferc1_record_linkage.py:251-307`).
    */
  def keepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** `__best_snapshot` semantics (`/root/reference/src/pudl/transform/ferc.py:21-34`):
    * per key keep the row with the most non-null data columns; ties broken by
    * `tiebreak` (must make the order total).
    */
  def bestSnapshot(df: DataFrame, keys: Seq[String], dataCols: Seq[String],
                   tiebreak: Seq[Column]): DataFrame = {
    val nonNulls = dataCols.map(c => when(col(c).isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    val scored = df.withColumn("__nn", nonNulls)
    keepFirst(scored, keys, col("__nn").desc +: tiebreak).drop("__nn")
  }

  /** Per-column last-non-null merge across versions of the same key —
    * `__apply_diffs` (`/root/reference/src/pudl/transform/ferc.py:36-60`).
    * One aggregation: max_by(value, order-when-non-null) per column.
    */
  def applyDiffs(df: DataFrame, keys: Seq[String], orderCol: String,
                 dataCols: Seq[String]): DataFrame = {
    val aggs = dataCols.map { c =>
      max_by(col(c), when(col(c).isNotNull, col(orderCol))).as(c)
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
