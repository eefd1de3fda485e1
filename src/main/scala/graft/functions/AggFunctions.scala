package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Aggregate-expression kit. Everything here is a *declarative* Column
  * expression so it stays inside whole-stage codegen and gets partial
  * (map-side) aggregation for free — no imperative UDAFs in hot paths.
  */
object AggFunctions {

  /** SUM that is NULL when ANY input in the group is NULL — the inverse of
    * SQL SUM's null-skipping. Reference: `sum_na`
    * (`/root/reference/src/pudl/helpers.py:42-50`), which exists because
    * pandas' nullable Int64 silently turns absent data into 0 on sum.
    * Declarative form: `sum(c)` if no nulls were seen, else NULL.
    */
  def sumNa(c: Column): Column =
    when(count(c) === count(lit(1)), sum(c))

  /** Σ(v·w)/Σ(w) — `weighted_average`
    * (`/root/reference/src/pudl/helpers.py:1771-1795`). NULL-safe: rows where
    * either value or weight is null contribute to neither numerator nor
    * denominator (matches pandas' skipna semantics).
    */
  def weightedAvg(value: Column, weight: Column): Column = {
    val both = when(value.isNotNull && weight.isNotNull, value * weight)
    val w = when(value.isNotNull && weight.isNotNull, weight)
    sum(both) / sum(w)
  }

  /** Weighted average with *exact* integer arithmetic: value is quantized to
    * `scale` decimal places (exact when the source data carries at most that
    * many decimals) and the weight must be integral. The sums are then
    * integer-exact, so the result is independent of partitioning/summation
    * order — bit-identical across engines and cluster sizes. Use for
    * oracle-checked ratios where float-order drift near a rounding boundary
    * would flip a digit.
    */
  def weightedAvgExact(value: Column, weight: Column, scale: Int): Column = {
    val factor = math.pow(10, scale)
    val vInt = round(value * factor, 0).cast("long")
    val wInt = weight.cast("long")
    sum(vInt * wInt).cast("double") / (lit(factor) * sum(wInt))
  }

  /** Single distinct value per group, or the literal "mixed".
    * Reference: `groupby_agg_label_unique_source_or_mixed`
    * (`/root/reference/src/pudl/helpers.py:1461-1476`).
    */
  def uniqueOrMixed(c: Column): Column =
    when(count_distinct(c) === 1, min(c)).otherwise(lit("mixed"))
}
