package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-group equal-width binning — the reference's CURRENT load-factor
  * binning (`assign_groupwise_load_factor_bins`,
  * `/root/reference/src/pudl/analysis/operational_characteristics.py:182-268`),
  * which replays `pandas.cut(bins=10, right=True, include_lowest=False)`
  * inside each unit group, pad rule for pad rule:
  *
  *   - bins span the group's OWN observed [min, max], width = span/nBins
  *     (span 0 → width 0.002/nBins, pad 0.001 — pandas' zero-range rule);
  *   - only the LOWEST bin's left edge is padded by 0.1% of the range so
  *     the minimum lands inside the first right-closed bin (pandas shifts
  *     `bins[0]` only, never redistributes the pad);
  *   - bin index = ceil(round((x − lo)/width, 9)) clipped to [1, nBins] —
  *     the reference's own round-before-ceil discipline for values landing
  *     exactly on an edge, which also makes the arithmetic replay exactly
  *     across engines (elementwise IEEE doubles, no folds);
  *   - rows are eligible only when the group has > 1 distinct non-null
  *     value and the value itself is non-null; ineligible rows drop;
  *   - `bin_rank` densely ranks the group's occupied bins by lower edge.
  *
  * Scale shape: one map-side-combinable aggregate for the per-group
  * (min, max, n-distinct) stats — broadcast back (group count is the dim
  * cardinality) — then pure per-row arithmetic; the only corpus shuffle is
  * the dense-rank window on the GROUP key. */
object Binning {

  def equalWidthBins(df: DataFrame, groupCol: String, valueCol: String,
                     nBins: Int = 10): DataFrame = {
    require(nBins >= 1, "nBins must be >= 1")
    val v = col(valueCol)
    val stats = df.groupBy(col(groupCol)).agg(
      min(v).as("__lo"), max(v).as("__hi"),
      countDistinct(v).as("__nuniq"))
    val span = col("__hi") - col("__lo")
    val pad = when(span === 0, lit(0.001)).otherwise(span * 0.001)
    val width = when(span === 0, lit(0.002 / nBins))
      .otherwise(span / nBins)
    val idx = least(greatest(
      ceil(round((v - col("__lo")) / width, 9)), lit(1L)), lit(nBins.toLong))
    val lower = when(idx === 1, col("__lo") - pad)
      .otherwise(col("__lo") + (idx - 1) * width)
    val upper = col("__lo") + idx * width
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("bin_lower"))
    df.join(broadcast(stats), Seq(groupCol))
      .where(col("__nuniq") > 1 && v.isNotNull)
      .withColumn("bin_idx", idx)
      .withColumn("bin_lower", lower)
      .withColumn("bin_upper", upper)
      .withColumn("bin_rank", dense_rank().over(w))
      .drop("__lo", "__hi", "__nuniq")
  }

  /** Minimum stable load bin — `compute_minimum_stable_bin`
    * (`/root/reference/src/pudl/analysis/operational_characteristics.py:420-477`):
    * bin the per-group series with [[equalWidthBins]], drop the lowest
    * occupied bin (rank 1 = "effectively off"), find runs of consecutive
    * rows (in `order`) that stay in the SAME bin, keep runs of at least
    * `minRun` rows, and report each group's LOWEST-ranked such bin —
    * the minimum load factor at which the unit demonstrably runs stable.
    * Groups with no qualifying run are absent (the reference leaves them
    * null in its output shell).
    *
    * Scale shape: the binning's one broadcast-stats aggregate, then two
    * windows over the SAME group-key exchange (dense rank by bin edge,
    * gaps-and-islands run ids by time), a map-side-combinable run-length
    * count, and a 1-row-per-group min — nothing wider than the series
    * shuffle the screens already pay. */
  def minStableBin(df: DataFrame, groupCol: String, order: Seq[Column],
                   valueCol: String, nBins: Int = 10,
                   minRun: Int = 2): DataFrame =
    minStableBinFromBinned(equalWidthBins(df, groupCol, valueCol, nBins),
      groupCol, order, minRun)

  /** [[minStableBin]] over an ALREADY-binned frame ([[equalWidthBins]]
    * output) — callers that consume the binned frame elsewhere too can
    * materialize it once and share it (round 17: q185 re-computed the
    * stats + dense-rank window pipeline once per reference). */
  def minStableBinFromBinned(binned: DataFrame, groupCol: String,
                             order: Seq[Column],
                             minRun: Int = 2): DataFrame = {
    require(minRun >= 1, "minRun must be >= 1")
    val wT = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(order: _*)
    val runs = binned
      .withColumn("__chg",
        when(lag(col("bin_idx"), 1).over(wT).isNull ||
          lag(col("bin_idx"), 1).over(wT) =!= col("bin_idx"), 1)
          .otherwise(0))
      .withColumn("__run", sum(col("__chg")).over(
        wT.rowsBetween(Long.MinValue, 0)))
    runs.where(col("bin_rank") > 1)
      .groupBy(col(groupCol), col("bin_idx"), col("bin_rank"),
        col("bin_lower"), col("__run"))
      .agg(count(lit(1)).as("run_length"))
      .where(col("run_length") >= minRun)
      .groupBy(col(groupCol))
      .agg(min(struct(col("bin_rank"), col("bin_idx"), col("bin_lower")))
        .as("__s"))
      .select(col(groupCol),
        col("__s.bin_rank").as("min_stable_bin_rank"),
        col("__s.bin_idx").as("min_stable_bin_idx"),
        col("__s.bin_lower").as("min_stable_load_factor"))
  }
}
