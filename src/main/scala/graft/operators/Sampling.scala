package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Random splits (`df.randomSplit`) depend on partitioning and rerun
  * nondeterministically; at 100 TB the split must be a PURE FUNCTION of
  * the record id so that (a) reruns and backfills land every doc in the
  * same split, (b) adding data never moves old docs between splits, and
  * (c) any engine can recompute membership. The standard recipe is a
  * salted hash bucket per id — here the portable MD5-prefix hash
  * ([[graft.functions.PortableHash]]), so DuckDB replays membership
  * bit-identically.
  */
object Sampling {

  /** 0..99 hash bucket for an id: hex60(salt + "_" + id) mod 100. */
  def splitBucket(idCol: Column, salt: String): Column =
    graft.functions.PortableHash.hex60(
      concat(lit(s"${salt}_"), idCol.cast("string"))) % 100

  /** Deterministic stratified sampling: keep `percents(stratum)` % of each
    * stratum's rows (0 for strata not listed, `defaultPercent` otherwise),
    * selected by the same salted hash bucket as [[deterministicSplit]] —
    * so the sample is rerun-stable, composes with split assignment (use a
    * different salt), and is reproducible in any engine. The standard
    * corpus-mixing op: up/down-weight languages or sources without RNG
    * state; one narrow filter, no shuffle. */
  def stratifiedSample(df: DataFrame, idCol: String, strataCol: String,
                       percents: Map[String, Int], defaultPercent: Int = 0,
                       salt: String = "strat"): DataFrame = {
    require((percents.values ++ Seq(defaultPercent)).forall(p =>
      p >= 0 && p <= 100), "percents must be within 0..100")
    val bucket = splitBucket(col(idCol), salt)
    val threshold = percents.foldLeft(lit(defaultPercent)) {
      case (acc, (stratum, pct)) =>
        when(col(strataCol) === stratum, lit(pct)).otherwise(acc)
    }
    df.withColumn("split_bucket", bucket)
      .where(col("split_bucket") < threshold)
  }

  /** Assign each row to a named split by hash bucket. `splits` are
    * (name, percent) in priority order, summing to ≤ 100 (a shortfall
    * leaves a NULL holdout). One narrow projection — no shuffle, no RNG
    * state, stable under any partitioning. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)],
                         salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      "split percents must sum to <= 100")
    require(splits.forall(_._2 >= 0),
      "split percents must be non-negative") // a negative percent would
    // silently produce non-monotonic cuts and steal its neighbor's range
    val bucket = splitBucket(col(idCol), salt)
    val cuts = splits.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = splits.zip(cuts).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), hi)) =>
        Some(acc match {
          case None => when(bucket < hi, lit(name))
          case Some(c) => c.when(bucket < hi, lit(name))
        })
    }.get
    df.withColumn("split_bucket", bucket).withColumn("split", assign)
  }
}
