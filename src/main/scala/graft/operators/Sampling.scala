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

  /** Assign each row to a named split by hash bucket. `splits` are
    * (name, percent) in priority order, summing to ≤ 100 (a shortfall
    * leaves a NULL holdout). One narrow projection — no shuffle, no RNG
    * state, stable under any partitioning. */
  def deterministicSplit(df: DataFrame, idCol: String,
                         splits: Seq[(String, Int)],
                         salt: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 100,
      "split percents must sum to <= 100")
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
