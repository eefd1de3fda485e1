package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Explicit lifecycle for persisted blocks (caches + `localCheckpoint`s).
  *
  * Spark keeps localCheckpoint RDD blocks until the backing Dataset is
  * driver-GC'd; across a long single-JVM session (the 107-query verify/bench
  * suites) unreleased blocks accumulate, squeeze the storage pool and degrade
  * unrelated later queries. Operators release their superseded intermediates
  * with [[releaseCheckpoint]]; harness mains call [[releaseAll]] between
  * queries so each query's numbers measure the query, not session history.
  */
object SessionHygiene {

  /** Release the storage behind a `localCheckpoint`'ed (or cached) frame.
    * Safe on any DataFrame: non-checkpoint plans fall back to `unpersist`. */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking = false)
      case _              => df.unpersist(blocking = false)
    }

  /** Drop every persisted block in the context: SQL relation caches AND raw
    * RDD persists (which is where localCheckpoint blocks live —
    * `clearCache()` alone misses them). */
  def releaseAll(spark: SparkSession): Unit = {
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }
}
