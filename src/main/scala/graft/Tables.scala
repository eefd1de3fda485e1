package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Fixture-table registry: canonical load path for the driver-generated
  * TPC-H-ish tables (TESTDATA.md). Mirrors the reference's front door
  * `get_parquet_table` (`/root/reference/src/pudl/helpers.py:2257-2325`):
  * read canonical parquet, normalize types, let Catalyst push down
  * column pruning + filters from whatever the caller selects next.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one table. `events.ts` arrives in two parquet encodings depending
    * on the writer: nanosecond int64 (Spark reads it as long via nanosAsLong)
    * or microsecond `isAdjustedToUTC=false` (Spark reads TIMESTAMP_NTZ).
    * Normalize both to TIMESTAMP (LTZ): the session timezone is pinned UTC
    * (GraftSession), so the NTZ→LTZ cast preserves the instant, and the
    * nanos path truncates to µs the same way DuckDB does — oracle
    * comparisons agree either way. Downstream operators (watermarks,
    * `unix_micros`) require TIMESTAMP, never NTZ.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(path(dir, name))
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
    else if (name == "events" && df.schema("ts").dataType == TimestampNTZType) {
      // the NTZ→LTZ cast preserves the instant ONLY under a UTC session;
      // on a session not built via GraftSession.tune it would silently
      // shift every timestamp by the local offset — fail loudly instead
      val tz = spark.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events.ts is TIMESTAMP_NTZ and session timezone is '$tz' — " +
          "Tables.load requires a UTC session (build via GraftSession.tune)")
      df.withColumn("ts", col("ts").cast("timestamp"))
    } else df
  }

  /** Register every fixture table as a temp view (the `spark.sql` front door —
    * the analogue of the reference's duckdb view layer). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
