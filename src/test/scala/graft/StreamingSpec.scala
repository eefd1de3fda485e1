package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming parity: the watermarked streaming rollup over the events
  * fixture must agree with the batch window aggregation (SURVEY §2.14). */
class StreamingSpec extends SparkSpec {

  test("streaming hourlyCounts matches the batch window aggregation") {
    val batchEvents = Tables.load(spark, sf, "events")
    // stage as a plain parquet dir with the normalized (µs) timestamp so the
    // stream reader sees the same schema the batch path produces
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)

    val q = EventStreams.runToMemory(spark, staged.schema, dir,
      EventStreams.hourlyCounts(_), "hourly_out")
    q.awaitTermination(60000)

    val streamed = spark.table("hourly_out")
      .groupBy("hour", "event_type")
      .agg(sum("n_events").as("n_events"))
    val batch = batchEvents
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(streamed.count() == batch.count())
    val diff = streamed.join(batch, Seq("hour", "event_type"))
      .where(streamed("n_events") =!= batch("n_events")).count()
    assert(diff == 0)
  }

  test("sessionize accumulates per-user state") {
    import spark.implicits._
    val events = Tables.load(spark, sf, "events")
    val out = EventStreams.sessionize(spark, events)
    val perUser = events.groupBy("user_id").agg(count(lit(1)).as("n"))
    val joined = out.join(perUser, "user_id")
      .where(col("n_events") =!= col("n")).count()
    assert(joined == 0)
  }
}
