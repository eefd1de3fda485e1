package graft

import org.apache.spark.sql.functions._

/** CSV source path (§2.1 CsvExtractor analogue): schema'd csv read
  * round-trips the fixture data. */
class SourcesSpec extends SparkSpec {

  test("csv write/read round-trips with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    val src = Tables.load(spark, sf, "nation")
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read
      .schema(src.schema)
      .option("header", "true")
      .csv(dir)
    assert(back.count() == src.count())
    val diff = back.exceptAll(src).count() + src.exceptAll(back).count()
    assert(diff == 0)
  }

  test("json lines read parses typed columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    Tables.load(spark, sf, "events").limit(100)
      .select("event_id", "event_type", "value")
      .write.mode("overwrite").json(dir)
    val back = spark.read.json(dir)
    assert(back.count() == 100)
    assert(back.columns.sorted.toSeq == Seq("event_id", "event_type", "value"))
  }
}
