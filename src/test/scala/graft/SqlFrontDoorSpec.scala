package graft

/** SURVEY §3.3: the engine's query surface is spark.read.parquet +
  * spark.sql over registered views — the analogue of the reference's
  * get_parquet_table / duckdb layer. */
class SqlFrontDoorSpec extends SparkSpec {

  test("registerAll exposes every fixture as a SQL view") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT r_name, count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(r.length == 5 && r.map(_.getLong(1)).sum == 25)
    val docs = spark.sql("SELECT count(*) FROM documents").head().getLong(0)
    assert(docs > 0)
  }
}
