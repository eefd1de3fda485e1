package graft

import org.apache.spark.sql.functions._
import graft.schema.{Field, FieldType, Resource}
import graft.sources.Extractor
import graft.sources.Extractor.Partition

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("Extractor unions partitions through column maps and enforces schema") {
    val d1 = java.nio.file.Files.createTempDirectory("graft_ex1").toString
    val d2 = java.nio.file.Files.createTempDirectory("graft_ex2").toString
    // two "years" of the same logical table with drifted raw column names
    Seq((1L, 10.0)).toDF("plant_id", "cap").write.mode("overwrite").parquet(d1)
    Seq((2L, 20.0, "x")).toDF("plant", "capacity_mw", "junk")
      .write.mode("overwrite").parquet(d2)
    val res = Resource("plants", Seq(
      Field("plant_id", FieldType.Integer, required = true),
      Field("capacity_mw", FieldType.Number)))
    val out = Extractor.extract(spark, Seq(
      Partition(d1, columnMap = Map("plant_id" -> "plant_id", "cap" -> "capacity_mw")),
      Partition(d2, columnMap = Map("plant" -> "plant_id", "capacity_mw" -> "capacity_mw"))),
      res)
    assert(out.columns.toSeq == Seq("plant_id", "capacity_mw"))
    val rows = out.orderBy("plant_id").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    assert(rows.toSeq == Seq((1L, 10.0), (2L, 20.0)))
  }

  test("Etl.build outputs conform to their declared resources and checks pass") {
    val outputs = Etl.build(spark, sf)
    val cust = Etl.customerSummary.enforceSchema(outputs(Etl.customerSummary.name))
    val supp = Etl.supplierYearly.enforceSchema(outputs(Etl.supplierYearly.name))
    assert(cust.count() > 0 && supp.count() > 0)
    import graft.checks.CheckRunner
    val custFails = CheckRunner.run(cust,
      CheckRunner.fromResource(Etl.customerSummary))
      .where(!col("passed")).count()
    val suppFails = CheckRunner.run(supp,
      CheckRunner.fromResource(Etl.supplierYearly))
      .where(!col("passed")).count()
    assert(custFails == 0 && suppFails == 0)
  }
}
