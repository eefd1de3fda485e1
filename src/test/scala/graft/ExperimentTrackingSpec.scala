package graft

import java.nio.file.Files
import graft.ml.ExperimentTracking

class ExperimentTrackingSpec extends SparkSpec {

  test("flattenConfig produces dotted keys like the reference") {
    val flat = ExperimentTracking.flattenConfig(Map(
      "model" -> Map("penalty" -> "l2", "C" -> 0.5),
      "threshold" -> 0.9))
    assert(flat == Map("model.penalty" -> "l2", "model.C" -> 0.5,
      "threshold" -> 0.9))
  }

  test("runs append to one JSONL file and read back as a table") {
    val dir = Files.createTempDirectory("runs").toString
    val f1 = ExperimentTracking.startRun("linkage", dir)
      .logParams(Map("model" -> Map("C" -> 1.5), "blocking" -> "nation"))
      .logMetric("precision", 0.91)
      .logMetric("recall", 0.84)
      .end()
    ExperimentTracking.startRun("linkage", dir)
      .logParam("blocking", "none")
      .logMetric("precision", 0.77)
      .end()
    val df = spark.read.json(f1)
    assert(df.count() == 2)
    val row = df.where(df("metrics.precision") === 0.91).collect()
    assert(row.length == 1)
    assert(row.head.getAs[org.apache.spark.sql.Row]("params")
      .getAs[Double]("model.C") == 1.5)
    // distinct run ids, same experiment
    assert(df.select("run_id").distinct().count() == 2)
    assert(df.select("experiment").distinct().count() == 1)
  }

  test("escaping survives quotes, backslashes and control chars") {
    val dir = Files.createTempDirectory("runs").toString
    val f = ExperimentTracking.startRun("esc", dir)
      .logParam("note", "say \"hi\"\\path\nnewline")
      .end()
    val df = spark.read.json(f)
    assert(df.select("params.note").head().getString(0) ==
      "say \"hi\"\\path\nnewline")
  }
}
