package graft.ml

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Experiment tracking for model runs — the reference's mlflow wrapper
  * (`/root/reference/src/pudl/analysis/ml_tools/experiment_tracking.py:74-200`)
  * re-expressed without the mlflow server: one JSON-lines file per
  * experiment, one record per run, nested configs flattened to dotted
  * parameter keys exactly like `_flatten_model_config`
  * (`experiment_tracking.py:24-63`).
  *
  * Deliberately driver-side and tiny: a tracker records a handful of
  * params/metrics per model run (record linkage, imputation), never row
  * data. The JSONL file is append-only so concurrent runs of different
  * experiments don't clobber each other; reading it back is one
  * `spark.read.json` away (it's a table like any other).
  */
object ExperimentTracking {

  /** Flatten {"a": {"b": 1}, "c": 2} → {"a.b": 1, "c": 2}. */
  def flattenConfig(config: Map[String, Any], prefix: String = ""): Map[String, Any] =
    config.flatMap {
      case (k, nested: Map[_, _]) =>
        flattenConfig(nested.asInstanceOf[Map[String, Any]],
          if (prefix.isEmpty) k else s"$prefix.$k")
      case (k, v) => Map((if (prefix.isEmpty) k else s"$prefix.$k") -> v)
    }

  final class Tracker private[ExperimentTracking] (
      val experiment: String, val runId: String, outFile: String) {
    private val params = scala.collection.mutable.LinkedHashMap.empty[String, Any]
    private val metrics = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    private val startedAt = java.time.Instant.now().toString

    def logParams(config: Map[String, Any]): Tracker = {
      params ++= flattenConfig(config); this
    }
    def logParam(k: String, v: Any): Tracker = { params += k -> v; this }
    def logMetric(k: String, v: Double): Tracker = { metrics += k -> v; this }

    private def jsonStr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""

    private def jsonVal(v: Any): String = v match {
      case null => "null"
      case b: Boolean => b.toString
      case n: Int => n.toString
      case n: Long => n.toString
      case n: Double => if (n.isNaN || n.isInfinite) jsonStr(n.toString) else n.toString
      case n: Float => jsonVal(n.toDouble)
      case s => jsonStr(s.toString)
    }

    /** Append this run's record to the experiment's JSONL file. */
    def end(): String = {
      val obj = Seq(
        "experiment" -> experiment, "run_id" -> runId,
        "started_at" -> startedAt,
        "ended_at" -> java.time.Instant.now().toString)
        .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" } ++
        Seq(s"""${jsonStr("params")}: {${
          params.map { case (k, v) => s"${jsonStr(k)}: ${jsonVal(v)}" }.mkString(", ")}}""",
          s"""${jsonStr("metrics")}: {${
            metrics.map { case (k, v) => s"${jsonStr(k)}: ${jsonVal(v)}" }.mkString(", ")}}""")
      val line = obj.mkString("{", ", ", "}") + "\n"
      val p = Paths.get(outFile)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.write(p, line.getBytes(StandardCharsets.UTF_8),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      outFile
    }
  }

  /** `create_experiment_tracker` twin: runs of one experiment share a JSONL
    * file under `trackingDir`. Run ids are time-ordered and unique. */
  def startRun(experiment: String, trackingDir: String): Tracker = {
    val runId = f"${System.currentTimeMillis()}%d-${
      java.util.UUID.randomUUID().toString.take(8)}"
    new Tracker(experiment, runId, s"$trackingDir/$experiment.jsonl")
  }
}
