package graft

import org.apache.spark.sql.functions._
import graft.text.SpanCorruption

/** T5 span corruption (q194): structural invariants that hold for ANY
  * mask outcome — reconstruction (splicing each target span back at its
  * sentinel reproduces the document), sentinel numbering, token
  * conservation, and partitioning determinism. */
class SpanCorruptionSpec extends SparkSpec {
  import spark.implicits._

  private val sentinel = "<extra_id_(\\d+)>".r

  private def corrupted = SpanCorruption.spanCorrupt(
    Tables.load(spark, sf, "documents").limit(200), "doc_id", "text")

  test("splicing target spans into the input reconstructs the document") {
    val rows = corrupted
      .join(Tables.load(spark, sf, "documents"), "doc_id")
      .select("doc_id", "input_text", "target_text", "text")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (input, target, orig) =
        (r.getString(1), r.getString(2), r.getString(3))
      // parse target into sentinel -> span-token map (terminal sentinel
      // carries an empty span)
      val parts = sentinel.split(target).map(_.trim)
      val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      val spans = ids.zip(parts.drop(1).padTo(ids.size, "")).toMap
      val rebuilt = input.split(" ").toSeq.flatMap { s =>
        if (sentinel.matches(s)) {
          val k = sentinel.findFirstMatchIn(s).get.group(1).toInt
          spans(k).split(" ").filter(_.nonEmpty).toSeq
        } else Seq(s)
      }.mkString(" ")
      assert(rebuilt === orig.split(" ").filter(_.nonEmpty).mkString(" "),
        s"doc ${r.getLong(0)}")
    }
  }

  test("sentinels number 0..n_spans-1 in input, target ends at n_spans") {
    corrupted.collect().foreach { r =>
      val n = r.getAs[Long]("n_spans").toInt
      val inIds = sentinel.findAllMatchIn(r.getAs[String]("input_text"))
        .map(_.group(1).toInt).toSeq
      assert(inIds === (0 until n), s"doc ${r.getLong(0)}")
      val tgIds = sentinel.findAllMatchIn(r.getAs[String]("target_text"))
        .map(_.group(1).toInt).toSeq
      assert(tgIds === (0 to n), s"doc ${r.getLong(0)}")
    }
  }

  test("token conservation and ~15% masking rate on the fixture") {
    val agg = corrupted
      .join(Tables.load(spark, sf, "documents"), "doc_id")
      .select(sum(col("n_tokens")).as("n"),
        sum(size(split(col("text"), " "))).as("raw"),
        sum(length(col("input_text"))
          - length(replace(col("input_text"), lit("<extra_id_"), lit(""))))
          .as("sentinel_chars"))
      .head()
    assert(agg.getLong(0) === agg.getLong(1))
    // masked-token share across the sample: every block is spanLen=3
    // tokens at rate 3/20; allow a wide deterministic-fixture band
    // target tokens = n_spans sentinels + masked tokens + 1 terminal
    val maskedToks = corrupted
      .select(sum(col("n_tokens")).as("n"),
        sum(size(split(col("target_text"), " "))
          - col("n_spans") - 1).as("m"))
      .head()
    val share = maskedToks.getLong(1).toDouble / maskedToks.getLong(0)
    assert(share > 0.08 && share < 0.25, s"masked share = $share")
  }

  test("output is identical under a different input partitioning") {
    val base = corrupted.orderBy("doc_id").collect().toSeq
    val repart = SpanCorruption.spanCorrupt(
        Tables.load(spark, sf, "documents").limit(200).repartition(13),
        "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    assert(base === repart)
  }
}
