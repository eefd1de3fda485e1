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

  test("prefixLmSplit: prefix + suffix reconstruct the doc, split in band") {
    val rows = SpanCorruption.prefixLmSplit(
        Tables.load(spark, sf, "documents").limit(200), "doc_id", "text")
      .join(Tables.load(spark, sf, "documents"), "doc_id")
      .collect()
    rows.foreach { r =>
      val (in, tg, orig) = (r.getAs[String]("input_text"),
        r.getAs[String]("target_text"), r.getAs[String]("text"))
      val rebuilt = (in + " " + tg).trim
      assert(rebuilt === orig.split(" ").filter(_.nonEmpty).mkString(" "))
      val (nIn, n) = (in.split(" ").count(_.nonEmpty),
        r.getAs[Long]("n_tokens").toInt)
      assert(nIn >= 1 && (n < 2 || nIn < n), s"doc ${r.getLong(0)}")
      if (n >= 4) // hash band 25-74% holds once the floor/ceiling clamps
        assert(nIn >= n / 4 && nIn <= 3 * n / 4 + 1, s"doc ${r.getLong(0)}")
    }
  }

  test("ul2Mixture: every doc exactly once, paradigm token matches lane") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val out = SpanCorruption.ul2Mixture(docs, "doc_id", "text").collect()
    assert(out.map(_.getLong(0)).toSet.size === out.length)
    assert(out.length === docs.count())
    val byLane = out.groupBy(_.getAs[String]("denoiser"))
    assert(byLane.keySet === Set("R", "S", "X"))
    out.foreach { r =>
      assert(r.getAs[String]("input_text")
        .startsWith(s"[${r.getAs[String]("denoiser")}] "))
    }
    // hash weights 2:1:1 — wide band on a 200-doc sample
    assert(byLane("R").length > byLane("S").length)
    assert(byLane("R").length > byLane("X").length)
  }

  test("fimTransform: PSM reorder reconstructs; pass-through verbatim") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val rows = SpanCorruption.fimTransform(docs, "doc_id", "text")
      .join(docs, "doc_id").collect()
    val applied = rows.count(_.getAs[Boolean]("fim_applied"))
    // 75% hash coin: wide band on 200 docs
    assert(applied > rows.length / 2 && applied < rows.length)
    rows.foreach { r =>
      val orig = r.getAs[String]("text").split(" ")
        .filter(_.nonEmpty).mkString(" ")
      val t = r.getAs[String]("fim_text")
      if (!r.getAs[Boolean]("fim_applied")) {
        assert(t === orig)
        assert(r.isNullAt(r.fieldIndex("split_i")))
      } else {
        val (i, j, n) = (r.getAs[Long]("split_i"), r.getAs[Long]("split_j"),
          r.getAs[Long]("n_tokens"))
        assert(0 <= i && i <= j && j <= n, s"doc ${r.getLong(0)}")
        val m = "(?s)^<PRE> (.*) <SUF> (.*) <MID> (.*)$".r
          .findFirstMatchIn(t).get
        val rebuilt = Seq(m.group(1), m.group(3), m.group(2))
          .flatMap(_.split(" ")).filter(_.nonEmpty).mkString(" ")
        assert(rebuilt === orig, s"doc ${r.getLong(0)}")
      }
    }
  }

  test("repeated whitespace: sentinel/reconstruction invariants still hold") {
    // single-space split turns doubled/leading/trailing spaces into empty
    // tokens; positions must be assigned AFTER the empty filter or a
    // block whose first raw slot was empty emits no input sentinel while
    // its tokens still move to the target (ADVICE r15, medium)
    val docs = Seq(
      (1L, "a  b c d  e f g h i j k l"),
      (2L, "  lead double  gap and   triple   gap tokens x y z  "),
      (3L, " x "),
      (4L, "a b  c d e f  g h i j  k l m n o p  q r s t"),
      (5L, "solo"),
      (6L, "gap  " + (1 to 40).map(i => s"t$i").mkString("  "))
    ).toDF("doc_id", "text")
    val rows = SpanCorruption.spanCorrupt(docs, "doc_id", "text")
      .join(docs, "doc_id").collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val (input, target, orig) = (r.getAs[String]("input_text"),
        r.getAs[String]("target_text"), r.getAs[String]("text"))
      val cleanToks = orig.split(" ").filter(_.nonEmpty).toSeq
      assert(r.getAs[Long]("n_tokens") === cleanToks.length,
        s"doc ${r.getLong(0)}")
      // every masked span surfaces as a sentinel in BOTH input and target,
      // numbered densely from 0
      val n = r.getAs[Long]("n_spans").toInt
      val inIds = sentinel.findAllMatchIn(input).map(_.group(1).toInt).toSeq
      assert(inIds === (0 until n), s"doc ${r.getLong(0)}")
      // splice reconstruction over the whitespace-normalized doc
      val parts = sentinel.split(target).map(_.trim)
      val ids = sentinel.findAllMatchIn(target).map(_.group(1).toInt).toSeq
      val spans = ids.zip(parts.drop(1).padTo(ids.size, "")).toMap
      val rebuilt = input.split(" ").filter(_.nonEmpty).toSeq.flatMap { s =>
        if (sentinel.matches(s)) {
          val k = sentinel.findFirstMatchIn(s).get.group(1).toInt
          spans(k).split(" ").filter(_.nonEmpty).toSeq
        } else Seq(s)
      }.mkString(" ")
      assert(rebuilt === cleanToks.mkString(" "), s"doc ${r.getLong(0)}")
    }
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
