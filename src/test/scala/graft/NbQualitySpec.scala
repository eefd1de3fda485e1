package graft

import org.apache.spark.sql.functions._

import graft.ml.NbQuality

/** Trained-NB quality classifier (`NbQuality`, q166): closed-form
  * log-odds weights from a labeled seed, integer-nano log discipline, and
  * the scale shape (broadcast weights, one-row-per-doc shuffle). */
class NbQualitySpec extends SparkSpec {

  import spark.implicits._

  private def seedDf = Seq(
    // positive docs speak "good clean", negatives "bad noisy"
    (true, "good clean good text"),
    (true, "good clean signal"),
    (false, "bad noisy bad text"),
    (false, "bad noisy junk")
  ).toDF("pos", "text").select(col("pos"), split(col("text"), " ").as("ws"))

  test("learned weights separate class-indicative tokens by sign") {
    val w = NbQuality.trainLogOdds(seedDf, col("ws"), col("pos"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("good") > 0 && w("clean") > 0)
    assert(w("bad") < 0 && w("noisy") < 0)
    // "text" appears once per class with equal totals-denominator → the
    // two nano-rounded ln terms cancel exactly
    assert(w("text") == 0L)
    // exact closed form for one weight: counts are ("good": 3 pos, 0 neg),
    // totals (7 tokens per class, V = 7 types) — the diff is ln 7 in nanos
    def nano(c: Long, n: Long, v: Long) =
      math.round(math.log((c + 0.5) / (n + 0.5 * v)) * 1e9)
    assert(w("good") == nano(3, 7, 7) - nano(0, 7, 7))
  }

  test("scoring separates held-out docs and is partition-order invariant") {
    val w = NbQuality.trainLogOdds(seedDf, col("ws"), col("pos"))
    val corpus = Seq(
      (1L, "good clean story"), (2L, "bad noisy story"),
      (3L, "story about nothing")
    ).toDF("id", "text")
    def scores(df: org.apache.spark.sql.DataFrame) =
      NbQuality.score(df, "id", split(col("text"), " "), w)
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val s = scores(corpus)
    assert(s(1L) > 0 && s(2L) < 0)
    // doc 3 shares no seed vocabulary except nothing → raw score 0
    assert(s(3L) == 0L)
    // integer-sum discipline: any partitioning yields identical longs
    assert(scores(corpus.repartition(7)) == s)
  }

  test("score plan broadcasts the weights and shuffles one row per doc") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val seed = docs.where(col("doc_id") % 3 === 0)
      .select((col("lang") === "en").as("pos"), split(col("text"), " ").as("ws"))
    val w = NbQuality.trainLogOdds(seed, col("ws"), col("pos"))
    val scored = NbQuality.score(docs.where(col("doc_id") % 3 =!= 0),
      "doc_id", split(col("text"), " "), w)
    val plan = scored.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weights join must broadcast:\n$plan")
    // partial aggregation before the doc_id exchange: HashAggregate
    // (partial) must sit below the Exchange in the scoring branch
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"expected partial+final aggregate pair:\n$plan")
  }
}
