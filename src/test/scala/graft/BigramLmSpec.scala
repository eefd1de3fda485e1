package graft

import org.apache.spark.sql.functions._
import graft.text.BigramLm

/** Bigram stupid-backoff LM (q201): hand-computed model tables and doc
  * scores on a planted corpus, backoff reachability, and the exact-integer
  * properties (repartition invariance; self-trained corpora never back
  * off). */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  private def nano(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 1e9)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private val docs = Seq(
    (0L, "a b a b"), // train (even id)
    (2L, "a a"),     // train
    (1L, "a b c"),   // apply-only: 'c' unseen even as a unigram
    (3L, ""))        // empty doc: zero row, kept at zeros

  test("scoreDocs: hand-computed tables, backoff + unk floor, empty doc") {
    val df = docs.toDF("doc_id", "text")
    val out = BigramLm.scoreDocs(df, "doc_id", "text",
        trainPred = $"doc_id" % 2 === 0)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3))).toMap
    // train stream: doc0 (<s>,a)(a,b)(b,a)(a,b), doc2 (<s>,a)(a,a)
    // bigram MLE: (<s>,a) 2/2 -> 0; (a,b) 2/3; (b,a) 1/1 -> 0; (a,a) 1/3
    // unigrams over N=6: a 4/6, b 2/6
    val lnAB = nano(math.log(2.0 / 3))
    val lnAA = nano(math.log(1.0 / 3))
    val backoff = nano(math.log(0.4))
    val unk = -23025850930L
    assert(out(0L) == ((4L, 0L, 2 * lnAB)), s"doc0 = ${out(0L)}")
    assert(out(2L) == ((2L, 0L, lnAA)), s"doc2 = ${out(2L)}")
    // doc1 "a b c": (<s>,a) 0 + (a,b) lnAB + (b,c) backoff+unk
    assert(out(1L) == ((3L, 1L, lnAB + backoff + unk)), s"doc1 = ${out(1L)}")
    assert(out(3L) == ((0L, 0L, 0L)), s"empty doc = ${out(3L)}")
  }

  test("self-trained corpus never backs off; integer sums repartition-proof") {
    val df = Tables.load(spark, sf, "documents")
    val all = BigramLm.scoreDocs(df, "doc_id", "text", trainPred = lit(true))
    assert(all.agg(sum($"n_backoff")).head().getLong(0) == 0L,
      "every bigram of the training corpus is in its own model")
    val split = BigramLm.scoreDocs(df, "doc_id", "text",
      trainPred = $"doc_id" % 2 === 0)
    val a = split.orderBy("doc_id").collect().toSeq
    val b = BigramLm.scoreDocs(df.repartition(13), "doc_id", "text",
        trainPred = $"doc_id" % 2 === 0)
      .orderBy("doc_id").collect().toSeq
    assert(a == b, "per-type nanos + integer sums must not see partitioning")
    // the held-out half genuinely exercises the backoff lane at fixture scale
    val oddBackoff = split.where($"doc_id" % 2 === 1)
      .agg(sum($"n_backoff")).head().getLong(0)
    assert(oddBackoff > 0L, "apply-only docs should hit unseen bigrams")
  }
}
