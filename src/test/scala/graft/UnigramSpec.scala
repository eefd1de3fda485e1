package graft

import org.apache.spark.sql.functions._

import graft.text.Unigram

/** Unigram-LM tokenizer (`Unigram`, q171): hand-computed Viterbi
  * segmentations under integer-nano scores, the tie rule, EM behavior,
  * and determinism. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  private val UNK = -23025850930L // ln(1e-10) nanos

  private def vocabOf(m: Map[String, Long]) =
    m.toSeq.map { case (p, s) => (p, 0L, s) }
      .toDF("piece", "cnt", "score_nano")

  private def segment(words: Seq[String], vocab: Map[String, Long],
                      maxL: Int = 4): Map[String, (Seq[String], Long)] = {
    val w = words.map(Tuple1(_)).toDF("word")
    Unigram.viterbiSegment(
        Unigram.scoreArrays(w, "word", vocabOf(vocab), maxL, UNK),
        "word", maxL)
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](r.fieldIndex("pieces")),
          r.getLong(r.fieldIndex("score_nano")))).toMap
  }

  test("viterbi picks the max-score segmentation, hand-checked") {
    // "abc": ab+c = -2-5 = -7; a+bc = -3-1 = -4; abc = -10; a+b+c = -9
    val v = Map("a" -> -3L, "b" -> -4L, "c" -> -5L,
      "ab" -> -2L, "bc" -> -1L, "abc" -> -10L)
    val got = segment(Seq("abc"), v)
    assert(got("abc") == ((Seq("a", "bc"), -4L)), got("abc"))
  }

  test("tie rule: equal score prefers the longer last piece") {
    // "ab": a+b = -6; ab = -6 — tie → smaller start of last piece = "ab"
    val v = Map("a" -> -3L, "b" -> -3L, "ab" -> -6L)
    assert(segment(Seq("ab"), v)("ab") == ((Seq("ab"), -6L)))
  }

  test("unknown single chars fall back to unk; never dead-ends") {
    val v = Map("a" -> -3L)
    val got = segment(Seq("axa"), v)
    assert(got("axa")._1 == Seq("a", "x", "a"))
    assert(got("axa")._2 == -3L + UNK + -3L)
  }

  test("seed vocab: all single chars + top-k multi-grams, smoothed scores") {
    val words = Seq(("hash", 10L), ("has", 5L)).toDF("word", "cnt")
    val v = Unigram.seedVocab(words, "word", "cnt", k = 2, maxPieceLen = 3)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    // coverage: every distinct char present
    assert(Set("h", "a", "s").subsetOf(v.keySet))
    // top multi-grams by weighted count: "ha"/"as" (15 each) beat "sh" (10)
    assert(v.contains("ha") && v.contains("as") && !v.contains("sh"))
    assert(v("ha")._1 == 15L)
    // smoothed score replays the driver arithmetic
    val tot = v.values.map(_._1).sum.toDouble
    val exp = math.round(math.log((15 + 0.5) / (tot + 0.5 * v.size)) * 1e9)
    assert(math.abs(v("ha")._2 - exp) <= 1)
  }

  test("EM: frequent whole words win their own piece, counts are weighted") {
    val words = Seq(("hash", 100L), ("cash", 1L)).toDF("word", "cnt")
    val seed = Unigram.seedVocab(words, "word", "cnt", k = 8)
    val r1 = Unigram.emRound(words, "word", "cnt", seed, 4, UNK)
    val m = r1.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "hash" must segment as the whole-word piece, weighted by 100
    assert(m.getOrElse("hash", 0L) == 100L, m)
    // every count is a multiple of the word weights
    assert(m.values.forall(c => c >= 0))
    // a second round is stable here (fixed point on this tiny dict)
    val r2 = Unigram.emRound(words, "word", "cnt", r1, 4, UNK)
    val s1 = r1.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val s2 = r2.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(s1 == s2)
  }

  test("prune keeps all chars + top multi-grams, deterministic tiebreak") {
    val vocab = Seq(
      ("a", 10L, -1L), ("b", 2L, -1L), ("ab", 7L, -1L), ("ba", 7L, -1L),
      ("abc", 9L, -1L), ("bc", 1L, -1L)
    ).toDF("piece", "cnt", "score_nano")
    val kept = Unigram.prune(vocab, keepMulti = 2)
      .collect().map(_.getString(0)).toSet
    // chars always survive; multi: abc (9) then ab/ba tie at 7 → "ab" asc
    assert(kept == Set("a", "b", "abc", "ab"))
    // rescore renormalizes over the survivors
    val re = Unigram.rescoreCounts(Unigram.prune(vocab, 2))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val tot = 10 + 2 + 9 + 7
    val exp = math.round(math.log((10 + 0.5) / (tot + 0.5 * 4)) * 1e9)
    assert(math.abs(re("a") - exp) <= 1)
  }

  test("rescore renormalizes without a single-partition WindowExec") {
    // the normalizer must be a 1-row aggregate broadcast back onto the
    // vocab — an unpartitioned Window would funnel a production-size
    // vocab (256k pieces) through ONE partition
    val vocab = Seq(("a", 10L), ("b", 2L), ("ab", 7L)).toDF("piece", "cnt")
    val plan = Unigram.rescoreCounts(vocab)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unpartitioned WindowExec in:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
  }

  test("segmentation is partition-order independent") {
    val words = (1 to 40).map(i => s"word${i % 7}x").distinct
    val vocab = Map("wo" -> -2L, "rd" -> -2L, "w" -> -5L, "o" -> -5L,
      "r" -> -5L, "d" -> -5L, "x" -> -5L) ++
      (0 to 9).map(d => d.toString -> -4L).toMap
    val a = segment(words, vocab)
    val w2 = words.map(Tuple1(_)).toDF("word").repartition(11)
    val b = Unigram.viterbiSegment(
        Unigram.scoreArrays(w2, "word", vocabOf(vocab), 4, UNK), "word", 4)
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](r.fieldIndex("pieces")),
          r.getLong(r.fieldIndex("score_nano")))).toMap
    assert(a == b)
  }
}
