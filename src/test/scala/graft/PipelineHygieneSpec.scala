package graft

import org.apache.spark.sql.functions._
import graft.dedup.NearDup
import graft.operators.Sampling
import graft.similarity.Similarity

/** Training-corpus hygiene operators: benchmark decontamination,
  * leakage-safe splitting, and SemDeDup semantic dedup. */
class PipelineHygieneSpec extends SparkSpec {
  import spark.implicits._

  test("decontaminate flags overlap, keeps clean and short docs at zero") {
    val train = Seq(
      (1L, "alpha beta gamma delta shared tail"), // shares a 3-gram w/ eval
      (2L, "totally unrelated training content here"),
      (3L, "tiny doc")                            // < n words: zero shingles
    ).toDF("doc_id", "text")
    val eval = Seq(
      (100L, "prefix words alpha beta gamma something")
    ).toDF("doc_id", "text")
    val out = NearDup.decontaminate(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(1) == 1L && out(0).getBoolean(2))  // "alpha beta gamma"
    assert(out(1).getLong(1) == 0L && !out(1).getBoolean(2))
    assert(out(2).getLong(1) == 0L && !out(2).getBoolean(2))
  }

  test("decontaminate counts distinct grams once per doc") {
    // the shared gram appears twice in the train doc — hit count is 1
    val train = Seq((1L, "x y z pad pad x y z")).toDF("doc_id", "text")
    val eval = Seq((9L, "x y z")).toDF("doc_id", "text")
    val out = NearDup.decontaminate(train, eval, "doc_id", "text", n = 3)
      .collect()
    assert(out.head.getLong(1) == 1L)
  }

  test("decontaminate broadcasts the eval-gram dim") {
    val docs = Tables.load(spark, sf, "documents")
    val df = NearDup.decontaminate(
      docs.where(col("doc_id") % 37 =!= 0),
      docs.where(col("doc_id") % 37 === 0), "doc_id", "text", n = 4)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("leakageSafeSplit keeps near-dup clusters in one split") {
    // ids 1 and 42 are near-dups; under the plain per-id hash they land in
    // different splits (bucket(1)=76 -> train, bucket(42)=94 -> test), so
    // this fixture exercises exactly the leakage case.
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, base),
      (42L, base + " ok"),
      (50L, "completely different text with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Sampling.leakageSafeSplit(docs, "doc_id", "text",
        splits = Seq("train" -> 80, "val" -> 10, "test" -> 10))
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // both cluster members share the canonical and therefore the split
    assert(byId(1L).getLong(1) == 1L && byId(42L).getLong(1) == 1L)
    assert(byId(1L).getString(3) == "train" &&
      byId(42L).getString(3) == "train")
    // the singleton keeps its plain-split bucket (same salt, own id)
    val plain = Sampling.deterministicSplit(
      docs.where($"doc_id" === 50L), "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10)).collect().head
    assert(byId(50L).getLong(2) == plain.getAs[Long]("split_bucket"))
    assert(byId(50L).getString(3) == plain.getAs[String]("split"))
  }

  test("semDedup flags the planted near-dup, keeps the lowest id") {
    // two far-apart clusters; ids 11/12 nearly identical, 13 distant but in
    // the same cluster, 20/21 in the other cluster, also near-identical
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (11L, v(1.0, 0.0, 0.1, 0.0)),
      (12L, v(1.0, 0.01, 0.1, 0.0)),   // cos(11,12) ~ 1 -> dup of 11
      (13L, v(0.0, 0.0, 1.0, 0.2)),
      (20L, v(-1.0, 0.5, -1.0, 0.0)),
      (21L, v(-1.0, 0.5, -1.0, 0.01))  // dup of 20
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.95)
      .orderBy("vec_id").collect()
    val dup = out.map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(dup == Map(11L -> false, 12L -> true, 13L -> false,
      20L -> false, 21L -> true))
    // 11/12/13 share a cluster; 20/21 share the other
    val cl = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl(11L) == cl(12L) && cl(20L) == cl(21L) && cl(11L) != cl(20L))
  }

  test("semDedup banded production path matches the exact all-pairs twin") {
    // same fixture as the flag test: near-identical pairs project to the
    // same sign bits on every plane (no projection sits within 0.01 of a
    // hyperplane), so banding keeps every true pair and output is equal
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (11L, v(1.0, 0.0, 0.1, 0.0)),
      (12L, v(1.0, 0.01, 0.1, 0.0)),
      (13L, v(0.0, 0.0, 1.0, 0.2)),
      (20L, v(-1.0, 0.5, -1.0, 0.0)),
      (21L, v(-1.0, 0.5, -1.0, 0.01))
    ).toDF("vec_id", "embedding")
    val exact = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, tau = 0.95).orderBy("vec_id").collect()
    val banded = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 2, iters = 2, tau = 0.95, bandedDim = Some(4))
      .orderBy("vec_id").collect()
    assert(banded.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("semDedup data-scaled k: derived cluster count ≡ the explicit-k run") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    val emb = Seq(
      (11L, v(1.0, 0.0, 0.1, 0.0)),
      (12L, v(1.0, 0.01, 0.1, 0.0)),
      (13L, v(0.0, 0.0, 1.0, 0.2)),
      (20L, v(-1.0, 0.5, -1.0, 0.0)),
      (21L, v(-1.0, 0.5, -1.0, 0.01))
    ).toDF("vec_id", "embedding")
    // n = 5, target = 2 -> ceil(5/2) = 3 beats the floor k = 2, so the
    // derived-k run must be BIT-IDENTICAL to calling with k = 3 directly
    // (k is a plan literal either way — that is what keeps the Lloyd
    // trace SQL-replayable at every scale)
    val derived = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.95, targetClusterRows = 2)
      .orderBy("vec_id").collect()
    val explicit = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 3, iters = 2, tau = 0.95)
      .orderBy("vec_id").collect()
    assert(derived.map(_.toSeq).toSeq == explicit.map(_.toSeq).toSeq)
    // below floor·target rows the floor wins: target = 250 leaves k = 2
    val floored = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.95, targetClusterRows = 250)
      .orderBy("vec_id").collect()
    val plain = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, tau = 0.95)
      .orderBy("vec_id").collect()
    assert(floored.map(_.toSeq).toSeq == plain.map(_.toSeq).toSeq)
  }

  test("semDedup emits one row per vector even when clusters empty out") {
    def v(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
    // k = 4 seeds on 4 points that collapse into 2 real clusters: some
    // seeds lose every member after the first update
    val emb = Seq(
      (1L, v(1.0, 0.0)), (2L, v(1.0, 0.02)),
      (3L, v(-1.0, 0.0)), (4L, v(-1.0, 0.02))
    ).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
      k = 4, iters = 3, tau = 0.999)
    assert(out.count() == 4)
  }
}
