package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.Communities

/** Synchronous LPA community detection (q209): clique convergence and
  * equality with a driver-side reference of the same deterministic rule. */
class CommunitiesSpec extends SparkSpec {
  import spark.implicits._

  /** Driver reference: sync rounds, label = most frequent neighbor label,
    * ties to the smaller label. */
  private def reference(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter { case (a, b) => a != b }.distinct
    val adj = (und ++ und.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    var lbl: Map[Long, Long] = adj.keys.map(v => v -> v).toMap
    for (_ <- 0 until iters) {
      lbl = adj.map { case (v, nbrs) =>
        val counts = nbrs.groupBy(lbl).map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    lbl
  }

  test("cliques converge to their min id; disconnected cliques stay apart") {
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L), (10L, 12L), (11L, 12L))
      .toDF("src", "dst")
    val got = Communities.labelPropagation(edges, "src", "dst", iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), got.toString)
  }

  test("checkpointed rounds ≡ unchunked trace (deep-run lineage truncation)") {
    // a path graph propagates slowly — 6 rounds give a non-trivial trace;
    // checkpointEvery = 2 forces two mid-run localCheckpoints while
    // checkpointEvery = 100 never checkpoints. The label trace must be
    // BIT-IDENTICAL: the checkpoint is pure lineage truncation.
    val edges = ((1L to 9L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L))).toDF("src", "dst")
    for (iters <- Seq(0, 1, 5, 6)) {
      val chunked = Communities.labelPropagation(edges, "src", "dst",
        iters, checkpointEvery = 2).as[(Long, Long)].collect().toMap
      val plain = Communities.labelPropagation(edges, "src", "dst",
        iters, checkpointEvery = 100).as[(Long, Long)].collect().toMap
      assert(chunked == plain, s"iters=$iters: $chunked vs $plain")
      assert(chunked == reference(
        ((1L to 9L).map(i => (i, i + 1)) ++
          Seq((20L, 21L), (21L, 22L), (20L, 22L))), iters),
        s"iters=$iters diverged from driver reference")
    }
    // the old hard cap is lifted: a 20-round run (> one segment) completes
    val deep = Communities.labelPropagation(edges, "src", "dst", iters = 20)
      .as[(Long, Long)].collect().toMap
    assert(deep.nonEmpty && deep.keySet.contains(1L))
  }

  test("matches the driver-side reference on seeded random graphs") {
    def forAll[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
      (0 until n).foreach { i =>
        body(g.pureApply(Gen.Parameters.default, Seed(11L + i)))
      }
    val gGen: Gen[List[(Long, Long)]] = Gen.choose(5, 50).flatMap(m =>
      Gen.listOfN(m, Gen.zip(Gen.choose(0L, 11L), Gen.choose(0L, 11L))))
    forAll(gGen, 8) { raw =>
      val expect = reference(raw, iters = 2)
      val got = Communities.labelPropagation(raw.toDF("src", "dst"),
        "src", "dst", iters = 2).as[(Long, Long)].collect().toMap
      assert(got == expect, s"edges=$raw\ngot $got\nexpect $expect")
    }
  }
}
