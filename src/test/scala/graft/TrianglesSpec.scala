package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.graph.Triangles

/** Degree-ordered triangle counting (q208): known small graphs, input
  * normalization, and brute-force equality on seeded random graphs. */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  test("K4 plus pendant: exact per-vertex counts; noise normalized away") {
    // K4 on 1..4 (4 triangles, 3 per vertex) + pendant 5-1 (0 triangles),
    // with self-loops, duplicates and reversed duplicates as noise
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (5L, 1L),
      (2L, 1L), (3L, 1L), (1L, 1L), (4L, 2L), (1L, 2L))
      .toDF("src", "dst")
    val got = Triangles.countPerVertex(edges, "src", "dst")
      .select("vertex", "n_triangles")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L),
      got.toString)
    // degrees on the normalized graph (pendant edge + K4)
    val degs = Triangles.countPerVertex(edges, "src", "dst")
      .select("vertex", "degree").as[(Long, Long)].collect().toMap
    assert(degs == Map(1L -> 4L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
    // clustering coefficient: K4 members of deg 3 are fully closed (1.0);
    // vertex 1 (deg 4) has 3 of its 6 neighbor pairs closed; pendant 0
    val cc = Triangles.clusteringCoefficient(edges, "src", "dst")
      .select("vertex", "cc_nano").as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 500000000L, 2L -> 1000000000L,
      3L -> 1000000000L, 4L -> 1000000000L, 5L -> 0L), cc.toString)
  }

  test("matches brute-force id-ordered counting on random graphs") {
    def forAll[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
      (0 until n).foreach { i =>
        body(g.pureApply(Gen.Parameters.default, Seed(7L + i)))
      }
    val gGen: Gen[List[(Long, Long)]] = Gen.choose(5, 60).flatMap(m =>
      Gen.listOfN(m, Gen.zip(Gen.choose(0L, 14L), Gen.choose(0L, 14L))))
    forAll(gGen, 8) { raw =>
      val und = raw.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .filter { case (a, b) => a != b }.distinct
      val eset = und.toSet
      // brute force: all id-ordered triples with all three edges present
      val verts = und.flatMap { case (a, b) => Seq(a, b) }.distinct.sorted
      val bf = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for {
        i <- verts.indices; j <- (i + 1) until verts.size
        k <- (j + 1) until verts.size
        (x, y, z) = (verts(i), verts(j), verts(k))
        if eset((x, y)) && eset((x, z)) && eset((y, z))
      } { bf(x) += 1; bf(y) += 1; bf(z) += 1 }
      val expect = verts.map(v => v -> bf(v)).toMap
      val got = Triangles.countPerVertex(raw.toDF("src", "dst"),
        "src", "dst").select("vertex", "n_triangles")
        .as[(Long, Long)].collect().toMap
      assert(got == expect, s"edges=$und\ngot $got\nexpect $expect")
    }
  }
}
