package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class EmbeddingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private def corpus: Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(7)
    val bases = Seq.fill(20)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    // 20 random docs + a jittered near-dup of each of the first 10
    val dups = bases.take(10).zipWithIndex.map { case (b, i) =>
      b.map(v => v + 0.02f * rnd.nextGaussian().toFloat)
    }
    (bases ++ dups).zipWithIndex.map { case (v, i) => (i.toLong, v) }
  }

  test("cosineNearDupPairs finds planted near-dups, no false positives") {
    val df = corpus.toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      dim = dim, threshold = 0.98, nBits = 24, bands = 4).collect()
    // every reported pair genuinely clears the exact-cosine threshold
    assert(got.forall(_.getDouble(2) >= 0.98))
    // recall: banded blocking must surface the planted pairs (i, i+20);
    // at cosine ≈ 0.999 per-band collision is near-certain
    val found = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 10).map(i => (i.toLong, (i + 20).toLong)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall; found=$found")
    // unrelated random gaussian pairs must not appear
    assert(found.forall { case (a, b) => (b - a) == 20 },
      s"unexpected non-planted pair in $found")
  }

  test("euclideanNearPairs: planted close pairs found, far pairs exact-filtered") {
    val rnd = new scala.util.Random(13)
    // 30 well-separated centers (pairwise distance >> eps), each with a
    // close satellite at distance ~0.1
    val centers = Seq.tabulate(30)(i =>
      Array.tabulate(dim)(d => (10.0 * rnd.nextGaussian()).toFloat))
    val satellites = centers.map(c => c.map(v => v + 0.025f))
    val all = (centers ++ satellites).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = all.toDF("vec_id", "embedding")
    val eps = 0.5
    val got = Similarity.euclideanNearPairs(df, "vec_id", "embedding",
      dim = dim, eps = eps, w = 1.0, tables = 8).collect()
    // every returned pair is genuinely within eps (exact filter)
    assert(got.forall(_.getDouble(2) <= eps))
    val found = got.map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 30).map(i => (i.toLong, (i + 30).toLong)).toSet
    val recall = planted.count(found.contains).toDouble / planted.size
    assert(recall >= 0.9, s"euclidean LSH recall $recall")
    assert(found.subsetOf(planted), s"far pair leaked: ${found.diff(planted)}")
  }

  test("banded blocking bounds candidate volume vs all-pairs") {
    // 200 random vectors: all-pairs = 19900; candidates via 4 bands of 6
    // bits ≈ 4 × n²/2 / 64 — assert an order-of-magnitude reduction.
    val rnd = new scala.util.Random(11)
    val df = Seq.tabulate(200)(i =>
        (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cand = Similarity.cosineNearDupPairs(df, "vec_id", "embedding",
      dim = dim, threshold = -1.0, nBits = 24, bands = 4).count()
    assert(cand < 19900 / 2, s"blocking did not prune: $cand candidate pairs")
  }
}
