package graft

import org.apache.spark.sql.functions._
import graft.similarity.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("dot/cosine compute correctly on known vectors") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val d = df.select(Similarity.dot($"a", $"b")).head().getDouble(0)
    assert(d == 11.0)
    val c = df.select(Similarity.cosine($"a", $"a")).head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-12)
  }

  test("cosineTopK ranks the exact neighbor first") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.cosineTopK(emb.where($"vec_id" === 1), emb,
      "vec_id", "embedding", 2).orderBy("rk").collect()
    assert(out(0).getLong(2) == 2L && out(1).getLong(2) == 3L)
  }

  test("lshTopK achieves reasonable recall@5 vs brute force on fixtures") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.where($"vec_id" < 20)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(q, emb, "vec_id", "embedding", 5,
        nBits = 3, dim = 64, tables = 6)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"ANN recall@5 = $recall")
  }

  test("ivfTopK achieves reasonable recall@5 vs brute force on fixtures") {
    val emb = Tables.load(spark, sf, "embeddings")
    val q = emb.where($"vec_id" < 20)
    val exact = Similarity.cosineTopK(q, emb, "vec_id", "embedding", 5)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.ivfTopK(q, emb, "vec_id", "embedding", 5,
        nCells = 8, nProbe = 4)
      .select("q_id", "c_id").as[(Long, Long)].collect().toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }
}
