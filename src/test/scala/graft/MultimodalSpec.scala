package graft

import org.apache.spark.sql.functions._
import graft.multimodal.BinaryOps

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("withBlobMeta yields byte length and stable sha256") {
    val df = Seq((1L, "abc")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val r = BinaryOps.withBlobMeta(df, "blob").head()
    assert(r.getAs[Long]("n_bytes") == 3L)
    assert(r.getAs[String]("sha256") ==
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
  }

  test("decodeImageStub is deterministic and in range") {
    val df = Seq((1L, "some media bytes"), (2L, "some media bytes")).toDF("id", "s")
      .withColumn("meta", BinaryOps.decodeImageStub(BinaryOps.toBlob($"s")))
      .select($"meta.width", $"meta.height", $"meta.channels")
    val rows = df.collect()
    assert(rows(0) == rows(1)) // same bytes -> same fake dims
    val w = rows(0).getInt(0)
    assert(w >= 1 && w <= 1920)
  }

  test("sampleFrames emits one row per stride offset") {
    val df = Seq((1L, "0123456789")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val n = BinaryOps.sampleFrames(df, "id", "blob", 4).count()
    assert(n == 3) // offsets 0,4,8
  }

  test("byteHistogram buckets every byte exactly once") {
    val df = Seq((1L, "abcd")).toDF("id", "s")
      .withColumn("blob", BinaryOps.toBlob($"s"))
    val row = BinaryOps.byteHistogram(df, "id", "blob").head()
    val total = (1 until row.length).map(i => if (row.isNullAt(i)) 0L else row.getLong(i)).sum
    assert(total == 4L)
  }
  test("resizeBatchedStub preserves rows and bounds thumbnails via batched mapPartitions") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
      .select(col("doc_id"), graft.multimodal.BinaryOps.toBlob(col("text")).as("blob"))
    val out = graft.multimodal.BinaryOps.resizeBatchedStub(docs, "doc_id", "blob",
      thumbBytes = 16, batchSize = 8)
    assert(out.count() == 100)
    assert(out.where(length(col("thumb")) > 16).count() == 0)
    assert(out.where(col("n_bytes") <= 0).count() == 0)
  }
}
