package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video ride through the engine as
  * opaque `binary` columns plus typed metadata. The Spark-side mechanics
  * (schema, batched per-partition processing, deterministic partitioning)
  * are real; the actual codec calls are STUBBED (no image/audio libraries in
  * this environment) behind `decodeImageStub` — swap its body for a real
  * decoder (e.g. TwelveMonkeys/JavaCV) without touching the plumbing.
  */
object BinaryOps {

  /** Stand-in for reading raw media bytes: UTF-8 bytes of a string column. */
  def toBlob(c: Column): Column = c.cast("binary")

  /** Byte length + content hash — the universal media metadata columns. */
  def withBlobMeta(df: DataFrame, blobCol: String): DataFrame =
    df.withColumn("n_bytes", length(col(blobCol)).cast("long"))
      .withColumn("sha256", sha2(col(blobCol), 256))

  val imageMetaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  /** STUB image decode: derives deterministic fake dimensions from the
    * content hash. Real implementation would decode the header bytes; the
    * call shape (binary in, struct out, evaluated per-row inside codegen)
    * is what a real decoder plugs into. */
  def decodeImageStub(blob: Column): Column = {
    val h = abs(xxhash64(blob))
    struct(
      (h % 1920 + 1).cast("int").as("width"),
      (h % 1080 + 1).cast("int").as("height"),
      (h % 3 + 1).cast("int").as("channels"))
  }

  /** STUB frame sampling for video-like blobs: every `stride`-th byte offset
    * becomes a "frame" row — demonstrates the explode-per-media-unit shape
    * (one row per frame, partition-preserving) used for real frame
    * extraction. */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String,
                   stride: Int): DataFrame =
    df.withColumn("frame_offset",
        explode(sequence(lit(0), length(col(blobCol)) - 1, lit(stride))))
      .select(col(idCol), col("frame_offset"),
        // one "frame" = a byte slice; real impl decodes at the offset
        substring(base64(col(blobCol)), 1, 8).as("frame_preview"))

  case class BlobRow(id: Long, blob: Array[Byte])
  case class ResizedRow(id: Long, width: Int, height: Int, n_bytes: Long,
                        thumb: Array[Byte])

  /** Batched per-partition media transform — the Scala twin of the
    * `mapInPandas` batch shape: rows stream through `mapPartitions` in
    * groups of `batchSize`, so a real codec/model gets amortized batch
    * calls (GPU-friendly) instead of per-row invocations, and the
    * partitioning (one task per input split) is preserved. The resize
    * itself is STUBBED deterministically (truncate bytes to the "thumbnail"
    * size); the batch/iterator mechanics are the real, tested part. */
  def resizeBatchedStub(df: DataFrame, idCol: String, blobCol: String,
                        thumbBytes: Int, batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(blobCol).as("blob"))
      .as[BlobRow]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // a real implementation would hand the whole batch to the codec
          batch.iterator.map { r =>
            val thumb = r.blob.take(thumbBytes)
            ResizedRow(r.id, math.min(r.blob.length, 1920),
              math.min(r.blob.length, 1080), r.blob.length.toLong, thumb)
          }
        }
      }
      .toDF()
  }

  /** Deterministic byte-histogram features per blob (16 buckets on the high
    * nibble, via hex encoding) — a real distributed feature-extraction pass
    * (explode bytes → groupBy) that a model-based featurizer would replace. */
  def byteHistogram(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val hexed = df.withColumn("__hex", lower(hex(col(blobCol))))
    val buckets = hexed.select(col(idCol),
      explode(expr("transform(sequence(1, length(__hex) DIV 2), " +
        "i -> substring(__hex, 2*i - 1, 1))")).as("bucket"))
    buckets.groupBy(col(idCol))
      .pivot("bucket", "0123456789abcdef".map(_.toString))
      .agg(count(lit(1)))
  }
}
