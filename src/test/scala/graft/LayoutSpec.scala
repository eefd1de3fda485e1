package graft

import org.apache.spark.sql.functions._
import graft.operators.Layout

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference interleave: bit i of dim d → position i*n+d. */
  private def refZ(dims: Seq[Long], bits: Int): Long =
    (for (i <- 0 until bits; (v, d) <- dims.zipWithIndex)
      yield ((v >> i) & 1L) << (i * dims.size + d)).sum

  test("zorderValue matches the reference interleave (2 and 3 dims)") {
    val pts = for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)
    val got2 = pts.toDF("x", "y")
      .select($"x", $"y", Layout.zorderValue(Seq($"x", $"y"), 5).as("z"))
      .as[(Long, Long, Long)].collect()
    got2.foreach { case (x, y, z) => assert(z == refZ(Seq(x, y), 5), (x, y)) }
    // bijective on the grid
    assert(got2.map(_._3).distinct.length == pts.length)
    val got3 = Seq((5L, 9L, 3L), (0L, 0L, 0L), (7L, 7L, 7L), (1L, 2L, 4L))
      .toDF("a", "b", "c")
      .select(Layout.zorderValue(Seq($"a", $"b", $"c"), 3).as("z"),
        $"a", $"b", $"c")
      .as[(Long, Long, Long, Long)].collect()
    got3.foreach { case (z, a, b, c) => assert(z == refZ(Seq(a, b, c), 3)) }
  }

  test("aligned z-ranges are rectangles — the data-skipping invariant") {
    // Every aligned 2^(2b)-cell z-block of a 2-D grid must span at most
    // 2^b distinct values per dimension: that bounded min-max box per
    // contiguous key range is exactly what makes file/row-group stats
    // prune multi-dimensional predicates after clusterByZOrder.
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .select($"x", $"y", Layout.zorderValue(Seq($"x", $"y"), 6).as("z"))
    val spans = grid.groupBy((col("z") / 256).cast("long").as("block"))
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"),
        count(lit(1)).as("n"))
      .as[(Long, Long, Long, Long)].collect()
    assert(spans.length == 16)
    spans.foreach { case (blk, dx, dy, n) =>
      assert(n == 256 && dx <= 15 && dy <= 15, s"block $blk spans $dx x $dy")
    }
  }

  test("clusterByZOrder co-locates 2-D boxes where single-dim sort cannot") {
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
    def touched(df: org.apache.spark.sql.DataFrame, cond: org.apache.spark.sql.Column): Long =
      df.withColumn("pid", spark_partition_id())
        .where(cond).select("pid").distinct().count()
    val zed = Layout.clusterByZOrder(grid, Seq($"x", $"y"), bits = 6,
      numPartitions = 8)
    val xSorted = grid.repartitionByRange(8, $"x").sortWithinPartitions("x")
    // filter on the dimension the row-major layout does NOT sort by:
    // every x-stripe contains all y values, so all 8 partitions hit;
    // z-order keeps both dimensions bounded per partition, so only the
    // partitions whose rectangles intersect y<8 are touched
    val yBox = $"y" < 8
    val zTouched = touched(zed, yBox)
    val sTouched = touched(xSorted, yBox)
    assert(sTouched == 8, s"x-sorted layout should touch all: $sTouched")
    assert(zTouched <= 4, s"z-order should prune most partitions: $zTouched")
    // and on the sorted dimension both layouts prune well
    assert(touched(zed, $"x" < 8) <= 4)
    assert(touched(xSorted, $"x" < 8) <= 2)
  }

  test("batchByLength: bucketed batching slashes padding vs arrival order") {
    val docs = Tables.load(spark, sf, "documents")
    val len = size(split(col("text"), " "))
    def totalPadding(byLength: Boolean): Long =
      Layout.batchByLength(docs, "doc_id", len, batchSize = 16, nShards = 4,
          byLength = byLength)
        .agg(sum("padding")).head().getLong(0)
    val naive = totalPadding(byLength = false)
    val bucketed = totalPadding(byLength = true)
    assert(bucketed * 5 < naive,
      s"bucketed=$bucketed naive=$naive — expected >5x padding reduction")
    // every doc lands in exactly one batch under either policy
    val n = Layout.batchByLength(docs, "doc_id", len, 16, 4, byLength = true)
      .agg(sum("n_docs")).head().getLong(0)
    assert(n == docs.count())
    // batches are full except at most one tail batch per shard
    val partial = Layout.batchByLength(docs, "doc_id", len, 16, 4,
        byLength = true)
      .where(col("n_docs") < 16).groupBy("shard").count()
      .where(col("count") > 1)
    assert(partial.count() == 0)
  }

  test("statsManifest on a z-clustered write prunes files end to end") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_manifest")
    val zPath = dir.resolve("z").toString
    val sPath = dir.resolve("s").toString
    try {
      val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
        .toDF("x", "y")
      Layout.clusterByZOrder(grid, Seq($"x", $"y"), bits = 6,
        numPartitions = 8).write.parquet(zPath)
      grid.repartitionByRange(8, $"x").sortWithinPartitions("x")
        .write.parquet(sPath)
      def filesForBox(path: String): (Long, Long) = {
        val m = Layout.statsManifest(
          spark.read.parquet(path).select($"x", $"y"), Seq("x", "y"))
        val total = m.count()
        val hit = m.where(col("min_y") <= 7 && col("max_y") >= 0 &&
          col("min_x") <= 7 && col("max_x") >= 0).count()
        (hit, total)
      }
      val (zHit, zTotal) = filesForBox(zPath)
      val (sHit, sTotal) = filesForBox(sPath)
      assert(zTotal == 8 && sTotal == 8, s"$zTotal/$sTotal files")
      // the box x<8 && y<8 intersects exactly one 16x16-aligned z-block
      // rectangle per overlapping file; the x-sorted layout prunes on x
      // but every surviving file spans ALL y, so this assertion flips as
      // soon as the predicate moves to a y-only box below
      assert(zHit <= 2, s"z-manifest should isolate the corner: $zHit")
      val yOnlyZ = Layout.statsManifest(
        spark.read.parquet(zPath).select($"x", $"y"), Seq("x", "y"))
        .where(col("min_y") <= 7 && col("max_y") >= 0).count()
      val yOnlyS = Layout.statsManifest(
        spark.read.parquet(sPath).select($"x", $"y"), Seq("x", "y"))
        .where(col("min_y") <= 7 && col("max_y") >= 0).count()
      assert(yOnlyZ <= 4, s"z-layout bounds y per file: $yOnlyZ")
      assert(yOnlyS == 8, s"x-sort leaves y unbounded per file: $yOnlyS")
    } finally {
      def rm(p: java.nio.file.Path): Unit = {
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.list(p).forEach(rm(_))
        java.nio.file.Files.deleteIfExists(p)
      }
      rm(dir)
    }
  }

  test("bloom manifest: no false negatives, prunes what min/max cannot") {
    import spark.implicits._
    // keys interleave across shards (id % 4), so every shard's [min, max]
    // spans every probe — min/max stats prune NOTHING here
    val df = (0L until 400L).toDF("id")
    val shard = pmod(col("id"), lit(4L))
    val bits = Layout.bloomBits(df, shard.as("file"), col("id"),
      mBits = 4096, kHashes = 3)
    val probes = Seq(7L, 123L, 202L).toDF("probe_id")
    val cand = Layout.bloomProbe(bits, probes, "probe_id",
        mBits = 4096, kHashes = 3)
      .as[(Long, Long)].collect().toSet
    // the true shard of every probe qualifies (no false negatives)
    assert(Seq(7L, 123L, 202L).forall(p => cand.contains((p, p % 4))))
    // 400 keys x 3 hashes in 4096 bits: ~7% fill, fp ~ 0.04% — the
    // candidate set is (nearly always exactly) the true shards, i.e. the
    // filter prunes 3 of 4 shards per probe where min/max prunes none
    assert(cand.size <= 4)
    // a key that was never inserted is (at this fill) filtered everywhere
    val absent = Layout.bloomProbe(bits, Seq(999999L).toDF("probe_id"),
      "probe_id", mBits = 4096, kHashes = 3).count()
    assert(absent == 0)
    // aggregated manifest form agrees with the bit rows
    val m = Layout.bloomManifest(df, shard.as("file"), col("id"),
      mBits = 4096, kHashes = 3).collect()
    assert(m.length == 4)
    assert(m.forall(r => r.getLong(1) == r.getSeq[Long](2).size &&
      r.getSeq[Long](2) == r.getSeq[Long](2).sorted))
  }
}
