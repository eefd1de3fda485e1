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
}
