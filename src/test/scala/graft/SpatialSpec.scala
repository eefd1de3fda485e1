package graft

import org.apache.spark.sql.functions._
import graft.spatial.SpatialOps

/** Planar geometry kit tests (SURVEY §2.13). */
class SpatialSpec extends SparkSpec {
  import spark.implicits._

  private def ring(pts: (Double, Double)*): org.apache.spark.sql.Column =
    array(pts.map { case (x, y) => struct(lit(x).as("x"), lit(y).as("y")) }: _*)

  test("shoelaceArea: square, triangle, concave") {
    val df = Seq(1).toDF("one").select(
      SpatialOps.shoelaceArea(ring((0, 0), (4, 0), (4, 4), (0, 4))).as("sq"),
      SpatialOps.shoelaceArea(ring((0, 0), (6, 0), (0, 3))).as("tri"),
      // L-shape: 4x4 square minus 2x2 corner = 12
      SpatialOps.shoelaceArea(ring((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4)))
        .as("ell"))
    val r = df.head()
    assert(r.getDouble(0) == 16.0 && r.getDouble(1) == 9.0 && r.getDouble(2) == 12.0)
  }

  test("pointInRing: even-odd containment incl. concave notch") {
    val ell = ring((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4))
    val pts = Seq((1.0, 1.0, true), (3.0, 1.0, true), (3.0, 3.0, false),
      (1.0, 3.0, true), (5.0, 5.0, false))
    val df = pts.toDF("px", "py", "expect")
    val out = df.withColumn("got",
      SpatialOps.pointInRing(col("px"), col("py"), ell))
    assert(out.where(col("got") =!= col("expect")).count() == 0)
  }

  test("overlayBoxes matches brute-force pairs and conserves allocation") {
    val left = (1 to 20).map(i =>
      (i.toLong, (i % 7) * 3.0, (i % 5) * 4.0, (i % 7) * 3.0 + 5.0,
        (i % 5) * 4.0 + 6.0)).toDF("lid", "x1", "y1", "x2", "y2")
    val right = (1 to 15).map(j =>
      (j.toLong, (j % 6) * 4.0, (j % 4) * 5.0, (j % 6) * 4.0 + 7.0,
        (j % 4) * 5.0 + 5.0, 100.0))
      .toDF("rid", "x1", "y1", "x2", "y2", "pop")
    val got = SpatialOps.overlayBoxes(left, right, "lid", "rid",
      Seq("pop"), cell = 4.0)
      .select("lid", "rid", "inter_area").as[(Long, Long, Double)]
      .collect().toSet
    // brute force
    val lc = left.as[(Long, Double, Double, Double, Double)].collect()
    val rc = right.as[(Long, Double, Double, Double, Double, Double)].collect()
    val want = (for {
      (lid, ax1, ay1, ax2, ay2) <- lc
      (rid, bx1, by1, bx2, by2, _) <- rc
      ix = math.min(ax2, bx2) - math.max(ax1, bx1)
      iy = math.min(ay2, by2) - math.max(ay1, by1)
      if ix > 0 && iy > 0
    } yield (lid, rid, ix * iy)).toSet
    assert(got == want)
  }

  test("ConvexClip: L-shape clipped by rectangle has the exact area") {
    // L-shape (area 12) clipped by square [1,3]x[1,3]: the clip square
    // overlaps the L everywhere except the notch quadrant [2,3]x[2,3] -> 3
    val ell = ring((0, 0), (4, 0), (4, 2), (2, 2), (2, 4), (0, 4))
    val clip = ring((1, 1), (3, 1), (3, 3), (1, 3))
    val df = Seq(1).toDF("one").select(
      SpatialOps.shoelaceArea(graft.plans.ConvexClip(ell, clip)).as("a"),
      // disjoint clip -> empty ring -> area 0
      SpatialOps.shoelaceArea(
        graft.plans.ConvexClip(ell, ring((10, 10), (12, 10), (12, 12), (10, 12))))
        .as("zero"),
      // clip fully inside subject -> clip's own area
      SpatialOps.shoelaceArea(
        graft.plans.ConvexClip(ell, ring((0.5, 0.5), (1.5, 0.5), (1.5, 1.5), (0.5, 1.5))))
        .as("inner"))
    val r = df.head()
    assert(r.getDouble(0) == 3.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0)
  }

  test("unionAreaByGroup: sweep equals brute-force cell counting") {
    // integer-coordinate boxes -> union area == count of covered unit cells
    val boxes = (1 to 25).map(i =>
      (i.toLong % 3, (i % 8).toDouble, ((i * 3) % 6).toDouble,
        (i % 8) + 1.0 + (i % 3), ((i * 3) % 6) + 2.0))
    val df = boxes.toDF("g", "x1", "y1", "x2", "y2")
    val got = SpatialOps.unionAreaByGroup(df, "g")
      .select("g", "union_area").as[(Long, Double)].collect().toMap
    val want = boxes.groupBy(_._1).map { case (g, bs) =>
      val cells = (for {
        (_, x1, y1, x2, y2) <- bs
        cx <- x1.toInt until x2.toInt
        cy <- y1.toInt until y2.toInt
      } yield (cx, cy)).toSet
      g -> cells.size.toDouble
    }
    assert(got == want)
  }
}
