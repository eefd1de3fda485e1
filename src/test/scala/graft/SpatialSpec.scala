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

  test("RingGeom: triangulation covers concave rings exactly") {
    import graft.plans.RingGeom
    // L-shape (concave), CW input (winding must not matter)
    val ell = IndexedSeq((0.0, 0.0), (0.0, 4.0), (2.0, 4.0), (2.0, 2.0),
      (4.0, 2.0), (4.0, 0.0))
    val tris = RingGeom.triangulate(ell)
    assert(math.abs(tris.map(t => RingGeom.area(t.toIndexedSeq)).sum - 12.0) < 1e-9)
    // U-shape: two reflex vertices
    val u = IndexedSeq((0.0, 0.0), (6.0, 0.0), (6.0, 4.0), (4.0, 4.0),
      (4.0, 1.0), (2.0, 1.0), (2.0, 4.0), (0.0, 4.0))
    val ut = RingGeom.triangulate(u)
    assert(math.abs(ut.map(t => RingGeom.area(t.toIndexedSeq)).sum - 18.0) < 1e-9)
  }

  test("RingGeom.intersectionArea: concave cases incl. the notch miss") {
    import graft.plans.RingGeom
    val ell = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (0.0, 4.0))
    def box(x1: Double, y1: Double, x2: Double, y2: Double) =
      IndexedSeq((x1, y1), (x2, y1), (x2, y2), (x1, y2))
    // a box entirely inside the notch: bbox overlaps, true area 0 — the
    // regression that the strict-interior ear test got wrong (ears spanned
    // the notch when the reflex corner sat exactly on the ear diagonal)
    assert(RingGeom.intersectionArea(ell, box(2, 2, 4, 4)) < 1e-9)
    // straddling box [1,3]²: bottom strip gives [1,3]x[1,2] (2) and the
    // left arm gives [1,2]x[2,3] (1)
    assert(math.abs(RingGeom.intersectionArea(ell, box(1, 1, 3, 3)) - 3.0) < 1e-9)
    // self-intersection = own area; box through both arms
    assert(math.abs(RingGeom.intersectionArea(ell, ell) - 12.0) < 1e-9)
    assert(math.abs(RingGeom.intersectionArea(ell, box(0, 0, 4, 4)) - 12.0) < 1e-9)
    // two concave shapes: L and its 180°-rotated twin interlocking
    val ell2 = IndexedSeq((4.0, 4.0), (0.0, 4.0), (0.0, 2.0), (2.0, 2.0),
      (2.0, 0.0), (4.0, 0.0))
    // overlap = [0,4]² minus both notches minus... compute directly: the
    // two Ls tile the square except both cover nothing jointly outside
    // their strips: L1 = bottom+left strips, L2 = top+right strips;
    // common = ([0,4]x[0,2] ∪ [0,2]x[0,4]) ∩ ([0,4]x[2,4] ∪ [2,4]x[0,4])
    //        = [2,4]x[0,2] ∪ [0,2]x[2,4]  → area 8
    assert(math.abs(RingGeom.intersectionArea(ell, ell2) - 8.0) < 1e-9)
  }

  test("overlayPolygons: concave L x box grid join matches decomposition") {
    def pt(x: Double, y: Double) = (x, y)
    def ringDf(rows: Seq[(Long, IndexedSeq[(Double, Double)])], id: String) =
      rows.toDF(id, "__r")
        .withColumn("ring", transform(col("__r"),
          p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
        .drop("__r")
    // three Ls at different offsets; two 3x3 counties
    def ell(ox: Double, oy: Double) = IndexedSeq(pt(ox, oy), pt(ox + 4, oy),
      pt(ox + 4, oy + 2), pt(ox + 2, oy + 2), pt(ox + 2, oy + 4), pt(ox, oy + 4))
    val left = ringDf(Seq((1L, ell(0, 0)), (2L, ell(3, 1)), (3L, ell(10, 10))), "lid")
    val right = ringDf(Seq(
      (7L, IndexedSeq(pt(2, 2), pt(5, 2), pt(5, 5), pt(2, 5))),
      (8L, IndexedSeq(pt(11, 9), pt(14, 9), pt(14, 12), pt(11, 12)))), "rid")
      .withColumn("v", lit(9.0))
    val got = SpatialOps.overlayPolygons(left, right, "lid", "rid",
        Seq("v"), cell = 4.0)
      .select("lid", "rid", "inter_area").as[(Long, Long, Double)]
      .collect().map { case (l, r, a) => (l, r) -> a }.toMap
    // L1 ∩ county7: notch miss — no pair. L2 ∩ county7: bottom strip
    // [3,7]x[1,3] ∩ [2,5]x[2,5] = [3,5]x[2,3] (2) + left strip
    // [3,5]x[3,5] ∩ = [3,5]x[3,5] (4) → 6. L3 ∩ county8: bottom strip
    // [10,14]x[10,12] ∩ [11,14]x[9,12] = 3x2 (6) + left [10,12]x[12,14] ∩ = 0 → 6
    assert(!got.contains((1L, 7L)), s"notch miss must not pair: $got")
    assert(math.abs(got((2L, 7L)) - 6.0) < 1e-9, s"$got")
    assert(math.abs(got((3L, 8L)) - 6.0) < 1e-9, s"$got")
    assert(got.size == 2, s"$got")
  }

  test("explodeMultiPolygon: fractions sum to 1, values conserved") {
    val df = Seq((1L, 100.0)).toDF("id", "v")
      .withColumn("rings", array(
        // 2x3 box and 1x4 box
        expr("array(struct(0.0d AS x, 0.0d AS y), struct(2.0d AS x, 0.0d AS y), " +
          "struct(2.0d AS x, 3.0d AS y), struct(0.0d AS x, 3.0d AS y))"),
        expr("array(struct(10.0d AS x, 0.0d AS y), struct(11.0d AS x, 0.0d AS y), " +
          "struct(11.0d AS x, 4.0d AS y), struct(10.0d AS x, 4.0d AS y))")))
    val rows = SpatialOps.explodeMultiPolygon(df, "id", Seq("v"))
      .select("part_index", "ring_area", "area_fraction", "v_part")
      .as[(Int, Double, Double, Double)].collect().sortBy(_._1)
    assert(rows.map(_._2).toSeq == Seq(6.0, 4.0))
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-12)
    assert(math.abs(rows.map(_._4).sum - 100.0) < 1e-9)
  }

  test("RingGeom.unionArea: overlapping concave polygons, slanted edges") {
    import graft.plans.RingGeom
    val ell = IndexedSeq((0.0, 0.0), (4.0, 0.0), (4.0, 2.0), (2.0, 2.0),
      (2.0, 4.0), (0.0, 4.0))
    val ell2 = IndexedSeq((4.0, 4.0), (0.0, 4.0), (0.0, 2.0), (2.0, 2.0),
      (2.0, 0.0), (4.0, 0.0))
    // interlocking Ls: 12 + 12 − 8 (their intersection, proven above) = 16
    assert(math.abs(RingGeom.unionArea(Seq(ell, ell2)) - 16.0) < 1e-9)
    // disjoint copies add; duplicates don't double-count
    val far = ell.map { case (x, y) => (x + 100.0, y) }
    assert(math.abs(RingGeom.unionArea(Seq(ell, far)) - 24.0) < 1e-9)
    assert(math.abs(RingGeom.unionArea(Seq(ell, ell)) - 12.0) < 1e-9)
    // slanted overlap: two unit right triangles sharing half their area
    val t1 = IndexedSeq((0.0, 0.0), (2.0, 0.0), (0.0, 2.0))
    val t2 = IndexedSeq((0.0, 0.0), (2.0, 0.0), (2.0, 2.0))
    // each area 2, intersection = triangle (0,0),(2,0),(1,1) area 1 → union 3
    assert(math.abs(RingGeom.unionArea(Seq(t1, t2)) - 3.0) < 1e-9)
  }

  test("unionAreaPolygonsByGroup matches cell counting on L-shapes") {
    def ell(ox: Double, oy: Double) = IndexedSeq((ox, oy), (ox + 4, oy),
      (ox + 4, oy + 2), (ox + 2, oy + 2), (ox + 2, oy + 4), (ox, oy + 4))
    val rows = Seq((1L, ell(0, 0)), (1L, ell(1, 1)), (1L, ell(20, 20)),
      (2L, ell(0, 0)))
    val df = rows.toDF("g", "__r")
      .withColumn("ring", transform(col("__r"),
        p => struct(p.getField("_1").as("x"), p.getField("_2").as("y"))))
      .drop("__r")
    val got = SpatialOps.unionAreaPolygonsByGroup(df, "g")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // brute force: count covered unit cells (L = two boxes)
    def cells(ox: Double, oy: Double): Set[(Int, Int)] = {
      val (x, y) = (ox.toInt, oy.toInt)
      ((for (cx <- x until x + 4; cy <- y until y + 2) yield (cx, cy)) ++
        (for (cx <- x until x + 2; cy <- y + 2 until y + 4) yield (cx, cy))).toSet
    }
    val want1 = (cells(0, 0) ++ cells(1, 1) ++ cells(20, 20)).size.toDouble
    assert(got(1L) == ((want1, 3L)), s"got $got want ($want1, 3)")
    assert(got(2L) == ((12.0, 1L)))
  }

  test("RingGeom properties on random star-shaped (concave) polygons") {
    import graft.plans.RingGeom
    val rnd = new scala.util.Random(1234)
    // radial construction with angles spread over the FULL circle (evenly
    // spaced + jitter): every angular gap stays < π, so the polygon is
    // guaranteed simple; random radii make it concave. (Fully random
    // sorted angles can cluster in a half-plane, where the wrap-around
    // edge cuts across the interior — a NON-simple ring, outside
    // RingGeom's documented precondition.)
    def randPoly(): IndexedSeq[(Double, Double)] = {
      val n = 5 + rnd.nextInt(8)
      IndexedSeq.tabulate(n) { i =>
        val a = 2 * math.Pi * (i + 0.1 + rnd.nextDouble() * 0.8) / n
        val r = 1.0 + rnd.nextDouble() * 4.0
        (r * math.cos(a), r * math.sin(a))
      }
    }
    for (_ <- 1 to 60) {
      val p = randPoly()
      val area = RingGeom.area(p)
      // triangulation is exhaustive: triangle areas sum to the ring area
      val triSum = RingGeom.triangulate(p).map(t => RingGeom.area(t.toIndexedSeq)).sum
      assert(math.abs(triSum - area) < 1e-9 * math.max(1.0, area),
        s"triangulation lost area: $triSum vs $area for $p")
      // self-intersection is identity
      assert(math.abs(RingGeom.intersectionArea(p, p) - area) < 1e-9 * math.max(1.0, area))
      // union of itself is itself; union with a far translate is the sum
      assert(math.abs(RingGeom.unionArea(Seq(p, p)) - area) < 1e-9 * math.max(1.0, area))
      val far = p.map { case (x, y) => (x + 1000.0, y) }
      assert(math.abs(RingGeom.unionArea(Seq(p, far)) - 2 * area) < 1e-9 * math.max(1.0, area))
      // intersection with a second random polygon is symmetric and bounded
      val q = randPoly()
      val iPQ = RingGeom.intersectionArea(p, q)
      val iQP = RingGeom.intersectionArea(q, p)
      assert(math.abs(iPQ - iQP) < 1e-9, s"asymmetric intersection: $iPQ vs $iQP")
      assert(iPQ >= -1e-12 && iPQ <= math.min(area, RingGeom.area(q)) + 1e-9)
      // inclusion–exclusion ties union to intersection
      val u = RingGeom.unionArea(Seq(p, q))
      assert(math.abs(u - (area + RingGeom.area(q) - iPQ)) < 1e-6,
        s"inclusion-exclusion violated: union $u, areas $area + ${RingGeom.area(q)} - $iPQ")
    }
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
