package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructType}

/** Pure-JVM planar geometry for simple (possibly CONCAVE) rings — the
  * kernel behind [[PolygonIntersectArea]]. Rings are open vertex arrays,
  * either winding order, no self-intersections (the reference's shapely
  * polygons satisfy the same precondition).
  */
object RingGeom {

  type Pt = (Double, Double)

  /** Twice the signed area (CCW positive). */
  def signedArea2(ring: IndexedSeq[Pt]): Double = {
    var s = 0.0
    var i = 0
    while (i < ring.length) {
      val (x1, y1) = ring(i)
      val (x2, y2) = ring((i + 1) % ring.length)
      s += x1 * y2 - x2 * y1
      i += 1
    }
    s
  }

  def area(ring: IndexedSeq[Pt]): Double = math.abs(signedArea2(ring)) / 2.0

  private def dedupConsecutive(ring: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    if (ring.isEmpty) return ring
    val out = scala.collection.mutable.ArrayBuffer[Pt](ring.head)
    for (p <- ring.tail) if (p != out.last) out += p
    if (out.length > 1 && out.head == out.last) out.remove(out.length - 1)
    out.toIndexedSeq
  }

  /** Ear-clipping triangulation of a simple polygon (handles concave
    * rings; collinear vertices are clipped away without emitting). Returns
    * CCW triangles whose areas sum to the ring's area. */
  def triangulate(ring0: IndexedSeq[Pt]): IndexedSeq[Array[Pt]] = {
    val ring = dedupConsecutive(ring0)
    if (ring.length < 3) return IndexedSeq.empty
    val ccw = if (signedArea2(ring) >= 0) ring else ring.reverse
    val idx = scala.collection.mutable.ArrayBuffer(ccw.indices: _*)
    val tris = scala.collection.mutable.ArrayBuffer.empty[Array[Pt]]
    def cross(a: Pt, b: Pt, c: Pt): Double =
      (b._1 - a._1) * (c._2 - a._2) - (b._2 - a._2) * (c._1 - a._1)
    // CLOSED-triangle test: a vertex on the ear's boundary blocks the ear
    // too — a reflex vertex sitting exactly on the ear's diagonal (the
    // notch corner of a rectilinear L) would otherwise let the ear span
    // the notch. Vertices coincident with an ear corner are exempt
    // (measure-zero touch, would deadlock the scan otherwise).
    def inClosedTri(p: Pt, a: Pt, b: Pt, c: Pt): Boolean =
      cross(a, b, p) >= 0 && cross(b, c, p) >= 0 && cross(c, a, p) >= 0
    while (idx.length > 3) {
      var earAt = -1
      var k = 0
      while (k < idx.length && earAt < 0) {
        val ip = idx((k + idx.length - 1) % idx.length)
        val ic = idx(k)
        val in = idx((k + 1) % idx.length)
        val (a, b, c) = (ccw(ip), ccw(ic), ccw(in))
        val cr = cross(a, b, c)
        if (cr == 0.0) earAt = k // degenerate: drop vertex, emit nothing
        else if (cr > 0 && idx.forall { j =>
          j == ip || j == ic || j == in || {
            val q = ccw(j)
            q == a || q == b || q == c || !inClosedTri(q, a, b, c)
          }
        }) {
          tris += Array(a, b, c)
          earAt = k
        }
        k += 1
      }
      if (earAt < 0) {
        // no ear found (numerically degenerate ring) — bail out with what
        // we have rather than loop forever; callers see a partial area
        return tris.toIndexedSeq
      }
      idx.remove(earAt)
    }
    val t = Array(ccw(idx(0)), ccw(idx(1)), ccw(idx(2)))
    if (cross(t(0), t(1), t(2)) != 0.0) tris += t
    tris.toIndexedSeq
  }

  /** Sutherland–Hodgman: subject ring clipped by a CONVEX CCW clip ring. */
  def clipByConvex(subject: IndexedSeq[Pt], clipCcw: IndexedSeq[Pt]): IndexedSeq[Pt] = {
    var out: IndexedSeq[Pt] = subject
    var e = 0
    while (e < clipCcw.length && out.nonEmpty) {
      val (ax, ay) = clipCcw(e)
      val (bx, by) = clipCcw((e + 1) % clipCcw.length)
      def inside(p: Pt): Boolean =
        (bx - ax) * (p._2 - ay) - (by - ay) * (p._1 - ax) >= 0
      def intersect(p: Pt, q: Pt): Pt = {
        val t = ((ax - p._1) * (ay - by) - (ay - p._2) * (ax - bx)) /
          ((q._1 - p._1) * (ay - by) - (q._2 - p._2) * (ax - bx))
        (p._1 + t * (q._1 - p._1), p._2 + t * (q._2 - p._2))
      }
      val in = out
      val next = scala.collection.mutable.ArrayBuffer.empty[Pt]
      var i = 0
      while (i < in.length) {
        val cur = in(i)
        val prev = in((i + in.length - 1) % in.length)
        (inside(cur), inside(prev)) match {
          case (true, true)  => next += cur
          case (true, false) => next += intersect(prev, cur); next += cur
          case (false, true) => next += intersect(prev, cur)
          case _             => ()
        }
        i += 1
      }
      out = next.toIndexedSeq
      e += 1
    }
    out
  }

  /** Exact intersection area of two simple polygons, concave allowed:
    * triangulate both, sum the convex triangle∩triangle clip areas
    * (overlaps between summands are boundary-only — measure zero). */
  def intersectionArea(a: IndexedSeq[Pt], b: IndexedSeq[Pt]): Double =
    intersectionAreaMemo(a, b, null)

  /** As [[intersectionArea]], with an optional caller-owned triangulation
    * memo: in an overlay join each ring meets many candidates, so caching
    * `triangulate` per distinct ring removes the dominant repeated cost
    * (the clip stage itself is per-pair and unavoidable). */
  def intersectionAreaMemo(a: IndexedSeq[Pt], b: IndexedSeq[Pt],
      memo: java.util.HashMap[IndexedSeq[Pt], IndexedSeq[Array[Pt]]]): Double = {
    def tri(r: IndexedSeq[Pt]): IndexedSeq[Array[Pt]] =
      if (memo == null) triangulate(r)
      else {
        var t = memo.get(r)
        if (t == null) {
          if (memo.size > 8192) memo.clear() // bound task-local memory
          t = triangulate(r)
          memo.put(r, t)
        }
        t
      }
    val ta = tri(a)
    if (ta.isEmpty) return 0.0
    val tb = tri(b)
    if (tb.isEmpty) return 0.0
    // allocation-free primitive kernel per triangle pair (same double ops
    // in the same order as clipByConvex + area — results are bit-identical)
    val bx = new Array[Double](16); val by = new Array[Double](16)
    val tx = new Array[Double](16); val ty = new Array[Double](16)
    var sum = 0.0
    var i = 0
    while (i < ta.length) {
      var j = 0
      while (j < tb.length) {
        sum += triTriClipArea(ta(i), tb(j), bx, by, tx, ty)
        j += 1
      }
      i += 1
    }
    sum
  }

  /** Sutherland–Hodgman of one CCW triangle by another on primitive
    * buffers — the overlay join's hot kernel. Mirrors [[clipByConvex]]'s
    * arithmetic exactly (same expressions, same order). */
  private def triTriClipArea(subj: Array[Pt], clip: Array[Pt],
      bx: Array[Double], by: Array[Double],
      tx: Array[Double], ty: Array[Double]): Double = {
    var n = 3
    var k = 0
    while (k < 3) { bx(k) = subj(k)._1; by(k) = subj(k)._2; k += 1 }
    var e = 0
    while (e < 3 && n > 0) {
      val ax = clip(e)._1; val ay = clip(e)._2
      val nx = clip((e + 1) % 3)
      val bxe = nx._1; val bye = nx._2
      var m = 0
      var i = 0
      while (i < n) {
        val pi = (i + n - 1) % n
        val px = bx(pi); val py = by(pi)
        val cx = bx(i); val cy = by(i)
        val insideCur = (bxe - ax) * (cy - ay) - (bye - ay) * (cx - ax) >= 0
        val insidePrev = (bxe - ax) * (py - ay) - (bye - ay) * (px - ax) >= 0
        if (insideCur != insidePrev) {
          val t = ((ax - px) * (ay - bye) - (ay - py) * (ax - bxe)) /
            ((cx - px) * (ay - bye) - (cy - py) * (ax - bxe))
          tx(m) = px + t * (cx - px); ty(m) = py + t * (cy - py); m += 1
        }
        if (insideCur) { tx(m) = cx; ty(m) = cy; m += 1 }
        i += 1
      }
      n = m
      var q = 0
      while (q < n) { bx(q) = tx(q); by(q) = ty(q); q += 1 }
      e += 1
    }
    if (n < 3) return 0.0
    var s = 0.0
    var i2 = 0
    while (i2 < n) {
      val j2 = (i2 + 1) % n
      s += bx(i2) * by(j2) - bx(j2) * by(i2)
      i2 += 1
    }
    math.abs(s) / 2.0
  }

  /** Exact union area of simple polygons (overlaps allowed, concave
    * allowed) by vertical-slab sweep: between consecutive event abscissae
    * (vertex xs and pairwise edge-crossing xs) the covered y-measure is
    * linear in x, so evaluating it at each slab's midpoint (even-odd
    * crossings per polygon → merged intervals) and multiplying by the slab
    * width is exact — the midpoint rule integrates linear functions
    * without error. O(E² + slabs·E) on the group's edge count. */
  def unionArea(polys: Seq[IndexedSeq[Pt]]): Double = {
    val rings = polys.filter(_.length >= 3)
    if (rings.isEmpty) return 0.0
    val edges: Array[(Pt, Pt)] = rings.flatMap(r =>
      r.indices.map(i => (r(i), r((i + 1) % r.length)))).toArray
    val events = scala.collection.mutable.TreeSet.empty[Double]
    rings.foreach(_.foreach(p => events += p._1))
    // pairwise proper edge crossings add breakpoints where interval
    // endpoints exchange order (collinear overlaps contribute no new xs —
    // their endpoints are vertices, already events). Edges are sorted by
    // bbox xmin so the inner scan stops at the first non-overlapping x —
    // near-linear for spatially spread groups instead of all-pairs.
    val sortedE = edges.sortBy(e => math.min(e._1._1, e._2._1))
    val xmin = sortedE.map(e => math.min(e._1._1, e._2._1))
    val xmax = sortedE.map(e => math.max(e._1._1, e._2._1))
    val ymin = sortedE.map(e => math.min(e._1._2, e._2._2))
    val ymax = sortedE.map(e => math.max(e._1._2, e._2._2))
    var i = 0
    while (i < sortedE.length) {
      var j = i + 1
      while (j < sortedE.length && xmin(j) <= xmax(i)) {
        if (ymin(j) <= ymax(i) && ymin(i) <= ymax(j)) {
          val ((p1, p2), (q1, q2)) = (sortedE(i), sortedE(j))
          val d1 = (p2._1 - p1._1, p2._2 - p1._2)
          val d2 = (q2._1 - q1._1, q2._2 - q1._2)
          val den = d1._1 * d2._2 - d1._2 * d2._1
          if (den != 0.0) {
            val t = ((q1._1 - p1._1) * d2._2 - (q1._2 - p1._2) * d2._1) / den
            val u = ((q1._1 - p1._1) * d1._2 - (q1._2 - p1._2) * d1._1) / den
            if (t > 0 && t < 1 && u > 0 && u < 1) events += p1._1 + t * d1._1
          }
        }
        j += 1
      }
      i += 1
    }
    val xs = events.toArray
    var area = 0.0
    var k = 0
    while (k < xs.length - 1) {
      val (x0, x1) = (xs(k), xs(k + 1))
      if (x1 > x0) {
        val xm = (x0 + x1) / 2.0
        // even-odd vertical-line crossings per polygon → inside intervals
        val ivs = scala.collection.mutable.ArrayBuffer.empty[(Double, Double)]
        rings.foreach { r =>
          val cuts = r.indices.flatMap { i =>
            val (a, b) = (r(i), r((i + 1) % r.length))
            if ((a._1 <= xm) != (b._1 <= xm))
              Some(a._2 + (xm - a._1) / (b._1 - a._1) * (b._2 - a._2))
            else None
          }.sorted
          var c = 0
          while (c + 1 < cuts.length) { ivs += ((cuts(c), cuts(c + 1))); c += 2 }
        }
        // merge intervals across polygons
        val sortedIvs = ivs.sortBy(_._1)
        var covered = 0.0
        var curLo = Double.NaN; var curHi = Double.NaN
        sortedIvs.foreach { case (lo, hi) =>
          if (curHi.isNaN || lo > curHi) {
            if (!curHi.isNaN) covered += curHi - curLo
            curLo = lo; curHi = hi
          } else if (hi > curHi) curHi = hi
        }
        if (!curHi.isNaN) covered += curHi - curLo
        area += covered * (x1 - x0)
      }
      k += 1
    }
    area
  }
}

/** Native Catalyst expression: intersection AREA of two simple polygons —
  * concave rings included, which is what [[ConvexClip]] (convex windows
  * only) cannot express. This is the general-polygon core of the
  * reference's `overlay` / `self_union` / `dissolve` surface
  * (`/root/reference/src/pudl/analysis/spatial.py:118-288`), where county
  * and territory shapes are concave (multi)polygons.
  *
  * Triangulate-and-clip: ear-clip both rings, Sutherland–Hodgman each
  * triangle pair, sum areas — deterministic, one eval per row over columnar
  * ArrayData, no driver state. Rings are `array<struct<x:double,y:double>>`,
  * open, either winding order.
  */
case class PolygonIntersectArea(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs.forall(_.dataType == DoubleType) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "polygon_intersect_area expects two array<struct<x:double,y:double>> rings")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "polygon_intersect_area"

  private def readRing(a: Any): IndexedSeq[RingGeom.Pt] = {
    val arr = a.asInstanceOf[ArrayData]
    IndexedSeq.tabulate(arr.numElements()) { i =>
      val s = arr.getStruct(i, 2)
      (s.getDouble(0), s.getDouble(1))
    }
  }

  // task-local triangulation memo: each expression tree is deserialized
  // per task, so this map is single-thread-confined; in an overlay join a
  // ring meets many candidate pairs and its ear clipping is the dominant
  // repeated cost
  @transient private lazy val triMemo =
    new java.util.HashMap[IndexedSeq[RingGeom.Pt], IndexedSeq[Array[RingGeom.Pt]]]()

  override def nullSafeEval(aRaw: Any, bRaw: Any): Any =
    RingGeom.intersectionAreaMemo(readRing(aRaw), readRing(bRaw), triMemo)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PolygonIntersectArea =
    copy(left = newLeft, right = newRight)
}

object PolygonIntersectArea {
  /** Column-API entry point: area(a ∩ b) for simple, possibly concave rings. */
  def apply(a: Column, b: Column): Column =
    Internals.column(PolygonIntersectArea(
      Internals.expression(a), Internals.expression(b)))
}
