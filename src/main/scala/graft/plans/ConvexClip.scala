package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StructField, StructType}

/** Native Catalyst expression: Sutherland–Hodgman polygon clipping — the
  * subject ring (any simple polygon) clipped by a CONVEX clip ring. Returns
  * the intersection ring (possibly empty). This is the geometric core of
  * the reference's planar overlay / `self_union` split
  * (`/root/reference/src/pudl/analysis/spatial.py:118-288`): intersecting
  * each layer polygon with convex cells (counties' bounding cells, grid
  * tiles) and prorating by the clipped area.
  *
  * One eval per row over columnar ArrayData (same tier as `WordShingles`);
  * rings are `array<struct<x:double,y:double>>`, open (no repeated last
  * vertex), either winding order.
  */
case class ConvexClip(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  private val ringType = ArrayType(StructType(Seq(
    StructField("x", DoubleType), StructField("y", DoubleType))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(StructType(fs), _) if fs.length == 2 &&
        fs.forall(_.dataType == DoubleType) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "convex_clip expects two array<struct<x:double,y:double>> rings")
  }
  override def dataType: DataType = ringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "convex_clip"

  private def readRing(a: Any): Array[(Double, Double)] = {
    val arr = a.asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val s = arr.getStruct(i, 2)
      (s.getDouble(0), s.getDouble(1))
    }
  }

  override def nullSafeEval(subjRaw: Any, clipRaw: Any): Any = {
    val clip = readRing(clipRaw)
    var out = readRing(subjRaw).toVector
    // ensure counter-clockwise clip ring so "inside" is a consistent side
    val ccwClip = {
      var a2 = 0.0
      var i = 0
      while (i < clip.length) {
        val (x1, y1) = clip(i); val (x2, y2) = clip((i + 1) % clip.length)
        a2 += x1 * y2 - x2 * y1
        i += 1
      }
      if (a2 >= 0) clip else clip.reverse
    }
    var e = 0
    while (e < ccwClip.length && out.nonEmpty) {
      val (ax, ay) = ccwClip(e)
      val (bx, by) = ccwClip((e + 1) % ccwClip.length)
      def inside(p: (Double, Double)): Boolean =
        (bx - ax) * (p._2 - ay) - (by - ay) * (p._1 - ax) >= 0
      def intersect(p: (Double, Double), q: (Double, Double)): (Double, Double) = {
        val t = ((ax - p._1) * (ay - by) - (ay - p._2) * (ax - bx)) /
          ((q._1 - p._1) * (ay - by) - (q._2 - p._2) * (ax - bx))
        (p._1 + t * (q._1 - p._1), p._2 + t * (q._2 - p._2))
      }
      val in = out
      out = Vector.empty
      var i = 0
      while (i < in.length) {
        val cur = in(i)
        val prev = in((i + in.length - 1) % in.length)
        (inside(cur), inside(prev)) match {
          case (true, true) => out :+= cur
          case (true, false) => out :+= intersect(prev, cur); out :+= cur
          case (false, true) => out :+= intersect(prev, cur)
          case _ => ()
        }
        i += 1
      }
      e += 1
    }
    new GenericArrayData(out.map { case (x, y) =>
      val r = new GenericInternalRow(2)
      r.setDouble(0, x); r.setDouble(1, y)
      r: Any
    }.toArray)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ConvexClip =
    copy(left = newLeft, right = newRight)
}

object ConvexClip {
  /** Column-API entry point: intersection ring of subject ∩ convex clip. */
  def apply(subject: Column, clip: Column): Column =
    Internals.column(ConvexClip(
      Internals.expression(subject), Internals.expression(clip)))
}
