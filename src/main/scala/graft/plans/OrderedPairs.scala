package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all ordered index pairs (i < j) of an
  * array, as `array<struct<a, b>>` — the posting-list pair emit of the
  * near-dup family ([[graft.dedup.NearDup.jaccardPairs]] /
  * `winnowPairs`).
  *
  * Pair-for-pair identical (same (i, j) lexicographic order) to the
  * declarative chain it replaces:
  * `flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2,
  * size(ids) - i - 1), y -> struct(x, y))))` — which Catalyst evaluates
  * interpreted (a boxed lambda dispatch per pair) and whose `slice`
  * re-copies the list tail per element (O(df²) element copies per
  * posting list on top of the O(df²) output itself). Here each input
  * element is read (and defensively copied out of its unsafe buffer)
  * once, and every pair is two shared references. Per-row eval via
  * CodegenFallback, the [[WordShingles]] rationale: the win is
  * per-pair → per-row.
  */
case class OrderedPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType
  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: ArrayType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ordered_pairs expects an array input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("a", elemType, nullable = elemNullable),
    StructField("b", elemType, nullable = elemNullable))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ordered_pairs"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    // copy each element out of its (possibly reused) unsafe buffer ONCE;
    // pairs then share references
    val objs = new Array[Any](n)
    var i = 0
    while (i < n) {
      objs(i) =
        if (arr.isNullAt(i)) null
        else arr.get(i, elemType) match {
          case r: InternalRow => r.copy()
          case s: UTF8String => s.clone()
          case d: ArrayData => d.copy()
          case x => x
        }
      i += 1
    }
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = InternalRow(objs(i), objs(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): OrderedPairs =
    copy(child = newChild)
}

object OrderedPairs {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    Internals.column(OrderedPairs(Internals.expression(c)))
}
