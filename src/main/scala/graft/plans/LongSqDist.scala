package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer squared euclidean distance between two `array<bigint>`
  * vectors: Σ (aᵢ − bᵢ)² over the common prefix, as a single codegen'd
  * primitive loop.
  *
  * Exists for the same reason as [[FloatDotProduct]]: the declarative
  * `aggregate(zip_with(a, b, …))` form allocates an intermediate array
  * per evaluation and runs the lambda interpreted (Catalyst higher-order
  * functions don't participate in whole-stage codegen), which turns the
  * n·k distance evaluations of a Lloyd's assignment into the dominant
  * cost once k is data-scaled (semDedup's targetClusterRows). This is the
  * hot inner product of the quantized-grid k-means family — exact long
  * arithmetic, so the SQL oracle's list_sum/list_transform replay agrees
  * bit-for-bit. Values are quantized embedding grids (|v| ≤ ~quantScale ·
  * max|e|), so the Σ of 64 squared diffs stays far below int64 overflow
  * by the operator's quantScale contract.
  */
case class LongSqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"long_sq_dist expects array<bigint> inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "long_sq_dist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): LongSqDist =
    copy(left = newLeft, right = newRight)
}

object LongSqDist {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Internals.column(LongSqDist(
      Internals.expression(a), Internals.expression(b)))
}
