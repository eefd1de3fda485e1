package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String bridge for codegen — kept in a companion-less object so
  * Scala emits a static forwarder the generated code can call. */
object MetaphoneAlgo {
  def compute(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.functions.Phonetics.metaphone(s.toString))
}

/** Native Catalyst expression: Metaphone phonetic code (Philips 1990) —
  * the reference's actual blocking-key function for its FERC↔EIA splink
  * model (`jellyfish.metaphone`,
  * `/root/reference/src/pudl/analysis/record_linkage/
  * eia_ferc1_record_linkage.py:182-193`; blocked as
  * `substr(plant_name_mphone, 1, 3)` in `eia_ferc1_model_config.py:12`).
  * `doGenCode` emits a static call so the expression stays inside
  * whole-stage codegen — no UDF boxing; at 100 TB the code is a per-row
  * O(len) state machine with zero allocation beyond the output.
  * Algorithm + oracle replay live in `graft.functions.Phonetics`. */
case class Metaphone(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"metaphone expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "metaphone"

  override def nullSafeEval(s: Any): Any =
    MetaphoneAlgo.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.plans.MetaphoneAlgo.compute($s)")

  override protected def withNewChildInternal(newChild: Expression): Metaphone =
    copy(child = newChild)
}

object Metaphone {
  /** Column-API entry point. */
  def apply(c: Column): Column =
    Internals.column(Metaphone(Internals.expression(c)))
}
