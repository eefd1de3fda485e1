package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One native pass over a whole ordered regex-replace chain.
  *
  * Folding N `regexp_replace` Columns (the company-name cleaner is ~150
  * steps, [[graft.functions.CompanyNames]]) costs N expression nodes per
  * row — each with its own UTF8String→String→UTF8String round trip and
  * result allocation. This expression converts ONCE, loops precompiled
  * `java.util.regex.Pattern`s over a plain String, and converts back —
  * same Java `replaceAll` semantics as the engine's `regexp_replace`
  * (parity pinned by CompanyNamesSpec's reference battery and the q163
  * oracle, which replays the same constants in DuckDB).
  *
  * CodegenFallback is deliberate: the per-row work is the regex loop
  * itself, not expression dispatch, so interpreted eval with 1/N-th the
  * conversions beats N codegen'd nodes (measured ~3× on q163's chain).
  */
case class RegexReplaceChain(child: Expression, patterns: Seq[String],
                             replacements: Seq[String])
    extends UnaryExpression with CodegenFallback {
  require(patterns.length == replacements.length,
    "patterns and replacements must align")

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  @transient private lazy val compiled: Array[java.util.regex.Pattern] =
    patterns.map(java.util.regex.Pattern.compile).toArray

  protected override def nullSafeEval(input: Any): Any = {
    var s = input.asInstanceOf[UTF8String].toString
    var i = 0
    while (i < compiled.length) {
      s = compiled(i).matcher(s).replaceAll(replacements(i))
      i += 1
    }
    UTF8String.fromString(s)
  }

  override protected def withNewChildInternal(newChild: Expression): RegexReplaceChain =
    copy(child = newChild)
}

object RegexReplaceChain {
  def apply(c: Column, steps: Seq[(String, String)]): Column =
    Internals.column(RegexReplaceChain(Internals.expression(c),
      steps.map(_._1), steps.map(_._2)))
}
