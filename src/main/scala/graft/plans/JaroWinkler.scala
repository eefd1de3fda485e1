package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro–Winkler kernel, written to match DuckDB's
  * `jaro_winkler_similarity` (RapidFuzz semantics) bit-for-bit so results
  * are SQL-oracle-replayable:
  *   - either string empty → 0.0 (including both empty);
  *   - match window = ⌊max(len)/2⌋ − 1, clamped to ≥ 0;
  *   - jaro = (m/len1 + m/len2 + (m−t)/m) / 3  — summed in that order,
  *     then one division by 3.0 (the association order matters for the
  *     last bit);
  *   - Winkler prefix boost (p = 0.1, prefix capped at 4) applied only
  *     when jaro > 0.7: jw = jaro + prefix·0.1·(1 − jaro).
  *
  * Kept in a companion-less object so Scala emits a static forwarder the
  * generated code can call directly. */
object JaroWinklerAlgo {
  def compute(a: UTF8String, b: UTF8String): Double =
    compute(a.toString, b.toString)

  def compute(s1: String, s2: String): Double = {
    val len1 = s1.length
    val len2 = s2.length
    if (len1 == 0 || len2 == 0) return 0.0
    val window = math.max(0, math.max(len1, len2) / 2 - 1)
    val m1 = new Array[Boolean](len1)
    val m2 = new Array[Boolean](len2)
    var m = 0
    var i = 0
    while (i < len1) {
      val lo = math.max(0, i - window)
      val hi = math.min(len2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < len1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var sim = m.toDouble / len1 + m.toDouble / len2 +
      (m - t).toDouble / m
    sim /= 3.0
    if (sim > 0.7) {
      var prefix = 0
      val maxP = math.min(4, math.min(len1, len2))
      while (prefix < maxP && s1.charAt(prefix) == s2.charAt(prefix)) prefix += 1
      sim += prefix * 0.1 * (1.0 - sim)
    }
    sim
  }
}

/** Native Catalyst expression: Jaro–Winkler similarity of two strings —
  * the reference's actual record-linkage string metric
  * (`/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:346-371`
  * uses jarowinkler via the recordlinkage library; levenshtein is the
  * built-in stand-in elsewhere). `doGenCode` emits a static call so the
  * expression stays inside whole-stage codegen — no UDF boxing. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType == StringType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects string inputs, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerAlgo.compute(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.plans.JaroWinklerAlgo.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    Internals.column(JaroWinkler(
      Internals.expression(a), Internals.expression(b)))
}
