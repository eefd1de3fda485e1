package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the 60-bit MD5-prefix hash
  * ([[graft.functions.PortableHash]]) computed straight from the digest
  * bytes.
  *
  * Bit-identical to the declarative chain it replaces —
  * `conv(substring(md5(x), 1, 15), 16, 10)::long` — because the first 15
  * hex characters of the digest ARE the top 60 bits of its first 8 bytes:
  * fold bytes 0..7 big-endian into a long and shift the bottom nibble
  * off. What it removes is everything around the digest: the 32-char hex
  * string materialization, the substring copy, and conv's per-char base-16
  * parse — three allocations and a parse per HASH CALL, which the gram-
  * level operators (winnowing q113, repeated-span dedup q133) pay once
  * per character of the corpus. The digest itself (the actual oracle tax
  * vs xxhash64) stays.
  *
  * Per-row eval via CodegenFallback, like [[WordShingles]]: the win is
  * per-call constant-factor work, not codegen fusion; a ThreadLocal
  * MessageDigest avoids the per-call provider lookup DigestUtils-style
  * helpers pay.
  */
case class Md5Prefix60(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix60 expects a string input, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix60"

  override def nullSafeEval(input: Any): Any = {
    val md = Md5Prefix60.digest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[UTF8String].getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix60 =
    copy(child = newChild)
}

object Md5Prefix60 {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    Internals.column(Md5Prefix60(Internals.expression(c)))
}
