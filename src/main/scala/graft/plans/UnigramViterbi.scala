package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the exact-integer Viterbi segmentation DP
  * of [[graft.text.Unigram.viterbiSegment]] in ONE node per row —
  * `struct(score: bigint, pieces: array<string>)` from (word, score_arr).
  *
  * Semantics are bit-identical to the declarative form it replaces (two
  * nested `aggregate` HOFs: the forward DP with the candidate window
  * unrolled, then the backpointer walk):
  *   - dp[0] = 0; dp[i] = max over piece lengths l = 1..maxPieceLen of
  *     dp[i−l] + score_arr[(i−l)·maxPieceLen + l − 1] (1-based slot
  *     (j−1)·maxPieceLen + l, j = i−l+1), null slots skipped;
  *   - tie rule: equal score prefers the SMALLER start (longer last
  *     piece) — the fold checked candidates from longest to shortest with
  *     a strict `>`, which this loop mirrors exactly;
  *   - backtrace via stored backpointers; pieces are
  *     `substr(word, bp, pos − bp + 1)` — [[UTF8String.substringSQL]],
  *     the same kernel Spark's `Substring` calls, so unicode slicing is
  *     identical.
  *
  * Exists for plan size and per-row speed (the LongSqDist/WordShingles
  * rationale): Catalyst HOFs run interpreted — one boxed lambda dispatch
  * per DP cell — and `concat(acc, array(best))` re-copies the
  * accumulator per position (O(n²) allocation per word). Worse, the
  * unrolled DP is a ~10³-node expression tree that every EM round
  * re-analyzes and re-compiles, which dominated the unigram lanes'
  * latency (the dictionary is vocabulary-bounded, so driver-side plan
  * work outweighed execution at every fixture scale). Per-row eval via
  * CodegenFallback: the win is per-cell → per-row, not codegen fusion.
  *
  * Word length is bounded by the dictionary contract (real words, not
  * documents); the DP is O(n·maxPieceLen) time, O(n) state per row.
  */
case class UnigramViterbi(left: Expression, right: Expression,
                          maxPieceLen: Int)
    extends BinaryExpression with CodegenFallback {

  require(maxPieceLen >= 1, "maxPieceLen must be >= 1")

  /** Mirror of [[graft.text.Unigram.NegInf]] — the DP's very negative
    * sentinel, far below any real path score but safe from overflow. */
  private val NegInf: Long = -4611686018427387904L

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"unigram_viterbi expects (string, array<bigint>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("score", LongType, nullable = false),
    StructField("pieces", ArrayType(StringType, containsNull = false),
      nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_viterbi"

  override def nullSafeEval(wordAny: Any, arrAny: Any): Any = {
    val word = wordAny.asInstanceOf[UTF8String]
    val arr = arrAny.asInstanceOf[ArrayData]
    val n = word.numChars()
    val m = arr.numElements()
    // dp[i]: best score of the length-i prefix; bp[i]: 1-based start of
    // its last piece (-1 = unreachable, cannot occur for well-formed
    // score arrays where every l=1 slot is non-null)
    val dp = new Array[Long](n + 1)
    val bp = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestS = NegInf
      var bestJ = -1
      // longest candidate first + strict '>' = ties prefer smaller start
      var d = maxPieceLen - 1
      while (d >= 0) {
        val j = i - d // 1-based start of a piece of length d+1 ending at i
        if (j >= 1) {
          val slot = (j - 1) * maxPieceLen + d // 0-based: (j-1)*mpl + l - 1
          if (slot < m && !arr.isNullAt(slot)) {
            val cand = dp(j - 1) + arr.getLong(slot)
            if (cand > bestS) { bestS = cand; bestJ = j }
          }
        }
        d -= 1
      }
      dp(i) = bestS
      bp(i) = bestJ
      i += 1
    }
    // backtrace: at most n pieces, emitted left-to-right via a prepend walk
    var pos = n
    var count = 0
    val starts = new Array[Int](n)
    val ends = new Array[Int](n)
    while (pos > 0) {
      val j = bp(pos)
      starts(count) = j; ends(count) = pos
      count += 1
      pos = j - 1
    }
    val pieces = new Array[Any](count)
    var k = 0
    while (k < count) {
      val s = starts(count - 1 - k)
      val e = ends(count - 1 - k)
      pieces(k) = word.substringSQL(s, e - s + 1)
      k += 1
    }
    InternalRow(dp(n), new GenericArrayData(pieces))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): UnigramViterbi =
    copy(left = newLeft, right = newRight)
}

object UnigramViterbi {
  /** Column-API entry point. */
  def apply(word: Column, scoreArr: Column, maxPieceLen: Int): Column =
    Internals.column(UnigramViterbi(
      Internals.expression(word), Internals.expression(scoreArr),
      maxPieceLen))
}
