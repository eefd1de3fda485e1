package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftaccess.Internals
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Product-quantization encoder as ONE native pass: for each of `m`
  * subspaces, the argmin codeword by ROUNDED (4 dp, HALF_UP — Spark's
  * `round()` semantics via `BigDecimal.valueOf`) distance
  * `|c|² − 2·v_mi·c`, strict `<` so ties keep the earliest codeword —
  * exactly the order the declarative zip_with/round/fold form (and the
  * DuckDB oracle's `row_number ORDER BY d, j`) produces, but without m
  * interpreted higher-order-function chains boxing 64 structs per
  * subspace per row (the measured difference on the sf1 encode pass).
  *
  * `codebooks` is flattened mi-major: codeword (mi, j) occupies
  * [mi·nCodes·sub + j·sub, +sub). Codeword norms are precomputed once at
  * construction with the same sequential fold the literal form used. */
case class PqEncodeCodes(child: Expression, codebooks: Array[Float],
                         m: Int, sub: Int, nCodes: Int)
    extends UnaryExpression {
  require(codebooks.length == m * nCodes * sub,
    s"codebook length ${codebooks.length} != m*nCodes*sub = ${m * nCodes * sub}")

  private lazy val cn2: Array[Double] = Array.tabulate(m * nCodes) { i =>
    val off = i * sub
    var acc = 0.0
    var d = 0
    while (d < sub) {
      acc += codebooks(off + d).toDouble * codebooks(off + d).toDouble
      d += 1
    }
    acc
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode expects array<float> input, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(e: Any): Any = {
    val v = e.asInstanceOf[ArrayData]
    val out = new Array[Int](m)
    val dists = new Array[Double](nCodes)
    var mi = 0
    while (mi < m) {
      val vOff = mi * sub
      var j = 0
      while (j < nCodes) {
        val off = (mi * nCodes + j) * sub
        var dot = 0.0
        var d = 0
        // bound like the declarative slice(): a short vector contributes
        // only its present elements
        val dMax = math.min(sub, v.numElements() - vOff)
        while (d < dMax) {
          dot += v.getFloat(vOff + d).toDouble * codebooks(off + d).toDouble
          d += 1
        }
        dists(j) = cn2(mi * nCodes + j) - 2.0 * dot
        j += 1
      }
      out(mi) = PqEncodeCodes.argminRounded(dists)
      mi += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    val cn2Ref = ctx.addReferenceObj("cn2", cn2, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val dists = ctx.freshName("dists")
      val mi = ctx.freshName("mi")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val vOff = ctx.freshName("vOff")
      val dot = ctx.freshName("dot")
      s"""
         |int[] $out = new int[$m];
         |double[] $dists = new double[$nCodes];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $vOff = $mi * $sub;
         |  for (int $j = 0; $j < $nCodes; $j++) {
         |    int $off = ($mi * $nCodes + $j) * $sub;
         |    double $dot = 0.0;
         |    int ${d}Max = java.lang.Math.min($sub, $v.numElements() - $vOff);
         |    for (int $d = 0; $d < ${d}Max; $d++) {
         |      $dot += ((double) $v.getFloat($vOff + $d))
         |        * ((double) $cbRef[$off + $d]);
         |    }
         |    $dists[$j] = $cn2Ref[$mi * $nCodes + $j] - 2.0 * $dot;
         |  }
         |  $out[$mi] = graft.plans.PqEncodeCodes.argminRounded($dists);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncodeCodes =
    copy(child = newChild)
}

/** The ADC pair kernel: Σ_m q_m · c_{m,codes[m]} over the same flattened
  * codebook, each subspace dot a sequential double fold (bit-identical to
  * the declarative slice+zip_with form it replaced) and the m terms
  * summed in subspace order. One native pass per pair instead of m
  * interpreted HOF folds — the pair side of the q159 hot path. */
case class PqAdcDotSum(left: Expression, right: Expression,
                       codebooks: Array[Float], m: Int, sub: Int,
                       nCodes: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(codebooks.length == m * nCodes * sub,
    s"codebook length ${codebooks.length} != m*nCodes*sub = ${m * nCodes * sub}")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot_sum expects (array<float>, array<int>), got " +
          s"(${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "pq_adc_dot_sum"

  override def nullSafeEval(q: Any, c: Any): Any = {
    val v = q.asInstanceOf[ArrayData]
    val codes = c.asInstanceOf[ArrayData]
    var total = 0.0
    var mi = 0
    while (mi < m) {
      val vOff = mi * sub
      val off = (mi * nCodes + codes.getInt(mi)) * sub
      var dot = 0.0
      var d = 0
      val dMax = math.min(sub, v.numElements() - vOff)
      while (d < dMax) {
        dot += v.getFloat(vOff + d).toDouble * codebooks(off + d).toDouble
        d += 1
      }
      total += dot
      mi += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("codebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, (v, codes) => {
      val total = ctx.freshName("total")
      val mi = ctx.freshName("mi")
      val d = ctx.freshName("d")
      val off = ctx.freshName("off")
      val vOff = ctx.freshName("vOff")
      val dot = ctx.freshName("dot")
      s"""
         |double $total = 0.0;
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  int $vOff = $mi * $sub;
         |  int $off = ($mi * $nCodes + $codes.getInt($mi)) * $sub;
         |  double $dot = 0.0;
         |  int ${d}Max = java.lang.Math.min($sub, $v.numElements() - $vOff);
         |  for (int $d = 0; $d < ${d}Max; $d++) {
         |    $dot += ((double) $v.getFloat($vOff + $d))
         |      * ((double) $cbRef[$off + $d]);
         |  }
         |  $total += $dot;
         |}
         |${ev.value} = $total;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcDotSum =
    copy(left = newLeft, right = newRight)
}

object PqAdcDotSum {
  def apply(qEmb: Column, codes: Column,
            codebooks: Seq[Seq[Array[Float]]]): Column = {
    val m = codebooks.length
    val nCodes = codebooks.head.length
    val sub = codebooks.head.head.length
    val flat = new Array[Float](m * nCodes * sub)
    var i = 0
    for (cb <- codebooks; cw <- cb; v <- cw) { flat(i) = v; i += 1 }
    Internals.column(PqAdcDotSum(Internals.expression(qEmb),
      Internals.expression(codes), flat, m, sub, nCodes))
  }
}

object PqEncodeCodes {
  /** Spark `round(x, 4)` twin: shortest-decimal BigDecimal, HALF_UP.
    * (`BigDecimal.valueOf`, NOT `new BigDecimal` — the exact-binary
    * expansion disagrees with SQL round at ...5 boundaries.) */
  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  /** First index minimizing `round4(dists(j))` — the (rounded dist, j)
    * argmin — with O(1) expected `round4` calls instead of one per
    * codeword: `round4` is monotone non-decreasing, so the rounded min
    * r0 = round4(raw min), and the winner is the FIRST j that rounds to
    * r0; any j with raw dist > r0 + 0.000051 provably rounds above r0
    * (round4(d) ≥ d − 0.00005 − ulp) and is skipped without rounding. */
  def argminRounded(dists: Array[Double]): Int = {
    var rawMin = Double.MaxValue
    var j = 0
    while (j < dists.length) {
      if (dists(j) < rawMin) rawMin = dists(j)
      j += 1
    }
    val r0 = round4(rawMin)
    val cut = r0 + 0.000051
    j = 0
    while (j < dists.length) {
      if (dists(j) <= cut && round4(dists(j)) == r0) return j
      j += 1
    }
    // unreachable (the raw-min index always qualifies); defensive
    0
  }

  def apply(emb: Column, codebooks: Seq[Seq[Array[Float]]]): Column = {
    val m = codebooks.length
    val nCodes = codebooks.head.length
    val sub = codebooks.head.head.length
    val flat = new Array[Float](m * nCodes * sub)
    var i = 0
    for (cb <- codebooks; cw <- cb; v <- cw) { flat(i) = v; i += 1 }
    Internals.column(
      PqEncodeCodes(Internals.expression(emb), flat, m, sub, nCodes))
  }
}
