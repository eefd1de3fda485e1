package graft.impute

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.jtransforms.fft.DoubleFFT_1D

/** Low-tubal-rank tensor completion — the FFT variant of the reference's
  * LATC family (`impute_latc_tubal`,
  * `/root/reference/src/pudl/analysis/timeseries_cleaning.py:648-764`,
  * after Chen, Chen & Sun 2020, arXiv:2008.03194).
  *
  * Per group, the long-form cells build a (rows × cols × periods) tensor;
  * each iteration runs a DFT along the period axis (JTransforms), truncates
  * every frequency's (rows × cols) complex slice to tubal rank `rank`,
  * inverse-transforms, and re-pins observed entries. The complex truncated
  * SVD uses the real 2n-embedding [[B,-C],[C,B]] whose singular values are
  * the complex ones duplicated — keeping 2·rank of them is exactly the
  * rank-`rank` complex truncation, and the blocks recover B and C.
  *
  * The reference's autoregressive penalty (`impute_latc_tnn`,
  * `timeseries_cleaning.py:555-647`: per-series AR coefficients refit by
  * least squares each iteration, missing entries updated with the blend
  * `(lowrank + λ·ar_pred)/(1+λ)`) is available behind `arLambda > 0` with
  * per-tube lagged regression along the period axis. It is DETERMINISTIC
  * here: the reference's `0.001·rng.random` coefficient init is fully
  * overwritten by the pinv refit on the first penalized iteration, so a
  * zero init reproduces the same fixpoint without the RNG. Default
  * `arLambda = 0` keeps the plain low-tubal-rank core. Both paths are
  * validated by reconstruction WMAPE in `ImputeSpec` rather than a SQL
  * oracle (SURVEY §7 hard-part #3).
  *
  * Scale design mirrors `MatrixCompletion`: one group per task via
  * `flatMapGroups`; group tensors are the reference's size (≤ 8760 × ~200),
  * the driver never materializes one.
  */
object TubalCompletion {

  case class Cell3(group: String, row: Int, col: Int, slice: Int,
                   value: Option[Double])
  case class ImputedCell3(group: String, row: Int, col: Int, slice: Int,
                          value: Double, was_missing: Boolean)

  /** Truncate a complex matrix (re, im) to rank k via the real embedding. */
  private def complexTruncate(re: DenseMatrix[Double], im: DenseMatrix[Double],
                              k: Int): (DenseMatrix[Double], DenseMatrix[Double]) = {
    val nR = re.rows; val nC = re.cols
    val e = DenseMatrix.zeros[Double](2 * nR, 2 * nC)
    e(0 until nR, 0 until nC) := re
    e(0 until nR, nC until 2 * nC) := -im
    e(nR until 2 * nR, 0 until nC) := im
    e(nR until 2 * nR, nC until 2 * nC) := re
    val s = svd(e)
    val kk = math.min(2 * k, s.S.length)
    val u = s.U(::, 0 until kk)
    val d = DenseMatrix.tabulate(kk, kk)((i, j) => if (i == j) s.S(i) else 0.0)
    val vt = s.Vt(0 until kk, ::)
    val t = u * d * vt
    val b = (t(0 until nR, 0 until nC) + t(nR until 2 * nR, nC until 2 * nC)) / 2.0
    val c = (t(nR until 2 * nR, 0 until nC) - t(0 until nR, nC until 2 * nC)) / 2.0
    (b, c)
  }

  def imputeByGroup(spark: SparkSession, cells: Dataset[Cell3], rank: Int,
                    iters: Int = 50, tol: Double = 1e-7,
                    arLambda: Double = 0.0,
                    arLags: Seq[Int] = Seq(1)): Dataset[ImputedCell3] = {
    import spark.implicits._
    val lags = arLags.toArray
    cells.groupByKey(_.group).flatMapGroups { (g, it) =>
      val rows = it.toArray
      val nR = rows.iterator.map(_.row).max + 1
      val nC = rows.iterator.map(_.col).max + 1
      val nS = rows.iterator.map(_.slice).max + 1
      // x(s) holds the frequency-s real slice; obs marks observed entries
      val x = Array.fill(nS)(DenseMatrix.zeros[Double](nR, nC))
      val obs = Array.fill(nS)(DenseMatrix.zeros[Double](nR, nC))
      var sum = 0.0; var n = 0
      rows.foreach { c =>
        c.value.foreach { v =>
          x(c.slice)(c.row, c.col) = v; obs(c.slice)(c.row, c.col) = 1.0
          sum += v; n += 1
        }
      }
      val mean = if (n > 0) sum / n else 0.0
      // init missing entries with their (row, col) tube's observed mean —
      // the tube's DC Fourier coefficient, which dominates smooth series —
      // falling back to the global mean for fully-missing tubes
      for (i <- 0 until nR; j <- 0 until nC) {
        var ts = 0.0; var tn = 0
        var s = 0
        while (s < nS) {
          if (obs(s)(i, j) > 0) { ts += x(s)(i, j); tn += 1 }; s += 1
        }
        val tubeMean = if (tn > 0) ts / tn else mean
        s = 0
        while (s < nS) { if (obs(s)(i, j) == 0) x(s)(i, j) = tubeMean; s += 1 }
      }
      val fft = new DoubleFFT_1D(nS)
      var iter = 0
      var delta = Double.MaxValue
      while (iter < iters && delta > tol) {
        // forward DFT along the period axis, per (row, col) tube
        val fre = Array.fill(nS)(DenseMatrix.zeros[Double](nR, nC))
        val fim = Array.fill(nS)(DenseMatrix.zeros[Double](nR, nC))
        val buf = new Array[Double](2 * nS)
        for (i <- 0 until nR; j <- 0 until nC) {
          var s = 0
          while (s < nS) { buf(2 * s) = x(s)(i, j); buf(2 * s + 1) = 0.0; s += 1 }
          fft.complexForward(buf)
          s = 0
          while (s < nS) { fre(s)(i, j) = buf(2 * s); fim(s)(i, j) = buf(2 * s + 1); s += 1 }
        }
        // tubal truncation: rank-k complex SVD per frequency slice
        for (s <- 0 until nS) {
          val (b, c) = complexTruncate(fre(s), fim(s), rank)
          fre(s) = b; fim(s) = c
        }
        // inverse DFT → low-rank reconstruction, then per-entry update:
        // observed entries re-pin; missing entries take the low-rank value,
        // optionally blended with the tube's AR prediction (the reference's
        // (lowrank + λ·ar)/(1+λ) update) when arLambda > 0
        val maxLag = if (lags.nonEmpty) lags.max else 0
        val useAr = arLambda > 0 && lags.nonEmpty && nS > maxLag + lags.length
        var num = 0.0; var den = 0.0
        for (i <- 0 until nR; j <- 0 until nC) {
          var s = 0
          while (s < nS) { buf(2 * s) = fre(s)(i, j); buf(2 * s + 1) = fim(s)(i, j); s += 1 }
          fft.complexInverse(buf, true)
          // deterministic per-tube AR refit (least squares on the tube's
          // CURRENT values; ridge 1e-9 keeps the solve well-posed)
          var arCoef: DenseVector[Double] = null
          if (useAr) {
            val dL = lags.length
            val gm = DenseMatrix.zeros[Double](dL, dL)
            val bv = DenseVector.zeros[Double](dL)
            var t = maxLag
            while (t < nS) {
              var p = 0
              while (p < dL) {
                val qp = x(t - lags(p))(i, j)
                var q = 0
                while (q < dL) { gm(p, q) += qp * x(t - lags(q))(i, j); q += 1 }
                bv(p) += qp * x(t)(i, j)
                p += 1
              }
              t += 1
            }
            var p = 0
            while (p < dL) { gm(p, p) += 1e-9; p += 1 }
            arCoef = gm \ bv
          }
          s = 0
          while (s < nS) {
            val lowrank = buf(2 * s)
            val v =
              if (obs(s)(i, j) > 0) x(s)(i, j)
              else if (arCoef != null && s >= maxLag) {
                var pr = 0.0
                var k = 0
                while (k < lags.length) { pr += arCoef(k) * x(s - lags(k))(i, j); k += 1 }
                (lowrank + arLambda * pr) / (1.0 + arLambda)
              } else lowrank
            val d0 = v - x(s)(i, j)
            num += d0 * d0; den += x(s)(i, j) * x(s)(i, j)
            x(s)(i, j) = v
            s += 1
          }
        }
        delta = math.sqrt(num) / (math.sqrt(den) + 1e-12)
        iter += 1
      }
      rows.iterator.map { c =>
        val missing = c.value.isEmpty
        ImputedCell3(g, c.row, c.col, c.slice,
          if (missing) x(c.slice)(c.row, c.col) else c.value.get, missing)
      }
    }
  }

  /** DataFrame adapter: (groupCol, rowCol, colCol, sliceCol, valueCol). */
  def imputeDf(df: DataFrame, groupCol: String, rowCol: String, colCol: String,
               sliceCol: String, valueCol: String, rank: Int,
               iters: Int = 50, arLambda: Double = 0.0,
               arLags: Seq[Int] = Seq(1)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df.select(
      col(groupCol).cast("string").as("group"),
      col(rowCol).cast("int").as("row"),
      col(colCol).cast("int").as("col"),
      col(sliceCol).cast("int").as("slice"),
      col(valueCol).cast("double").as("value")).as[Cell3]
    imputeByGroup(spark, cells, rank, iters, arLambda = arLambda,
      arLags = arLags).toDF()
  }
}
