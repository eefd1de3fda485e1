package graft.impute

import breeze.linalg.{svd, DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Low-rank matrix completion for timeseries imputation (SURVEY §2.12) —
  * the Spark-distributed form of the reference's LATC tensor completion
  * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:555-647`):
  * iterative truncated-SVD reconstruction (`_svt_tnn`, `:518-554`) applied
  * per group.
  *
  * Scale design: each group's pivoted matrix is small (the reference's are
  * ≤ 8760 × ~200); `flatMapGroups` runs one group per task — thousands of
  * groups complete in parallel across executors, and the driver never sees
  * a matrix. Numerical parity with numpy is tolerance-based, not exact
  * (SURVEY §7 hard-part #3), so validation lives in the test suite
  * (reconstruction MAPE), not the SQL oracle.
  */
object MatrixCompletion {

  case class Cell(group: String, row: Int, col: Int, value: Option[Double])
  case class ImputedCell(group: String, row: Int, col: Int, value: Double,
                         was_missing: Boolean)

  /** Complete missing cells per group via `iters` rounds of rank-`rank`
    * truncated-SVD projection with observed entries re-pinned each round. */
  def imputeByGroup(spark: SparkSession, cells: Dataset[Cell], rank: Int,
                    iters: Int = 500): Dataset[ImputedCell] = {
    import spark.implicits._
    cells.groupByKey(_.group).flatMapGroups { (g, it) =>
      val rows = it.toArray
      val nR = rows.iterator.map(_.row).max + 1
      val nC = rows.iterator.map(_.col).max + 1
      val m = DenseMatrix.zeros[Double](nR, nC)
      val obs = DenseMatrix.zeros[Double](nR, nC) // 1.0 where observed
      rows.foreach { c =>
        c.value.foreach { v => m(c.row, c.col) = v; obs(c.row, c.col) = 1.0 }
      }
      // init missing with column means (0 if column fully missing)
      val colMean = DenseVector.tabulate(nC) { j =>
        var s = 0.0; var n = 0
        (0 until nR).foreach { i => if (obs(i, j) > 0) { s += m(i, j); n += 1 } }
        if (n > 0) s / n else 0.0
      }
      (0 until nR).foreach { i =>
        (0 until nC).foreach { j => if (obs(i, j) == 0) m(i, j) = colMean(j) }
      }
      var x = m.copy
      val k = math.min(rank, math.min(nR, nC))
      var iter = 0
      var delta = Double.MaxValue
      // alternating projection converges linearly; stop on relative change
      while (iter < iters && delta > 1e-7) {
        val s = svd(x)
        val u = s.U(::, 0 until k)
        val d = DenseMatrix.tabulate(k, k)((i, j) =>
          if (i == j) s.S(i) else 0.0)
        val vt = s.Vt(0 until k, ::)
        val next = u * d * vt
        // re-pin observed entries
        (0 until nR).foreach { i =>
          (0 until nC).foreach { j => if (obs(i, j) > 0) next(i, j) = m(i, j) }
        }
        val diff = next - x
        delta = breeze.linalg.norm(diff.toDenseVector) /
          (breeze.linalg.norm(x.toDenseVector) + 1e-12)
        x = next
        iter += 1
      }
      rows.iterator.map { c =>
        val missing = c.value.isEmpty
        ImputedCell(g, c.row, c.col,
          if (missing) x(c.row, c.col) else c.value.get, missing)
      }
    }
  }

  /** DataFrame adapter: (groupCol: string, rowCol: int, colCol: int,
    * valueCol: double nullable) → imputed long-form cells. */
  def imputeDf(df: DataFrame, groupCol: String, rowCol: String, colCol: String,
               valueCol: String, rank: Int, iters: Int = 500): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cells = df.select(
      col(groupCol).cast("string").as("group"),
      col(rowCol).cast("int").as("row"),
      col(colCol).cast("int").as("col"),
      col(valueCol).cast("double").as("value")).as[Cell]
    imputeByGroup(spark, cells, rank, iters).toDF()
  }
}
