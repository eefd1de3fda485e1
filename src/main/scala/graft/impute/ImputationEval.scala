package graft.impute

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Imputation evaluation harness — the reference's timeseries evaluation
  * loop (`/root/reference/src/pudl/analysis/timeseries_evaluation.py:512-556`
  * `simulate_nulls` → impute → score): null out KNOWN values in a
  * run-length pattern, impute them, and score the imputations against the
  * held-back truth.
  *
  * FINAL deviation (documented, same class as the IANA-tz grid): the
  * reference places simulated runs at RANDOM feasible offsets
  * (`insert_run_length`); this twin plants fixed-length runs on a periodic
  * grid with a per-series HASHED phase — same run-length structure, but
  * deterministic, partition-stable, and SQL-oracle-replayable.
  *
  * Scoring is exact integer arithmetic (the q152 fixed-point discipline):
  * truth and imputed values convert to half-cent longs (group medians of
  * cent-valued data land on the half-cent grid), absolute errors sum as
  * longs, and WMAPE ships both as the exact (numerator, denominator) pair
  * and as nanos of the single-division ratio.
  */
object ImputationEval {

  /** Plant deterministic null runs: with the series ordered by `order`
    * inside each `keyCol` group, 0-based position p is PLANTED iff
    * ((p + phase(key)) mod period) < runLen, phase = portable hash of
    * (seed, key) mod period. Adds `rn` (1-based position), `planted`,
    * and `v` (= value, nulled where planted). One window on the series
    * key — the same shuffle any per-series screen pays. */
  def simulateNullRuns(df: DataFrame, keyCol: String, order: Seq[Column],
                       valueCol: String, period: Int, runLen: Int,
                       seed: String): DataFrame = {
    require(period >= 2 && runLen >= 1 && runLen < period,
      "need 1 <= runLen < period")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(order: _*)
    val phase = pmod(graft.functions.PortableHash.hex60(
      concat(lit(s"${seed}_"), col(keyCol).cast("string"))), lit(period.toLong))
    df.withColumn("rn", row_number().over(w))
      .withColumn("planted",
        pmod(col("rn") - 1 + phase, lit(period.toLong)) < runLen)
      .withColumn("v",
        when(col("planted"), lit(null).cast("double"))
          .otherwise(col(valueCol)))
  }

  /** Score imputed values against held-back truth on the PLANTED rows
    * only: per key, n_planted, exact half-cent error/truth sums, and
    * wmape_nano = round(1e9·Σ|err| / Σ|truth|) — numerator and
    * denominator are exact longs, the ratio is one double division (both
    * engines fold the identical IEEE value). */
  def scoreImputation(df: DataFrame, keyCol: String, truthCol: String,
                      imputedCol: String): DataFrame =
    df.where(col("planted"))
      .groupBy(col(keyCol))
      .agg(
        count(lit(1)).as("n_planted"),
        sum(abs(round(col(imputedCol) * 200) - round(col(truthCol) * 200))
          .cast("long")).as("abs_err_hc"),
        sum(abs(round(col(truthCol) * 200)).cast("long")).as("truth_hc"))
      .withColumn("wmape_nano",
        round(lit(1e9) * col("abs_err_hc") / col("truth_hc")).cast("long"))
}
