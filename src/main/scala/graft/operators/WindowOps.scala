package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions._

/** Window / analytic kit (SURVEY §2.6, §2.12 flagging screens).
  *
  * Every operator is a window expression over `partitionBy(keys).orderBy(...)`
  * — one shuffle on the entity key, then per-partition sorted evaluation.
  * At 100 TB the partition count is the number of entities, which is what you
  * want: no global sort, no driver state. Callers must pass a *total* order
  * (include a unique tiebreak column) — pandas relied on implicit row order
  * (SURVEY §7 hard-part #1).
  */
object WindowOps {

  def keyed(keys: Seq[String], order: Seq[Column]): WindowSpec =
    Window.partitionBy(keys.map(col): _*).orderBy(order: _*)

  /** Centered rolling mean, window = `before` preceding .. `after` following
    * rows. Reference: `generate_rolling_avg` window=12 centered
    * (`/root/reference/src/pudl/helpers.py:1375-1425`); pandas center=true with
    * even window spans [i-6, i+5].
    */
  def rollingAvg(df: DataFrame, keys: Seq[String], order: Seq[Column], value: Column,
                 before: Int = 6, after: Int = 5, out: String = "rolling_avg"): DataFrame =
    df.withColumn(out,
      avg(value).over(keyed(keys, order).rowsBetween(-before, after)))

  /** Fill nulls from the rolling average of the non-null neighbors —
    * `fillna_w_rolling_avg` (`/root/reference/src/pudl/helpers.py:1426-1460`). */
  def fillnaRollingAvg(df: DataFrame, keys: Seq[String], order: Seq[Column],
                       valueCol: String, before: Int = 6, after: Int = 5): DataFrame =
    df.withColumn(valueCol,
      coalesce(col(valueCol),
        avg(col(valueCol)).over(keyed(keys, order).rowsBetween(-before, after))))

  /** Exact sliding median over a row frame. Implemented as a declarative
    * sorted-array expression (stays in codegen) rather than an imperative
    * aggregator. Reference: `rolling_median`
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:829-906`).
    * Interpolating (percentile_cont 0.5) semantics on even counts:
    * (arr[(n+1)/2] + arr[n/2+1]) / 2 with 1-based integer indices.
    */
  def rollingMedian(df: DataFrame, keys: Seq[String], order: Seq[Column], value: Column,
                    before: Int, after: Int, out: String = "rolling_median"): DataFrame = {
    // collect_list skips nulls natively; array_compact (native) documents
    // the no-null invariant without an interpreted per-element filter()
    val arr = array_sort(
      array_compact(collect_list(value)
        .over(keyed(keys, order).rowsBetween(-before, after))))
    val n = size(arr)
    val lo = element_at(arr, ((n + 1) / 2).cast("int"))
    val hi = element_at(arr, (n / 2).cast("int") + 1)
    df.withColumn(out, when(n > 0, (lo + hi) / 2.0))
  }

  /** Monotone run-ids for runs of equal `flag` values per key: cumulative
    * sum of null-safe change-points. Consecutive equal values (including
    * consecutive nulls) share a run. Reference: `encode_run_length`
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:340-517`),
    * `calculate_min_up_or_down_times` (`analysis/operational_characteristics.py:533-570`).
    */
  def runIds(df: DataFrame, keys: Seq[String], order: Seq[Column], flag: Column,
             out: String = "run_id"): DataFrame = {
    val w = keyed(keys, order)
    val changed = when(!(lag(flag, 1).over(w) <=> flag), 1).otherwise(0)
    df.withColumn(out,
      sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-run summary: one row per (key, run) with the run's flag value,
    * length and bounds. Two shuffles on the entity key total.
    * Reference: `encode_run_length`
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:340-517`). */
  def runLengths(df: DataFrame, keys: Seq[String], order: Seq[Column], flag: Column,
                 orderName: String): DataFrame = {
    val withRun = runIds(df.withColumn("__flag", flag), keys, order,
      col("__flag"), "run_id")
    withRun.groupBy((keys :+ "run_id").map(col): _*)
      .agg(
        min(col("__flag")).as("flag"), // all values in a run are equal
        count(lit(1)).as("run_length"),
        min(col(orderName)).as("run_start"),
        max(col(orderName)).as("run_end"))
  }

  /** Max ramp up / down per key from consecutive diffs — `summarize_ramp_rates`
    * (`/root/reference/src/pudl/analysis/operational_characteristics.py:269-325`). */
  def rampRates(df: DataFrame, keys: Seq[String], order: Seq[Column],
                value: Column): DataFrame = {
    val w = keyed(keys, order)
    df.withColumn("__diff", value - lag(value, 1).over(w))
      .groupBy(keys.map(col): _*)
      .agg(
        max(col("__diff")).as("max_ramp_up"),
        min(col("__diff")).as("max_ramp_down"))
  }

  /** Flag runs of >= `minLen` identical values — `flag_identical_run`
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:777-795`). */
  def flagIdenticalRun(df: DataFrame, keys: Seq[String], order: Seq[Column],
                       value: Column, minLen: Int, out: String = "flag_run"): DataFrame = {
    val withRun = runIds(df.withColumn("__v", value), keys, order, col("__v"), "__run")
    val wRun = Window.partitionBy((keys :+ "__run").map(col): _*)
    withRun
      .withColumn(out, (count(lit(1)).over(wRun) >= minLen) && col("__v").isNotNull)
      .drop("__run", "__v")
  }

  /** One-flag-per-cell screen accumulation: screens are evaluated in
    * priority order and the first matching screen names the cell's flag
    * ("ok" if none match). Reference: the `flag()` accumulation that
    * orchestrates the screen suite
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:247-272`). */
  def flagPipeline(df: DataFrame, screens: Seq[(String, Column)],
                   out: String = "flag"): DataFrame =
    df.withColumn(out, screens.foldRight(lit("ok"): Column) {
      case ((name, cond), acc) => when(cond, lit(name)).otherwise(acc)
    })

  /** Gap-based sessionization: a new session starts when the event-time gap
    * from the previous row exceeds `gapSeconds`. Session ids are the
    * cumulative count of session starts per key — the batch twin of
    * streaming session windows (§2.14), built from the same cumulative-sum
    * trick as runIds. Timestamps compare at microsecond precision (exact
    * integers — no truncation ambiguity at the threshold). */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: String,
                 tiebreak: Column, gapSeconds: Long): DataFrame = {
    val order = Seq(col(tsCol), tiebreak)
    val w = keyed(keys, order)
    val prev = lag(unix_micros(col(tsCol)), 1).over(w)
    val isStart = when(
      prev.isNull || unix_micros(col(tsCol)) - prev > gapSeconds * 1000000L, 1
    ).otherwise(0)
    df.withColumn("session_id",
      sum(isStart).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Lag-based double-delta spike flag: |Δprev| and |Δnext| both exceed
    * `threshold` with opposite signs. Reference: `flag_double_delta`
    * (`/root/reference/src/pudl/analysis/timeseries_cleaning.py:1040-1120`). */
  def flagDoubleDelta(df: DataFrame, keys: Seq[String], order: Seq[Column],
                      value: Column, threshold: Column, out: String = "flag_spike"): DataFrame = {
    val w = keyed(keys, order)
    val dPrev = value - lag(value, 1).over(w)
    val dNext = lead(value, 1).over(w) - value
    df.withColumn(out,
      dPrev.isNotNull && dNext.isNotNull &&
        abs(dPrev) > threshold && abs(dNext) > threshold &&
        (dPrev * dNext < 0))
  }

  /** Ordered-step funnel: per key, the earliest chain of `steps` event
    * types where each step happens STRICTLY after the previous one and
    * every step lands within `within` of step 1 — the product-analytics
    * conversion primitive (signup → activate → purchase), greedy-earliest
    * semantics so the result is a pure function of the data (step i's
    * timestamp is the minimum eligible instant given steps 1..i−1).
    * Tied timestamps intentionally do NOT chain (strict `>`), keeping
    * every step value a well-defined min.
    *
    * Scale shape: ONE hash exchange on the key. Each step is a per-key
    * window minimum whose condition references the previous step's
    * column, so Catalyst stacks the k Window operators over the SAME
    * partitioning (no re-shuffle — the q117 shared-clustering shape),
    * and the final per-key collapse reuses that partitioning too
    * (plan-asserted: exactly one exchange).
    *
    * Output: one row per key — step{i}_ts for each step +
    * `steps_completed`. */
  def funnel(df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
             steps: Seq[String], within: String): DataFrame = {
    require(steps.nonEmpty, "need at least one funnel step")
    val w = Window.partitionBy(col(keyCol))
    val names = steps.indices.map(i => s"step${i + 1}_ts")
    var cur = df.select(col(keyCol), col(tsCol), col(typeCol))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col(typeCol) === s
        else col(typeCol) === s &&
          col(tsCol) > col(names(i - 1)) &&
          col(tsCol) <= col(names.head) + expr(s"INTERVAL $within")
      cur = cur.withColumn(names(i), min(when(cond, col(tsCol))).over(w))
    }
    val agg = names.map(n => min(col(n)).as(n))
    cur.groupBy(col(keyCol))
      .agg(agg.head, agg.tail: _*)
      .withColumn("steps_completed",
        names.map(n => when(col(n).isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("long"))
  }
}
