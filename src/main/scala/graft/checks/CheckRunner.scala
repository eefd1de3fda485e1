package graft.checks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Resource

/** Declarative data-quality check runner (SURVEY §5.3-5.4) — the engine's
  * analogue of the reference's dbt/DuckDB validation layer (920 data_tests
  * under `/root/reference/dbt/models`) and runtime asset checks
  * (`src/pudl/dagster/asset_checks.py:264-351`).
  *
  * Each check compiles to ONE aggregation over the table; `runAll` unions
  * the per-check single-row results — the whole suite is a handful of scans
  * that Catalyst can pipeline, not row-by-row assertions.
  */
object CheckRunner {

  sealed trait Check { def name: String }
  /** PK uniqueness (`pudl_check_fks` / enforce_schema PK check). */
  case class UniqueKey(name: String, keys: Seq[String]) extends Check
  /** No nulls in required column. */
  case class NotNull(name: String, column: String) extends Check
  /** All values within [lo, hi] (nulls pass). */
  case class InRange(name: String, column: String, lo: Double, hi: Double) extends Check
  /** All values in the enum (nulls pass). */
  case class InEnum(name: String, column: String, values: Seq[String]) extends Check
  /** Exact row count golden (dbt `etl_full_row_counts` pattern). */
  case class RowCount(name: String, expected: Long) extends Check
  /** Σa / Σb within [lo, hi] (`expect_columns_ratio` macro). */
  case class ColumnsRatio(name: String, num: String, den: String,
                          lo: Double, hi: Double) extends Check
  /** Per group, |Σ(child parts) - total| <= tol·|total| — the
    * `expect_subcomponents_sum_to_total` macro
    * (`/root/reference/dbt/macros/`): `totalCol` is reported once per
    * group (as max), `partCol` sums over the group's part rows. */
  case class SubcomponentsSum(name: String, groupKeys: Seq[String],
                              partCol: String, totalCol: String,
                              tol: Double) extends Check
  /** Weighted quantile qNum/qDen of `valueCol` (weights `weightCol`)
    * within [lo, hi] — the `weighted_quantile` distribution-bounds macro. */
  case class WeightedQuantileBound(name: String, valueCol: String,
                                   weightCol: String, qNum: Long, qDen: Long,
                                   lo: Double, hi: Double) extends Check
  /** Group totals change within [1-ratio, 1+ratio] between consecutive
    * periods — `expect_column_change_within_ratio` (year-over-year
    * continuity; `asset_checks.py:221-263` group-mean continuity twin). */
  case class ChangeWithinRatio(name: String, periodCol: String,
                               valueCol: String, ratio: Double) extends Check
  /** Row-level `a + b <= threshold · multiplier` with a failure budget —
    * `expect_summed_columns_not_exceed_threshold`
    * (`/root/reference/dbt/macros/expect_summed_columns_not_exceed_threshold.sql`):
    * rows where all three sides are non-null and the sum exceeds count as
    * failures; the check passes while failures <= errorThreshold. */
  case class SummedNotExceed(name: String, colA: String, colB: String,
                             thresholdCol: String, multiplier: Double = 1.0,
                             errorThreshold: Long = 0) extends Check
  /** Functional dependency key → value — `one_value_per_key`
    * (`/root/reference/dbt/macros/one_value_per_key.sql`): fails if any
    * non-null key maps to more than one distinct value. */
  case class OneValuePerKey(name: String, keyCol: String,
                            valueCol: String) extends Check
  /** Referential integrity (`pudl_check_fks`,
    * `/root/reference/src/pudl/validate/integrity.py:109-160`): child rows
    * whose key tuple is absent from the parent. SQL FK semantics — a tuple
    * containing a NULL passes. Cross-table, so the check carries its parent
    * frame; the anti-join broadcasts when the parent key set is small, and
    * at scale the distinct parent keys shuffle once per suite run. */
  case class ForeignKey(name: String, childCols: Seq[String],
                        parent: DataFrame,
                        parentCols: Seq[String]) extends Check

  /** One row per check: (check_name, passed, observed). Fully lazy — each
    * check is a one-row aggregation, the union is a single plan evaluated
    * when the caller acts on it. */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame =
    checks.map {
      case UniqueKey(n, keys) =>
        df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
          .agg(count(when(col("__n") > 1, 1)).as("observed"))
          .select(lit(n).as("check_name"), (col("observed") === 0).as("passed"),
            col("observed"))
      case NotNull(n, c) =>
        badCount(df, n, col(c).isNull)
      case InRange(n, c, lo, hi) =>
        badCount(df, n, col(c).isNotNull && !col(c).between(lo, hi))
      case InEnum(n, c, vs) =>
        badCount(df, n, col(c).isNotNull && !col(c).isin(vs: _*))
      case RowCount(n, expected) =>
        df.agg(count(lit(1)).as("observed"))
          .select(lit(n).as("check_name"),
            (col("observed") === expected).as("passed"), col("observed"))
      case ColumnsRatio(n, num, den, lo, hi) =>
        df.agg((sum(col(num)) / sum(col(den))).as("__r"))
          .select(lit(n).as("check_name"),
            col("__r").between(lo, hi).as("passed"),
            round(col("__r") * 1e6).cast("long").as("observed"))
      case SubcomponentsSum(n, keys, part, total, tol) =>
        df.groupBy(keys.map(col): _*)
          .agg(sum(col(part)).as("__parts"), max(col(total)).as("__total"))
          .agg(count(when(
            abs(col("__parts") - col("__total")) > lit(tol) * abs(col("__total")),
            1)).as("observed"))
          .select(lit(n).as("check_name"), (col("observed") === 0).as("passed"),
            col("observed"))
      case WeightedQuantileBound(n, v, w, qNum, qDen, lo, hi) =>
        df.groupBy(col(v)).agg(sum(col(w)).as("__w"))
          .agg(graft.functions.WeightedQuantile(col(v), col("__w"), qNum, qDen)
            .as("__q"))
          .select(lit(n).as("check_name"),
            col("__q").between(lo, hi).as("passed"),
            round(col("__q") * 1e6).cast("long").as("observed"))
      case ForeignKey(n, cc, parent, pc) =>
        val child = df.select(cc.map(col): _*)
          .where(cc.map(col(_).isNotNull).reduce(_ && _))
        val par = parent
          .select(pc.zip(cc).map { case (p, c) => col(p).as(c) }: _*)
          .distinct()
        child.join(par, cc, "left_anti")
          .agg(count(lit(1)).as("observed"))
          .select(lit(n).as("check_name"), (col("observed") === 0).as("passed"),
            col("observed"))
      case SummedNotExceed(n, a, b, t, mult, errT) =>
        df.agg(count(when(
            col(a).isNotNull && col(b).isNotNull && col(t).isNotNull &&
              (col(a) + col(b)) > col(t) * mult, 1)).as("observed"))
          .select(lit(n).as("check_name"),
            (col("observed") <= errT).as("passed"), col("observed"))
      case OneValuePerKey(n, k, v) =>
        df.where(col(k).isNotNull)
          .groupBy(col(k)).agg(count_distinct(col(v)).as("__n"))
          .agg(count(when(col("__n") > 1, 1)).as("observed"))
          .select(lit(n).as("check_name"),
            (col("observed") === 0).as("passed"), col("observed"))
      case ChangeWithinRatio(n, period, v, ratio) =>
        import org.apache.spark.sql.expressions.Window
        df.groupBy(col(period)).agg(sum(col(v)).as("__t"))
          .withColumn("__prev",
            lag(col("__t"), 1).over(Window.orderBy(col(period))))
          .agg(count(when(col("__prev").isNotNull &&
            !(col("__t") / col("__prev")).between(1 - ratio, 1 + ratio), 1))
            .as("observed"))
          .select(lit(n).as("check_name"), (col("observed") === 0).as("passed"),
            col("observed"))
    }.reduce(_ unionByName _)

  private def badCount(df: DataFrame, name: String, bad: Column): DataFrame =
    df.agg(count(when(bad, 1)).as("observed"))
      .select(lit(name).as("check_name"), (col("observed") === 0).as("passed"),
        col("observed"))

  /** Derive the standard check set from a declared Resource (PK unique +
    * required/enum/range per field) — schema metadata drives validation,
    * as in the reference's pandera-from-Resource factory. */
  def fromResource(r: Resource): Seq[Check] = {
    val pk = if (r.primaryKey.nonEmpty)
      Seq(UniqueKey(s"${r.name}:pk_unique", r.primaryKey)) else Nil
    val fieldChecks = r.fields.flatMap { f =>
      val req = if (f.required) Seq(NotNull(s"${r.name}:${f.name}:not_null", f.name)) else Nil
      val en = f.enum.map(v => InEnum(s"${r.name}:${f.name}:enum", f.name, v)).toSeq
      // one-sided bounds enforce with the missing side unbounded
      val rng = (f.min, f.max) match {
        case (None, None) => Nil
        case (lo, hi) =>
          Seq(InRange(s"${r.name}:${f.name}:range", f.name,
            lo.getOrElse(Double.NegativeInfinity),
            hi.getOrElse(Double.PositiveInfinity)))
      }
      req ++ en ++ rng
    }
    pk ++ fieldChecks
  }

}
