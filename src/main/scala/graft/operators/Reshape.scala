package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / melt / stack kit (SURVEY §2.7 — PUDL's bread and butter).
  *
  * Melt is built at *plan time* from the column list (no data pass), and the
  * output is produced by a single `stack` projection — per-partition,
  * shuffle-free, safe at any scale. Pivot uses Spark's two-phase pivot with
  * explicit value lists (never the value-discovery scan) where callers know
  * the domain.
  */
object Reshape {

  /** Wide→long: each (label, column) pair becomes a row.
    * Reference: `wide_to_tidy` (`/root/reference/src/pudl/transform/ferc1.py:279-395`),
    * `_yearly_to_monthly_records` (`transform/eia923.py:397-461`).
    */
  def melt(df: DataFrame, idCols: Seq[String], valueCols: Seq[(String, String)],
           varName: String = "variable", valueName: String = "value"): DataFrame = {
    val stackArgs = valueCols
      .map { case (label, c) => s"'$label', CAST(`$c` AS DOUBLE)" }
      .mkString(", ")
    val stackExpr =
      s"stack(${valueCols.size}, $stackArgs) as (`$varName`, `$valueName`)"
    df.selectExpr(idCols.map(c => s"`$c`") :+ stackExpr: _*)
  }

  /** Regex-driven melt: columns matching `pattern` (with one capture group
    * per produced key column) melt into rows; the capture groups become
    * columns. Reference: `multi_index_stack`
    * (`/root/reference/src/pudl/helpers.py:88-164`). Plan-time only.
    */
  def meltRegex(df: DataFrame, idCols: Seq[String], pattern: String,
                keyNames: Seq[String], valueName: String = "value"): DataFrame = {
    val rx = pattern.r
    val matches = df.columns.flatMap { c =>
      rx.unapplySeq(c).map(groups => (c, groups))
    }
    require(matches.nonEmpty, s"no columns match $pattern")
    val pieces = matches.map { case (c, groups) =>
      val keyLits = keyNames.zip(groups).map { case (k, g) => s"'$g' AS `$k`" }
      (keyLits :+ s"CAST(`$c` AS DOUBLE) AS `$valueName`").mkString(", ")
    }
    // single stack projection: one row set per matched column
    val args = matches.map { case (c, groups) =>
      (groups.map(g => s"'$g'") :+ s"CAST(`$c` AS DOUBLE)").mkString(", ")
    }.mkString(", ")
    val outCols = (keyNames.map(k => s"`$k`") :+ s"`$valueName`").mkString(", ")
    df.selectExpr(idCols.map(c => s"`$c`") :+
      s"stack(${matches.length}, $args) as ($outCols)": _*)
  }

  /** Long→wide with an explicit value domain (skips Spark's pivot-value
    * discovery job). Reference: `unstack_balances_to_report_year_instant_xbrl`
    * (`/root/reference/src/pudl/transform/ferc1.py:632-710`), `_pivot_info_block`
    * (`transform/sec10k.py:100-123`).
    */
  def pivot(df: DataFrame, idCols: Seq[String], pivotCol: String,
            values: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(idCols.map(col): _*).pivot(pivotCol, values).agg(valueCol)
}
