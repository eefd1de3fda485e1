package graft.checks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Single-pass table profiler — the data-quality reconnaissance step every
  * large-scale pipeline runs before trusting a new source (the engine-side
  * sibling of the reference's pandera/dbt check layer,
  * `/root/reference/src/pudl/validate/dbt.py:145-189`, which validates
  * DECLARED expectations; the profiler DISCOVERS the distributions those
  * expectations are written against).
  *
  * Per column: row count, null count, distinct-count estimate (KMV sketch
  * — exact below the sketch size, bounded O(k) state above it), and
  * min/max (numeric columns in `min_num`/`max_num`, everything else
  * rendered to `min_str`/`max_str`).
  *
  * Scale shape: ONE scan + ONE aggregate for the whole profile — all
  * columns' statistics are aggregate expressions in the same
  * `agg(...)`, so the table is read once and the aggregation state is
  * (#cols × k) longs regardless of row count or key cardinality (never
  * a multi-`count(distinct)` Expand blowup). The per-column pivot to
  * output rows is a plan-time `explode(array(struct...))` over the
  * single aggregated row.
  *
  * @param family hash family for the KMV sketches —
  *               [[graft.functions.PortableHashFamily]] renders values
  *               via string cast (engine-replayable; avoid for doubles,
  *               whose string forms differ across engines),
  *               [[graft.functions.XxHashFamily]] for production. */
object Profile {

  def profileTable(df: DataFrame, cols: Seq[String], k: Int = 256,
                   family: graft.functions.HashFamily =
                     graft.functions.XxHashFamily): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val schema = df.schema
    def isNum(c: String): Boolean = schema(c).dataType match {
      case _: NumericType => true
      case _              => false
    }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        graft.functions.KmvSketch(col(c), k, family).as(s"__nd_$c"),
        (if (isNum(c)) min(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mnn_$c"),
        (if (isNum(c)) max(col(c)).cast("double") else lit(null).cast("double"))
          .as(s"__mxn_$c"),
        (if (isNum(c)) lit(null).cast("string") else min(col(c)).cast("string"))
          .as(s"__mns_$c"),
        (if (isNum(c)) lit(null).cast("string") else max(col(c)).cast("string"))
          .as(s"__mxs_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct_est"),
        col(s"__mnn_$c").as("min_num"), col(s"__mxn_$c").as("max_num"),
        col(s"__mns_$c").as("min_str"), col(s"__mxs_$c").as("max_str"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
