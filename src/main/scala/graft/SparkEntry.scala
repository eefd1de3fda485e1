package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.AggFunctions._
import graft.operators.{Dedup, Reshape, WindowOps}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry pairs a Spark-first implementation (built from the graft
  * operator library) with ANSI SQL the driver runs in DuckDB over the same
  * parquet. Aggregated doubles are rounded identically on both sides so the
  * driver's value-hash comparison is immune to float summation order.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---- §2.5 hash aggregation: TPC-H Q1-style pricing summary -------------
  // Reference pattern: time re-aggregation factory sum/avg rollups
  // (/root/reference/src/pudl/output/eia923.py:358-430).
  private def q01(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  // ---- §2.3 denormalization joins: revenue by region × year --------------
  // Reference pattern: entity denorm joins (/root/reference/src/pudl/output/eia.py:117-332).
  // Dims are broadcast — at 100 TB the fact table never shuffles for these.
  private def q02(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("o_year"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))

  // ---- §2.2 filter + projection (pushdown must reach the scan) -----------
  // Reference: organize_cols + drop_invalid_rows
  // (/root/reference/src/pudl/helpers.py:807-828, transform/classes.py:835-903).
  private def q03(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_quantity").isNotNull && col("l_quantity").between(0, 100))
      .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity",
        "l_returnflag")

  // ---- §2.4 freshest-record dedup: latest order per customer -------------
  // Reference: filter_for_freshest_data_xbrl / dedupe_on_category
  // (/root/reference/src/pudl/transform/ferc.py:91-146, helpers.py:1594-1617).
  private def q04(s: SparkSession, dir: String): DataFrame =
    Dedup.keepFirst(t(s, dir, "orders"), Seq("o_custkey"),
      Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")

  // ---- §2.5 weighted average -------------------------------------------
  // Reference: weighted_average (/root/reference/src/pudl/helpers.py:1771-1795).
  private def q05(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"))
      .agg(
        round(weightedAvg(col("l_discount"), col("l_quantity")), 6).as("wavg_discount"),
        round(sum(col("l_quantity")), 2).as("sum_qty"))

  // ---- §2.6 centered rolling average over a monthly series ---------------
  // Reference: generate_rolling_avg (/root/reference/src/pudl/helpers.py:1375-1425).
  private def q06(s: SparkSession, dir: String): DataFrame = {
    val monthly = t(s, dir, "orders")
      .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), date_trunc("month", col("o_orderdate")).as("o_month"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    WindowOps.rollingAvg(monthly, Seq("c_mktsegment"), col("o_month"),
      col("revenue"), before = 5, after = 6, out = "rolling_revenue")
      .withColumn("rolling_revenue", round(col("rolling_revenue"), 4))
  }

  // ---- §2.7 melt / wide_to_tidy -----------------------------------------
  // Reference: wide_to_tidy (/root/reference/src/pudl/transform/ferc1.py:279-395).
  private def q07(s: SparkSession, dir: String): DataFrame =
    Reshape.melt(t(s, dir, "lineitem"),
      idCols = Seq("l_orderkey", "l_linenumber"),
      valueCols = Seq(
        "quantity" -> "l_quantity",
        "extendedprice" -> "l_extendedprice",
        "discount" -> "l_discount"),
      varName = "measure", valueName = "value")

  // ---- §2.6/§2.14 hourly time-window aggregation over events -------------
  // Batch form of the streaming hourly rollup (SURVEY §2.14).
  private def q08(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"),
        round(avg(col("value")), 6).as("avg_value"))

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    q02(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (q01 _),
    "q02_region_revenue" -> (q02 _),
    "q03_filter_project" -> (q03 _),
    "q04_freshest_order" -> (q04 _),
    "q05_weighted_avg" -> (q05 _),
    "q06_rolling_avg" -> (q06 _),
    "q07_melt" -> (q07 _),
    "q08_hourly_events" -> (q08 _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_region_revenue" ->
      """SELECT r_name, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, CAST(year(o_orderdate) AS INTEGER)""".stripMargin,
    "q03_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity, l_returnflag
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_quantity IS NOT NULL AND l_quantity BETWEEN 0 AND 100""".stripMargin,
    "q04_freshest_order" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
        |  SELECT *, row_number() OVER (
        |    PARTITION BY o_custkey
        |    ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "q05_weighted_avg" ->
      """SELECT s_nationkey,
        |  round(sum(l_discount * l_quantity) / sum(l_quantity), 6) AS wavg_discount,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_nationkey""".stripMargin,
    "q06_rolling_avg" ->
      """WITH monthly AS (
        |  SELECT c_mktsegment,
        |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS o_month,
        |    round(sum(o_totalprice), 2) AS revenue
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, o_month, revenue,
        |  round(avg(revenue) OVER (
        |    PARTITION BY c_mktsegment ORDER BY o_month
        |    ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING), 4) AS rolling_revenue
        |FROM monthly""".stripMargin,
    "q07_melt" ->
      """SELECT l_orderkey, l_linenumber, 'quantity' AS measure,
        |  CAST(l_quantity AS DOUBLE) AS value FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'extendedprice',
        |  CAST(l_extendedprice AS DOUBLE) FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, 'discount',
        |  CAST(l_discount AS DOUBLE) FROM lineitem""".stripMargin,
    "q08_hourly_events" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 4) AS sum_value,
        |  round(avg(value), 6) AS avg_value
        |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
  )
}
