package graft

/** SURVEY §3.3: the engine's query surface is spark.read.parquet +
  * spark.sql over registered views — the analogue of the reference's
  * get_parquet_table / duckdb layer. */
class SqlFrontDoorSpec extends SparkSpec {

  test("registerAll exposes every fixture as a SQL view") {
    Tables.registerAll(spark, sf)
    val r = spark.sql(
      """SELECT r_name, count(*) AS n_nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin).collect()
    assert(r.length == 5 && r.map(_.getLong(1)).sum == 25)
    val docs = spark.sql("SELECT count(*) FROM documents").head().getLong(0)
    assert(docs > 0)
  }

  /** Canonical row set: columns sorted by name, rows sorted by their
    * string form — the driver comparator's shape. */
  private def canon(df: org.apache.spark.sql.DataFrame): Seq[Seq[String]] = {
    val cols = df.columns.sorted.toSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(String.valueOf)).toSeq.sortBy(_.mkString(""))
  }

  // Breadth check: graded queries re-expressed PURELY as spark.sql text
  // over the registered views — a dedup, a window screen, and a temporal
  // join — must equal their DataFrame forms value-for-value. Proves the
  // operator surface is reachable from the SQL front door, not only the
  // Column API.
  test("SQL text twin: q39 exact dedup == DataFrame form") {
    Tables.registerAll(spark, sf)
    val sqlForm = spark.sql(
      """WITH fp AS (
        |  SELECT doc_id,
        |    md5(trim(regexp_replace(lower(text), '\\s+', ' '))) AS fingerprint
        |  FROM documents)
        |SELECT doc_id, fingerprint,
        |  min(doc_id) OVER (PARTITION BY fingerprint) AS canonical_id,
        |  count(*) OVER (PARTITION BY fingerprint) AS group_size,
        |  (doc_id <> min(doc_id) OVER (PARTITION BY fingerprint)) AS is_dup
        |FROM fp""".stripMargin)
    val dfForm = graft.dedup.NearDup.exactDupGroups(
      Tables.load(spark, sf, "documents"), "doc_id", "text")
    assert(canon(sqlForm) == canon(dfForm) && canon(dfForm).nonEmpty)
  }

  test("SQL text twin: q19 rolling-median window screen == DataFrame form") {
    Tables.registerAll(spark, sf)
    val sqlForm = spark.sql(
      """WITH fr AS (
        |  SELECT user_id, event_id, ts, value,
        |    array_sort(collect_list(value) OVER (
        |      PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
        |  FROM events)
        |SELECT user_id, event_id, ts, value,
        |  CASE WHEN size(arr) > 0 THEN
        |    (element_at(arr, CAST((size(arr) + 1) / 2 AS INT)) +
        |     element_at(arr, CAST(size(arr) / 2 AS INT) + 1)) / 2.0
        |  END AS rolling_median
        |FROM fr""".stripMargin)
    val dfForm = graft.operators.WindowOps.rollingMedian(
        Tables.load(spark, sf, "events"),
        keys = Seq("user_id"),
        order = Seq(org.apache.spark.sql.functions.col("ts"),
          org.apache.spark.sql.functions.col("event_id")),
        value = org.apache.spark.sql.functions.col("value"),
        before = 3, after = 3)
      .select("user_id", "event_id", "ts", "value", "rolling_median")
    assert(canon(sqlForm) == canon(dfForm) && canon(dfForm).nonEmpty)
  }

  test("SQL text twin: q105 as-of join == DataFrame form") {
    import org.apache.spark.sql.functions._
    Tables.registerAll(spark, sf)
    // the asofJoin union+window shape written as SQL text: right rows
    // sort before left at equal ts (equal timestamps match), the last
    // non-null payload carries forward
    val sqlForm = spark.sql(
      """WITH r AS (
        |  SELECT o_custkey AS user_id, CAST(o_orderdate AS TIMESTAMP) AS ots,
        |    max(o_orderkey) AS last_order_id,
        |    sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS day_total
        |  FROM orders GROUP BY 1, 2),
        |u AS (
        |  SELECT user_id, ts AS sts, 1 AS is_left, event_id, ts,
        |    CAST(NULL AS TIMESTAMP) AS ots,
        |    CAST(NULL AS BIGINT) AS last_order_id,
        |    CAST(NULL AS DOUBLE) AS day_total
        |  FROM events
        |  UNION ALL
        |  SELECT user_id, ots AS sts, 0 AS is_left,
        |    CAST(NULL AS BIGINT) AS event_id,
        |    CAST(NULL AS TIMESTAMP) AS ts, ots, last_order_id, day_total
        |  FROM r),
        |f AS (
        |  SELECT *,
        |    last_value(ots, true) OVER w AS m_ots,
        |    last_value(last_order_id, true) OVER w AS m_last,
        |    last_value(day_total, true) OVER w AS m_total
        |  FROM u
        |  WINDOW w AS (PARTITION BY user_id ORDER BY sts ASC, is_left ASC
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT event_id, user_id, ts, m_ots AS order_ts,
        |  m_last AS last_order_id, m_total AS day_total
        |FROM f WHERE is_left = 1""".stripMargin)
    val right = Tables.load(spark, sf, "orders")
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ots"))
      .agg(max(col("o_orderkey")).as("last_order_id"),
        (sum(round(col("o_totalprice") * 100).cast("long")) / 100.0)
          .as("day_total"))
    val dfForm = graft.operators.TemporalOps.asofJoin(
        Tables.load(spark, sf, "events").select("event_id", "user_id", "ts"),
        right, Seq("user_id"), "ts", "ots", matchedTsName = "order_ts")
      .select("event_id", "user_id", "ts", "order_ts", "last_order_id",
        "day_total")
    assert(canon(sqlForm) == canon(dfForm) && canon(dfForm).nonEmpty)
  }

  test("SQL text twin: q98 Jaro-Winkler blocked join via registered function") {
    // jaro_winkler binds at session build (GraftExtensions), so this twin
    // runs on an extension-bearing session sharing the JVM's SparkContext
    val prior = TestSession.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    try {
      val s = GraftSession.tune(
        org.apache.spark.sql.SparkSession.builder().master("local[2]")
          .withExtensions(new graft.plans.GraftExtensions),
        shufflePartitions = 2).getOrCreate()
      Tables.registerAll(s, sf)
      val sqlForm = s.sql(
        """SELECT c_nationkey AS nkey, c_custkey, s_suppkey,
          |  round(jaro_winkler(c_name, s_name), 6) AS name_sim
          |FROM customer JOIN supplier ON c_nationkey = s_nationkey
          |WHERE jaro_winkler(c_name, s_name) >= 0.77""".stripMargin)
      val c = Tables.load(s, sf, "customer")
        .select(org.apache.spark.sql.functions.col("c_nationkey").as("nkey"),
          org.apache.spark.sql.functions.col("c_custkey"),
          org.apache.spark.sql.functions.col("c_name"))
      val sup = Tables.load(s, sf, "supplier")
        .select(org.apache.spark.sql.functions.col("s_nationkey").as("nkey"),
          org.apache.spark.sql.functions.col("s_suppkey"),
          org.apache.spark.sql.functions.col("s_name"))
      val dfForm = graft.linkage.Linkage.blockedFuzzyJoinJw(
          c, sup, Seq("nkey"), "c_name", "s_name", minSim = 0.77)
        .select(org.apache.spark.sql.functions.col("nkey"),
          org.apache.spark.sql.functions.col("c_custkey"),
          org.apache.spark.sql.functions.col("s_suppkey"),
          org.apache.spark.sql.functions
            .round(org.apache.spark.sql.functions.col("name_sim"), 6)
            .as("name_sim"))
      assert(canon(sqlForm) == canon(dfForm) && canon(dfForm).nonEmpty)
    } finally {
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
      org.apache.spark.sql.SparkSession.setActiveSession(prior)
      org.apache.spark.sql.SparkSession.setDefaultSession(prior)
    }
  }
}
