package graft

import org.apache.spark.sql.functions._
import graft.functions.Cleaning
import graft.operators.TimeseriesScreens

/** Unit tests for the remaining Ruggles screens (SURVEY §2.12) and the
  * phone/year scalar recodes (§2.9). */
class ScreensSpec extends SparkSpec {
  import spark.implicits._

  test("rollingQuantileExpr interpolates like pandas/quantile_cont") {
    val df = Seq((1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0), (1, 4, 10.0))
      .toDF("k", "i", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"k").orderBy($"i")
    val out = df.withColumn("q75",
      TimeseriesScreens.rollingQuantileExpr($"v", 0.75, w, 3, 3))
      .orderBy("i").select("q75").as[Double].collect()
    // full frame [1,2,3,10]: h = 3*0.75 = 2.25 -> 3 + 0.25*(10-3) = 4.75
    assert(out.forall(_ == 4.75))
  }

  test("horizontalMedian drops nulls and interpolates") {
    val df = Seq((Option(1.0), Option(3.0), Option.empty[Double]))
      .toDF("a", "b", "c")
    val m = df.select(TimeseriesScreens.horizontalMedian(
      Seq($"a", $"b", $"c")).as("m")).as[Double].head()
    assert(m == 2.0)
  }

  test("flagLocalOutlier flags a spike above the median prediction") {
    // flat series with one huge spike: pred tracks the median, iqr small
    val rows = (1 to 40).map(i => (1, i, if (i == 20) 500.0 else 10.0 + (i % 3)))
    val df = rows.toDF("k", "i", "v")
    val out = TimeseriesScreens.flagLocalOutlier(df, Seq("k"), Seq($"i"),
      $"v", window = (4, 3), longWindow = (10, 9),
      shifts = Seq(-6, 0, 6), iqrWindow = (8, 7))
    val flagged = out.where($"flag_local_hi").select("i").as[Int].collect()
    assert(flagged.toSeq == Seq(20))
    assert(out.where($"flag_local_lo").count() == 0)
  }

  test("flagLocalOutlierFast is bit-identical to the declarative form") {
    val ev = Tables.load(spark, sf, "events")
    val slow = TimeseriesScreens.flagLocalOutlier(ev, Seq("user_id"),
      Seq(col("ts"), col("event_id")), col("value"),
      window = (6, 5), longWindow = (24, 23),
      shifts = Seq(-12, -6, 0, 6, 12), iqrWindow = (12, 11))
      .select("user_id", "event_id", "value", "pred", "iqr",
        "flag_local_hi", "flag_local_lo")
    val fast = TimeseriesScreens.flagLocalOutlierFast(ev, "user_id", "ts",
      "event_id", "value", window = (6, 5), longWindow = (24, 23),
      shifts = Seq(-12, -6, 0, 6, 12), iqrWindow = (12, 11))
      .select("user_id", "event_id", "value", "pred", "iqr",
        "flag_local_hi", "flag_local_lo")
    assert(slow.count() == fast.count())
    // exact join compare: every column equal (null-safe), no tolerance
    val joined = slow.as("s").join(fast.as("f"),
      col("s.user_id") === col("f.user_id") &&
        col("s.event_id") === col("f.event_id"))
    val mismatches = joined.where(
      !(col("s.pred") <=> col("f.pred")) ||
        !(col("s.iqr") <=> col("f.iqr")) ||
        !(col("s.flag_local_hi") <=> col("f.flag_local_hi")) ||
        !(col("s.flag_local_lo") <=> col("f.flag_local_lo"))).count()
    assert(mismatches == 0)
  }

  test("flagAnomalousRegion flags unflagged values inside flagged regions") {
    // one dense flagged block (i in 10..25), with unflagged holes at 14, 18
    val rows = (1 to 40).map(i =>
      (1, i, (i >= 10 && i <= 25) && i != 14 && i != 18))
    val df = rows.toDF("k", "i", "flagged")
    val out = TimeseriesScreens.flagAnomalousRegion(df, Seq("k"), Seq($"i"),
      $"flagged", window = 8, threshold = 0.5)
    val regions = out.where($"flag_region").select("i").as[Int].collect().sorted
    assert(regions.nonEmpty && regions.forall(i => i == 14 || i == 18))
    // far-away unflagged values are never flagged
    assert(!out.where($"flag_region" && ($"i" < 10 || $"i" > 25)).head(1).nonEmpty)
  }

  test("flagBadPeriods flags short-coverage periods") {
    val ts = (h: Int) => java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")
    // key 1: 12 hourly points (coverage 12h, fraction 1) — good
    // key 2: two points 2h apart (coverage 3h < 6) — bad
    val rows = (0 until 12).map(h => (1L, ts(h), Some(1.0))) ++
      Seq((2L, ts(0), Some(1.0)), (2L, ts(2), Some(2.0)))
    val df = rows.toDF("k", "ts", "v")
    val out = TimeseriesScreens.flagBadPeriods(df, Seq("k"), "ts", $"v",
      lit(false), date_trunc("month", $"ts"), minData = 6.0,
      minDataFraction = 0.5)
    val byKey = out.select($"k", $"flag_bad_period").distinct().as[(Long, Boolean)]
      .collect().toMap
    assert(byKey(1L) == false && byKey(2L) == true)
  }

  test("flagSingleDelta chains consecutive outliers off the surviving level") {
    // level ~10 with two consecutive wild values; both must flag because the
    // scan compares against the last SURVIVING value
    val rows = Seq(10.0, 10.5, 10.2, 200.0, 210.0, 10.4, 10.1, 10.6, 10.3, 10.2)
      .zipWithIndex.map { case (v, i) => (1L, i.toLong, v) }
    val df = rows.toDF("k", "t", "v")
    val out = TimeseriesScreens.flagSingleDelta(df, "k", "t", "v",
      multiplier = 5.0)
    val flagged = out.where($"flag_single_delta").select("t").as[Long]
      .collect().sorted
    assert(flagged.toSeq == Seq(3L, 4L))
  }

  test("standardizePhone covers formats, extensions and invalids") {
    val df = Seq("(415) 555 0123", "415.555.0123x7", "5550123",
      "0000000000", "415-555-0123", "boo").toDF("p")
    val out = df.select(Cleaning.standardizePhone($"p").as("s"))
      .as[Option[String]].collect().toSeq
    assert(out == Seq(Some("415-555-0123"), Some("415-555-0123x7"),
      Some("5550123"), None, Some("415-555-0123"), None))
  }

  test("normalizeYearFragments applies the rolling-century rule") {
    val df = Seq("05", "95", "1995", "7", "30").toDF("y")
    val out = df.select(Cleaning.normalizeYearFragments($"y", 1960, 2026)
      .as("yy")).as[Option[Int]].collect().toSeq
    // 05 -> 2005; 95 -> 1995; 1995 passes; "7" malformed -> null;
    // 30 -> 1930 (out of range) -> null
    assert(out == Seq(Some(2005), Some(1995), Some(1995), None, None))
  }

  test("parseAddress covers the usaddress tag-set shapes") {
    // (raw, number, street, city, state, zip) — street concatenates
    // pre-dir / name+type / post-dir / occupancy in the reference's
    // street_parts order; PO Box with location drops the box from street
    // (reference street_parts exclude USPSBox*); unparseable mirrors the
    // CRF failure contract: raw string as street, typed parts NULL.
    val cases = Seq(
      ("123 Main St, Springfield, IL 62704",
        Some("123"), Some("Main St"), Some("Springfield"), Some("IL"), Some("62704")),
      ("45 N Oak Ave, Denver, CO 80202",
        Some("45"), Some("N Oak Ave"), Some("Denver"), Some("CO"), Some("80202")),
      ("9 Elm Dr NW, Austin, TX 73301",
        Some("9"), Some("Elm Dr NW"), Some("Austin"), Some("TX"), Some("73301")),
      ("77 Oak Ave, Ste 210, Boston, MA 02108",
        Some("77"), Some("Oak Ave Ste 210"), Some("Boston"), Some("MA"), Some("02108")),
      ("8 Main St Apt 4B, Salem, OR 97301-1234",
        Some("8"), Some("Main St Apt 4B"), Some("Salem"), Some("OR"), Some("97301-1234")),
      ("500 W Pine Rd # 12, Mesa, AZ 85201",
        Some("500"), Some("W Pine Rd # 12"), Some("Mesa"), Some("AZ"), Some("85201")),
      // spelled-out directionals (surface forms the CRF tags as
      // Pre/PostDirectional); "Northview" must NOT lose its prefix to
      // the "North" alternative (longest-first alternation + backtrack)
      ("12 North Main St, Provo, UT 84601",
        Some("12"), Some("North Main St"), Some("Provo"), Some("UT"), Some("84601")),
      ("7 42nd St West, Fargo, ND 58102",
        Some("7"), Some("42nd St West"), Some("Fargo"), Some("ND"), Some("58102")),
      ("33 Northview Ave, Boise, ID 83702",
        Some("33"), Some("Northview Ave"), Some("Boise"), Some("ID"), Some("83702")),
      ("PO Box 873, Helena, MT 59601",
        None, None, Some("Helena"), Some("MT"), Some("59601")),
      ("P.O. Box 12, Reno, NV 89501",
        None, None, Some("Reno"), Some("NV"), Some("89501")),
      ("PO Box 99",
        None, Some("PO Box 99"), None, None, None),
      ("not an address",
        None, Some("not an address"), None, None, None))
    val df = cases.map(_._1).toDF("a")
    val out = Cleaning.parseAddress($"a")
      .foldLeft(df) { case (acc, (n, e)) => acc.withColumn(n, e) }
      .select("addr_number", "addr_street", "addr_city", "addr_state", "addr_zip")
      .as[(Option[String], Option[String], Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(out == cases.map(c => (c._2, c._3, c._4, c._5, c._6)))
  }

  test("ewmaScreen: hand-computed fixed-point fold, flags, partition-stable") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // series: 4, 8, 8, 100 (spike), alpha=1/4, threshold=50
    // micro: E1=4e6; E2=(8e6+3·4e6+2)//4=5e6; E3=(8e6+15e6+2)//4=5.75e6
    //        E4=(100e6+17.25e6+2)//4=29312500 -> 29.3125
    val df = Seq((1L, ts(1), 10L, 4.0), (1L, ts(2), 11L, 8.0),
      (1L, ts(3), 12L, 8.0), (1L, ts(4), 13L, 100.0),
      (2L, ts(1), 20L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
    def run(parts: Int) = TimeseriesScreens.ewmaScreen(df.repartition(parts),
        "user_id", "ts", "event_id", "value", threshold = 50.0)
      .orderBy("user_id", "ts_us")
      .select("user_id", "event_id", "ewma", "deviation", "flag_ewma")
      .as[(Long, Long, Double, Option[Double], Boolean)].collect().toSeq
    val out = run(2)
    assert(out == Seq(
      (1L, 10L, 4.0, None, false),
      (1L, 11L, 5.0, Some(4.0), false),
      (1L, 12L, 5.75, Some(3.0), false),
      (1L, 13L, 29.3125, Some(94.25), true), // 100 - 5.75 > 50
      (2L, 20L, 7.0, None, false)))          // singleton series
    assert(run(7) == out) // integer state: partitioning is bit-invariant
  }

  test("ewmaScreen: zero values fold normally, negative values fail loudly") {
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    // zeros are legal state — the old prev = -1 sentinel never conflated
    // them, but the explicit first-flag must keep treating 0 as a value:
    // E1=0, E2=(8e6+0+2)//4=2e6, E3=(0+3·2e6+2)//4=1.5e6
    val zeros = Seq((1L, ts(1), 1L, 0.0), (1L, ts(2), 2L, 8.0),
      (1L, ts(3), 3L, 0.0)).toDF("user_id", "ts", "event_id", "value")
    val out = TimeseriesScreens.ewmaScreen(zeros, "user_id", "ts",
        "event_id", "value", threshold = 50.0)
      .orderBy("ts_us").select("ewma", "deviation")
      .as[(Double, Option[Double])].collect().toSeq
    assert(out == Seq((0.0, None), (2.0, Some(8.0)), (1.5, Some(-2.0))))
    // a contract-violating negative value must throw, not silently
    // restart the series (the old sentinel treated every later row as
    // a fresh first row)
    val neg = Seq((1L, ts(1), 1L, 4.0), (1L, ts(2), 2L, -1.0))
      .toDF("user_id", "ts", "event_id", "value")
    val ex = intercept[org.apache.spark.SparkException] {
      TimeseriesScreens.ewmaScreen(neg, "user_id", "ts", "event_id",
        "value", threshold = 50.0).collect()
    }
    assert(ex.getMessage.contains("non-negative") ||
      Option(ex.getCause).exists(_.getMessage.contains("non-negative")))
  }
}
