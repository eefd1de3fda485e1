package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Name→code geocoding dims and lookups (SURVEY §2.9).
  *
  * Reference operators:
  *   - `add_fips_ids` / `clean_eia_counties`
  *     (`/root/reference/src/pudl/helpers.py:273-428`): normalize state/county
  *     names, apply a manual-fix map for known misspellings, join a static
  *     FIPS dimension, emit zero-padded code columns.
  *   - `find_timezone` (`/root/reference/src/pudl/transform/eia.py:80-121`):
  *     state → IANA timezone via a static lookup, lat/lng fallback.
  *
  * Spark design: the dimension is a broadcast join (a few dozen to a few
  * thousand rows — it never shuffles the fact side at any scale); the manual
  * fixes are a `when` chain folded into the join key expression so the whole
  * lookup is one codegen'd stage. The reference's lat/lng path calls
  * `timezonefinder` (a polygon index); we substitute the deterministic
  * nautical approximation `Etc/GMT∓round(lon/15)` — documented deviation,
  * the operator shape (static lookup + coalesced fallback) is identical.
  *
  * The fixture tables have TPC-H nations, not US states, so the shipped dim
  * maps the 25 nation names to ISO 3166-1 numeric codes (public knowledge) —
  * same semantics: authoritative name→zero-padded-code dimension.
  */
object GeoCodes {

  /** (name, ISO 3166-1 numeric code, representative IANA timezone) for the
    * 25 TPC-H nations. Names are stored pre-normalized (lower case), like
    * the reference's FIPS dim after `simplify_strings`. */
  val nationIsoTz: Seq[(String, String, String)] = Seq(
    ("algeria", "012", "Africa/Algiers"),
    ("argentina", "032", "America/Argentina/Buenos_Aires"),
    ("brazil", "076", "America/Sao_Paulo"),
    ("canada", "124", "America/Toronto"),
    ("egypt", "818", "Africa/Cairo"),
    ("ethiopia", "231", "Africa/Addis_Ababa"),
    ("france", "250", "Europe/Paris"),
    ("germany", "276", "Europe/Berlin"),
    ("india", "356", "Asia/Kolkata"),
    ("indonesia", "360", "Asia/Jakarta"),
    ("iran", "364", "Asia/Tehran"),
    ("iraq", "368", "Asia/Baghdad"),
    ("japan", "392", "Asia/Tokyo"),
    ("jordan", "400", "Asia/Amman"),
    ("kenya", "404", "Africa/Nairobi"),
    ("morocco", "504", "Africa/Casablanca"),
    ("mozambique", "508", "Africa/Maputo"),
    ("peru", "604", "America/Lima"),
    ("china", "156", "Asia/Shanghai"),
    ("romania", "642", "Europe/Bucharest"),
    ("saudi arabia", "682", "Asia/Riyadh"),
    ("vietnam", "704", "Asia/Ho_Chi_Minh"),
    ("russia", "643", "Europe/Moscow"),
    ("united kingdom", "826", "Europe/London"),
    ("united states", "840", "America/New_York"))

  /** The static dim as a DataFrame: (state_name, code, tz). */
  def nationDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    nationIsoTz.toDF("state_name", "code", "tz")
  }

  /** US state → (FIPS code, primary IANA timezone) — the reference's actual
    * domain (`addfips` data, public). Pre-normalized names like the fixture
    * dim; DC and the 50 states. */
  val stateFipsTz: Seq[(String, String, String)] = Seq(
    ("alabama", "01", "America/Chicago"), ("alaska", "02", "America/Anchorage"),
    ("arizona", "04", "America/Phoenix"), ("arkansas", "05", "America/Chicago"),
    ("california", "06", "America/Los_Angeles"), ("colorado", "08", "America/Denver"),
    ("connecticut", "09", "America/New_York"), ("delaware", "10", "America/New_York"),
    ("district of columbia", "11", "America/New_York"),
    ("florida", "12", "America/New_York"), ("georgia", "13", "America/New_York"),
    ("hawaii", "15", "Pacific/Honolulu"), ("idaho", "16", "America/Boise"),
    ("illinois", "17", "America/Chicago"), ("indiana", "18", "America/Indiana/Indianapolis"),
    ("iowa", "19", "America/Chicago"), ("kansas", "20", "America/Chicago"),
    ("kentucky", "21", "America/New_York"), ("louisiana", "22", "America/Chicago"),
    ("maine", "23", "America/New_York"), ("maryland", "24", "America/New_York"),
    ("massachusetts", "25", "America/New_York"), ("michigan", "26", "America/Detroit"),
    ("minnesota", "27", "America/Chicago"), ("mississippi", "28", "America/Chicago"),
    ("missouri", "29", "America/Chicago"), ("montana", "30", "America/Denver"),
    ("nebraska", "31", "America/Chicago"), ("nevada", "32", "America/Los_Angeles"),
    ("new hampshire", "33", "America/New_York"), ("new jersey", "34", "America/New_York"),
    ("new mexico", "35", "America/Denver"), ("new york", "36", "America/New_York"),
    ("north carolina", "37", "America/New_York"), ("north dakota", "38", "America/Chicago"),
    ("ohio", "39", "America/New_York"), ("oklahoma", "40", "America/Chicago"),
    ("oregon", "41", "America/Los_Angeles"), ("pennsylvania", "42", "America/New_York"),
    ("rhode island", "44", "America/New_York"), ("south carolina", "45", "America/New_York"),
    ("south dakota", "46", "America/Chicago"), ("tennessee", "47", "America/Chicago"),
    ("texas", "48", "America/Chicago"), ("utah", "49", "America/Denver"),
    ("vermont", "50", "America/New_York"), ("virginia", "51", "America/New_York"),
    ("washington", "53", "America/Los_Angeles"), ("west virginia", "54", "America/New_York"),
    ("wisconsin", "55", "America/Chicago"), ("wyoming", "56", "America/Denver"))

  /** US dim as a DataFrame with the same (state_name, code, tz) shape, so
    * `addFipsIds`/`findTimezone` run unchanged on the real domain. */
  def stateDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stateFipsTz.toDF("state_name", "code", "tz")
  }

  /** Normalize a messy name column and apply manual fixes — the
    * `clean_eia_counties` step: `simplify_strings` then a known-misspelling
    * map. Pure expressions (one `when` per fix). */
  def cleanName(c: Column, fixes: Map[String, String]): Column = {
    val simplified = Cleaning.simplifyStrings(c)
    fixes.foldLeft(simplified) { case (acc, (bad, good)) =>
      when(acc === bad, good).otherwise(acc)
    }
  }

  /** `add_fips_ids`: clean the name column, broadcast-join the dim, add the
    * zero-padded code column (`width` digits). Unmatched names keep a NULL
    * code, like the reference (which warns and leaves NA). */
  def addFipsIds(df: DataFrame, nameCol: String, dim: DataFrame,
                 outCol: String = "state_id_fips", width: Int = 3,
                 fixes: Map[String, String] = Map.empty): DataFrame = {
    val dimSel = dim.select(col("state_name").as("__name_clean"),
      lpad(col("code"), width, "0").as(outCol))
    df.withColumn("__name_clean", cleanName(col(nameCol), fixes))
      .join(broadcast(dimSel), Seq("__name_clean"), "left")
  }

  /** `find_timezone`: static name→tz lookup with a deterministic longitude
    * fallback (`Etc/GMT∓n`, nautical convention — Etc/GMT-1 is UTC+1). */
  def findTimezone(df: DataFrame, nameCol: String, lonCol: Option[String],
                   dim: DataFrame, outCol: String = "timezone",
                   fixes: Map[String, String] = Map.empty): DataFrame = {
    val dimSel = dim.select(col("state_name").as("__tz_name"),
      col("tz").as("__tz_dim"))
    val joined = df.withColumn("__tz_name", cleanName(col(nameCol), fixes))
      .join(broadcast(dimSel), Seq("__tz_name"), "left")
    val out = lonCol match {
      case Some(lon) => joined.withColumn(outCol,
        coalesce(col("__tz_dim"), etcGmt(col(lon))))
      case None => joined.withColumn(outCol, col("__tz_dim"))
    }
    out.drop("__tz_dim", "__tz_name")
  }

  /** Point rule for the continental-US IANA zone at (lat, lon) — the
    * stand-in for the reference's `timezonefinder` polygon index
    * (`eia.py:80-121`), built from public boundary geography (the legal
    * zone boundaries follow state and county lines; see the standard
    * US DOT / Wikipedia "Time in the United States" maps): latitude-banded
    * boundary meridians for the Eastern/Central and Central/Mountain
    * lines (the Kentucky and Tennessee east/west splits, the Alabama–
    * Georgia line, the Florida panhandle, the Illinois–Indiana line with
    * the NW-Indiana Central pocket, the Dakotas/Nebraska/Kansas Mountain
    * staircase, El Paso + Hudspeth), plus the named islands a
    * state-level lookup can never answer: America/Phoenix (no-DST
    * Arizona) with the Navajo-Nation Denver carve-out, America/Boise
    * (southern Idaho + SE-Oregon Malheur), America/Menominee (the
    * western-UP Central counties), America/Detroit, and
    * America/Indiana/Indianapolis. Residual error is bounded by the
    * distance the legal line wanders from these rules (county-scale,
    * ≲0.2°) — vs whole states under the dim lookup and 1-3° under the
    * old meridian bands (which put most of Alabama in Eastern time).
    * Sub-county micro-zones (the America/Indiana, America/North_Dakota
    * and America/Kentucky families) collapse onto their offset family's
    * major zone — documented deviation from timezonefinder's exact
    * strings. */
  def usTzPoint(lat: Double, lon: Double): String = {
    // Arizona: no-DST Phoenix; the Navajo Nation (NE) observes DST →
    // Denver. West edge is the Colorado River (≈ −114.55, swinging to
    // −114.65 below Yuma's latitude).
    val azWest = if (lat < 33.0) -114.65 else -114.55
    if (lon >= azWest && lon < -109.05 && lat >= 31.3 && lat < 37.0)
      return if (lat > 35.2 && lon > -110.75) "America/Denver"
             else "America/Phoenix"
    // Michigan's western-UP Central counties (Gogebic/Iron/Dickinson/
    // Menominee) are their own IANA zone
    if ((lat >= 46.0 && lat < 46.9 && lon >= -90.45 && lon < -88.2) ||
        (lat >= 45.05 && lat < 46.0 && lon >= -88.2 && lon < -87.3))
      return "America/Menominee"
    // America/Boise: Mountain-time southern Idaho (panhandle is Pacific,
    // boundary ≈ the Salmon River at 45.55°) + SE-Oregon Malheur county
    if ((lat >= 42.0 && lat < 45.55 && lon >= -117.05 && lon < -113.0) ||
        (lat >= 42.0 && lat < 45.0 && lon >= -113.0 && lon < -111.05) ||
        (lat >= 42.0 && lat < 44.3 && lon >= -118.25 && lon < -117.05))
      return "America/Boise"
    // Pacific/Mountain line: WA/OR/N-Idaho above 45.55; NE Oregon;
    // Nevada reaching east to −114.05; the Colorado River south of 35
    val pacific =
      (lat >= 45.55 && lon < -115.6) ||
      (lat >= 44.3 && lat < 45.55 && lon < -117.05) ||
      (lat >= 42.0 && lat < 44.3 && lon < -118.25) ||
      (lat >= 35.0 && lat < 42.0 && lon < -114.05) ||
      (lat >= 33.0 && lat < 35.0 && lon < -114.55) ||
      (lat < 33.0 && lon < -114.65)
    if (pacific) return "America/Los_Angeles"
    // Central/Mountain staircase (west of the meridian → Denver):
    // MT/ND line, Missouri-river ND, western SD/NE, 4 western-KS
    // counties, NM/TX line, El Paso + Hudspeth
    val cmB =
      if (lat >= 47.6) -104.05
      else if (lat >= 45.94) -101.55
      else if (lat >= 40.0) -101.0
      else if (lat >= 37.0) -101.5
      else if (lat >= 32.1) -103.05
      else if (lat >= 30.4) -104.85
      else -106.7
    if (lon < cmB) return "America/Denver"
    // NW-Indiana Central pocket (Lake/Porter/LaPorte-west … Jasper),
    // east of the Illinois line but on Chicago time
    if (lat >= 40.75 && lat < 41.76 && lon >= -87.53 && lon < -86.82)
      return "America/Chicago"
    // Eastern/Central line, latitude-banded: UP edge, Lake Michigan
    // midline, IL/IN line, the KY and TN splits, AL/GA, FL panhandle
    val ceB =
      if (lat >= 45.8) -90.45
      else if (lat >= 41.76) -87.0
      else if (lat >= 38.35) -87.53
      else if (lat >= 36.65) -85.8
      else if (lat >= 35.8) -85.25
      else if (lat >= 35.0) -85.45
      else if (lat >= 33.0) -85.6
      else if (lat >= 31.0) -85.07
      else if (lat >= 29.5) -85.1
      else -87.5
    if (lon < ceB) return "America/Chicago"
    // Eastern family — pick the IANA name by region
    if ((lat >= 41.7 && lat < 46.1 && lon >= -87.0 && lon < -82.3) ||
        (lat >= 45.8 && lat < 48.3 && lon >= -90.45 && lon < -83.4))
      "America/Detroit"
    else if (lat >= 38.35 && lat < 41.76 && lon >= -87.53 && lon < -84.82)
      "America/Indiana/Indianapolis"
    else "America/New_York"
  }

  /** [[usTzPoint]] sampled on 0.25° cells over lat 24..49, lon −125..−67
    * (cell key = floor(4·coord), value = the rule at the cell center) —
    * 23.2k rows, broadcast-joined: the fact side never shuffles, and the
    * lookup is exact wherever a cell does not straddle a boundary. */
  lazy val usTzGrid: Seq[(Int, Int, String)] =
    for {
      qlat <- (24 * 4) until (49 * 4)
      qlon <- (-125 * 4) until (-67 * 4)
    } yield (qlat, qlon, usTzPoint(qlat / 4.0 + 0.125, qlon / 4.0 + 0.125))

  /** The grid as a broadcastable dim: (glat, glon, grid_tz) keyed on
    * quarter-degree cell indices (floor(4·lat), floor(4·lon)). */
  def usTzGridDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    usTzGrid.toDF("glat", "glon", "grid_tz")
  }

  /** `find_timezone` with the reference's PRIORITY ORDER: location first
    * (the grid standing in for timezonefinder), then the state dim
    * approximation, then the nautical `Etc/GMT∓n` fallback — the
    * reference only consults the state map when lng/lat fail
    * (`eia.py:105-119`). One broadcast join per dim; the fact side stays
    * a single codegen'd stage. */
  def findTimezoneGrid(df: DataFrame, nameCol: String, latCol: String,
                       lonCol: String, dim: DataFrame, grid: DataFrame,
                       outCol: String = "timezone",
                       fixes: Map[String, String] = Map.empty): DataFrame = {
    val dimSel = dim.select(col("state_name").as("__tz_name"),
      col("tz").as("__tz_dim"))
    val gridSel = grid.select(col("glat").as("__glat"),
      col("glon").as("__glon"), col("grid_tz").as("__tz_grid"))
    df.withColumn("__tz_name", cleanName(col(nameCol), fixes))
      .withColumn("__glat", floor(col(latCol) * 4).cast("int"))
      .withColumn("__glon", floor(col(lonCol) * 4).cast("int"))
      .join(broadcast(gridSel), Seq("__glat", "__glon"), "left")
      .join(broadcast(dimSel), Seq("__tz_name"), "left")
      .withColumn(outCol, coalesce(col("__tz_grid"), col("__tz_dim"),
        when(col(lonCol).isNotNull, etcGmt(col(lonCol)))))
      .drop("__tz_grid", "__tz_dim", "__tz_name", "__glat", "__glon")
  }

  /** Longitude → "Etc/GMT∓n" (nautical time zone, ±0.5h boundary at
    * round-half-even like both engines' `round`). */
  def etcGmt(lon: Column): Column = {
    val off = round(lon / 15.0, 0).cast("int")
    concat(lit("Etc/GMT"),
      when(off >= 0, concat(lit("-"), off.cast("string")))
        .otherwise(concat(lit("+"), (-off).cast("string"))))
  }
}
