package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level cleaning functions (SURVEY §2.9) — the Spark analogue of the
  * reference's `ColumnTransformFunc` library
  * (`/root/reference/src/pudl/transform/classes.py:147-254`). Everything is a
  * pure `Column => Column` built from codegen'd built-ins; the only UDF is
  * NFKD normalization (no built-in exists).
  */
object Cleaning {

  /** lower, trim, collapse internal whitespace, strip non-printable-ASCII.
    * Reference: `simplify_strings` (`/root/reference/src/pudl/helpers.py:829-868`). */
  def simplifyStrings(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(lower(c), "[^\\x20-\\x7e]", ""),
      "\\s+", " "))

  /** Unicode NFKD + drop combining marks + lower/strip — `normalize_strings`
    * (`/root/reference/src/pudl/transform/classes.py:291-346`). UDF: no
    * Catalyst built-in does NFKD. */
  val normalizeStringsUdf = udf { (s: String) =>
    if (s == null) null
    else java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKD)
      .replaceAll("\\p{M}", "").toLowerCase.trim
  }

  /** snake_case values — `enforce_snake_case`
    * (`/root/reference/src/pudl/transform/classes.py:347-391`). */
  def enforceSnakeCase(c: Column): Column =
    regexp_replace(regexp_replace(trim(lower(c)), "[^a-z0-9]+", "_"), "^_+|_+$", "")

  /** Extract the first numeric token from a messy string —
    * `strip_non_numeric_values` (`/root/reference/src/pudl/transform/classes.py:392-439`). */
  def extractNumeric(c: Column): Column =
    regexp_extract(c, "(-?\\d+(\\.\\d+)?)", 1)

  /** Linear unit conversion `col * m + b` — `convert_units`
    * (`/root/reference/src/pudl/transform/classes.py:540-624`). */
  def convertUnits(c: Column, m: Double, b: Double = 0.0): Column = c * m + b

  /** Detect out-of-range values and apply the inverse conversion to bring
    * them in range — `correct_units`
    * (`/root/reference/src/pudl/transform/classes.py:659-791`). */
  def correctUnits(c: Column, lo: Double, hi: Double, m: Double): Column =
    when(c.between(lo, hi) || c.isNull, c).otherwise(c * m)

  /** NULL out-of-range values — `oob_to_nan`
    * (`/root/reference/src/pudl/helpers.py:429-492`). */
  def oobToNan(c: Column, lo: Double, hi: Double): Column =
    when(c.between(lo, hi), c)

  /** NULL an out-of-range value AND its dependent columns together —
    * `oob_to_nan_with_dependent_cols` (`/root/reference/src/pudl/helpers.py:460-492`):
    * when the anchor value is invalid, columns derived from it are invalid
    * too. Returns the replacement expressions for (anchor, dependents...). */
  def oobToNanWithDependents(df: DataFrame, anchorCol: String, lo: Double,
                             hi: Double, dependents: Seq[String]): DataFrame = {
    val valid = col(anchorCol).between(lo, hi)
    val replaced = (anchorCol +: dependents).map { c =>
      c -> when(valid, col(c))
    }
    replaced.foldLeft(df) { case (acc, (name, expr)) =>
      acc.withColumn(name, expr)
    }
  }

  /** snake_case + simplify COLUMN NAMES (plan-time rename) —
    * `simplify_columns` (`/root/reference/src/pudl/helpers.py:1201-1230`). */
  def simplifyColumns(df: DataFrame): DataFrame = {
    val renames = df.columns.map { c =>
      c -> c.trim.toLowerCase
        .replaceAll("[^0-9a-z]+", "_").replaceAll("^_+|_+$", "")
    }
    require(renames.map(_._2).distinct.length == renames.length,
      s"simplifyColumns would collide: ${renames.mkString(", ")}")
    df.withColumnsRenamed(renames.toMap)
  }

  /** Sentinel→NULL — `standardize_na_values`
    * (`/root/reference/src/pudl/transform/classes.py:905-928`). */
  def naSentinelsToNull(c: Column, sentinels: Seq[String]): Column =
    when(c.isin(sentinels: _*), lit(null)).otherwise(c)

  /** Zero-pad a numeric string to `width` — `zero_pad_numeric_string`
    * (`/root/reference/src/pudl/helpers.py:1518-1568`). Non-numeric → NULL. */
  def zeroPad(c: Column, width: Int): Column =
    when(c.rlike("^\\d+$"), lpad(c, width, "0"))

  /** %→ratio with domain check — `standardize_percentages_ratio`
    * (`/root/reference/src/pudl/helpers.py:1671-1710`). */
  def percentToRatio(c: Column): Column =
    when(c.between(0, 100), c / 100.0)

  /** Compose y/m/d columns into a date — `convert_to_date`
    * (`/root/reference/src/pudl/helpers.py:1082-1141`). */
  def composeDate(y: Column, m: Column, d: Column): Column = make_date(y, m, d)

  /** Whitelist boolean recode — `convert_col_to_bool` / `fix_boolean_columns`
    * (`/root/reference/src/pudl/helpers.py:1928-2005`): listed true-values →
    * true, listed false-values → false, everything else NULL. */
  def convertToBool(c: Column, trueVals: Seq[String], falseVals: Seq[String]): Column =
    when(c.isin(trueVals: _*), lit(true))
      .when(c.isin(falseVals: _*), lit(false))

  /** Int-like values with NA → clean digit string (ZIP/FIPS shape) —
    * `fix_int_na` (`/root/reference/src/pudl/helpers.py:964-1008`). */
  def fixIntNa(c: Column): Column =
    round(c, 0).cast("long").cast("string")

  /** Phone standardization — `standardize_phone_column`
    * (`/root/reference/src/pudl/helpers.py:2326-2381`): strip a trailing
    * ".0", split off an `x<digits>` extension, drop non-digits; exactly 10
    * digits format as ###-###-####, other lengths pass through as bare
    * digits; the extension is re-appended as `x#`; empty or all-zero
    * numbers → NULL. */
  def standardizePhone(c: Column): Column = {
    val noFloat = regexp_replace(c, "\\.0$", "")
    val mainRaw = regexp_extract(noFloat, "^([^xX]*)", 1)
    val ext = regexp_extract(noFloat, "[xX](\\d+)$", 1)
    val digits = regexp_replace(mainRaw, "[^0-9]", "")
    val formatted = when(length(digits) === 10,
      concat_ws("-", substring(digits, 1, 3), substring(digits, 4, 3),
        substring(digits, 7, 4))).otherwise(digits)
    val withExt = when(ext =!= "", concat(formatted, lit("x"), ext))
      .otherwise(formatted)
    when(digits === "" || digits.rlike("^0+$"), lit(null)).otherwise(withExt)
  }

  /** 2-digit → 4-digit year repair with a rolling-century rule —
    * `normalize_year_fragments` (`/root/reference/src/pudl/helpers.py:2553-2626`):
    * 2-digit years map into `baseCentury`, rolling back 100 years when the
    * result exceeds `maxValid`. Where the reference raises on malformed or
    * out-of-range values, this column form yields NULL (engines can't raise
    * per-row; pair with a CheckRunner NotNull to reproduce the hard
    * failure). */
  def normalizeYearFragments(c: Column, minValid: Int, maxValid: Int,
                             baseCentury: Int = 2000): Column = {
    require(baseCentury % 100 == 0 && maxValid - minValid < 100 &&
      minValid <= maxValid, "invalid rolling-century configuration")
    val s = c.cast("string")
    val y = s.cast("int")
    val mapped = when(length(s) === 2,
      when(lit(baseCentury) + y > maxValid, lit(baseCentury) + y - 100)
        .otherwise(lit(baseCentury) + y))
      .otherwise(y)
    when(s.rlike("^(\\d{2}|\\d{4})$") && mapped.between(minValid, maxValid),
      mapped)
  }

  /** Heuristic US address parse — `parse_address`
    * (`/root/reference/src/pudl/helpers.py:2660-2701`). The reference uses
    * the probabilistic usaddress CRF; this is the documented regex-heuristic
    * stand-in (SURVEY §2.9) covering the CRF tag set's common shapes:
    *
    *   - `AddressNumber [PreDirectional] StreetName+PostType
    *     [PostDirectional] [, OccupancyType OccupancyId], City, ST ZIP[+4]`
    *     — the street column concatenates pre-directional, name,
    *     post-directional and occupancy in the reference's `street_parts`
    *     order (helpers.py:2680-2691); the address number is additionally
    *     split out as its own column.
    *   - `PO Box N, City, ST ZIP` — the reference's street_parts exclude
    *     the USPSBoxType/USPSBoxID tags, so street is NULL while
    *     city/state/zip still parse.
    *   - anything else mirrors the CRF failure contract
    *     (helpers.py:2698-2700): `(addr, None, None, None)` — the raw
    *     string lands in the street column, the typed parts stay NULL.
    *
    * Pure expressions; both regexes are RE2-compatible so the DuckDB oracle
    * runs the identical patterns. */
  val streetAddrPattern: String = {
    // longer alternatives first: "Northeast" must not match as "North";
    // spelled-out directionals cover the usaddress corpus's
    // StreetNamePreDirectional/PostDirectional surface forms
    val dir = "(?:Northeast|Northwest|Southeast|Southwest|North|South|" +
      "East|West|NE|NW|SE|SW|N|S|E|W)"
    val occ = "(?:Apt|Apartment|Ste|Suite|Unit|Bldg|Rm|Fl|#)"
    "^\\s*(\\d+)\\s+" +                       // 1: address number
      s"(?:($dir)\\s+)?" +                    // 2: pre-directional
      "([^,]+?)" +                            // 3: street name + post type
      s"(?:\\s+($dir))?" +                    // 4: post-directional
      s"(?:\\s*,?\\s+($occ\\.?\\s*[A-Za-z0-9-]+))?" + // 5: occupancy
      "\\s*,\\s*([^,]+?)" +                   // 6: city
      "\\s*,\\s*([A-Z]{2})" +                 // 7: state
      "\\s+(\\d{5}(?:-\\d{4})?)\\s*$"         // 8: zip or zip+4
  }
  val poBoxPattern: String =
    "^\\s*[Pp]\\.?[Oo]\\.?\\s*Box\\s+(\\d+)\\s*,\\s*([^,]+?)\\s*,\\s*([A-Z]{2})\\s+(\\d{5}(?:-\\d{4})?)\\s*$"

  def parseAddress(c: Column): Seq[(String, Column)] = {
    def g(pat: String, i: Int): Column = {
      val v = regexp_extract(c, pat, i)
      when(v =!= "", v)
    }
    val num = g(streetAddrPattern, 1)
    val street = trim(concat_ws(" ",
      g(streetAddrPattern, 2), g(streetAddrPattern, 3),
      g(streetAddrPattern, 4), g(streetAddrPattern, 5)))
    val boxZip = g(poBoxPattern, 4)
    Seq(
      "addr_number" -> num,
      "addr_street" -> when(num.isNotNull, street)
        .when(boxZip.isNotNull, lit(null))
        .otherwise(c),
      "addr_city" -> coalesce(g(streetAddrPattern, 6), g(poBoxPattern, 2)),
      "addr_state" -> coalesce(g(streetAddrPattern, 7), g(poBoxPattern, 3)),
      "addr_zip" -> coalesce(g(streetAddrPattern, 8), boxZip))
  }

  /** Code-table driven recode: fix known-bad codes, NULL ignored codes,
    * pass through valid codes, NULL everything else. Reference:
    * `Encoder.encode` (`/root/reference/src/pudl/metadata/classes.py:410-634`).
    * The code table is broadcast — at scale this is a map-side join.
    */
  def encode(spark: SparkSession, df: DataFrame, column: String,
             valid: Seq[String], fixes: Map[String, String],
             ignored: Seq[String]): DataFrame = {
    import spark.implicits._
    val codeTable =
      valid.map(v => (v, v)) ++ fixes.toSeq.filter { case (_, v) => valid.contains(v) }
    val codes = codeTable.toDF("__raw", "__coded")
    df.join(broadcast(codes), df(column) === col("__raw"), "left")
      .withColumn(column,
        when(df(column).isin(ignored: _*), lit(null)).otherwise(col("__coded")))
      .drop("__raw", "__coded")
  }
}
