package graft

import org.apache.spark.sql.functions._
import graft.functions.Phonetics

/** Pins the soundex twins: the driver-side Scala port must agree with the
  * engine's codegen'd `soundex` EXACTLY (the DuckDB rendering is pinned
  * by the q165 oracle). The battery covers the probed semantic corners —
  * H/W skip without separating duplicates (Ashcraft), vowel/Y resets
  * (Tymczak, Honeyman), non-letter resets (ab.b vs abb), first-char
  * bypass (123abc), case folding — plus an exhaustive length-≤3 cross
  * over a separator-rich alphabet. */
class PhoneticsSpec extends SparkSpec {
  import spark.implicits._

  private val battery = Seq(
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "Acme", "Basin Creek", "delta", "Niagara", "Consolidated",
    "Gulf", "PECO", "Duke", "Green", "Tampa", "Midwest", "Rivers",
    "Edison", "Pacific", "xx123", "123abc", "", "a", "Herman", "Knight",
    "WILLIAMS", "McDonald", "OBrien", "DAngelo", "St. Clair",
    "ab.b", "abb", "ahb", "awb", "ab b", "aeb", "abeb", "bob", "bfb",
    "a1b", "Ab", "aB", "ss", "s", "hh", "h", "wmca", "b2b",
    "Akme Power", "Nyagara Mohock", "Midvest Generation")

  test("driver twin matches engine soundex on battery + exhaustive cross") {
    val alpha = Seq("a", "b", "h", "w", "s", "c", "1", " ")
    val exhaustive = for {
      x <- alpha; y <- alpha; z <- alpha
    } yield x + y + z
    val names = (battery ++ alpha ++
      (for { x <- alpha; y <- alpha } yield x + y) ++ exhaustive).distinct
    val got = names.toDF("n")
      .select(col("n"), soundex(col("n")).as("sx")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    names.foreach { n =>
      assert(got(n) == Phonetics.soundex(n),
        s"'$n': engine=${got(n)} twin=${Phonetics.soundex(n)}")
    }
  }

  test("blocking property: spelling variants share a code, null-safe") {
    val pairs = Seq(
      "Acme Power" -> "Akme Power",
      "Basin Creek" -> "Bassin Creak",
      "Niagara Mohawk" -> "Nyagara Mohock",
      "Duke Energy" -> "Dook Energy")
    pairs.foreach { case (a, b) =>
      assert(Phonetics.soundex(a) == Phonetics.soundex(b), s"$a vs $b")
    }
    // the deliberate miss lanes q165 exercises: first-letter change and
    // the W-skip both move the block
    assert(Phonetics.soundex("Consolidated Edison") !=
      Phonetics.soundex("Konsolidated Edison"))
    assert(Phonetics.soundex("Midwest Generation") !=
      Phonetics.soundex("Midvest Generation"))
    val r = Seq((Some("Acme"), 1), (None, 2)).toDF("n", "i")
      .select(soundex(col("n"))).collect()
    assert(r.exists(_.isNullAt(0)))
  }
}
