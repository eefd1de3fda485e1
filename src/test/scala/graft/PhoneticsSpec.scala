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

  // ---- Metaphone (Philips 1990) -----------------------------------------

  test("metaphone: hand-checked classic vectors") {
    // every expected value hand-derived from the documented rule set in
    // Phonetics.metaphoneWord's Scaladoc ('0' = theta)
    val vectors = Seq(
      "thompson" -> "0MPSN", // TH → 0
      "knight" -> "NT",      // kn- prefix drop; silent gh
      "wright" -> "RT",      // wr- prefix drop
      "school" -> "SKL",     // sch → K; oo collapses
      "lamb" -> "LM",        // final -mb
      "xavier" -> "SFR",     // x- → s; v → F
      "where" -> "WR",       // wh- → w
      "ghost" -> "KST",      // gh before vowel → K
      "through" -> "0R",     // final silent gh
      "judge" -> "JJ",       // dge → J
      "dodge" -> "TJ",
      "cellar" -> "SLR",     // ce → S; ll collapses
      "phone" -> "FN",       // ph → F
      "watch" -> "WX",       // -tch- drops T, ch → X
      "signed" -> "SNT",     // -gned silent g
      "gnome" -> "NM",       // gn- prefix drop
      "science" -> "SNS",    // sci silent c
      "pneumonia" -> "NMN",  // pn- prefix drop
      "ocean" -> "OSN",      // word-initial vowel kept; ce → S
      "machine" -> "MXN",    // ch → X
      "aggressive" -> "AKRSF", // gg collapses; v → F
      "exciting" -> "EKSSTNK", // x → KS
      "accept" -> "AKSPT")   // cc NOT collapsed
    vectors.foreach { case (w, exp) =>
      assert(Phonetics.metaphoneWord(w) == exp,
        s"'$w': got ${Phonetics.metaphoneWord(w)}, want $exp")
    }
  }

  test("metaphone: multi-word names, non-letters, null safety") {
    assert(Phonetics.metaphone("Acme Power") == "AKM PWR")
    assert(Phonetics.metaphone("St. Clair") == "ST KLR")
    assert(Phonetics.metaphone("O'Brien") == "O BRN")
    assert(Phonetics.metaphone("123") == "")
    assert(Phonetics.metaphone("") == "")
    assert(Phonetics.metaphone(null) == null)
  }

  test("metaphone blocking: variants that share a code, and the misses") {
    val same = Seq(
      "Acme Power" -> "Akme Power",
      "Gulf States" -> "Golf States",
      "Delta Utilities" -> "Deltta Utilitys",
      "Duke Energy" -> "Dook Energy",
      "Tampa Electric" -> "Tempa Electrik",
      "Green Mountain" -> "Greene Mountain",
      "Basin Creek" -> "Bassin Creak",
      "Consolidated Edison" -> "Konsolidated Edison",
      "Pacific Gas" -> "Pasific Gas")
    same.foreach { case (a, b) =>
      assert(Phonetics.metaphone(a) == Phonetics.metaphone(b), s"$a vs $b")
    }
    // metaphone is SHARPER than soundex on these (documented recall
    // difference of the q174 blocking vs q165's): Y-before-vowel is
    // emitted, V≠W, CC≠C
    assert(Phonetics.metaphone("Niagara Mohawk") !=
      Phonetics.metaphone("Nyagara Mohock"))
    assert(Phonetics.metaphone("Midwest Generation") !=
      Phonetics.metaphone("Midvest Generation"))
    assert(Phonetics.metaphone("Peco Energy") !=
      Phonetics.metaphone("Pecco Energy"))
  }

  test("metaphone: randomized engine-vs-twin parity incl. hostile inputs") {
    // deterministic fuzz battery: pure letters, mixed-case, digits,
    // punctuation, unicode separators, long runs, empty-ish strings —
    // the codegen'd expression and the driver twin must agree everywhere,
    // and the output alphabet is pinned to [A-Z0 ]
    val rnd = new scala.util.Random(13)
    val alphabets = Seq(
      "abcdefghijklmnopqrstuvwxyz",
      "abcdeghknpswxy",          // prefix/digraph-heavy
      "aAbB cC-12.!'",           // separators + case
      "gghhtchdgesciy",          // rule-dense
      "éßñ日ab c")               // non-ASCII are separators
    val fuzz = (1 to 400).map { _ =>
      val a = alphabets(rnd.nextInt(alphabets.size))
      (1 to (1 + rnd.nextInt(18))).map(_ => a(rnd.nextInt(a.length))).mkString
    } :+ "" :+ "   " :+ "a" * 200
    val got = fuzz.distinct.toDF("n")
      .select(col("n"), graft.plans.Metaphone(col("n")).as("mp")).collect()
    got.foreach { r =>
      val (n, mp) = (r.getString(0), r.getString(1))
      assert(mp == Phonetics.metaphone(n), s"'$n'")
      assert(mp.forall(c => (c >= 'A' && c <= 'Z') || c == '0' || c == ' '),
        s"'$n' -> '$mp'")
    }
  }

  test("metaphone engine expression matches the driver twin, stays codegen") {
    val names = (battery.filter(_ != null) ++ Seq(
      "Acme Power", "Gulf States", "Niagara Mohawk", "exciting machine",
      "thompson", "where", "xavier")).distinct
    // drive from range() so the projection cannot constant-fold into a
    // LocalTableScan — the codegen assertion must see a real span
    val df = spark.range(names.size)
      .select(element_at(array(names.map(lit): _*),
        col("id").cast("int") + 1).as("n"))
      .select(col("n"), graft.plans.Metaphone(col("n")).as("mp"))
    // null-intolerant native expression inside WholeStageCodegen
    assert(df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }.nonEmpty, df.queryExecution.executedPlan)
    df.collect().foreach { r =>
      assert(r.getString(1) == Phonetics.metaphone(r.getString(0)),
        s"'${r.getString(0)}'")
    }
    val nullRow = Seq((Option.empty[String], 1)).toDF("n", "i")
      .select(graft.plans.Metaphone(col("n"))).collect()
    assert(nullRow.head.isNullAt(0))
  }
}
