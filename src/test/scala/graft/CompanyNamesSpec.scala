package graft

import org.apache.spark.sql.functions._
import graft.functions.CompanyNames

/** Fidelity battery for the company-name cleaner: expected values probed
  * from the reference implementation (CompanyNameCleaner,
  * `/root/reference/src/pudl/analysis/record_linkage/name_cleaner.py`)
  * run on the same inputs — default config (default rule list + legal-term
  * NORMALIZE at end) and the SEC subsidiary screen config (no rules +
  * legal-term REMOVE anywhere). */
class CompanyNamesSpec extends SparkSpec {
  import spark.implicits._

  private val battery: Seq[(String, String, String)] = Seq(
    // (raw, expected normalize-default, expected remove-mode)
    ("The Acme Power & Light Co.",
      "acme power and light company", "the acme power & light"),
    ("Basin-Creek Energy (Holdings) LLC",
      "basin creek energy holdings limited liability company",
      "basin-creek energy (holdings"),
    ("delta_utilities l.l.c.",
      // remove_all_punctuation runs BEFORE legal terms, so dotted
      // abbreviations lose their dots and no longer match any variant —
      // reference behavior, reproduced exactly
      "delta utilities l l c", "delta_utilities"),
    ("Gulf States Util. Inc", "gulf states util incorporated",
      "gulf states util"),
    ("PECO ENERGY COMPANY", "peco energy company", "peco energy"),
    ("Duke Energy Corp", "duke energy corporation", "duke energy"),
    ("Green Mtn. Power CORP.", "green mtn power corporation",
      "green mtn. power"),
    ("Niagara Mohawk Power pub lc",
      "niagara mohawk power public limited company",
      "niagara mohawk power"),
    ("Tampa Electric-Company the", "tampa electric company",
      "tampa electric- the"),
    ("Midwest Gen. EME, LLC", "midwest gen eme limited liability company",
      "midwest gen. eme"),
    ("AEP Texas N.A.", "aep texas n a", "aep texas"),
    ("Big Rivers Electric 2000 Corp.", "big rivers electric corporation",
      "big rivers electric 2000"),
    ("  spaced   out   utility   ltd  ", "spaced out utility limited",
      "spaced out utility"),
    ("Consol. Edison co", "consol edison company", "consol. edison"),
    ("Pacific G&E assn.", "pacific g and e association", "pacific g&e"))

  test("clean matches the reference on the probe battery (both modes)") {
    val df = battery.map(_._1).toDF("raw")
      .select(col("raw"),
        CompanyNames.clean(col("raw")).as("norm"),
        CompanyNames.clean(col("raw"), rules = Nil,
          legalTerms = CompanyNames.Remove).as("bare"))
    val got = df.collect().map(r =>
      r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    battery.foreach { case (raw, expNorm, expBare) =>
      assert(got(raw)._1 == expNorm, s"normalize($raw)")
      assert(got(raw)._2 == expBare, s"remove($raw)")
    }
  }

  test("clean is null-safe and zero-shuffle") {
    val df = Seq(Some("Foo Power llc"), None).toDF("raw")
      .select(CompanyNames.clean(col("raw")).as("c"))
    val rows = df.collect()
    assert(rows.map(r => Option(r.getString(0))).toSet ==
      Set(Some("foo power limited liability company"), None))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sqlChain replays the engine exactly in DuckDB-free parity form") {
    // structural parity: one \u0001-delimited (pattern, replacement) list
    // element per engine step, folded by ONE list_reduce (nested calls
    // would exceed DuckDB's 128-deep binder recursion)
    val nSteps = CompanyNames.steps(CompanyNames.DefaultRules,
      CompanyNames.Normalize, legalTermsAtEnd = true).size
    val sql = CompanyNames.sqlChain("raw_name")
    assert(sql.contains("list_reduce"))
    assert(sql.count(_ == '\u0001') == nSteps)
    // value-level parity is pinned by the q163 oracle (check_oracle.py)
  }
}
