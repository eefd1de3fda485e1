package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Company-name canonicalization for record linkage — the rule-driven
  * regexp pipeline the reference uses to normalize utility/plant/SEC
  * company names before fuzzy matching
  * (`/root/reference/src/pudl/analysis/record_linkage/name_cleaner.py:16-70`
  * CLEANING_RULES_DICT + DEFAULT_CLEANING_RULES_LIST, :105-400
  * CompanyNameCleaner, and
  * `src/pudl/package_data/settings/us_legal_forms.json` — the US legal-form
  * variant table, public data shipped with the reference).
  *
  * Execution shape: the whole pipeline compiles to a chain of
  * `regexp_replace` Columns — pure per-row, codegen'd, zero shuffle, no
  * UDF — so it rides inside whatever projection uses it at any scale.
  * Patterns are ASCII-classed (`\b`, `\w`, `\s` are ASCII in both Java
  * regex and DuckDB's RE2); the reference's Python `re` is unicode-classed,
  * which differs only on non-ASCII names.
  *
  * Every constant lives here once and [[CompanyNames.sqlChain]] renders the
  * SAME constants as a nested DuckDB `regexp_replace(...)` expression, so
  * the oracle replays the pipeline exactly (q163).
  */
object CompanyNames {

  /** rule name -> (replacement, regex) — name_cleaner.py:16-53 verbatim.
    * A regex that names another rule is an alias for that rule (the
    * reference's "repeat" mechanism). */
  val CleaningRules: Map[String, (String, String)] = Map(
    "remove_email" -> (" ", """\S*@\S*\s?"""),
    "remove_url" -> (" ", """https*\S+"""),
    "remove_word_the_from_the_end" -> ("", """\s+the$"""),
    "remove_word_the_from_the_beginning" -> ("", """^the\s+"""),
    "remove_www_address" -> (" ", """https?://[.\w]{3,}|www.[.\w]{3,}"""),
    "enforce_single_space_between_words" -> (" ", """\s+"""),
    "replace_ampersand_in_spaces_by_AND" -> (" and ", """\s+&\s+"""),
    "replace_ampersand_by_AND" -> (" and ", """\s*&\s*"""),
    "add_space_between_ampersand" -> (" & ", """&"""),
    "add_space_before_opening_parentheses" -> (" (", """\("""),
    "add_space_after_closing_parentheses" -> (") ", """\)"""),
    "replace_hyphen_by_space" -> (" ", """\s*-\s*"""),
    "replace_underscore_by_space" -> (" ", """\s*_\s*"""),
    "remove_all_punctuation" -> (" ", """([^\w\s])"""),
    "remove_punctuation_except_dot" -> (" ", """([^\w\s.])"""),
    "replace_dot_with_nothing" -> ("", """\."""),
    "remove_mentions" -> (" ", """@\S+"""),
    "remove_hashtags" -> (" ", """#\S+"""),
    "remove_numbers" -> (" ", """\w*\d+\w*"""),
    "remove_text_punctuation" -> ("", """\;|\:|\,|\.|\?|\!|"|'"""),
    "remove_text_punctuation_except_dot" -> ("", """\;|\:|\,|\?|\!|"'"""),
    "remove_math_symbols" -> (" ", """\+|\-|\*|\>|\<|\=|\%"""),
    "remove_math_symbols_except_dash" -> (" ", """\+|\*|\>|\<|\=|\%"""),
    "remove_parentheses" -> ("", """\(|\)"""),
    "remove_brackets" -> ("", """\[|\]"""),
    "remove_curly_brackets" -> ("", """\{|\}"""),
    "remove_single_quote_next_character" -> (" ", """'\w+"""),
    "remove_single_quote" -> (" ", """'"""),
    "remove_double_quote" -> (" ", "\""),
    "remove_words_in_parentheses" -> (" ", """\([^()]*\)"""),
    "remove_words_between_slashes" -> (" ", """/.*?/"""),
    "repeat_remove_words_in_parentheses" -> (" ", "remove_words_in_parentheses"))

  /** name_cleaner.py:56-70 — the default rule list. */
  val DefaultRules: Seq[String] = Seq(
    "remove_word_the_from_the_end",
    "remove_word_the_from_the_beginning",
    "replace_ampersand_by_AND",
    "replace_hyphen_by_space",
    "replace_underscore_by_space",
    "remove_all_punctuation",
    "remove_numbers",
    "remove_math_symbols",
    "remove_words_in_parentheses",
    "remove_parentheses",
    "remove_brackets",
    "remove_curly_brackets",
    "enforce_single_space_between_words")

  /** canonical form -> abbreviation variants, in the reference JSON's
    * order (us_legal_forms.json `legal_forms.en`; iteration order is
    * load-bearing — earlier canonicals rewrite the string first). */
  val LegalForms: Seq[(String, Seq[String])] = Seq(
    "registered limited liability limited partnership" ->
      Seq("r.l.l.l.p.", "r.l.l.l.p", "rlllp.", "rlllp"),
    "registered limited liability partnership" ->
      Seq("r.l.l.p.", "r.l.l.p", "rllp.", "rllp"),
    "professional limited liability limited partnership" ->
      Seq("p.l.l.l.p.", "p.l.l.l.p", "plllp.", "plllp"),
    "limited liability limited partnership" ->
      Seq("lllp.", "lllp", "l.l.l.p.", "l.l.l.p"),
    "professional limited liabity partnership" ->
      Seq("p.l.l.p.", "p.l.l.p", "pllp.", "pllp"),
    "professional limited liability company" ->
      Seq("p.l.l.c.", "p.l.l.c", "pllc.", "pllc"),
    "limited liability partnership" ->
      Seq("l.l.p.", "l.l.p", "llp.", "llp"),
    "low-profit limited liability company" ->
      Seq("l3c.", "l3c", "l.3.c.", "l.3.c", "lllc.", "lllc", "l.l.l.c.",
        "l.l.l.c"),
    "limited liability company" ->
      Seq("ltd. liability co.", "ltd. liability co", "ltd liability co.",
        "ltd liability co", "l.l.c.", "l.l.c", "llc.", "llc"),
    "public limited company" ->
      Seq("public lc.", "public lc", "pub. lc.", "pub. lc", "pub lc.",
        "pub lc", "p.l.c.", "p.l.c", "plc.", "plc"),
    "limited partnership" -> Seq("lp.", "lp", "l.p.", "l.p", "lp"),
    "professional corporation" ->
      Seq("prof. corp.", "prof corp.", "prof corp", "pro. corp.",
        "pro corp.", "pro corp", "pc.", "p.c.", "p.c", "pc"),
    "professional association" ->
      Seq("prof. assoc.", "prof assoc.", "prof assoc", "prof. assn.",
        "prof assn.", "prof assn", "pro. assoc.", "pro assoc.", "pro assoc",
        "pro. assn.", "pro assn.", "pro assn", "pa.", "p.a.", "p.a", "pa"),
    "corporation" -> Seq("corp.", "corp"),
    "company" -> Seq("c.o.", "co.", "c.o", "co"),
    "real state investment trust" ->
      Seq("reit.", "reit", "r.e.i.t.", "r.e.i.t"),
    "general partnership" -> Seq("gp.", "g.p.", "gp"),
    "commercial registered agent" -> Seq("c.r.a.", "cra.", "cra"),
    "national trust and savings association" ->
      Seq("nt&sa", "nt & sa", "nt. & sa.", "nt. & sa", "nt & sa."),
    "national association" ->
      Seq("n.a.", "n.a", "n. assoc.", "n. assoc", "n assoc.", "n assoc"),
    "authority" -> Seq("auth.", "auth"),
    "foundation" -> Seq("fdn.", "fdn", "f.d.n.", "f.d.n"),
    "cooperative" -> Seq("co-op.", "co-op", "coop.", "coop"),
    "association" -> Seq("assoc.", "assoc", "assn.", "assn"),
    "basin irrigation district" ->
      Seq("basin irr district", "basin irr. dist", "basin irr dist.",
        "basin irr. dist.", "basin irr dist"),
    "limited" ->
      Seq("limited.", "limit", "ltd.", "ltd", "l.t.d.", "l.t.d", "lt.", "lt"),
    "unlimited" -> Seq("ultd.", "unltd", "ult.", "ult"),
    "incorporated" -> Seq("inc.", "inc", "incorp.", "incorp"),
    "district" -> Seq("dist.", "dist"),
    "commission" -> Seq("comm.", "comm"))

  sealed trait LegalTermMode
  /** Rewrite abbreviations to the canonical long form (the default). */
  case object Normalize extends LegalTermMode
  /** Strip legal terms entirely (SEC subsidiary-name screening). */
  case object Remove extends LegalTermMode
  case object Leave extends LegalTermMode

  /** One (replacement, pattern) step. The rendering order is THE contract:
    * [[steps]] computes it once and both the Spark column and the oracle
    * SQL fold over the same list. */
  final case class Step(replacement: String, pattern: String)

  private def resolve(rule: String): (String, String) = {
    val (rep, rx) = CleaningRules(rule)
    // a rule whose regex names another rule is an alias for that rule
    CleaningRules.get(rx).getOrElse((rep, rx))
  }

  /** Variant pattern exactly as the reference builds it
    * (name_cleaner.py:268-283): dotted abbreviations match literally with
    * dots escaped; plain-letter terms are word-bounded; `$` pins the term
    * to the string end when `atEnd`. */
  private def termPattern(term: String, atEnd: Boolean): String = {
    val base =
      if (term.contains(".")) term.replace(".", """\.""")
      else "\\b" + term + "\\b"
    if (atEnd) base + "$" else base
  }

  private def reEscape(s: String): String =
    s.flatMap(ch =>
      if (ch.isLetterOrDigit || ch == ' ' || ch == '_') ch.toString
      else "\\" + ch)

  /** The full replace chain for a configuration. Shared by [[clean]] and
    * [[sqlChain]] so engine and oracle can never drift. */
  def steps(rules: Seq[String], legalTerms: LegalTermMode,
            legalTermsAtEnd: Boolean): Seq[Step] = {
    val ruleSteps = rules.map { r =>
      val (rep, rx) = resolve(r); Step(rep, rx)
    }
    // get_clean_data re-enforces single spaces right after the rule list
    val spaced = ruleSteps :+ Step(" ", """\s+""")
    // both legal-term handlers strip() on entry (name_cleaner.py:265,303) —
    // without this an end-anchored term never matches a trailing space
    val strip = Step("", """^\s+|\s+$""")
    val legal = legalTerms match {
      case Normalize =>
        strip +: LegalForms.flatMap { case (canonical, variants) =>
          variants.map(v =>
            Step(" " + canonical + " ", termPattern(v, legalTermsAtEnd)))
        }
      case Remove =>
        // reference order: all canonical keys first, then per-key variants
        // (each followed by its key again) — name_cleaner.py:297-300
        val all = LegalForms.map(_._1) ++
          LegalForms.flatMap { case (c, vs) => vs :+ c }
        Seq(strip,
          Step("", "\\b(?:" + all.map(reEscape).mkString("|") + ")\\b"))
      case Leave => Nil
    }
    spaced ++ legal
  }

  private val StripStep = Step("", """^\s+|\s+$""")
  private val CollapseStep = Step(" ", """\s+""")

  private def chain(c: Column, ss: Seq[Step]): Column =
    graft.plans.RegexReplaceChain(c, ss.map(s => (s.pattern, s.replacement)))

  /** Clean a name column: trim+lower, apply the rule chain, handle legal
    * terms, collapse whitespace. Pure per-row expression — no UDF. The
    * ~150 regex steps run as ONE native [[graft.plans.RegexReplaceChain]]
    * pass (precompiled patterns, one string conversion per row) instead
    * of ~150 folded `regexp_replace` nodes — same replaceAll semantics,
    * pinned by the reference battery and the q163 oracle. */
  def clean(c: Column, rules: Seq[String] = DefaultRules,
            legalTerms: LegalTermMode = Normalize,
            legalTermsAtEnd: Boolean = true): Column = {
    val body = StripStep +: steps(rules, legalTerms, legalTermsAtEnd)
    legalTerms match {
      case Remove =>
        // strip() then strip(".,!?()':;[]* \n\t") — name_cleaner.py:300-310
        // — the char-set trim is not a regex step, so Remove mode pays a
        // second (2-step) chain for the final strip + collapse
        chain(trim(chain(lower(c), body :+ StripStep), ".,!?()':;[]* \n\t"),
          Seq(StripStep, CollapseStep))
      case _ =>
        chain(lower(c), body ++ Seq(StripStep, CollapseStep))
    }
  }

  // ---- oracle twin -------------------------------------------------------

  private def sqlQuote(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Render the SAME chain as a DuckDB expression over `inner` — the
    * oracle-side twin of [[clean]]. The ~130-step chain exceeds DuckDB's
    * 128-deep binder recursion as nested calls, so the steps fold through
    * `list_reduce` over "pattern\u0001replacement" strings instead — one
    * flat list literal, depth ~4. DuckDB needs the 'g' flag for
    * replace-all (Java's replaceAll is all-occurrences). */
  def sqlChain(inner: String, rules: Seq[String] = DefaultRules,
               legalTerms: LegalTermMode = Normalize,
               legalTermsAtEnd: Boolean = true): String = {
    val lowered = s"lower(regexp_replace($inner, '^\\s+|\\s+$$', '', 'g'))"
    val pairs = steps(rules, legalTerms, legalTermsAtEnd)
      .map(s => sqlQuote(s.pattern + "\u0001" + s.replacement))
      .mkString(", ")
    val chained =
      s"""list_reduce(list_prepend($lowered, [$pairs]),
         | (acc, s) -> regexp_replace(acc, string_split(s, chr(1))[1],
         |                            string_split(s, chr(1))[2], 'g'))"""
        .stripMargin.replace("\n", "")
    val postLegal = legalTerms match {
      case Remove =>
        s"trim(regexp_replace($chained, '^\\s+|\\s+$$', '', 'g'), " +
          sqlQuote(".,!?()':;[]* \n\t") + ")"
      case _ => chained
    }
    s"regexp_replace(regexp_replace($postLegal, '^\\s+|\\s+$$', '', 'g'), '\\s+', ' ', 'g')"
  }
}
