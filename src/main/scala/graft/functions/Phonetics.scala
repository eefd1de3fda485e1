package graft.functions

/** Phonetic blocking keys for record linkage.
  *
  * The reference blocks its FERC↔EIA splink model on phonetic-code
  * prefixes of plant/utility names (`jellyfish.metaphone` →
  * `substr(plant_name_mphone, 1, 3)`;
  * `/root/reference/src/pudl/analysis/record_linkage/
  * eia_ferc1_record_linkage.py:182-193` and the blocking rules in
  * `eia_ferc1_model_config.py:12-15`). The Spark-first twin uses the
  * engine-native `functions.soundex` (codegen'd, zero custom code in the
  * hot path) for the same role: a coarse phonetic equivalence class whose
  * prefix makes a blocking key. Spelling variants of a company name land
  * in one block; the candidate pairs then score with Jaro-Winkler exactly
  * as the reference's comparison levels do (q165).
  *
  * This object carries the two twins of Spark's soundex needed for
  * verification: a driver-side Scala port (spec cross-check, probed
  * against the engine) and a DuckDB SQL rendering (oracle replay —
  * DuckDB ships no phonetic function, so the fold below recomputes the
  * code char-by-char with `list_reduce`, the q163 discipline).
  *
  * Spark's soundex semantics (probed, PhoneticsSpec): classic American
  * Soundex where H/W are skipped without separating duplicates, vowels
  * and Y reset the duplicate window, any NON-letter also resets, the
  * output is (first letter upper + 3 digits, zero-padded), and a string
  * whose first character is not an ASCII letter returns unchanged.
  */
object Phonetics {

  /** A..Z → digit ('0' = vowel-ish reset, '7' = H/W skip). */
  private val Map26 = "01230127022455012623017202"

  /** Driver-side twin of Spark's `soundex` (UTF8String.soundex). */
  def soundex(s: String): String = {
    if (s == null || s.isEmpty) return s
    val up = s.toUpperCase
    val c0 = up.charAt(0)
    if (c0 < 'A' || c0 > 'Z') return s
    val out = new StringBuilder(4).append(c0)
    var last = Map26(c0 - 'A')
    var i = 1
    while (i < up.length && out.length < 4) {
      val ch = up.charAt(i)
      if (ch >= 'A' && ch <= 'Z') {
        val code = Map26(ch - 'A')
        if (code == '7') () // H/W: skip, duplicate window stays open
        else if (code == '0') last = '0' // vowel/Y reset
        else if (code != last) { out.append(code); last = code }
      } else last = '0' // non-letter resets like a vowel
      i += 1
    }
    while (out.length < 4) out.append('0')
    out.toString
  }

  /** DuckDB rendering of the same algorithm over the expression `inner` —
    * a `list_reduce` over the characters carrying "output|lastCode" as
    * the fold state. NULL in → NULL out (the fold propagates). */
  def soundexSql(inner: String): String = {
    val m = s"'$Map26'"
    // code of an uppercase char: map[ascii(ch) - 64], 1-based substr
    def code(ch: String) = s"substr($m, ascii($ch) - 64, 1)"
    val first = s"upper(substr($inner, 1, 1))"
    val init = s"$first || '|' || ${code(first)}"
    val chars =
      s"list_transform(range(2, len($inner) + 1), i -> substr(upper($inner), i, 1))"
    val out = "string_split(acc, '|')[1]"
    val last = "string_split(acc, '|')[2]"
    val step =
      s"""CASE
         | WHEN ch NOT BETWEEN 'A' AND 'Z' THEN $out || '|0'
         | WHEN ${code("ch")} = '7' THEN acc
         | WHEN ${code("ch")} = '0' THEN $out || '|0'
         | WHEN ${code("ch")} = $last THEN acc
         | WHEN len($out) >= 4 THEN $out || '|' || ${code("ch")}
         | ELSE $out || ${code("ch")} || '|' || ${code("ch")}
         |END""".stripMargin.replace("\n", "")
    s"""CASE
       | WHEN $inner IS NULL THEN NULL
       | WHEN NOT regexp_matches($inner, '^[A-Za-z]') THEN $inner
       | ELSE rpad(string_split(list_reduce(list_prepend($init, $chars),
       |   (acc, ch) -> $step), '|')[1], 4, '0')
       |END""".stripMargin.replace("\n", "")
  }
}
