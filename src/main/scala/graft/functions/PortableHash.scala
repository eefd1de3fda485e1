package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** A 60-bit hash with bit-identical implementations in Spark, DuckDB and
  * plain JVM code: the first 15 hex digits of the MD5 of the UTF-8 string.
  *
  *   Spark  : conv(substring(md5(x), 1, 15), 16, 10)::long
  *   DuckDB : ('0x' || substr(md5(x), 1, 15))::BIGINT
  *   JVM    : MessageDigest MD5 → hex prefix → parseLong(…, 16)
  *
  * Purpose: sketch operators (MinHash, SimHash, random-hyperplane signs)
  * are usually "non-SQL-expressible" only because their hash family is
  * engine-private (xxhash64 has no DuckDB twin). Swapping the family for
  * this portable one makes the whole sketch — signatures, banding, candidate
  * pairs — replayable by the DuckDB oracle, turning rows-only checks into
  * exact hash-equality checks. 60 bits keeps the value positive in a signed
  * 64-bit integer on every engine.
  *
  * The default paths keep xxhash64 (codegen, no MD5 cost); the portable
  * family is opt-in where verifiability is worth ~2× hash cost.
  */
object PortableHash {

  /** Column form: 60-bit MD5-prefix hash of the string column — the
    * native [[graft.plans.Md5Prefix60]] expression (bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)::long`, pinned by a
    * PropertySpec equivalence test, without the hex/substring/conv
    * allocations per call). */
  def hex60(c: Column): Column =
    graft.plans.Md5Prefix60(c.cast("string"))

  /** Seeded family: h_i(x) = hex60(s"${i}_$x") — the seed is mixed into the
    * hashed bytes, so families are independent and the SQL twin is a plain
    * string concat. */
  def seeded(seed: Int, c: Column): Column =
    hex60(concat(lit(s"${seed}_"), c.cast("string")))

  /** Driver-side twin (for plan-time constants like sign matrices). */
  def hex60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val hex = d.map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def seeded(seed: Int, s: String): Long = hex60(s"${seed}_$s")
}
