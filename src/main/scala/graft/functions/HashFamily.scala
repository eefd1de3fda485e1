package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded hash family for sketch operators (MinHash, SimHash). Two
  * implementations:
  *
  *   - [[XxHashFamily]] (default): Spark's codegen'd xxhash64 — the scale
  *     path, cheapest per row, engine-private.
  *   - [[PortableHashFamily]]: [[PortableHash]] MD5-prefix — bit-identical
  *     in DuckDB, so sketches built on it are exactly replayable by the
  *     SQL oracle (signatures, band buckets, candidate pairs).
  *
  * The sketch logic is family-agnostic; swapping the family changes only
  * which hash values flow through it.
  */
sealed trait HashFamily {
  /** h_seed(c): one member of the family applied to a string column. */
  def hash(seed: Int, c: Column): Column
  /** Combine several hash columns into one (band→bucket compression). */
  def combine(cols: Seq[Column]): Column
  /** Usable signature width in bits (for SimHash-style bit votes). */
  def bits: Int
  /** Two-phase form for k-member evaluation over the same input (MinHash):
    * `base` digests the string once; `derive(i, base)` yields member i.
    * Splitting lets implementations pay the string hash once per row
    * instead of once per member. */
  def base(c: Column): Column
  def derive(seed: Int, base: Column): Column
  /** Non-negative uniform hash on [0, [[kmvScale]]) — the order-statistic
    * value KMV ranks; the estimator needs the scale to normalize h_k. */
  def kmvValue(c: Column): Column
  def kmvScale: Double
}

object XxHashFamily extends HashFamily {
  def hash(seed: Int, c: Column): Column = xxhash64(lit(seed), c)
  def combine(cols: Seq[Column]): Column = xxhash64(cols: _*)
  def bits: Int = 64
  def base(c: Column): Column = c
  def derive(seed: Int, base: Column): Column = hash(seed, base)
  /** Sign bit masked off (abs() would overflow on Long.MinValue). NULL in
    * → NULL out (xxhash64 alone hashes NULL to the seed, which would
    * smuggle a phantom distinct value into every sketch over a nullable
    * column — the portable family's md5 is already NULL-propagating). */
  def kmvValue(c: Column): Column =
    when(c.isNull, lit(null).cast("long"))
      .otherwise(xxhash64(c).bitwiseAND(lit(Long.MaxValue)))
  def kmvScale: Double = 9.223372036854776e18 // 2^63
}

object PortableHashFamily extends HashFamily {
  /** 2³¹−1 (Mersenne prime) — the affine family's modulus. Products of two
    * <2³¹ operands stay under 2⁶² and never overflow a signed 64-bit int,
    * in Spark or in DuckDB. */
  val P = 2147483647L

  def hash(seed: Int, c: Column): Column = PortableHash.seeded(seed, c)
  def combine(cols: Seq[Column]): Column =
    PortableHash.hex60(concat_ws("_", cols.map(_.cast("string")): _*))
  def bits: Int = 60

  /** One MD5 per row: x = hex60(s) mod P. */
  def base(c: Column): Column = PortableHash.hex60(c) % P

  /** Universal affine member i: (aᵢ·x + bᵢ) mod P with aᵢ,bᵢ derived from
    * the portable hash of the member index — the SQL twin computes the same
    * constants with md5('a_i')/md5('b_i'). */
  def derive(seed: Int, base: Column): Column = {
    val a = PortableHash.hex60(s"a_$seed") % (P - 1) + 1
    val b = PortableHash.hex60(s"b_$seed") % P
    (lit(a) * base + lit(b)) % P
  }

  /** The raw 60-bit MD5 prefix — DuckDB replays it bit-for-bit. */
  def kmvValue(c: Column): Column = PortableHash.hex60(c)
  def kmvScale: Double = 1152921504606846976.0 // 2^60
}
