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
}

object XxHashFamily extends HashFamily {
  def hash(seed: Int, c: Column): Column = xxhash64(lit(seed), c)
  def combine(cols: Seq[Column]): Column = xxhash64(cols: _*)
  def bits: Int = 64
}

object PortableHashFamily extends HashFamily {
  def hash(seed: Int, c: Column): Column = PortableHash.seeded(seed, c)
  def combine(cols: Seq[Column]): Column =
    PortableHash.hex60(concat_ws("_", cols.map(_.cast("string")): _*))
  def bits: Int = 60
}
