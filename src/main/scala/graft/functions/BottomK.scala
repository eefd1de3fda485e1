package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bottom-k (hash, id) pairs per group as a mergeable partial aggregate —
  * the scale-safe engine behind fixed-size per-stratum sampling
  * ([[graft.operators.Sampling.capPerStratum]]).
  *
  * The naive form — `row_number() OVER (PARTITION BY stratum ORDER BY
  * hash)` then `rank <= cap` — ships EVERY row of a stratum to one task
  * and sorts it there; a "language" stratum of a 100 TB corpus is billions
  * of rows through a single sorter for a cap of 30. This aggregator is the
  * same O(k) sorted-array state as [[KmvAgg]] (k-minimum-values), so the
  * heavy lifting happens map-side: each mapper keeps at most `k` pairs per
  * stratum, the shuffle carries ≤ k pairs per (stratum, mapper), and the
  * reducer merges tiny sorted arrays. No stratum-wide sort exists anywhere
  * in the plan — the aggregate shows up as Partial/Final
  * ObjectHashAggregate with map-side combine.
  *
  * Ordering is lexicographic on (hash, id) — identical to `ORDER BY hash
  * ASC, id ASC` — so the selected set and ranks are bit-identical to the
  * window form (spec-proved). Duplicate pairs are kept (row_number
  * semantics), but callers pass unique ids by contract.
  */
class BottomKPairsAgg(k: Int)
    extends Aggregator[(Long, Long), Array[(Long, Long)], Array[(Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
    a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: Array[(Long, Long)] = Array.empty

  override def reduce(b: Array[(Long, Long)], p: (Long, Long)): Array[(Long, Long)] = {
    if (b.length >= k && !lt(p, b(b.length - 1))) return b
    // binary search for insertion point (first element > p; equal keeps
    // insertion after existing copies — stable, row_number-like)
    var lo = 0; var hi = b.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (lt(p, b(mid))) hi = mid else lo = mid + 1
    }
    val outLen = math.min(k, b.length + 1)
    val out = new Array[(Long, Long)](outLen)
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = p
    System.arraycopy(b, lo, out, lo + 1, outLen - lo - 1)
    out
  }

  /** Merge two sorted arrays, truncated to k. */
  override def merge(x: Array[(Long, Long)], y: Array[(Long, Long)]): Array[(Long, Long)] = {
    if (x.isEmpty) return y
    if (y.isEmpty) return x
    val out = new Array[(Long, Long)](math.min(k, x.length + y.length))
    var i = 0; var j = 0; var o = 0
    while (o < out.length) {
      val takeX = j >= y.length || (i < x.length && !lt(y(j), x(i)))
      if (takeX) { out(o) = x(i); i += 1 } else { out(o) = y(j); j += 1 }
      o += 1
    }
    out
  }

  override def finish(b: Array[(Long, Long)]): Array[(Long, Long)] = b

  override def bufferEncoder: Encoder[Array[(Long, Long)]] =
    Encoders.kryo[Array[(Long, Long)]]
  override def outputEncoder: Encoder[Array[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[(Long, Long)]]()
}

object BottomK {
  /** Column form: bottom-k (hash, id) pairs of the group, sorted ascending.
    * `pair` must be a struct<_1: bigint, _2: bigint>. */
  def apply(pair: Column, k: Int): Column = {
    val agg = udaf(new BottomKPairsAgg(k), Encoders.product[(Long, Long)])
    agg(pair)
  }
}
