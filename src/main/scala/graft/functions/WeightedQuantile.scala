package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Weighted quantile as a typed `Aggregator` (SURVEY §2.15 custom agg #2).
  * Reference: `weighted_quantile` (`/root/reference/src/pudl/validate/quality.py:67-110`).
  *
  * Semantics: the smallest value v whose cumulative weight (values sorted
  * ascending, ties pooled) reaches q·W, with q = num/den compared in exact
  * arithmetic when weights are integral — deterministic across engines and
  * partitionings (no interpolation, no float thresholds).
  *
  * Buffer is the collected (value, weight) pairs — groups in the reference's
  * use are bounded (per-entity distributions); for unbounded groups compose
  * with a pre-aggregation on value.
  */
class WeightedQuantileAgg(num: Long, den: Long)
    extends Aggregator[(Double, Double), Seq[(Double, Double)], Double] {

  override def zero: Seq[(Double, Double)] = Seq.empty

  override def reduce(b: Seq[(Double, Double)], a: (Double, Double)): Seq[(Double, Double)] =
    if (a._1.isNaN || a._2.isNaN) b else b :+ a

  override def merge(x: Seq[(Double, Double)], y: Seq[(Double, Double)]): Seq[(Double, Double)] =
    x ++ y

  /** NaN for empty groups (groupBy never produces one). */
  override def finish(pairs: Seq[(Double, Double)]): Double = {
    if (pairs.isEmpty) return Double.NaN
    val sorted = pairs.sortBy(_._1).toIndexedSeq
    val total = sorted.iterator.map(_._2).sum
    var cum = 0.0
    var i = 0
    // cum/total >= num/den  <=>  cum*den >= num*total (weights >= 0)
    while (i < sorted.length - 1 && { cum += sorted(i)._2; cum * den < num * total })
      i += 1
    sorted(i)._1
  }

  // native product-array encoder, not Encoders.kryo — the buffer crosses
  // the partial/final boundary per group per mapper, and the struct-array
  // form shuffles as columnar unsafe rows instead of opaque blobs (also
  // drops the Kryo reflective-access runtime dependency)
  override def bufferEncoder: Encoder[Seq[(Double, Double)]] =
    org.apache.spark.sql.catalyst.encoders
      .ExpressionEncoder[Seq[(Double, Double)]]()
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

object WeightedQuantile {
  /** Column form: weightedQuantile(value, weight, num/den). */
  def apply(value: Column, weight: Column, num: Long, den: Long): Column = {
    val agg = udaf(new WeightedQuantileAgg(num, den),
      Encoders.product[(Double, Double)])
    agg(value, weight)
  }
}
