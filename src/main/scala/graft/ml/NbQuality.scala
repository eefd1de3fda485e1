package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-engine TRAINED quality classifier for corpus curation — the
  * fastText/CCNet-style "quality filter" every large pretraining pipeline
  * runs (positive seed = target-domain documents, negative = raw crawl),
  * expressed as multinomial Naive Bayes log-odds so training is
  * closed-form arithmetic over token counts: no iterative optimizer, one
  * shuffle, and the whole thing replays exactly in the DuckDB oracle.
  *
  * Float discipline (the q126 precedent): every `ln` is rounded to an
  * integer NANO (1e9) before any sum, so per-doc scores are integer sums —
  * summation-order-proof across partitionings and engines.
  *
  * Scale shape:
  *  - train: explode(seed tokens) → groupBy(token) — ONE shuffle with
  *    map-side combine; the (token, w_nano) table is vocab-bounded and the
  *    corpus totals ride in as a broadcast 1-row cross join (never a
  *    collect).
  *  - score: explode(corpus tokens) → broadcast-join weights → groupBy(id).
  *    A document's tokens never leave their source partition, so partial
  *    aggregation collapses each doc to one row BEFORE the exchange —
  *    shuffle volume is one row per document, not one per token.
  *  - A 100 TB crawl with an unbounded vocabulary swaps exact tokens for
  *    hashed feature buckets (the DSIR path, [[graft.ml.Dsir]]) — same
  *    algebra, weights table bounded at 2^k rows by construction.
  */
object NbQuality {

  /** `round(ln(c + α) / (n + α·v)) · 1e9)` as a long — both engines build
    * the identical IEEE double ratio, take `ln`, and round once. */
  private def lnNano(c: Column, n: Column, v: Column, alpha: Double): Column =
    round(log((c + lit(alpha)) / (n + lit(alpha) * v)) * lit(1e9)).cast("long")

  /** Multinomial NB log-odds token weights from a labeled seed set.
    *
    * @param seed      labeled documents
    * @param tokensCol array<string> token column
    * @param posCol    boolean label (true = positive / target class)
    * @param alpha     Laplace smoothing (add-α on counts, add-α·V on totals)
    * @return (token: string, w_nano: long) — w = ln P(t|pos) − ln P(t|neg),
    *         each term pre-rounded to nanos
    */
  def trainLogOdds(seed: DataFrame, tokensCol: Column, posCol: Column,
                   alpha: Double = 0.5): DataFrame = {
    val tok = seed.select(posCol.as("pos"), explode(tokensCol).as("token"))
    val cnt = tok.groupBy("token").agg(
      sum(when(col("pos"), 1L).otherwise(0L)).as("c_pos"),
      sum(when(col("pos"), 0L).otherwise(1L)).as("c_neg"))
    val tot = cnt.agg(sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
      count(lit(1)).as("v"))
    cnt.crossJoin(broadcast(tot))
      .select(col("token"),
        (lnNano(col("c_pos"), col("n_pos"), col("v"), alpha) -
          lnNano(col("c_neg"), col("n_neg"), col("v"), alpha)).as("w_nano"))
  }

  /** Class-prior log-odds `ln(n_pos_docs / n_neg_docs)` in nanos, as a
    * broadcastable 1-row frame (column `prior_nano`). */
  def priorNano(seed: DataFrame, posCol: Column): DataFrame =
    seed.agg(round(log(
        sum(when(posCol, 1L).otherwise(0L)).cast("double") /
          sum(when(posCol, 0L).otherwise(1L))) * lit(1e9))
      .cast("long").as("prior_nano"))

  /** Score a corpus against trained weights. Unseen tokens contribute 0
    * (they cancel in the log-odds under symmetric smoothing — the standard
    * NB treatment, and what keeps the weights table vocab-of-seed-sized).
    *
    * @return (idCol, n_toks: long, score_raw_nano: long) — caller adds the
    *         prior and thresholds
    */
  def score(corpus: DataFrame, idCol: String, tokensCol: Column,
            weights: DataFrame): DataFrame =
    corpus.select(col(idCol), explode(tokensCol).as("token"))
      .join(broadcast(weights), Seq("token"), "left")
      .groupBy(idCol).agg(
        count(lit(1)).as("n_toks"),
        sum(coalesce(col("w_nano"), lit(0L))).as("score_raw_nano"))
}
