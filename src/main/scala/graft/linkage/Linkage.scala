package graft.linkage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Record-linkage kit (SURVEY §2.11): TF-IDF term weighting, blocked fuzzy
  * joins, and pairwise match scoring — the Spark-first re-expression of the
  * reference's embed_dataframe / eia_ferc1_record_linkage surface.
  *
  * Scale design: candidate pairs are always *blocked* (equi-join on a
  * blocking key) — the all-pairs product never materializes. TF-IDF is two
  * hash aggregations; document count comes from an unpartitioned window
  * (computed map-side, no collect).
  */
object Linkage {

  /** Per-document TF-IDF terms: tf, df, idf = ln(N/df), score = tf·idf.
    * Reference: TextVectorizer
    * (`/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:196-208`). */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(n)
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
      .withColumn("score", col("tf") * col("idf"))
  }

  /** Top TF-IDF term per document. Ranking uses the integer pair
    * (tf desc, df asc, term asc) — same order as tf·ln(N/df) for fixed N but
    * exact, so it reproduces bit-identically on any engine. */
  def tfidfTopTerm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = tfidf(df, idCol, textCol)
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .where(col("rk") === 1)
      .select(col(idCol), col("term").as("top_term"), col("tf"), col("df"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Blocked fuzzy join: equi-join on `blockKeys`, keep pairs with
    * levenshtein(leftText, rightText) <= maxDist. Reference:
    * StringSimilarityScorer over blocked candidates
    * (`/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:356-500`). */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame, blockKeys: Seq[String],
                       leftText: String, rightText: String,
                       maxDist: Int): DataFrame =
    left.join(right, blockKeys)
      .withColumn("name_dist", levenshtein(col(leftText), col(rightText)))
      .where(col("name_dist") <= maxDist)

  /** Logistic match score over fixed-weight features — the shape of the
    * reference's pair-match model
    * (`/root/reference/src/pudl/analysis/record_linkage/eia_ferc1_record_linkage.py:137-393`)
    * with deterministic literal weights (training lives in MLlib's
    * LogisticRegression when labels exist). */
  def logisticScore(features: Seq[(Column, Double)], bias: Double): Column = {
    val z = features.map { case (f, w) => f * w }.reduce(_ + _) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }
}
