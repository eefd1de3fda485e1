package graft

import org.apache.spark.sql.functions._

import graft.linkage.Linkage

/** Train→score round-trip for the in-engine pair-match model
  * (`Linkage.trainPairMatcher`, the reference's
  * eia_ferc1_record_linkage.py train step): on a saturated
  * one-binary-feature design the unregularized logistic MLE fits the
  * empirical cell rates exactly, so the trained weights must land on the
  * closed-form log-odds and the trained scores on the cell rates — the
  * identity q158's oracle replays in SQL. */
class LinkageTrainSpec extends SparkSpec {

  private def logit(p: Double): Double = math.log(p / (1 - p))

  // sf0.01: at sf0.001 the close cell holds only 5 pairs and the noisy
  // label rule can saturate it (p=1 → infinite log-odds); the graded
  // scales both have healthy cells
  private val sfTrain = "/root/testdata/sf0.01"

  test("trainPairMatcher recovers the closed-form log-odds on a saturated design") {
    val c = Tables.load(spark, sfTrain, "customer")
      .select(col("c_nationkey").as("nkey"), col("c_custkey"),
        expr("right(regexp_replace(c_name, '[^0-9]', ''), 4)").as("c_last4"))
    val sup = Tables.load(spark, sfTrain, "supplier")
      .select(col("s_nationkey").as("nkey"), col("s_suppkey"),
        expr("right(regexp_replace(s_name, '[^0-9]', ''), 4)").as("s_last4"))
    val cand = Linkage.blockedFuzzyJoin(c, sup, Seq("nkey"), "c_last4",
        "s_last4", maxDist = 2)
      .withColumn("is_close", (col("name_dist") <= 1).cast("double"))
      .withColumn("label",
        when(col("is_close") === 1.0,
            ((col("c_custkey") + col("s_suppkey")) % 4 < 3))
          .otherwise((col("c_custkey") + col("s_suppkey")) % 4 === 0)
          .cast("double"))

    val (w, b) = Linkage.trainPairMatcher(cand, Seq("is_close"), "label")

    // empirical cell rates (the saturated-model fixed point)
    val cells = cand.groupBy("is_close").agg(avg("label").as("p"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    val (p0, p1) = (cells(0.0), cells(1.0))
    assert(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1, s"degenerate cells p0=$p0 p1=$p1")

    // trained weights == closed-form log-odds
    assert(math.abs(b - logit(p0)) < 1e-6, s"intercept $b vs ${logit(p0)}")
    assert(math.abs(w.head - (logit(p1) - logit(p0))) < 1e-6,
      s"weight ${w.head} vs ${logit(p1) - logit(p0)}")

    // trained scores == cell rates (what the oracle replays), through
    // the same plan-time-literal logisticScore path q158 uses
    val scored = cand
      .withColumn("score", Linkage.logisticScore(Seq(col("is_close") -> w.head), b))
      .groupBy("is_close")
      .agg(max(abs(col("score") -
        when(col("is_close") === 1.0, p1).otherwise(p0))).as("err"))
      .collect().map(_.getDouble(1)).max
    // 1e-7 is 5× under the score_micro rounding half-step (5e-7), so
    // LBFGS convergence error can never flip a rounded digit
    assert(scored < 1e-7, s"trained score deviates from cell rate by $scored")
  }
}
