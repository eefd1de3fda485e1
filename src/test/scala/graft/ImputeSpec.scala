package graft

import org.apache.spark.sql.functions._
import graft.impute.MatrixCompletion

class ImputeSpec extends SparkSpec {
  import spark.implicits._

  test("imputeByGroup recovers a low-rank matrix with planted gaps") {
    // rank-2 matrix: m[i,j] = a_i*b_j + c_i*d_j
    val n = 30
    val cells = for {
      i <- 0 until n; j <- 0 until n
    } yield {
      val truth = (i + 1) * (j + 1) * 0.1 + math.sin(i) * math.cos(j)
      val missing = (i * 31 + j * 17) % 10 == 0 // ~10% deterministic gaps
      MatrixCompletion.Cell("g1", i, j, if (missing) None else Some(truth))
    }
    val ds = spark.createDataset(cells)
    val out = MatrixCompletion.imputeByGroup(spark, ds, rank = 2, iters = 300)
    val imputed = out.filter(_.was_missing).collect()
    assert(imputed.nonEmpty)
    val truthMap = cells.map(c => (c.row, c.col) ->
      ((c.row + 1) * (c.col + 1) * 0.1 + math.sin(c.row) * math.cos(c.col))).toMap
    // WMAPE: near-zero truth cells would inflate plain MAPE
    val errs = imputed.map { c =>
      val t = truthMap((c.row, c.col))
      (math.abs(c.value - t), math.abs(t))
    }
    val wmape = errs.map(_._1).sum / errs.map(_._2).sum
    assert(wmape < 0.05, s"WMAPE $wmape too high")
  }

  test("TubalCompletion recovers a low-tubal-rank tensor with planted gaps") {
    import graft.impute.TubalCompletion
    // tubal-rank-2 tensor: every period slice is a rank-2 combination whose
    // coefficients vary smoothly (sinusoidally) across periods
    val (nR, nC, nS) = (12, 10, 16)
    val cells = for {
      i <- 0 until nR; j <- 0 until nC; s <- 0 until nS
    } yield {
      val w = 2 * math.Pi * s / nS
      val truth = (i + 1) * (j + 1) * 0.05 * (2.0 + math.cos(w)) +
        math.sin(i + 1) * math.cos(j + 1) * math.sin(w + 0.5)
      val missing = (i * 131 + j * 37 + s * 11) % 12 == 0 // ~8% gaps
      TubalCompletion.Cell3("g1", i, j, s, if (missing) None else Some(truth))
    }
    val ds = spark.createDataset(cells)
    val out = TubalCompletion.imputeByGroup(spark, ds, rank = 2, iters = 3000, tol = 1e-10)
    val imputed = out.filter(_.was_missing).collect()
    assert(imputed.nonEmpty)
    def truthOf(i: Int, j: Int, s: Int): Double = {
      val w = 2 * math.Pi * s / nS
      (i + 1) * (j + 1) * 0.05 * (2.0 + math.cos(w)) +
        math.sin(i + 1) * math.cos(j + 1) * math.sin(w + 0.5)
    }
    val errs = imputed.map { c =>
      val t = truthOf(c.row, c.col, c.slice)
      (math.abs(c.value - t), math.abs(t))
    }
    val wmape = errs.map(_._1).sum / errs.map(_._2).sum
    assert(wmape < 0.05, s"tubal WMAPE $wmape too high")
  }

  test("TubalCompletion AR penalty improves WMAPE on AR-structured tubes") {
    import graft.impute.TubalCompletion
    // AR(1)-structured tubes: v[i,j,s] = c_ij * 0.92^s — an exponential
    // decay is NOT band-limited, so pure tubal truncation ripples; the
    // autoregressive blend should recover the lag structure
    val (nR, nC, nS) = (8, 6, 24)
    def truthOf(i: Int, j: Int, s: Int): Double =
      (i + 1) * (j + 1) * 0.1 * math.pow(0.92, s)
    val cells = for {
      i <- 0 until nR; j <- 0 until nC; s <- 0 until nS
    } yield {
      val missing = s >= 2 && (i * 131 + j * 37 + s * 11) % 10 == 0 // ~10%
      TubalCompletion.Cell3("g1", i, j, s,
        if (missing) None else Some(truthOf(i, j, s)))
    }
    def wmapeOf(arLambda: Double): Double = {
      val out = TubalCompletion.imputeByGroup(spark,
        spark.createDataset(cells), rank = 2, iters = 300, tol = 1e-9,
        arLambda = arLambda, arLags = Seq(1))
      val errs = out.filter(_.was_missing).collect().map { c =>
        (math.abs(c.value - truthOf(c.row, c.col, c.slice)),
          math.abs(truthOf(c.row, c.col, c.slice)))
      }
      errs.map(_._1).sum / errs.map(_._2).sum
    }
    val (plain, ar) = (wmapeOf(0.0), wmapeOf(4.0))
    assert(ar <= plain + 1e-9,
      s"AR penalty must not hurt on AR-structured data: ar=$ar plain=$plain")
    assert(ar < 0.05, s"AR-path WMAPE $ar too high")
  }

  test("imputeDf fills event-value gaps per event_type") {
    val events = Tables.load(spark, sf, "events")
      .withColumn("day", dayofyear(col("ts")))
      .withColumn("hod", hour(col("ts")))
      .groupBy(col("event_type"), col("day"), col("hod"))
      .agg(avg(col("value")).as("v"))
      .withColumn("v", when(col("day") % 11 === 0, lit(null)).otherwise(col("v")))
    val out = MatrixCompletion.imputeDf(events, "event_type", "day", "hod",
      "v", rank = 3, iters = 5)
    assert(out.where(col("was_missing")).count() > 0)
    assert(out.where(col("value").isNull).count() == 0)
  }

  test("simulateNullRuns plants runs of exactly runLen per period, hashed phase") {
    import spark.implicits._
    import graft.impute.ImputationEval
    val df = (1 to 340).map(i => ((i % 4).toLong, i.toLong, i * 0.25))
      .toDF("k", "ord", "value")
    val out = ImputationEval.simulateNullRuns(df, "k",
      Seq(col("ord")), "value", period = 17, runLen = 3, seed = "t")
    // per key: 85 positions = 5 full periods -> exactly 15 planted
    val perKey = out.where(col("planted")).groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perKey.values.toSet === Set(15L))
    // planted rows have v null, unplanted keep the value
    assert(out.where(col("planted") && col("v").isNotNull).count() === 0)
    assert(out.where(!col("planted") &&
      (col("v").isNull || col("v") =!= col("value"))).count() === 0)
    // runs are contiguous length-3: within a key, planted positions mod 17
    // take exactly 3 consecutive residues
    val res = out.where(col("planted") && col("k") === 0)
      .select(pmod(col("rn") - 1, lit(17)).cast("int")).distinct()
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(res.size === 3 &&
      (res(2) - res(0) == 2 || res.toSet.subsetOf(Set(0, 1, 15, 16))),
      s"residues $res")
  }

  test("evalWithImputer: plumbing is exact — a perfect imputer scores zero") {
    import spark.implicits._
    import graft.impute.ImputationEval
    val df = (1 to 170).map(i => ((i % 2).toLong, i.toLong, (i % 7) * 1.5))
      .toDF("k", "ord", "truth")
    // the "imputer" reads the held-back truth straight off the gapped
    // frame: any nonzero score would be a harness bug (join key drift,
    // planted-row mislabeling), not an imputation error
    val scored = ImputationEval.evalWithImputer(df, "k", Seq(col("ord")),
      Seq("k", "ord"), "truth", period = 17, runLen = 3, seed = "t")(
      gapped => gapped.select(col("k"), col("ord"),
        col("truth").as("imputed")), "imputed")
    val rows = scored.collect()
    assert(rows.length === 2)
    assert(rows.forall(r => r.getLong(r.fieldIndex("abs_err_hc")) == 0L))
    // 85 positions per key = 5 full periods -> 15 planted per key
    assert(rows.forall(r => r.getLong(r.fieldIndex("n_planted")) == 15L))
    val (n, err, _, nano) = ImputationEval.overallWmape(scored)
    assert(n === 30L && err === 0L && nano === 0L)
  }

  test("latc/tubal eval harness: recorded WMAPE stays under the gate") {
    import graft.impute.ImputationEval
    // The per-round regression gate for the no_oracle imputer lanes
    // (LATC-TNN q61, tubal q81): Bench records these same numbers in
    // bench_full.json; this spec pins them so a quality regression fails
    // the suite even between bench runs. Thresholds are the measured
    // fixture values + ~25% headroom, not quality targets.
    val events = Tables.load(spark, sf, "events")
    val (_, _, _, latc) = ImputationEval.overallWmape(
      ImputationEval.latcEvalOnEvents(events))
    info(s"latc wmape_nano = $latc")
    assert(latc > 0L && latc < 2000000000L, s"latc wmape_nano $latc")
    val (_, _, _, tubal) = ImputationEval.overallWmape(
      ImputationEval.tubalEvalOnEvents(events))
    info(s"tubal wmape_nano = $tubal")
    assert(tubal > 0L && tubal < 2000000000L, s"tubal wmape_nano $tubal")
    // Comparative gate on a STRUCTURED grid: the raw fixture grid is
    // hour-level noise (no low-rank structure — LATC legitimately loses
    // to the median there, measured 0.93 vs 0.65), so the quality gate
    // plants a dominant rank-1 signal + 5% fixture noise and requires
    // the iterative imputer to beat the naive per-series median on the
    // SAME grid and the SAME gaps. Catches the regression class where
    // the SVT loop silently degrades to its initialization.
    // shared construction (ImputationEval.structuredGridCells /
    // latcGridWmapeNano / medianGridWmapeNano): the same numbers Bench
    // records per round as latc_grid_wmape_nano / median_grid_wmape_nano,
    // so this floor and the recorded artifact cannot drift
    val latcStructured = ImputationEval.latcGridWmapeNano(events)
    val naiveStructured = ImputationEval.medianGridWmapeNano(events)
    info(s"structured: latc = $latcStructured, naive median = $naiveStructured")
    assert(latcStructured < naiveStructured,
      s"LATC ($latcStructured) must beat the naive median " +
        s"($naiveStructured) on the structured grid")
  }

  test("scoreImputation: perfect imputation scores zero, known error exact") {
    import spark.implicits._
    import graft.impute.ImputationEval
    val planted = Seq(
      (1L, true, 10.00, 10.00), (1L, true, 5.00, 4.50),
      (1L, false, 7.00, 0.0),
      (2L, true, 8.00, 8.00), (2L, true, 2.00, 2.00))
      .toDF("k", "planted", "value", "imputed")
    val sc = ImputationEval.scoreImputation(planted, "k", "value", "imputed")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // k=1: errors |10-10| + |4.5-5| = 0.5 dollars = 100 half-cents;
    //      truth = 15.00 = 3000 hc; wmape = 100/3000 = 0.0333...
    assert(sc(1L) === ((2L, 100L, 3000L, 33333333L)))
    assert(sc(2L) === ((2L, 0L, 2000L, 0L)))
  }
}
