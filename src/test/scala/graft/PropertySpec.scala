package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{AggFunctions, WeightedQuantile}
import graft.operators.WindowOps

/** Property-based checks: window/aggregate operators vs brute-force
  * reference implementations on seeded random inputs (raw scalacheck
  * generators; deterministic across runs). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def forAll[T](g: Gen[T], minSuccessful: Int)(body: T => Unit): Unit =
    (0 until minSuccessful).foreach { i =>
      body(g.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }

  private val seriesGen: Gen[List[Double]] =
    Gen.choose(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-100.0, 100.0).map(v => math.rint(v * 100) / 100)))

  test("rollingMedian matches a brute-force sliding median") {
    forAll(seriesGen, 15) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1, i, v) }.toDF("k", "i", "v")
      val got = WindowOps.rollingMedian(df, Seq("k"), Seq(col("i")), col("v"), 2, 2)
        .orderBy("i").select("rolling_median").as[Double].collect()
      val exp = vs.indices.map { i =>
        val frame = vs.slice(math.max(0, i - 2), math.min(vs.length, i + 3)).sorted
        val n = frame.length
        (frame((n + 1) / 2 - 1) + frame(n / 2)) / 2.0
      }
      assert(got.toSeq == exp)
    }
  }

  test("runLengths partitions the series exactly") {
    forAll(seriesGen, 15) { vs =>
      val df = vs.zipWithIndex.map { case (v, i) => (1, i, v >= 0) }.toDF("k", "i", "f")
      val runs = WindowOps.runLengths(df, Seq("k"), Seq(col("i")), col("f"), "i")
        .orderBy("run_id").collect()
      // lengths sum to series length and adjacent runs alternate flags
      assert(runs.map(_.getLong(3)).sum == vs.length)
      val flags = runs.map(_.getBoolean(2)).toSeq
      assert(flags.zip(flags.drop(1)).forall { case (a, b) => a != b })
    }
  }

  test("weightedQuantile(1/2) equals brute-force weighted median") {
    val pairsGen = Gen.choose(1, 25).flatMap(n => Gen.listOfN(n,
      Gen.zip(Gen.choose(-50.0, 50.0).map(v => math.rint(v * 10) / 10),
        Gen.choose(1, 9).map(_.toDouble))))
    forAll(pairsGen, 15) { pairs =>
      val df = pairs.toDF("v", "w")
      val got = df.agg(WeightedQuantile($"v", $"w", 1, 2)).head().getDouble(0)
      val sorted = pairs.sortBy(_._1)
      val total = sorted.map(_._2).sum
      var cum = 0.0
      val exp = sorted.find { case (_, w) => cum += w; cum * 2 >= total }
        .map(_._1).getOrElse(sorted.last._1)
      assert(got == exp)
    }
  }

  test("sumNa equals sum when no nulls, null when any") {
    forAll(seriesGen, 10) { vs =>
      val clean = vs.map(v => (1, Option(v))).toDF("k", "v")
      val s1 = clean.groupBy("k").agg(AggFunctions.sumNa(col("v"))).head()
      assert(math.abs(s1.getDouble(1) - vs.sum) < 1e-6)
      val dirty = ((1, Option.empty[Double]) +: vs.map(v => (1, Option(v))))
        .toDF("k", "v")
      val s2 = dirty.groupBy("k").agg(AggFunctions.sumNa(col("v"))).head()
      assert(s2.isNullAt(1))
    }
  }
}
