package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Scale-technique proofs: salted joins preserve semantics; bucketed tables
  * join without a shuffle (SCALE.md). */
class SkewBucketSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain join on skewed data") {
    // hot key: one order id carries most rows
    val big = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i * 1.0))
      .toDF("k", "v")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty")).toDF("k", "name")
    val plain = big.join(small, Seq("k"), "inner")
      .select("k", "v", "name")
    val salted = Skew.saltedJoin(big, small, Seq("k"), saltFactor = 8)
      .select("k", "v", "name")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    val li = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("o_bucketed")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    // co-located buckets: the physical plan must contain no shuffle
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() > 0)
    spark.sql("DROP TABLE li_bucketed")
    spark.sql("DROP TABLE o_bucketed")
  }
}
