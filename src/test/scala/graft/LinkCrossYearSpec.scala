package graft

import org.apache.spark.sql.functions._
import graft.linkage.Linkage

/** End-to-end cross-year linkage orchestration
  * (`link_ids_cross_year`, reference link_cross_year.py:299-360):
  * edges+year-penalty → CC → split → orphan assignment, one call. */
class LinkCrossYearSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private def axis(i: Int): Array[Float] =
    Array.tabulate(dim)(d => if (d == i) 1.0f else 0.0f)

  // ids 1-3: one entity reported in 2019/2020/2021 (identical features)
  // ids 4-6: same-year chain — 4(2019) and 6(2019) both match 5(2020),
  //          so CC merges all three; the split stage must separate 6
  // id 7:    orphan at cosine 0.8 to the first entity — below the edge
  //          threshold (0.95) but above the assignment threshold (0.7)
  // id 8:    far orphan — new singleton entity
  private def records = Seq(
    (1L, 2019, axis(0)), (2L, 2020, axis(0)), (3L, 2021, axis(0)),
    (4L, 2019, axis(3)), (5L, 2020, axis(3)), (6L, 2019, axis(3)),
    (7L, 2022, Array.tabulate(dim)(d =>
      if (d == 0) 0.8f else if (d == 1) 0.6f else 0.0f)),
    (8L, 2020, axis(6))
  ).toDF("rec_id", "year", "embedding")

  test("linkIdsCrossYear: cluster, split duplicate years, assign orphans") {
    val got = Linkage.linkIdsCrossYear(records, "rec_id", "year", "embedding",
        dim = dim, simThreshold = 0.95, assignThreshold = 0.7,
        blockOrphans = false) // exact orphan semantics under test here
      .select("rec_id", "record_label")
      .as[(Long, Long)].collect().toMap
    assert(got.size == 8)
    assert(got(1L) == 1L && got(2L) == 1L && got(3L) == 1L,
      s"cross-year entity should share label: $got")
    assert(got(4L) == 4L && got(5L) == 4L,
      s"4 and 5 stay together after split: $got")
    assert(got(6L) == 6L,
      s"duplicate-year member 6 must split out: $got")
    assert(got(7L) == 1L,
      s"near orphan joins nearest cluster's label: $got")
    assert(got(8L) == 8L, s"far orphan stays a singleton: $got")
  }

  test("default (blockOrphans=true) orphan stage plans no cross product") {
    // blockOrphans defaults to TRUE (the 100 TB path): orphan assignment
    // goes through the banded LSH equi-join
    // (Similarity.nearestAssignBlocked — the exact stage linkIdsCrossYear
    // routes to by default; q99's PlanSpec test asserts the executed form),
    // never an all-pairs product. Asserted here on the stage's own plan
    // because the public result is checkpoint-backed (hygiene), which hides
    // upstream operators from its queryExecution.
    val clustered = records.where(col("rec_id") <= 6)
      .withColumn("record_label", col("rec_id"))
    val orphans = records.where(col("rec_id") > 6)
    val plan = graft.similarity.Similarity.nearestAssignBlocked(
        orphans, clustered, "rec_id", "embedding", "record_label",
        dim = dim, nBits = 24, bands = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"blocked orphan stage contains a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"blocked orphan stage contains a BroadcastNestedLoopJoin:\n$plan")
  }

  test("empty edge set: every record is its own entity") {
    val lone = Seq((10L, 2019, axis(0)), (11L, 2020, axis(3)))
      .toDF("rec_id", "year", "embedding")
    val got = Linkage.linkIdsCrossYear(lone, "rec_id", "year", "embedding",
        dim = dim, simThreshold = 0.95, assignThreshold = 0.99)
      .select("rec_id", "record_label")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(10L -> 10L, 11L -> 11L))
  }
}
