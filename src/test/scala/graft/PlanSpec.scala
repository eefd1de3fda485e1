package graft

/** Physical-plan assertions: the scale properties SCALE.md claims are
  * checked here against the actual executed plans, so a regression that
  * turns a broadcast into a shuffle (or an equi-join into a nested loop)
  * fails the suite, not just the benchmark. */
class PlanSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02 star join broadcasts dims, no nested-loop join") {
    val p = plan("q02_region_revenue")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q03 filter + projection reach the parquet scan") {
    val p = plan("q03_filter_project")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull(l_shipdate)") ||
      p.contains("GreaterThanOrEqual(l_shipdate"))
    // pruned read: non-projected columns never reach the scan
    val scan = p.linesIterator.find(_.contains("FileScan")).get
    assert(scan.contains("l_shipdate") && !scan.contains("l_extendedprice") &&
      !scan.contains("l_discount"), scan)
  }

  test("q82 spatial join is an equi-join on grid cells") {
    val p = plan("q82_overlay_alloc")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q87 row-map dim is broadcast") {
    val p = plan("q87_row_map")
    assert(p.contains("BroadcastHashJoin"))
  }

  test("q01 aggregation is map-side partial + final hash aggregation") {
    val p = plan("q01_pricing_summary")
    assert(p.contains("partial_sum"), "map-side combine missing")
    assert("HashAggregate".r.findAllIn(p).size >= 2)
  }
}
