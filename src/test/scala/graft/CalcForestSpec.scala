package graft

import graft.graph.CalcForest
import graft.graph.CalcForest.CalcEdge

class CalcForestSpec extends SparkSpec {

  private val edges = Seq(
    CalcEdge("total", "opex", 1.0),
    CalcEdge("total", "capex", 1.0),
    CalcEdge("opex", "fuel", 1.0),
    CalcEdge("opex", "labor", 0.5))

  test("leaves/roots/cycles on a small DAG") {
    assert(CalcForest.leaves(edges) == Set("fuel", "labor", "capex"))
    assert(CalcForest.roots(edges) == Set("total"))
    assert(CalcForest.cycleNodes(edges).isEmpty)
    val cyc = edges :+ CalcEdge("fuel", "total", 1.0)
    assert(CalcForest.cycleNodes(cyc).nonEmpty)
  }

  test("leafWeights multiplies weights down chains") {
    val lw = CalcForest.leafWeights(edges)
    assert(lw("total") == Map("fuel" -> 1.0, "labor" -> 0.5, "capex" -> 1.0))
    assert(lw("opex") == Map("fuel" -> 1.0, "labor" -> 0.5))
    assert(lw("fuel") == Map("fuel" -> 1.0))
  }

  test("propagateTags inherits from ancestors, own tags win") {
    val tags = CalcForest.propagateTags(edges, Map(
      "total" -> Map("side" -> "debit"),
      "labor" -> Map("side" -> "credit")))
    assert(tags("fuel") == Map("side" -> "debit"))
    assert(tags("labor") == Map("side" -> "credit"))
  }

  test("reconcile flags inconsistent parents") {
    import spark.implicits._
    val facts = Seq(
      ("g", "total", 10.0), ("g", "opex", 6.0), ("g", "capex", 4.0),
      ("g", "fuel", 5.0), ("g", "labor", 2.0)
    ).toDF("grp", "node", "v")
    val out = CalcForest.reconcile(spark, facts, edges, Seq("grp"), "node", "v",
        tolerance = 0.01)
      .collect().map(r => r.getAs[String]("parent") ->
        r.getAs[Boolean]("is_consistent")).toMap
    assert(out("total")) // 6 + 4 = 10
    assert(out("opex")) // 5 + 0.5*2 = 6
  }
}
