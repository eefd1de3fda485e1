package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PageRank (Brin & Page, *The Anatomy of a Large-Scale Hypertextual Web
  * Search Engine*, WWW'98) with a fixed iteration count and EXACT integer
  * arithmetic — the graph-centrality companion to the connected-components
  * family ([[ConnectedComponents]]).
  *
  * Ranks are integer-quantized (scale 10⁶) and every update is integer
  * division: `r' = (1−d)·scale + (d_num · Σ_incoming (r_u DIV deg_u))
  * DIV d_den` with d = d_num/d_den. No float summation anywhere, so the
  * result is independent of partitioning/merge order and replayable
  * bit-for-bit by the SQL oracle as unrolled iteration CTEs (the same
  * portable-iteration trick as semDedup's Lloyd's and q143's BPE rounds).
  *
  * Scale shape: the standard PageRank-on-Spark loop — per iteration ONE
  * join of the rank frame onto the edge list (hash-partitioned by src)
  * and ONE aggregation by dst; degree is computed once and carried on the
  * edge. State is the rank frame (one row per node). The loop truncates
  * the rank frame's lineage with a `localCheckpoint` every
  * `checkpointEvery` iterations (default 10, the
  * [[ConnectedComponents.runStars]] cadence) so a long chain never stacks
  * more than ~10 join+aggregate rounds into one Catalyst plan — without
  * it, planning cost grows linearly with `iters` and the optimizer
  * eventually chokes on the plan depth.
  *
  * Dangling nodes (no out-edges) simply leak their rank mass — the
  * documented simple variant; nodes not present in the edge list are not
  * ranked. `edges` is DIRECTED (src → dst); pass both directions for an
  * undirected graph. */
object PageRank {

  def run(edges: DataFrame, iters: Int, scale: Long = 1000000L,
          dNum: Int = 85, dDen: Int = 100,
          checkpointEvery: Int = 10): DataFrame = {
    require(iters >= 1 && scale >= 1 && dDen >= 1 && dNum >= 0 &&
      dNum <= dDen && checkpointEvery >= 1,
      "need iters >= 1, 0 <= dNum <= dDen, checkpointEvery >= 1")
    // materialize the EDGE frame once (round 17): every loop-invariant
    // frame (deg, withDeg, nodes) and every iteration re-reads it, and
    // without the cut the caller's whole edge build (scans, joins,
    // distinct) ran once per materialized consumer. withDeg/nodes stay
    // lazy on top of the checkpointed scan — their identical exchanges
    // are runtime-reused across the unrolled iterations, and dropping
    // their barriers measured faster than checkpointing each (blocks are
    // released by the harness's SessionHygiene, the runStars lifecycle).
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    // out-degree as a window on the SAME src partitioning the contribution
    // join needs (round 18, guide §2.4: a window partitioned like the
    // preceding operation shares its exchange) — the groupBy+join-back
    // form paid a separate aggregate plus a join per plan, and at scale
    // the window's per-key buffer spills where the join built a hash
    // relation; degree values are identical either way
    val withDeg = e.withColumn("deg", count(lit(1)).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("src"))))
    val nodes = e.select(explode(array(col("src"), col("dst"))).as("node"))
      .distinct()
    var ranks = nodes.withColumn("rank", lit(scale))
    for (i <- 1 to iters) {
      val contrib = withDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr("rank DIV deg").as("__c"))
        .groupBy(col("node")).agg(sum(col("__c")).as("__in"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((dDen - dNum).toLong * scale / dDen) +
            expr(s"($dNum * coalesce(__in, 0)) DIV $dDen")).as("rank"))
      // truncate lineage periodically — never on the last round (the
      // caller gets a lazy frame and decides its own materialization)
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
