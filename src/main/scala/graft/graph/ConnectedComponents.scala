package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components on a DataFrame edge list — the primitive behind the
  * reference's boiler–generator unit assembly and EPA–EIA subplant ids
  * (`/root/reference/src/pudl/transform/eia.py:945-1000`,
  * `dagster/assets/core/glue.py:449-645`), without the GraphFrames dep.
  *
  * Two execution paths, picked by edge count:
  *
  *  - **Small graphs** (≤ `localEdgeThreshold` undirected edges): collect the
  *    edge list and run union-find on the driver, then return the labels as a
  *    DataFrame. This mirrors the reference, which runs networkx on the
  *    driver for exactly these graphs, and costs one job instead of
  *    3 jobs × O(log d) rounds. Even in a 100 TB corpus, the *edge set* of a
  *    near-dup/crosswalk graph is orders of magnitude smaller than the corpus
  *    (pairs ∝ true duplicates), so this path covers most production runs;
  *    the threshold (default 5M edges ≈ 80 MB on the driver) keeps it safe.
  *
  *  - **Large graphs**: large-star/small-star contraction ([[runStars]],
  *    Kiveris et al. SoCC'14) — O(log n) rounds regardless of graph
  *    diameter, join-free windowed rounds, the safe default when the
  *    shape is unknown. Min-label propagation with pointer jumping
  *    ([[runLabelProp]]) stays available for known-small-diameter graphs
  *    (crosswalks), where it converges in fewer exchanges.
  *    `localCheckpoint` truncates plan lineage in both loops.
  */
object ConnectedComponents {

  /** @return (vertex "v", component) with component = min vertex id reachable.
    *
    * Routing: below `localEdgeThreshold` the edge list collects to a driver
    * union-find (one job); above it the star-contraction loop
    * ([[runStars]]) runs — O(log n) rounds with no dependence on graph
    * diameter, the safe default when the shape is unknown. The min-label
    * loop ([[runLabelProp]]) stays available for known-small-diameter
    * graphs, where its two-hop pointer jumping converges in fewer
    * exchanges. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 25,
          localEdgeThreshold: Long = 5000000L): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .cache()
    val nEdges = e.count()
    if (nEdges <= localEdgeThreshold) runLocal(e)
    else {
      e.unpersist()
      runStars(edges, srcCol, dstCol, maxIter = math.max(maxIter, 50))
    }
  }

  /** Driver union-find (path compression + union by rank). */
  private def runLocal(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val pairs = e.as[(Long, Long)].collect()
    e.unpersist()
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var root = x
      while (parent.getOrElse(root, root) != root) root = parent.getOrElse(root, root)
      var cur = x
      while (parent.getOrElse(cur, cur) != root) {
        val next = parent.getOrElse(cur, cur); parent(cur) = root; cur = next
      }
      root
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    val verts = pairs.iterator.flatMap(p => Iterator(p._1, p._2)).toArray.distinct
    verts.map(v => (v, find(v))).toSeq.toDF("v", "component")
  }

  /** Large-star/small-star alternation (Kiveris et al., *Connected
    * Components in MapReduce and Beyond*, ACM SoCC 2014) — the web-scale
    * path promised in the header. Convergence takes O(log n) rounds
    * REGARDLESS of graph diameter, where min-label propagation (even with
    * pointer jumping, [[runLabelProp]]) needs O(log diameter) rounds and
    * degrades on path-shaped graphs (a 1M-hop chain: ~20 rounds vs ~60).
    * Both phases are one hash aggregation + one shuffle join on vertex id —
    * the same primitives as the label loop, so the 100 TB cost model is
    * unchanged: no per-round growth, `localCheckpoint` truncates lineage.
    *
    *  - large-star(u): every neighbor v > u links to m = min(Γ(u) ∪ {u})
    *  - small-star(u): all neighbors v ≤ u (and u itself) link to their min
    *
    * The fixed point is a set of stars centered at each component's minimum
    * vertex, which is exactly the (v, component) labeling [[run]] returns.
    * Equality with the driver union-find is property-tested on random
    * graphs (OperatorSpec).
    */
  def runStars(edges: DataFrame, srcCol: String, dstCol: String,
               maxIter: Int = 50): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
    val verts = e0.select(explode(array(col("a"), col("b"))).as("v"))
      .distinct().localCheckpoint()
    var e = e0.where(col("a") =!= col("b")).distinct().localCheckpoint()
    // round signature (edge count + order-free hash sum) detects the fixed
    // point: two extra scalar aggregations per round, no driver edge list
    def signature(d: DataFrame): (Long, Long) = {
      // 32-bit mask: the sum stays far from Long overflow (ANSI mode
      // errors on it) until 2^32 edges per round, beyond this loop's reach
      val r = d.agg(count(lit(1)), coalesce(
        sum(xxhash64(col("a"), col("b")).bitwiseAND(lit(0xFFFFFFFFL))),
        lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }
    // One large-star + small-star alternation. Both phases are windowed
    // per-node mins — NO joins: the groupBy-then-join-back form spawns a
    // broadcast build + probe job per join per round (~10 scheduler
    // round-trips/round on small graphs); the window computes the same
    // per-group min inside the shuffle grouping needs anyway, so a full
    // round is 3 exchanges and no action. Same primitives at scale: hash
    // shuffles on vertex id.
    def round(in: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("a")
      // large-star: every neighbor v > u links to m = min(Γ(u) ∪ {u}).
      // Emitted edges (v, m) have m ≤ u < v — already directed
      // child=first/parent=second, no self-loops; duplicates are absorbed
      // by the small-star distinct.
      val dir = in.unionByName(in.select(col("b").as("a"), col("a").as("b")))
        .withColumn("m", least(min(col("b")).over(w), col("a")))
        .where(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
      // small-star: all of child group u's parents (and u itself) link to
      // the group min (parents are all < u, so min(N) = min(N ∪ {u}));
      // the per-group (u, m) edge is emitted per row and deduped
      dir
        .withColumn("m", min(col("b")).over(w))
        .select(explode(array(
          struct(col("b").as("a"), col("m").as("b")),
          struct(col("a"), col("m").as("b")))).as("s"))
        .select(col("s.a").as("a"), col("s.b").as("b"))
        .where(col("a") =!= col("b")).distinct()
    }
    var sig = signature(e)
    // Latency/throughput switch: each round's stages are freshly planned
    // and codegen-compiled (new expr ids every iteration — janino pays
    // ~0.1-0.3 s per stage per round). Below ~10M edges the loop is
    // scheduler/compile-bound, so run it interpreted; above, rounds are
    // data-bound and whole-stage codegen earns its compile time.
    val spark = e.sparkSession
    val codegenKey = "spark.sql.codegen.wholeStage"
    val prevCodegen = spark.conf.getOption(codegenKey)
    val smallGraph = sig._1 <= 10000000L
    if (smallGraph) spark.conf.set(codegenKey, "false")
    try {
      var converged = false
      var i = 0
      while (!converged && i < maxIter) {
        // two alternations per materialization: halves the driver actions
        // (checkpoint + signature) the convergence loop pays; costs at most
        // one extra (idempotent) alternation after the fixed point
        val ss = round(round(e)).localCheckpoint()
        val nextSig = signature(ss)
        converged = nextSig == sig
        sig = nextSig
        e = ss
        i += 1
      }
    } finally if (smallGraph) prevCodegen match {
      case Some(v) => spark.conf.set(codegenKey, v)
      case None => spark.conf.unset(codegenKey)
    }
    // fixed point is (child, root) stars; roots + self-loop-only vertices
    // label themselves
    verts.join(e.select(col("a").as("v"), col("b").as("c")), Seq("v"), "left")
      .select(col("v"), coalesce(col("c"), col("v")).as("component"))
  }

  /** Min-label propagation with two-hop pointer jumping — fewer exchanges
    * per round than star contraction, but round count grows with graph
    * diameter; prefer for known-small-diameter graphs (crosswalks, star
    * schemas). Takes the raw edge list like [[runStars]]. */
  def runLabelProp(edges: DataFrame, srcCol: String, dstCol: String,
                   maxIter: Int = 25): DataFrame = {
    val e = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .where(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      .cache()
    runDistributed(e, maxIter)
  }

  private def runDistributed(sym0: DataFrame, maxIter: Int): DataFrame = {
    val sym = sym0
      .unionByName(sym0.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()
    var labels = sym.select(col("a").as("v")).distinct()
      .withColumn("component", col("v"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym.join(labels, sym("b") === labels("v"))
        .groupBy(col("a")).agg(min(col("component")).as("nbr_min"))
      val updated = labels.join(nbrMin, labels("v") === nbrMin("a"), "left")
        .select(labels("v").as("v"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("c1"),
          col("component").as("c0"))
      // pointer jump ("shortcutting"): follow the new label one more hop —
      // halves the number of propagation rounds (O(log d) overall)
      val lbl2 = updated.select(col("v").as("v2"), col("c1").as("c2"))
      val next = updated.join(lbl2, updated("c1") === lbl2("v2"), "left")
        .select(col("v"),
          least(col("c1"), coalesce(col("c2"), col("c1"))).as("component"),
          (least(col("c1"), coalesce(col("c2"), col("c1"))) < col("c0")).as("__chg"))
        .localCheckpoint()
      changed = next.where(col("__chg")).count()
      labels = next.drop("__chg")
      i += 1
    }
    sym.unpersist()
    sym0.unpersist()
    labels
  }
}
