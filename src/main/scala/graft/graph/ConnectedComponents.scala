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
  *  - **Large graphs**: iterative min-label propagation with pointer
  *    jumping. Each iteration is one shuffle-join on vertex id + one
  *    aggregation; rounds ≤ O(log diameter). `localCheckpoint` truncates
  *    plan lineage so the loop doesn't build an ever-deeper DAG. For huge
  *    diameters swap the loop body for large-star/small-star contraction
  *    (same join primitives, O(log n) rounds).
  */
object ConnectedComponents {

  /** @return (vertex "v", component) with component = min vertex id reachable. */
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
    else runDistributed(e, maxIter)
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
