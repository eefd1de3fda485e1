package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components on a DataFrame edge list — the primitive behind the
  * reference's boiler–generator unit assembly and EPA–EIA subplant ids
  * (`/root/reference/src/pudl/transform/eia.py:945-1000`,
  * `dagster/assets/core/glue.py:449-645`), without the GraphFrames dep.
  *
  * Algorithm: iterative min-label propagation. Each iteration is one
  * shuffle-join on vertex id + one aggregation; iterations ≤ graph diameter
  * (energy-data graphs: tiny diameters). `localCheckpoint` truncates plan
  * lineage so the loop doesn't build an ever-deeper DAG. For 100 TB-scale
  * graphs with large diameters, swap the loop body for the large-star/
  * small-star contraction (same join primitives, O(log n) rounds).
  */
object ConnectedComponents {

  /** @return (vertex, component) with component = min vertex id reachable. */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          maxIter: Int = 25): DataFrame = {
    val sym = edges
      .select(col(srcCol).cast("long").as("a"), col(dstCol).cast("long").as("b"))
      .unionByName(edges.select(col(dstCol).cast("long").as("a"),
        col(srcCol).cast("long").as("b")))
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
    labels
  }
}
