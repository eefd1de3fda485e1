package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Calculation-forest semantics (SURVEY §2.10): a metadata-sized DAG of
  * account roll-ups with weights, validated and flattened on the driver,
  * then joined against facts for distributed reconciliation. Reference:
  * `XbrlCalculationForestFerc1` (`/root/reference/src/pudl/output/ferc1.py:1814-2585`)
  * and `Exploder.boom` (`:1212-1813`).
  *
  * The forest itself is thousands of nodes (driver-side by design — SURVEY
  * §2.10 maps it so); the *facts* reconciled against it are arbitrarily
  * large and stay distributed.
  */
object CalcForest {

  /** parent = Σ weight·child. */
  case class CalcEdge(parent: String, child: String, weight: Double)

  /** Detect cycles via iterative leaf-stripping (Kahn); returns nodes stuck
    * in cycles (empty = valid DAG). */
  def cycleNodes(edges: Seq[CalcEdge]): Set[String] = {
    var remaining = edges
    var nodes = edges.flatMap(e => Seq(e.parent, e.child)).toSet
    var progress = true
    while (progress) {
      val parents = remaining.map(_.parent).toSet
      val leaves = nodes.diff(parents)
      progress = leaves.nonEmpty
      if (progress) {
        nodes = nodes.diff(leaves)
        remaining = remaining.filter(e => nodes.contains(e.child))
      }
    }
    nodes
  }

  /** Children that appear as no edge's parent — the atomic facts. */
  def leaves(edges: Seq[CalcEdge]): Set[String] = {
    val parents = edges.map(_.parent).toSet
    edges.map(_.child).toSet.diff(parents)
  }

  /** Orphans: declared nodes never reached from any root. */
  def roots(edges: Seq[CalcEdge]): Set[String] = {
    val children = edges.map(_.child).toSet
    edges.map(_.parent).toSet.diff(children)
  }

  /** Expand every node to its leaf basis with multiplied weights —
    * "leafize" (`output/ferc1.py` pruning/leafization). Driver-side. */
  def leafWeights(edges: Seq[CalcEdge]): Map[String, Map[String, Double]] = {
    require(cycleNodes(edges).isEmpty, "calculation forest has cycles")
    val byParent = edges.groupBy(_.parent)
    val lvs = leaves(edges)
    val memo = scala.collection.mutable.Map.empty[String, Map[String, Double]]
    def expand(node: String): Map[String, Double] = memo.getOrElseUpdate(node,
      if (lvs.contains(node)) Map(node -> 1.0)
      else byParent.getOrElse(node, Nil).flatMap { e =>
        expand(e.child).map { case (leaf, w) => leaf -> w * e.weight }
      }.groupBy(_._1).map { case (leaf, ws) => leaf -> ws.map(_._2).sum })
    (edges.map(_.parent) ++ edges.map(_.child)).distinct
      .map(n => n -> expand(n)).toMap
  }

  /** Tag inheritance down the DAG: children inherit parent tags unless they
    * carry their own — `_propagate_tags` (`output/ferc1.py:2611-2688`). */
  def propagateTags(edges: Seq[CalcEdge],
                    own: Map[String, Map[String, String]]): Map[String, Map[String, String]] = {
    require(cycleNodes(edges).isEmpty, "calculation forest has cycles")
    val byChild = edges.groupBy(_.child)
    val memo = scala.collection.mutable.Map.empty[String, Map[String, String]]
    def tagsOf(node: String): Map[String, String] = memo.getOrElseUpdate(node, {
      val inherited = byChild.getOrElse(node, Nil)
        .flatMap(e => tagsOf(e.parent)).toMap
      inherited ++ own.getOrElse(node, Map.empty) // own wins
    })
    (edges.flatMap(e => Seq(e.parent, e.child)).distinct ++ own.keys).distinct
      .map(n => n -> tagsOf(n)).toMap
  }

  /** Distributed reconciliation: per (group, parent), compare the reported
    * parent value against Σ weight·child over the reported children.
    * `facts`: (groupCols..., nodeCol, valueCol). Tolerance check mirrors the
    * reference's error-metric classes (`transform/ferc1.py:1358-1633`). */
  def reconcile(spark: SparkSession, facts: DataFrame, edges: Seq[CalcEdge],
                groupCols: Seq[String], nodeCol: String, valueCol: String,
                tolerance: Double): DataFrame = {
    import spark.implicits._
    val edgeDf = broadcast(edges.toDF("parent", "child", "weight"))
    val g = groupCols.map(col)
    val childSums = facts
      .join(edgeDf, facts(nodeCol) === edgeDf("child"))
      .groupBy(g :+ col("parent"): _*)
      .agg(sum(col(valueCol) * col("weight")).as("calculated"))
    val reported = facts.select(g :+ col(nodeCol).as("parent") :+
      col(valueCol).as("reported"): _*)
    reported.join(childSums, groupCols :+ "parent", "inner")
      .withColumn("abs_diff", abs(col("reported") - col("calculated")))
      .withColumn("is_consistent", col("abs_diff") <= tolerance)
  }
}
