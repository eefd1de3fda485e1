package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact triangle counting via degree-ordered edge orientation — the
  * "compact-forward" algorithm (Latapy, TCS 2008; the distributed form is
  * Suri & Vassilvitskii's GP partitioning, WWW 2011). §2.10's graph family
  * member for clustering-coefficient / community-density analytics.
  *
  * Why orientation matters at 100 TB: a naive wedge join pays Σ deg(v)² —
  * a single celebrity hub with 10M neighbors yields 10¹⁴ wedges. Orienting
  * every edge from its (degree, id)-SMALLER endpoint bounds every
  * out-degree by ~√(2m), so wedge volume is O(m^1.5) TOTAL regardless of
  * hubs — the textbook skew-proof shape; the wedge join and its closing
  * probe are plain equi-joins that shuffle on vertex keys.
  *
  * Determinism: degrees are exact integers; the orientation total order
  * (deg, id) and every join are engine-portable, so the whole count
  * replays in SQL.
  */
object Triangles {

  /** Per-vertex triangle counts over an undirected simple graph given as
    * (src, dst) rows — self-loops, duplicates and reversed duplicates are
    * normalized away first. Every triangle {x ≺ y ≺ z} (≺ = (deg, id)) is
    * found exactly once at its apex x via the wedge (x→y, x→z) closed by
    * the oriented edge y→z. Output: `(vertex, n_triangles)`, one row per
    * distinct vertex of the normalized graph, zero-participation vertices
    * included at 0. */
  def countPerVertex(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // Round 17 (plan-size diet): every frame below is referenced ONCE —
    // `explode(array(...))` replaces the unionAll fan-outs (a union
    // re-plans its input per branch) and `oriented` materializes via one
    // localCheckpoint before fanning out to the wedge join's two sides
    // and the closing probe. The lazy form re-planned the edge build
    // once per reference — multiplicatively: the initial q208 plan held
    // ~180 Exchange nodes (deg ×2 copies × oriented ×3 × corner ×3) and
    // driver-side analysis+codegen of that tree dominated the lane at
    // every fixture scale. Runtime semantics are unchanged (same rows
    // into every aggregate); the checkpoint holds the m-row oriented
    // edge list — the same loop-invariant discipline as PageRank's
    // withDeg — and its blocks are released by session hygiene.
    val und = edges.select(
        least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .where(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct()
      // the normalized edge set feeds both the degree aggregate and the
      // orientation join — materialize so the caller's edge build runs
      // exactly once however many frames below re-read it
      .localCheckpoint()
    val deg = und.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
      .localCheckpoint()
    // orient each edge from its (deg, id)-smaller endpoint; carry the
    // head's (deg, id) so wedge endpoints can be ≺-compared without a
    // global vertex rank (a single-partition window at graph scale)
    val withDeg = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oriented = withDeg.select(
      when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
        struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
        .as("e"))
      .select(col("e.u"), col("e.w"), col("e.dw"))
      .localCheckpoint()
    // wedges at apex u with y ≺ z, closed by the oriented edge y→z
    val o1 = oriented.select(col("u"), col("w").as("y"), col("dw").as("dy"))
    val o2 = oriented.select(col("u"), col("w").as("z"), col("dw").as("dz"))
    val tris = o1.join(o2, "u")
      .where(col("dy") < col("dz") ||
        (col("dy") === col("dz") && col("y") < col("z")))
      .join(oriented.select(col("u").as("y"), col("w").as("z")),
        Seq("y", "z"))
      .select(col("u").as("x"), col("y"), col("z"))
    val corner = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("__t"))
    deg
      .join(corner, Seq("v"), "left")
      .select(col("v").as("vertex"), col("deg").as("degree"),
        coalesce(col("__t"), lit(0L)).as("n_triangles"))
  }

  /** Local clustering coefficient per vertex as EXACT integer nanos:
    * `cc_nano = 2·T(v)·1e9 // (deg(v)·(deg(v)−1))`, 0 for degree < 2 —
    * the standard graph-density signal (Watts–Strogatz 1998) on top of
    * [[countPerVertex]], one integer division per vertex, fully
    * oracle-replayable. The numerator is computed in decimal(38,0):
    * 2·T(v)·1e9 exceeds int64 once T(v) > ~4.6e9 (a 100k-degree hub in a
    * dense neighborhood — plausible at the 100 TB scale this lane
    * targets), and non-ANSI long arithmetic would wrap SILENTLY while the
    * DuckDB oracle errors — silent wrong results plus engine/oracle
    * divergence. In decimal the product is exact to 10^38 (T(v) is bounded
    * by deg² ≤ ~10^13 per vertex, so 2·T·1e9 ≤ ~10^23 — never overflows),
    * and the quotient is a ratio ≤ 1e9, always a safe BIGINT. The oracle
    * carries the identical decimal form. */
  def clusteringCoefficient(edges: DataFrame, srcCol: String,
                            dstCol: String): DataFrame =
    countPerVertex(edges, srcCol, dstCol)
      .select(col("vertex"), col("degree"), col("n_triangles"),
        when(col("degree") >= 2,
          expr("CAST(CAST(2 AS DECIMAL(38,0)) * n_triangles" +
            " * 1000000000 div (degree * (degree - 1)) AS BIGINT)"))
          .otherwise(lit(0L)).as("cc_nano"))
}
