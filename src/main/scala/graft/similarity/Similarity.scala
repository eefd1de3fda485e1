package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`Array[Float]`).
  *
  * `cosineTopK` is the exact brute-force baseline (and the oracle for the
  * approximate path). `lshTopK` is the scale path: random-hyperplane LSH
  * buckets make candidate generation an equi-join on (bucket), so the
  * query×corpus cross product never materializes — at 100 TB the corpus is
  * hash-partitioned by bucket and each query probes one partition.
  */
object Similarity {

  /** Σ aᵢ·bᵢ as a sequential left fold in double precision (deterministic
    * association order — reproducible across engines and partitionings).
    * Declarative form — use `dotFast` in per-pair hot paths. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Same semantics as `dot` (sequential left fold, double precision) via
    * the native codegen expression `graft.plans.FloatDotProduct` —
    * Catalyst's interpreted higher-order functions box every element, which
    * is the difference between 44 s and ~2 s on a 12M-pair scoring pass.
    * Association order matches `dot` exactly, so results are bit-identical. */
  def dotFast(a: Column, b: Column): Column = graft.plans.FloatDotProduct(a, b)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine guarded for zero-norm vectors. A zero denominator is a runtime
    * DIVIDE_BY_ZERO error under ANSI mode (Spark 4 default) and NaN/NULL
    * otherwise — and NaN orders FIRST under `desc` (NaN is greatest) and
    * passes `>= threshold`, where SQL engines produce NULL (sorts last,
    * fails comparisons). `try_divide` + NaN/NULL → −1 (below any real
    * cosine) makes every mode rank and threshold like the oracle's
    * NULLS-last behavior. */
  private def safeCosine(num: Column, denom: Column): Column =
    coalesce(nanvl(try_divide(num, denom), lit(-1.0)), lit(-1.0))

  /** Exact top-k cosine neighbors for each query row (brute force).
    * Ranking uses the rounded cosine with an id tiebreak so ordering is
    * insensitive to last-bit float drift. */
  def cosineTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                 embCol: String, k: Int): DataFrame = {
    // norms precomputed per ROW (O(n) folds), not per pair (O(n²))
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val scored = q.crossJoin(c).where(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  /** Recall@k of an approximate top-k result against the exact one — the
    * standard ANN index-quality metric (FAISS's `recall@k`): both inputs
    * are `(q_id, rk, c_id, …)` frames as produced by the `*TopK`
    * operators; recall = |approx ∩ exact| / |exact| over the
    * (q_id, c_id) pair sets with both sides truncated to rank ≤ k. One
    * row out: (n_queries, n_exact, n_hit, recall). The ratio is a
    * quotient of two exact integers, so the number reproduces exactly —
    * comparable round-over-round the way the imputer WMAPE gate is.
    *
    * Scale: the expensive input is the exact side (brute force — feed it
    * a BOUNDED query set, never the corpus); the recall computation
    * itself is one equi-join on (q_id, c_id) + one aggregate, both sides
    * |queries|·k rows. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    // BOTH sides dedup to their (q_id, c_id) pair sets: the *TopK frames
    // are rank-unique per pair already, but a malformed approx input would
    // double-count hits (recall > 1) and a malformed exact input would
    // inflate n_exact and silently DEFLATE recall — the distincts (over
    // ≤ |queries|·k rows each) make the metric a true set ratio either way.
    val e = exact.where(col("rk") <= k).select(col("q_id"), col("c_id"))
      .distinct()
    val a = approx.where(col("rk") <= k).select(col("q_id"), col("c_id"))
      .distinct()
      .withColumn("__hit", lit(1))
    e.join(a, Seq("q_id", "c_id"), "left")
      .agg(count_distinct(col("q_id")).as("n_queries"),
        count(lit(1)).as("n_exact"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_hit"))
      // empty exact side: an explicit 0.0 instead of a null that callers
      // would have to NPE on — an all-empty gate reads as an obvious
      // recall failure, never as a silently-dropped row
      .withColumn("recall",
        when(col("n_exact") === 0, lit(0.0))
          .otherwise(col("n_hit").cast("double") / col("n_exact")))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query row, the top-k most-similar corpus rows with a DIFFERENT
    * label — the highest-value negatives (similar-but-wrong) that
    * in-batch random sampling almost never surfaces. With
    * `bandedDim = None` the exact brute form runs (bounded query sets —
    * the q154 oracle twin); with `bandedDim = Some(dim)` candidates must
    * share ≥1 portable sign-bit band (the cosineNearDupPairs/semDedup
    * blocking), so the search is a (band, bits) equi-join — candidate
    * volume ~ bands × corpus / 2^(nBits/bands) per query, never corpus²
    * (recall vs the exact form is spec-tested, the lshTopK pattern).
    * TUNING: hard negatives live in the moderate-cosine band
    * (~0.3–0.6), so use NARROW bands (e.g. bands=12 over nBits=24 →
    * 2-bit bands); the default 6-bit near-dup blocking is tuned for
    * cosine ≳0.9 pairs and recalls poorly here (0.23 vs 0.5+ on the
    * fixture).
    * Output: (q_id, q_label, rk, c_id, c_label, cosine). */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
                    embCol: String, labelCol: String, k: Int,
                    bandedDim: Option[Int] = None, nBits: Int = 24,
                    bands: Int = 4): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"),
        col(labelCol).as("q_label"), col(embCol).as("q_emb"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    val c = corpus.select(col(idCol).as("c_id"),
        col(labelCol).as("c_label"), col(embCol).as("c_emb"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val cand = bandedDim match {
      case None =>
        q.crossJoin(c)
      case Some(dim) =>
        val bandStructs = bandedSignStructs(embCol, dim, nBits, bands)
        val qb = queries.select(col(idCol).as("q_id"),
          explode(array(bandStructs: _*)).as("bb"))
          .select(col("q_id"), col("bb.band"), col("bb.bits"))
        val cb = corpus.select(col(idCol).as("c_id"),
          explode(array(bandStructs: _*)).as("bb"))
          .select(col("c_id"), col("bb.band"), col("bb.bits"))
        qb.join(cb, Seq("band", "bits"))
          .select("q_id", "c_id").distinct()
          .join(q, "q_id").join(c, "c_id")
    }
    cand
      .where(col("q_id") =!= col("c_id") &&
        !(col("q_label") <=> col("c_label")))
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "q_label", "rk", "c_id", "c_label", "cosine")
  }

  /** Assign each orphan (unclustered) row to the cluster of its nearest
    * clustered neighbor by cosine — `match_orphaned_records`
    * (`/root/reference/src/pudl/analysis/record_linkage/link_cross_year.py:241-299`).
    * Brute-force here (orphans × clustered); swap the cross join for the
    * LSH bucket join at scale. */
  def nearestAssign(orphans: DataFrame, clustered: DataFrame, idCol: String,
                    embCol: String, clusterCol: String): DataFrame = {
    val o = orphans.select(col(idCol).as("orphan_id"), col(embCol).as("o_emb"))
      .withColumn("__on", sqrt(dotFast(col("o_emb"), col("o_emb"))))
    val c = clustered.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
        col(clusterCol).as("assigned_cluster"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val scored = o.crossJoin(c)
      .withColumn("cosine", round(safeCosine(
        dotFast(col("o_emb"), col("c_emb")), col("__on") * col("__cn")), 4))
    graft.operators.Dedup.keepFirst(scored, Seq("orphan_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc))
      .select("orphan_id", "neighbor_id", "cosine", "assigned_cluster")
  }

  /** Scale path for [[nearestAssign]]: candidates come from the banded
    * sign-bit LSH equi-join (same portable Rademacher planes as
    * [[cosineNearDupPairs]]) instead of the orphans × clustered cross join.
    * Shuffle keys are (band, bits); per-orphan candidate volume is
    * ~ bands × clustered / 2^(nBits/bands). Narrow bands (bands = nBits →
    * 1-bit bands) approach full recall at the cost of wider buckets; the
    * default 6-bit bands match the near-dup blocking. An orphan whose every
    * band bucket is empty gets no assignment (stays a singleton upstream) —
    * the approximation the cross join avoids, traded for never
    * materializing the product at 100 TB.
    *
    * `bandProbe1 = true` additionally probes, on the ORPHAN side only,
    * every single-bit-flip neighbor bucket of each band
    * ([[bandedSignStructsProbed]]) — the multi-probe recall lever in its
    * best-case placement: orphans are the BOUNDED side of this join, so
    * the (w+1)× membership growth lands on a few-thousand-row frame while
    * the clustered corpus index stays untouched. */
  def nearestAssignBlocked(orphans: DataFrame, clustered: DataFrame,
                           idCol: String, embCol: String, clusterCol: String,
                           dim: Int, nBits: Int = 24,
                           bands: Int = 4,
                           bandProbe1: Boolean = false): DataFrame = {
    val bandStructs = bandedSignStructs(embCol, dim, nBits, bands)
    def buckets(df: DataFrame, as: String, structs: Seq[Column]) =
      df.select(col(idCol).as(as), explode(array(structs: _*)).as("bb"))
        .select(col(as), col("bb.band"), col("bb.bits"))
    val oStructs = if (bandProbe1)
      bandedSignStructsProbed(embCol, dim, nBits, bands) else bandStructs
    val cand = buckets(orphans, "orphan_id", oStructs)
      .join(buckets(clustered.select(idCol, embCol), "neighbor_id",
        bandStructs), Seq("band", "bits"))
      .select("orphan_id", "neighbor_id").distinct()
    val o = orphans.select(col(idCol).as("orphan_id"), col(embCol).as("o_emb"))
      .withColumn("__on", sqrt(dotFast(col("o_emb"), col("o_emb"))))
    val c = clustered.select(col(idCol).as("neighbor_id"),
        col(embCol).as("c_emb"), col(clusterCol).as("assigned_cluster"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val scored = cand.join(o, "orphan_id").join(c, "neighbor_id")
      .withColumn("cosine", round(safeCosine(
        dotFast(col("o_emb"), col("c_emb")), col("__on") * col("__cn")), 4))
    graft.operators.Dedup.keepFirst(scored, Seq("orphan_id"),
        Seq(col("cosine").desc, col("neighbor_id").asc))
      .select("orphan_id", "neighbor_id", "cosine", "assigned_cluster")
  }

  /** Exact eps-graph edges (rounded cosine ≥ threshold) by brute force —
    * the verification twin of the blocked LSH paths, standing in for the
    * reference's O(n²) `DistanceMatrix` memmap
    * (`/root/reference/src/pudl/analysis/record_linkage/link_cross_year.py:34-128`).
    *
    * The declarative crossJoin form pays ~0.5 KB of UnsafeRow copy per pair
    * (two 64-float arrays materialized through the nested-loop join) — at
    * 12M fixture pairs that memcpy IS the runtime. Since this path only
    * exists where the corpus is bounded (it is quadratic by definition; the
    * scale path is [[cosineNearDupPairs]]), the corpus is collected and
    * broadcast once (~20 bytes + 4·dim per row) and the triangular pair
    * loop runs on primitive float arrays inside `mapPartitions` — SURVEY
    * §7's "last resort" tier, justified here because no join materializes
    * anything. Row ranges are stride-interleaved so every task gets an
    * equal share of the triangle (contiguous blocks would give the first
    * task n·par more pairs than the last).
    *
    * Output is bit-identical to the crossJoin + [[dotFast]] + `round(_, 4)`
    * form: same left-fold association, same `BigDecimal` HALF_UP rounding
    * (what Spark's `round` does for doubles). Zero-norm vectors are
    * skipped (the declarative form's NaN cosine compares TRUE under
    * Spark's NaN-is-greatest `>=`, which no oracle reproduces — the same
    * divergence [[safeCosine]] guards). */
  def bruteForceEpsPairs(df: DataFrame, idCol: String, embCol: String,
                         threshold: Double): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val corpus: Array[(Long, Array[Float])] = df
      .select(col(idCol).cast("long"), col(embCol))
      .where(col(idCol).isNotNull && col(embCol).isNotNull)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val norms: Array[Double] = corpus.map { case (_, v) =>
      var acc = 0.0; var i = 0
      while (i < v.length) { acc += v(i).toDouble * v(i).toDouble; i += 1 }
      math.sqrt(acc)
    }
    val bc = spark.sparkContext.broadcast((corpus, norms))
    val n = corpus.length
    val par = math.max(1, spark.sparkContext.defaultParallelism)
    spark.range(0, par.toLong, 1, par).as[Long].flatMap { p =>
      val (c, nm) = bc.value
      Iterator.range(p.toInt, n, par).flatMap { i =>
        val (ida, va) = c(i)
        val na = nm(i)
        Iterator.range(i + 1, n).flatMap { j =>
          val (idb, vb) = c(j)
          val nb = nm(j)
          if (na == 0.0 || nb == 0.0) Iterator.empty
          else {
            var acc = 0.0; var k = 0
            val len = math.min(va.length, vb.length)
            while (k < len) { acc += va(k).toDouble * vb(k).toDouble; k += 1 }
            val cos = java.math.BigDecimal.valueOf(acc / (na * nb))
              .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()
            if (cos >= threshold) Iterator.single((ida, idb, cos))
            else Iterator.empty
          }
        }
      }
    }.toDF("id_a", "id_b", "cosine")
  }

  /** Deterministic pseudo-random hyperplanes (seeded), as literal arrays —
    * tiny (nBits × dim doubles), broadcast with the plan. */
  private def hyperplanes(nBits: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(nBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH bucket id for an embedding column. The whole plane
    * matrix evaluates in ONE native `PlaneSignBits` node (constant float[]
    * reference, codegen'd primitive loop) — bit i of the result is plane
    * i's sign, identical to the per-plane `FloatDotProduct` form but
    * without nBits × dim literal nodes in the plan. */
  def lshBucket(emb: Column, nBits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes = hyperplanes(nBits, dim, seed)
    graft.plans.PlaneSignBits(emb,
      planes.flatMap(_.map(_.toFloat)).toArray, dim)
  }

  /** All (table, bucket) memberships for an embedding: `tables` independent
    * hash tables of `nBits` hyperplanes each. Multi-table is what buys
    * recall: a true neighbor is a candidate if it collides in ANY table.
    * `portable = true` swaps the Gaussian planes for MD5-derived Rademacher
    * planes (global plane index g = t·nBits + i), making every bucket
    * reproducible by the DuckDB oracle. */
  private def bucketMemberships(emb: Column, nBits: Int, tables: Int,
                                dim: Int, portable: Boolean = false): Column =
    if (!portable)
      array((0 until tables).map { t =>
        struct(lit(t).as("tbl"),
          lshBucket(emb, nBits, dim, seed = 42L + t).as("bucket"))
      }: _*)
    else {
      val all = rademacherPlanes(tables * nBits, dim)
      array((0 until tables).map { t =>
        val flat = (0 until nBits).flatMap(i => all(t * nBits + i)).toArray
        struct(lit(t).as("tbl"),
          graft.plans.PlaneSignBits(emb, flat, dim).as("bucket"))
      }: _*)
    }

  /** Driver-side Lloyd iterations over a bounded sample: seeded distinct
    * init, empty clusters keep their previous centroid. Deterministic given
    * (sample order, seed). k·N·dim·iters ≈ 16·4096·64·8 ≈ 34M flops — µs-ms
    * scale, no cluster work. */
  private def localLloyd(sample: Array[Array[Float]], k: Int, iters: Int,
                         seed: Long): Seq[Array[Float]] = {
    require(sample.nonEmpty, "IVF quantizer needs a non-empty corpus sample")
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val init = rnd.shuffle(sample.indices.toVector).take(k).sorted
    var centroids = init.map(i => sample(i).map(_.toDouble)).toArray
    val kEff = centroids.length // k capped by sample size
    for (_ <- 0 until iters) {
      val sums = Array.fill(kEff)(new Array[Double](dim))
      val counts = new Array[Long](kEff)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < kEff) {
          var d = 0.0; var j = 0
          while (j < dim) {
            val diff = v(j) - centroids(c)(j); d += diff * diff; j += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(kEff) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
    }
    centroids.map(_.map(_.toFloat)).toSeq
  }

  /** IVF (inverted-file) approximate top-k — the other standard ANN scale
    * path next to LSH: a k-means coarse quantizer (MLlib, deterministic
    * seed) partitions the corpus into `nCells` cells; each query probes its
    * `nProbe` nearest centroids and ranks exactly within those cells.
    *
    * At 100 TB the corpus is hash-partitioned by cell id (the shuffle key),
    * centroids are a broadcast dimension, and candidate volume per query is
    * ~ nProbe/nCells of the corpus — the cross product never forms. Recall
    * rises with `nProbe` (nProbe = nCells degrades to exact brute force).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              embCol: String, k: Int, nCells: Int, nProbe: Int,
              seed: Long = 42L, kmeansIters: Int = 20,
              sampleN: Int = 4096): DataFrame = {
    // Coarse quantizer trained on a bounded, deterministic sample — the
    // standard IVF recipe at scale (FAISS trains on ~max(10k, 40·nCells)
    // points regardless of corpus size): centroids only ROUTE candidates,
    // recall comes from nProbe. sort+limit is a distributed TopK (no full
    // collect), then Lloyd runs driver-side on ≤sampleN rows in ~ms —
    // replacing kmeansIters full MLlib passes over the corpus.
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol), col(embCol)).sort(col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    val centroids = localLloyd(sample, nCells, kmeansIters, seed)
    ivfRank(queries, corpus, idCol, embCol, k, centroids, nProbe,
      roundedRouting = false)
  }

  /** Portable IVF — same routing/ranking as [[ivfTopK]], but the coarse
    * quantizer is the `nCells` corpus rows with the smallest portable hash
    * `hex60("ivf_" || id)` (ties by id-as-string), used directly as
    * centroids with no Lloyd refinement. Sampled-seed init is a standard
    * IVF quantizer (recall still comes from `nProbe`, cells are merely
    * routing); picking seeds by a deterministic engine-portable hash makes
    * the ENTIRE operator — seed set, cell assignment, probe set, final
    * ranking — replayable by the DuckDB oracle, so the approximate ANN path
    * graduates from rows-only to hash-checked. Cell-routing distances are
    * rounded (4 dp, cell-id tiebreak) so argmin agrees across engines
    * despite summation-order float drift. */
  def ivfTopKSeeded(queries: DataFrame, corpus: DataFrame, idCol: String,
                    embCol: String, k: Int, nCells: Int,
                    nProbe: Int): DataFrame = {
    val centroids: Seq[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("__sid"), col(embCol).as("__emb"))
      .withColumn("__h",
        graft.functions.PortableHash.hex60(concat(lit("ivf_"), col("__sid"))))
      .sort(col("__h"), col("__sid")).limit(nCells) // distributed TopK
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    ivfRank(queries, corpus, idCol, embCol, k, centroids, nProbe,
      roundedRouting = true)
  }

  /** Shared IVF routing/ranking for a constant centroid matrix. */
  /** Constant centroids → cell routing as one codegen expression per
    * row: (dist, cell) structs sorted by argmin over cells of
    * |v−c|² = v·v − 2v·c + c·c, with the per-row v·v constant dropped
    * (ordering only). All centroid dots come from ONE PlaneProjections
    * node; rounding (4 dp, cell tiebreak) makes the argmin
    * engine-portable. No shuffle, no window. */
  private def cellRouting(embCol: String, centroids: Seq[Array[Float]],
                          rounded: Boolean): Column = {
    val dim = centroids.head.length
    val cNorms2 = array(centroids.map(c =>
      lit(c.foldLeft(0.0)((acc, v) => acc + v.toDouble * v.toDouble))): _*)
    val rawDist = zip_with(
      graft.plans.PlaneProjections(col(embCol), centroids.flatten.toArray, dim),
      cNorms2, (proj, n2) => n2 - lit(2.0) * proj)
    val distArr =
      if (rounded) transform(rawDist, d => round(d, 4)) else rawDist
    array_sort(transform(distArr, (d, i) =>
      struct(d.as("dist"), i.as("cell"))))
  }

  private def ivfRank(queries: DataFrame, corpus: DataFrame, idCol: String,
                      embCol: String, k: Int, centroids: Seq[Array[Float]],
                      nProbe: Int, roundedRouting: Boolean): DataFrame = {
    val cellsByDist = cellRouting(embCol, centroids, roundedRouting)
    val corpusCells = corpus
      .withColumn("cell", element_at(cellsByDist, 1).getField("cell"))
      .select(col(idCol).as("c_id"), col(embCol).as("c_emb"), col("cell"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    // queries probe their nProbe nearest cells
    val queryCells = queries
      .withColumn("cell", explode(
        transform(slice(cellsByDist, 1, nProbe), s => s.getField("cell"))))
      .select(col(idCol).as("q_id"), col(embCol).as("q_emb"), col("cell"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    queryCells.join(corpusCells, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  /** Deterministic Rademacher (±1) hyperplanes derived from the portable
    * MD5-prefix hash: sign(i,d) = +1 iff hex60(md5("i_d")) is even. Unlike
    * the Gaussian planes in [[lshBucket]], these are reproducible in ANY
    * engine with MD5 — the DuckDB oracle rebuilds the identical matrix, and
    * sign-bit projections of ±1 planes are bit-exact (same in-order double
    * sum on both sides). Rademacher projections preserve angles in
    * expectation just like Gaussian ones (Achlioptas 2001). */
  private def rademacherPlanes(nBits: Int, dim: Int): Seq[Array[Float]] =
    (0 until nBits).map { i =>
      Array.tabulate(dim) { d =>
        if (graft.functions.PortableHash.hex60(s"${i}_$d") % 2 == 0) 1f else -1f
      }
    }

  /** Embedding-cosine near-duplicate pairs — the embedding-space member of
    * the dedup family (exact / MinHash / SimHash / Jaccard live in
    * `graft.dedup.NearDup`). Candidate generation is banded sign-bit
    * blocking: an `nBits`-bit hyperplane signature split into `bands`
    * equal bands; pairs agreeing exactly on ≥1 band meet in a (band, bits)
    * equi-join, then the EXACT cosine filter `>= threshold` runs inside
    * buckets only. The all-pairs cross product never materializes: shuffle
    * keys are (band, bits), candidate volume per doc is ~ bands × corpus /
    * 2^(nBits/bands) — the same blocking shape as MinHash-LSH, tuned by
    * band width. With the portable plane matrix the entire operator
    * (signatures → buckets → pairs → cosine) is replayable by the DuckDB
    * oracle, so it is hash-checked, not rows-only. */
  /** Banded sign-bit signature structs for an embedding: `bands` structs of
    * (band, bits) where bits packs `nBits/bands` portable Rademacher-plane
    * signs. The shared candidate-generation key for the cosine family. */
  /** The full nBits sign signature as ONE expression — callers that
    * explode many band structs should materialize this into a column
    * first ([[bandedSignStructsFromSig]]): struct arrays that INLINE the
    * signature expression repeat it per struct, and past a handful of
    * copies the generator stage falls out of whole-stage codegen and
    * evaluates interpreted (the probed 28-struct form cost 90 µs/row —
    * 50× the codegen'd path — until semDedup switched to the
    * sig-as-column shape, round 17). */
  private def planeSig(embCol: String, dim: Int, nBits: Int): Column =
    graft.plans.PlaneSignBits(col(embCol),
      rademacherPlanes(nBits, dim).flatten.toArray, dim)

  /** Band structs over a PRE-COMPUTED signature column: band b =
    * bits [b·w, (b+1)·w) via integer shift+mask. */
  private def bandedSignStructsFromSig(sig: Column, nBits: Int,
                                       bands: Int): Seq[Column] = {
    require(nBits % bands == 0, "bands must divide nBits")
    val w = nBits / bands
    (0 until bands).map { b =>
      val bits = shiftright(sig, b * w).bitwiseAND(lit((1L << w) - 1))
      struct(lit(b).as("band"), bits.as("bits"))
    }
  }

  /** [[bandedSignStructsFromSig]] plus Hamming-radius-1 probing over a
    * pre-computed signature column. */
  private def bandedSignStructsProbedFromSig(sig: Column, nBits: Int,
                                             bands: Int): Seq[Column] = {
    require(nBits % bands == 0, "bands must divide nBits")
    val w = nBits / bands
    (0 until bands).flatMap { b =>
      val bits = shiftright(sig, b * w).bitwiseAND(lit((1L << w) - 1))
      struct(lit(b).as("band"), bits.as("bits")) +:
        (0 until w).map { i =>
          struct(lit(b).as("band"),
            bits.bitwiseXOR(lit(1L << i)).as("bits"))
        }
    }
  }

  private def bandedSignStructs(embCol: String, dim: Int, nBits: Int,
                                bands: Int): Seq[Column] =
    bandedSignStructsFromSig(planeSig(embCol, dim, nBits), nBits, bands)

  /** [[bandedSignStructs]] plus Hamming-radius-1 probing: per band, the
    * base bucket AND all `w` single-bit flips — the near-dup transfer of
    * multi-probe LSH ([[lshMultiProbeTopK]]): a pair whose band signatures
    * differ in ONE bit now meets in that band. Meant for ONE side of a
    * self-join only (the other side keeps base memberships), so candidate
    * volume grows (w+1)× on the probe side while the blocked side — the
    * thing that is index-sized at 100 TB — stays put. */
  private def bandedSignStructsProbed(embCol: String, dim: Int, nBits: Int,
                                      bands: Int): Seq[Column] =
    bandedSignStructsProbedFromSig(planeSig(embCol, dim, nBits), nBits, bands)

  /** Single-row frame of per-dimension corpus (min, max) — the SQ8
    * codebook. Dim-bounded metadata (64 doubles per array here), computed
    * with one explode + hash agg and collapsed to aligned arrays, so it
    * broadcasts; at 100 TB this is the one full-corpus pass a quantizer
    * pays once, then every reader works on 1/4 the bytes. */
  def sq8Stats(df: DataFrame, embCol: String): DataFrame =
    df.select(posexplode(col(embCol)).as(Seq("__d", "__v")))
      .groupBy(col("__d"))
      .agg(min(col("__v").cast("double")).as("__mn"),
        max(col("__v").cast("double")).as("__mx"))
      .agg(array_sort(collect_list(
        struct(col("__d"), col("__mn"), col("__mx")))).as("__s"))
      .select(transform(col("__s"), x => x.getField("__mn")).as("__mns"),
        transform(col("__s"), x => x.getField("__mx")).as("__mxs"))

  /** Scalar int8 quantization (the FAISS `SQ8` baseline, Jégou et al.,
    * *Product Quantization for Nearest Neighbor Search*, TPAMI 2011 §III.A
    * discusses the scalar special case): per-dimension affine map of each
    * float to a 0..255 code against the corpus [min, max] — 4× smaller
    * vectors, which at 100 TB is the difference between an in-memory and a
    * spilling ANN index. The map is EXACT integer arithmetic on identically
    * derived doubles, so codes are reproducible bit-for-bit by any engine
    * (constant dimensions quantize to 0 rather than dividing by zero).
    * Adds `code: array<long>` next to the original column. */
  def sq8Quantize(df: DataFrame, idCol: String, embCol: String,
                  stats: DataFrame): DataFrame =
    df.crossJoin(broadcast(stats))
      .withColumn("code", transform(sequence(lit(1), size(col(embCol))),
        i => {
          val mn = element_at(col("__mns"), i)
          val mx = element_at(col("__mxs"), i)
          when(mx === mn, lit(0L)).otherwise(
            round((element_at(col(embCol), i).cast("double") - mn) *
              255.0 / (mx - mn)).cast("long"))
        }))

  /** Asymmetric quantized top-k (ADC: raw query × dequantized corpus
    * codes): the compressed-corpus variant of [[cosineTopK]], same output
    * contract (rounded cosine, id tiebreak). The corpus rides as codes —
    * the raw embedding never reaches the join — so the scoring pass moves
    * 4× fewer bytes; recall loss is the quantization error (spec-tested
    * ≥ 0.8 recall@5 on the fixture). */
  def sq8TopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              embCol: String, k: Int): DataFrame = {
    val stats = sq8Stats(corpus, embCol)
    val deq = sq8Quantize(corpus, idCol, embCol, stats)
      .withColumn("__xhat", transform(sequence(lit(1), size(col("code"))),
        i => element_at(col("__mns"), i) + element_at(col("code"), i) *
          (element_at(col("__mxs"), i) - element_at(col("__mns"), i)) / 255.0))
      .select(col(idCol).as("c_id"), col("__xhat"))
      .withColumn("__cn", sqrt(dot(col("__xhat"), col("__xhat"))))
    val q = queries.select(col(idCol).as("q_id"),
        col(embCol).cast("array<double>").as("__q"))
      .withColumn("__qn", sqrt(dot(col("__q"), col("__q"))))
    q.crossJoin(deq).where(col("q_id") =!= col("c_id"))
      .withColumn("cosine", round(safeCosine(
        dot(col("__q"), col("__xhat")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  // ---- Product quantization (Jégou et al., *Product Quantization for
  // Nearest Neighbor Search*, TPAMI 2011) — the codebook ANN compression
  // next to SQ8: dim splits into `m` subspaces, each subvector snaps to
  // one of `nCodes` codewords, the corpus rides as m small ints
  // (dim·4 bytes → m bytes at nCodes ≤ 256), and queries score
  // asymmetrically (raw query × reconstructed codewords — ADC, §IV.A).
  // At 100 TB the encoded corpus is the only thing the scoring pass
  // moves; codebooks are plan-time literals (the IVF-router pattern), so
  // encode and ADC are pure per-row expressions — zero shuffle beyond
  // the final per-query top-k window.

  /** Portable PQ codebooks: the `nCodes` corpus rows with the smallest
    * portable hash `hex60('pq_' || id)` (ties by id-as-string), each
    * split into `m` subvectors — subspace `mi`'s codebook is the seeds'
    * mi-th subvectors, no Lloyd refinement (the [[ivfTopKSeeded]] trick:
    * sampled-seed codebooks are a standard quantizer init, and a
    * deterministic engine-portable pick makes encode + ADC + ranking
    * replayable by the DuckDB oracle). */
  private def pqSeededCodebooks(corpus: DataFrame, idCol: String,
                                embCol: String, m: Int,
                                nCodes: Int): Seq[Seq[Array[Float]]] = {
    val seeds: Array[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("__sid"), col(embCol).as("__emb"))
      .withColumn("__h",
        graft.functions.PortableHash.hex60(concat(lit("pq_"), col("__sid"))))
      .sort(col("__h"), col("__sid")).limit(nCodes) // distributed TopK
      .collect().map(_.getSeq[Float](1).toArray)
    val dim = seeds.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    (0 until m).map(mi => seeds.toSeq.map(_.slice(mi * sub, (mi + 1) * sub)))
  }

  /** PQ-encode: append `codes` (array<int>, length m) — per subspace the
    * argmin codeword by ROUNDED (4 dp) `|c|² − 2·v_m·c` distance
    * (the per-row `|v_m|²` constant drops; ordering only) with codeword
    * index as tiebreak, so assignments agree across engines despite
    * summation-order float drift. One codegen'd expression per row:
    * all codeword dots come from a single constant-matrix
    * [[graft.plans.PlaneProjections]] node per subspace. */
  def pqEncode(df: DataFrame, embCol: String,
               codebooks: Seq[Seq[Array[Float]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // ONE native codegen pass computes all m argmin codes
    // (graft.plans.PqEncodeCodes): rounded distance + strict-< tiebreak
    // exactly as the declarative zip_with/round/fold chain it replaced —
    // that chain boxed nCodes structs per subspace per row through three
    // interpreted HOFs, the measured bulk of the sf1 encode pass
    val withCodes = df.withColumn("codes",
      graft.plans.PqEncodeCodes(col(embCol), codebooks))
    // __cn2sum (the fold of the chosen codewords' norms, fixed subspace
    // order) rides next to the codes so ADC never re-derives it per pair
    val cn2Sum = (0 until m).map { mi =>
      val cn2 = array(codebooks(mi).map(c =>
        lit(c.foldLeft(0.0)((a, v) => a + v.toDouble * v.toDouble))): _*)
      element_at(cn2, element_at(col("codes"), mi + 1) + 1)
    }.reduce(_ + _)
    withCodes.withColumn("__cn2sum", cn2Sum)
  }

  /** ADC top-k over a PQ-encoded corpus: per pair the approximate
    * squared euclidean distance Σ_m |q_m − c_{m,codes[m]}|², each term
    * expanded as `|q_m|² + |c|² − 2·q_m·c` with the codeword vector and
    * its norm read from plan-time literal arrays by the corpus row's
    * code — the raw corpus embedding never reaches the join. Terms sum
    * in fixed subspace order and round once (4 dp, id tiebreak) so the
    * ranking replays across engines. */
  private def pqAdcTopK(queries: DataFrame, encoded: DataFrame,
                        idCol: String, embCol: String, k: Int,
                        codebooks: Seq[Seq[Array[Float]]]): DataFrame = {
    val m = codebooks.length
    val sub = codebooks.head.head.length
    // per-pair algebra: adc = |q|² + Σ|c|² − 2·Σ q_m·c_m, with |q|²
    // (fold of per-subspace norms) computed ONCE per query row and Σ|c|²
    // attached at encode time — only the m small dots remain per pair
    val qn2Tot = (0 until m).map { mi =>
      val qm = slice(col("__q"), mi * sub + 1, sub)
      dotFast(qm, qm)
    }.reduce(_ + _)
    // native pair kernel: one codegen pass over all m subspace dots
    // (codeword lookup by the corpus row's code) — the declarative
    // slice + literal-array + HOF form evaluated m interpreted folds
    // per pair
    val dotSum: Column = graft.plans.PqAdcDotSum(col("__q"), col("codes"),
      codebooks)
    queries.select(col(idCol).as("q_id"), col(embCol).as("__q"))
      .withColumn("__qn2", qn2Tot)
      .crossJoin(encoded)
      .where(col("q_id") =!= col("c_id"))
      .withColumn("adc_dist",
        round(col("__qn2") + col("__cn2sum") - lit(2.0) * dotSum, 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc_dist").asc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "adc_dist")
  }

  /** Portable PQ ADC top-k (seeded codebooks, fully oracle-replayable —
    * the q159 production twin at fixture scale). */
  def pqTopKSeeded(queries: DataFrame, corpus: DataFrame, idCol: String,
                   embCol: String, k: Int, m: Int = 8,
                   nCodes: Int = 32): DataFrame = {
    val cbs = pqSeededCodebooks(corpus, idCol, embCol, m, nCodes)
    pqAdcTopK(queries,
      pqEncode(corpus, embCol, cbs)
        .select(col(idCol).as("c_id"), col("codes"), col("__cn2sum")),
      idCol, embCol, k, cbs)
  }

  /** IVF-PQ (the composition FAISS ships as `IVFx,PQy` — Jégou et al.
    * TPAMI 2011 §V): seeded-IVF cell routing prunes the corpus to each
    * query's `nProbe` cells, and ranking inside the probed cells runs on
    * the PQ-compressed codes via ADC — the canonical 100 TB ANN serving
    * shape, where the scoring pass moves m-byte codes hash-partitioned
    * by cell id instead of raw vectors, and candidate volume per query
    * is ~ nProbe/nCells of the corpus. Both quantizers are the portable
    * seeded forms, so routing, codes, and ranking all replay in the
    * oracle (q162). */
  def ivfPqTopKSeeded(queries: DataFrame, corpus: DataFrame, idCol: String,
                      embCol: String, k: Int, nCells: Int, nProbe: Int,
                      m: Int = 16, nCodes: Int = 64): DataFrame = {
    val centroids: Seq[Array[Float]] = corpus
      .select(col(idCol).cast("string").as("__sid"), col(embCol).as("__emb"))
      .withColumn("__h",
        graft.functions.PortableHash.hex60(concat(lit("ivf_"), col("__sid"))))
      .sort(col("__h"), col("__sid")).limit(nCells)
      .collect().map(_.getSeq[Float](1).toArray).toSeq
    val cbs = pqSeededCodebooks(corpus, idCol, embCol, m, nCodes)
    val sub = cbs.head.head.length
    val routing = cellRouting(embCol, centroids, rounded = true)
    val corpusCells = pqEncode(corpus, embCol, cbs)
      .withColumn("cell", element_at(routing, 1).getField("cell"))
      .select(col(idCol).as("c_id"), col("codes"), col("__cn2sum"),
        col("cell"))
    val qn2Tot = (0 until m).map { mi =>
      val qm = slice(col("__q"), mi * sub + 1, sub)
      dotFast(qm, qm)
    }.reduce(_ + _)
    val queryCells = queries
      .withColumn("cell", explode(
        transform(slice(routing, 1, nProbe), s => s.getField("cell"))))
      .select(col(idCol).as("q_id"), col(embCol).as("__q"), col("cell"))
      .withColumn("__qn2", qn2Tot)
    queryCells.join(corpusCells, Seq("cell"))
      .where(col("q_id") =!= col("c_id"))
      .withColumn("adc_dist", round(col("__qn2") + col("__cn2sum") -
        lit(2.0) * graft.plans.PqAdcDotSum(col("__q"), col("codes"), cbs), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("adc_dist").asc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "adc_dist")
  }

  /** Trained PQ ADC top-k: per-subspace Lloyd codebooks on a bounded
    * deterministic sample (the [[ivfTopK]] recipe — FAISS trains PQ on a
    * sample regardless of corpus size), then the same encode/ADC path.
    * Recall vs exact euclidean top-k is spec-tested on the fixture. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
             embCol: String, k: Int, m: Int = 8, nCodes: Int = 32,
             kmeansIters: Int = 10, seed: Long = 42L,
             sampleN: Int = 4096): DataFrame = {
    val sample: Array[Array[Float]] = corpus
      .select(col(idCol), col(embCol)).sort(col(idCol)).limit(sampleN)
      .collect().map(_.getSeq[Float](1).toArray)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m subspaces")
    val sub = dim / m
    val cbs = (0 until m).map(mi => localLloyd(
      sample.map(_.slice(mi * sub, (mi + 1) * sub)), nCodes, kmeansIters,
      seed + mi))
    pqAdcTopK(queries,
      pqEncode(corpus, embCol, cbs)
        .select(col(idCol).as("c_id"), col("codes"), col("__cn2sum")),
      idCol, embCol, k, cbs)
  }

  def cosineNearDupPairs(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, threshold: Double, nBits: Int = 24,
                         bands: Int = 4): DataFrame = {
    val bandStructs = bandedSignStructs(embCol, dim, nBits, bands)
    val buckets = df.select(col(idCol),
        explode(array(bandStructs: _*)).as("bb"))
      .select(col(idCol), col("bb.band"), col("bb.bits"))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("band", "bits"))
      .where(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    val emb = df.select(col(idCol), col(embCol))
      .withColumn("__n", sqrt(dotFast(col(embCol), col(embCol))))
    val ea = emb.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
      col("__n").as("__na"))
    val eb = emb.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
      col("__n").as("__nb"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("__cos", safeCosine(
        dotFast(col("__ea"), col("__eb")), col("__na") * col("__nb")))
      .where(col("__cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("__cos"), 4).as("cosine"))
  }

  /** Euclidean near-pair generation via p-stable LSH — the scale
    * replacement for the reference's O(n²) `DistanceMatrix` memmap
    * (`/root/reference/src/pudl/analysis/record_linkage/link_cross_year.py:34-128`)
    * under its own metric (the cross-year features are euclidean, not
    * cosine). Classic Datar–Indyk scheme: bucket_t(v) = ⌊(v·g_t + b_t)/w⌋
    * for a Gaussian direction g_t and uniform shift b_t; vectors within
    * distance eps land in the same bucket of some table with probability
    * rising as w/eps grows. Candidates meet on the (table, bucket)
    * equi-join — same blocking shape as every other family here — and the
    * EXACT distance filter runs inside buckets only.
    *
    * Neighboring-bucket misses are covered by multiple tables (shifted
    * grids), the standard multi-table trade: recall is tuned by `tables`
    * and `w` (≈ 2×eps is a good default), never by widening to a cross
    * join. Seeded and deterministic. */
  def euclideanNearPairs(df: DataFrame, idCol: String, embCol: String,
                         dim: Int, eps: Double, w: Double,
                         tables: Int = 8, seed: Long = 42L,
                         portable: Boolean = false): DataFrame = {
    val rnd = new scala.util.Random(seed)
    // portable mode: Rademacher directions + MD5-derived shifts, so the
    // DuckDB oracle rebuilds grids, buckets and candidates exactly
    // (namespaced "eg_"/"eshift_" keys; q95's planes use bare "i_d")
    val grids: Seq[(Array[Float], Double)] =
      if (portable) Seq.tabulate(tables) { t =>
        (Array.tabulate(dim) { d =>
          if (graft.functions.PortableHash.hex60(s"eg_${t}_$d") % 2 == 0) 1f
          else -1f
        }, (graft.functions.PortableHash.hex60(s"eshift_$t") % 1000000L)
          / 1000000.0)
      }
      else Seq.fill(tables)(
        (Array.fill(dim)(rnd.nextGaussian().toFloat), rnd.nextDouble()))
    // all grid projections in one PlaneProjections node, shifts as one
    // literal array; zip_with + posexplode keeps the plan at a handful of
    // nodes instead of tables × dim literals
    val flat = grids.flatMap(_._1).toArray
    val shifts = array(grids.map { case (_, s) => lit(s) }: _*)
    val bucketArr = zip_with(
      graft.plans.PlaneProjections(col(embCol), flat, dim), shifts,
      (proj, shift) => floor(proj / w + shift).cast("long"))
    val buckets = df.select(col(idCol),
        posexplode(bucketArr).as(Seq("tbl", "bucket")))
    val cand = buckets.as("x").join(buckets.as("y"), Seq("tbl", "bucket"))
      .where(col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
      .distinct()
    // exact squared distance via the codegen dot product:
    // |a-b|² = a·a - 2a·b + b·b, with the self-dots computed once per ROW
    // (O(n)) instead of per pair (O(candidates)); the final expression
    // keeps the same left-to-right association, so __d2 is bit-identical
    val e = df.select(col(idCol), col(embCol))
      .withColumn("__n2", dotFast(col(embCol), col(embCol)))
    val ea = e.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
      col("__n2").as("__na2"))
    val eb = e.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
      col("__n2").as("__nb2"))
    cand.join(ea, "id_a").join(eb, "id_b")
      .withColumn("__d2",
        col("__na2")
          - lit(2.0) * dotFast(col("__ea"), col("__eb"))
          + col("__nb2"))
      .where(col("__d2") <= eps * eps)
      .select(col("id_a"), col("id_b"),
        round(sqrt(greatest(col("__d2"), lit(0.0))), 6).as("dist"))
  }

  /** Approximate top-k: candidates share an LSH bucket in any of `tables`
    * hash tables, then exact cosine rank within candidates. Raise `tables`
    * for recall, `nBits` for selectivity — candidate volume is
    * ~ tables × corpus / 2^nBits per query, never the full cross product. */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              embCol: String, k: Int, nBits: Int, dim: Int,
              tables: Int = 4, portable: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
      explode(bucketMemberships(col(embCol), nBits, tables, dim, portable)).as("bb"))
      .select(col("q_id"), col("q_emb"), col("bb.tbl"), col("bb.bucket"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"),
      explode(bucketMemberships(col(embCol), nBits, tables, dim, portable)).as("bb"))
      .select(col("c_id"), col("c_emb"), col("bb.tbl"), col("bb.bucket"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val cand = q.join(c, Seq("tbl", "bucket")).where(col("q_id") =!= col("c_id"))
      .select("q_id", "q_emb", "__qn", "c_id", "c_emb", "__cn")
      .dropDuplicates("q_id", "c_id")
    cand
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  /** Per-(table) probe memberships for multi-probe LSH: the base bucket
    * plus the `probes − 1` single-bit-flip neighbor buckets whose planes
    * have the smallest projection margin |emb · plane| — the buckets a true
    * neighbor most likely fell into when it landed just across a hyperplane
    * (Lv et al., "Multi-Probe LSH", VLDB 2007; this is the step-wise probing
    * sequence truncated at Hamming radius 1).
    *
    * Margins come from [[PlaneProjections]] — the same in-order double
    * accumulation as [[PlaneSignBits]] — so in the portable (Rademacher ±1)
    * family every margin, and therefore the probe ORDER, is bit-identical
    * to the DuckDB oracle's `list_sum` replay. Ties break toward the lower
    * plane index (struct sort on (margin, bit)). `probes = 1` degrades to
    * exactly the base memberships of [[lshTopK]]. */
  private def multiProbeMemberships(emb: Column, nBits: Int, tables: Int,
                                    dim: Int, probes: Int,
                                    portable: Boolean): Column = {
    require(probes >= 1 && probes <= nBits + 1,
      s"probes must be in [1, nBits + 1 = ${nBits + 1}], got $probes")
    val pow2 = array((0 until nBits).map(i => lit(1L << i)): _*)
    val allPortable =
      if (portable) rademacherPlanes(tables * nBits, dim) else Seq.empty
    flatten(array((0 until tables).map { t =>
      val flat: Array[Float] =
        if (portable) (0 until nBits).flatMap(i => allPortable(t * nBits + i)).toArray
        else hyperplanes(nBits, dim, seed = 42L + t).flatMap(_.map(_.toFloat)).toArray
      val base = graft.plans.PlaneSignBits(emb, flat, dim)
      val proj = graft.plans.PlaneProjections(emb, flat, dim)
      // (|margin|, bit) ascending: the cheapest hyperplanes to cross first
      val margins = array_sort(transform(proj, (p, i) =>
        struct(abs(p).as("m"), i.as("bit"))))
      val flips = transform(slice(margins, 1, probes - 1), s =>
        base.bitwiseXOR(element_at(pow2, s.getField("bit") + 1)))
      transform(concat(array(base), flips), b =>
        struct(lit(t).as("tbl"), b.as("bucket")))
    }: _*))
  }

  /** Exact re-rank of an ANN shortlist — the second stage of FAISS's
    * standard two-stage serving shape: a compressed/coarse index produces
    * a `shortlist` of candidates per query (rows carrying `q_id`, `c_id`),
    * raw vectors are fetched ONLY for those pairs and re-scored with the
    * exact rounded cosine, top `k` kept. Removes the compressed index's
    * METRIC distortion entirely (ADC/SQ quantization error) — recall
    * becomes bounded by shortlist coverage alone, which is the half of
    * the gap the shortlist size controls.
    *
    * At 100 TB the raw-vector fetch is a |queries|·shortlistK-row join
    * against the corpus — bounded by the query set, never corpus-shaped;
    * the compressed index remains the only thing the full corpus scan
    * ever touched. Same scoring/tiebreak contract as [[cosineTopK]]. */
  def rerankExact(shortlist: DataFrame, queries: DataFrame,
                  corpus: DataFrame, idCol: String, embCol: String,
                  k: Int): DataFrame = {
    val cand = shortlist.select(col("q_id"), col("c_id")).distinct()
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    cand.join(q, "q_id").join(c, "c_id")
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  /** Multi-probe LSH approximate top-k (Lv et al., VLDB 2007): candidates
    * share EITHER the query's base bucket or one of its `probes − 1` best
    * single-bit-flip neighbor buckets in any of `tables` hash tables, then
    * exact cosine rank within candidates — same scoring/ranking contract as
    * [[lshTopK]] (`probes = 1` IS lshTopK).
    *
    * This is the recall lever that is cheap at 100 TB: extra TABLES
    * replicate the CORPUS side of the (tbl, bucket) equi-join — `tables`×
    * the index storage and shuffle volume — while extra PROBES only
    * replicate the bounded QUERY side (probes× a few hundred rows). The
    * corpus memberships here are identical to lshTopK's, so one persisted
    * bucket index serves both operators; recall per table rises from
    * P(all nBits signs agree) to P(≥ nBits−1 of the low-margin signs
    * agree), which is what moves recall@10 without touching index cost. */
  def lshMultiProbeTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                        embCol: String, k: Int, nBits: Int, dim: Int,
                        tables: Int = 4, probes: Int = 3,
                        portable: Boolean = false): DataFrame = {
    val q = queries.select(col(idCol).as("q_id"), col(embCol).as("q_emb"),
      explode(multiProbeMemberships(col(embCol), nBits, tables, dim, probes,
        portable)).as("bb"))
      .select(col("q_id"), col("q_emb"), col("bb.tbl"), col("bb.bucket"))
      .withColumn("__qn", sqrt(dotFast(col("q_emb"), col("q_emb"))))
    val c = corpus.select(col(idCol).as("c_id"), col(embCol).as("c_emb"),
      explode(bucketMemberships(col(embCol), nBits, tables, dim, portable)).as("bb"))
      .select(col("c_id"), col("c_emb"), col("bb.tbl"), col("bb.bucket"))
      .withColumn("__cn", sqrt(dotFast(col("c_emb"), col("c_emb"))))
    val cand = q.join(c, Seq("tbl", "bucket")).where(col("q_id") =!= col("c_id"))
      .select("q_id", "q_emb", "__qn", "c_id", "c_emb", "__cn")
      .dropDuplicates("q_id", "c_id")
    cand
      .withColumn("cosine", round(safeCosine(
        dotFast(col("q_emb"), col("c_emb")), col("__qn") * col("__cn")), 4))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cosine").desc, col("c_id").asc)))
      .where(col("rk") <= k)
      .select("q_id", "rk", "c_id", "cosine")
  }

  /** SemDeDup — semantic deduplication via clustered embeddings (Abbas et
    * al., arXiv:2303.09540): k-means the corpus embeddings, then search for
    * near-duplicates ONLY within each cluster, dropping every member that
    * has a same-cluster neighbor with cosine ≥ `tau` and a smaller id. The
    * cluster step is what makes semantic dedup tractable — pair volume is
    * Σ|cluster|², not n², and `k` is the knob that bounds it at corpus
    * scale (raise k until the largest cluster's pair count fits a task).
    *
    * Engine-portable Lloyd's: embeddings are quantized to integer grids
    * (`round(e · quantScale)` as long), so every distance is EXACT integer
    * arithmetic and every centroid update is an exact integer sum with one
    * floor-division — no float summation-order drift anywhere, which is
    * what lets a SQL engine replay the entire iteration trace bit-for-bit
    * (same trick as the portable IVF router, see [[ivfTopKSeeded]]; the
    * final cosine check reuses the q42/q95 rounded-double formula).
    * Init = the `k` lowest-id vectors (distributed TopK, k-row collect);
    * per-iteration state is k×dim longs on the driver — broadcast-sized at
    * any corpus scale, the standard Lloyd's-on-Spark shape. Assignment
    * ties break toward the lowest centroid index; centroids that lose all
    * members drop out (both replayed identically in SQL).
    *
    * Output: (id, cluster, is_dup). `iters` centroid updates run, with a
    * final assignment after the last update.
    *
    * Candidate generation inside a cluster has two forms. With
    * `bandedDim = Some(dim)` (the production path) pairs must ALSO agree
    * on ≥1 band of the same portable sign-bit signature that powers
    * [[cosineNearDupPairs]], so the per-cluster search is a
    * (cluster, band, bits) equi-join — candidate volume per doc is
    * ~ bands × |cluster| / 2^(nBits/bands), never |cluster|²/2. That is
    * the piece the SemDeDup paper leaves to faiss: at 100 TB a cluster is
    * still millions of rows even at a data-scaled k, and an unbanded
    * within-cluster self-join is a quadratic blowup. With
    * `bandedDim = None` the exact all-pairs form runs — the
    * oracle/verification twin, only for bounded inputs.
    *
    * `bandProbe1 = true` additionally probes, on ONE side of the
    * within-cluster self-join, every single-bit-flip neighbor bucket of
    * each band ([[bandedSignStructsProbed]]) — pairs within Hamming
    * distance 1 of agreeing on a band become candidates, the multi-probe
    * recall lever at (w+1)× probe-side candidate volume and UNCHANGED
    * blocked-side/index cost. The banded dup set grows monotonically
    * (candidate superset), never past the exact twin's.
    *
    * `targetClusterRows > 0` wires the scaladoc's "raise k with the
    * corpus" knob INTO the operator: the effective cluster count becomes
    * `max(k, ceil(n / targetClusterRows))` (n from one count job), so
    * expected cluster size — and with it the within-cluster candidate
    * volume per doc — stays CONSTANT as the corpus grows instead of
    * growing linearly (the fixed-k mode's superlinear pair blowup, the
    * suite's one >1.0 exponent in rounds 15–16). The derived k is a plan
    * literal per (corpus, target), so the Lloyd trace stays exactly
    * replayable by a SQL oracle computing the same greatest/ceil. k keeps
    * its role as the FLOOR (fixture-stable below k·target rows). At
    * extreme scale the k·n assignment cost of flat Lloyd's is the next
    * binding constraint — the standard answer is hierarchical k-means
    * (route to √k super-clusters, then k/√k within each), which composes
    * from this same operator applied per super-cluster. */
  def semDedup(df: DataFrame, idCol: String, embCol: String, k: Int,
               iters: Int, tau: Double, quantScale: Int = 1000,
               bandedDim: Option[Int] = None, nBits: Int = 24,
               bands: Int = 4, bandProbe1: Boolean = false,
               targetClusterRows: Int = 0): DataFrame = {
    require(k >= 1 && iters >= 0, "k >= 1, iters >= 0")
    val kEff =
      if (targetClusterRows <= 0) k
      else math.max(k.toLong,
        (df.count() + targetClusterRows - 1L) / targetClusterRows).toInt
    val q = df.select(col(idCol), col(embCol), expr(
      s"transform($embCol, e -> CAST(round(CAST(e AS DOUBLE) * $quantScale)" +
        " AS BIGINT))").as("__qe"))

    // Assignment = centroids as broadcast DATA, not plan literals: an
    // always-true constant-key equi-join (BroadcastHashJoin, k-row build
    // side) streams k centroid rows past every vector, the quantized
    // distance is the codegen'd [[graft.plans.LongSqDist]] primitive loop
    // (the declarative aggregate/zip_with fold allocates an array per
    // evaluation and runs interpreted — at a data-derived k the n·k
    // distance evaluations made it the lane's dominant cost), and the
    // per-vector argmin is min(struct(d, j)) — lexicographic, ties toward
    // the lower centroid index, exact integers, partial-aggregated
    // map-side so the shuffle carries n rows, never n·k. The earlier
    // plan-literal array_min form compiled a k·dim-literal expression —
    // codegen falls over past ~a few thousand literals. Plan size is now
    // O(1) in k; the remaining n·k distance work is Lloyd's own
    // arithmetic, one primitive loop per (vector, centroid).
    def assignFrame(cents: Seq[(Int, Array[Long])]): DataFrame = {
      val spark = df.sparkSession
      import spark.implicits._
      val centDf = cents.map { case (j, ce) => (j, ce.toSeq) }
        .toDF("__j", "__ce")
      q.select(col(idCol), col("__qe")).withColumn("__one", lit(1))
        .join(broadcast(centDf.withColumn("__one", lit(1))), "__one")
        .withColumn("__d", graft.plans.LongSqDist(col("__qe"), col("__ce")))
        .groupBy(col(idCol))
        .agg(min(struct(col("__d"), col("__j"))).as("__m"))
        .select(col(idCol), col("__m.__j").as("__cl"))
    }

    // Init: kEff lowest ids via distributed TopK; kEff rows collected
    // (bounded driver state by contract, like ivfTopK's sample).
    var centroids: Seq[(Int, Array[Long])] = q
      .select(col(idCol), col("__qe")).sort(col(idCol)).limit(kEff)
      .collect().zipWithIndex
      .map { case (r, j) => (j, r.getSeq[Long](1).toArray) }.toSeq

    for (_ <- 0 until iters) {
      // One narrow assignment + one (cluster, dim) agg per iteration; the
      // k×dim partial sums collapse map-side before the k-row collect.
      centroids = assignFrame(centroids)
        .join(q.select(col(idCol), col("__qe")), Seq(idCol))
        .select(col("__cl"), posexplode(col("__qe")).as(Seq("__d", "__v")))
        .groupBy(col("__cl"), col("__d"))
        .agg(sum(col("__v")).as("__s"), count(lit(1)).as("__n"))
        .groupBy(col("__cl"))
        .agg(sort_array(collect_list(
          struct(col("__d"), col("__s"), col("__n")))).as("dims"))
        .collect()
        .map { r =>
          val dims = r.getSeq[org.apache.spark.sql.Row](1)
          (r.getInt(0), dims.map(d =>
            math.floor(d.getLong(1).toDouble / d.getLong(2)).toLong).toArray)
        }.sortBy(_._1).toSeq
    }

    // Final assignment is evaluated ONCE into a narrow (id, cluster)
    // frame and joined back: `fin` fans out to several consumers below
    // (bucket explode, probe explode, both sides of the cosine join, the
    // final select), and without materialization each one would re-run
    // the n·k argmin over its whole input. The checkpoint holds ids +
    // one int each — corpus-narrow at any scale; blocks are released by
    // the caller's session hygiene like every checkpointed lane.
    val assigned = assignFrame(centroids)
      .select(col(idCol), col("__cl").as("cluster"))
      .localCheckpoint()
    val fin = q.join(assigned, Seq(idCol))
      .withColumn("__n2", sqrt(dotFast(col(embCol), col(embCol))))
    val dups = (bandedDim match {
      case Some(dim) =>
        // production path: candidates agree on cluster AND ≥1 signature
        // band — the same (band, bits) blocking as cosineNearDupPairs,
        // narrowed by the cluster key, so no unbanded self-join exists.
        // The sign signature materializes as ONE column below the
        // explode — band structs that inline the signature expression
        // repeat its 24 hyperplane dots per struct and (at the probed
        // 28-struct arity) drop the generator out of codegen entirely
        // (52 s → ~1 s on the 10× fixture).
        val fin2 = fin.withColumn("__sig", planeSig(embCol, dim, nBits))
        val buckets = fin2.select(col(idCol), col("cluster"),
            explode(array(
              bandedSignStructsFromSig(col("__sig"), nBits, bands): _*))
              .as("bb"))
          .select(col(idCol), col("cluster"), col("bb.band"), col("bb.bits"))
        // probe side: base memberships, or base + radius-1 flips — the
        // y (blocked) side always stays at base memberships
        val xBuckets = if (!bandProbe1) buckets
          else fin2.select(col(idCol), col("cluster"),
              explode(array(
                bandedSignStructsProbedFromSig(col("__sig"), nBits,
                  bands): _*))
                .as("bb"))
            .select(col(idCol), col("cluster"), col("bb.band"),
              col("bb.bits"))
        val cand = xBuckets.as("x")
          .join(buckets.as("y"), Seq("cluster", "band", "bits"))
          .where(col(s"y.$idCol") < col(s"x.$idCol"))
          .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
          .distinct()
        val ea = fin.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
          col("__n2").as("__na"))
        val eb = fin.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
          col("__n2").as("__nb"))
        cand.join(ea, "id_a").join(eb, "id_b")
          .withColumn("__cos", round(safeCosine(
            dotFast(col("__ea"), col("__eb")), col("__na") * col("__nb")), 4))
      case None =>
        // exact all-pairs twin: bounded inputs only (oracle verification)
        val left = fin.select(col(idCol).as("id_a"), col(embCol).as("__ea"),
          col("__n2").as("__na"), col("cluster"))
        val right = fin.select(col(idCol).as("id_b"), col(embCol).as("__eb"),
          col("__n2").as("__nb"), col("cluster"))
        left.join(right, Seq("cluster"))
          .where(col("id_b") < col("id_a"))
          .withColumn("__cos", round(safeCosine(
            dotFast(col("__ea"), col("__eb")), col("__na") * col("__nb")), 4))
    })
      .where(col("__cos") >= tau)
      .select(col("id_a")).distinct()
      .withColumn("__dup", lit(true))
    fin.select(col(idCol), col("cluster").cast("long").as("cluster"))
      .join(dups, col(idCol) === col("id_a"), "left")
      .withColumn("is_dup", coalesce(col("__dup"), lit(false)))
      .select(col(idCol), col("cluster"), col("is_dup"))
  }

  /** Element-wise mean embedding per group — the pooling primitive behind
    * "late chunking" (chunk embeddings → one document vector), class
    * centroids, and per-domain embedding profiles. The naive
    * `avg(e_d) over group` is ORDER-DEPENDENT on floats (partial sums
    * combine in shuffle arrival order, so reruns drift in the last ulp);
    * here each value is quantized to an integer grid
    * (`round(e·quantScale)` as long — the same portable trick as
    * [[semDedup]]'s Lloyd's state), summed EXACTLY as longs, and divided
    * once at the end: `(Σq / n) / quantScale` — two IEEE divisions in a
    * fixed order, bit-identical on any engine and any partitioning.
    *
    * Scale: one posexplode (dim× row growth, map-side) into one
    * (group, dim) partial-aggregated shuffle, then a per-group collapse to
    * the sorted centroid array — state per group is dim longs. No
    * collects, no windows. Output: (group, n_members, centroid). */
  def pooledCentroids(df: DataFrame, groupCol: String, embCol: String,
                      quantScale: Int = 1000000): DataFrame = {
    require(quantScale >= 1, "quantScale must be >= 1")
    val qe = expr(s"transform($embCol, e -> CAST(round(CAST(e AS DOUBLE) * " +
      s"$quantScale) AS BIGINT))")
    df.select(col(groupCol), posexplode(qe).as(Seq("__d", "__q")))
      .groupBy(col(groupCol), col("__d"))
      .agg(sum(col("__q")).as("__s"), count(lit(1)).as("__n"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n_members"),
        array_sort(collect_list(struct(col("__d"), col("__s"), col("__n"))))
          .as("__dims"))
      .select(col(groupCol), col("n_members"),
        transform(col("__dims"), s =>
          s.getField("__s").cast("double") / s.getField("__n") / quantScale)
          .as("centroid"))
  }
}
