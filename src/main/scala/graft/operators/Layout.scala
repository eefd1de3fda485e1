package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for write-time clustering — the 100 TB lever the
  * fixtures can't show directly: at scale, query cost is dominated by how
  * much data the scan can SKIP, and skipping is a property of the layout
  * chosen when the data was written (file/row-group min-max stats only
  * prune when each file covers a small range of the filter columns).
  *
  * Z-ORDER clustering maps multiple bucketed dimensions onto one
  * space-filling-curve key and range-partitions + sorts by it, so every
  * file covers a small HYPER-RECTANGLE of the dimension space and a
  * multi-dimensional box predicate prunes to the few files whose
  * rectangles intersect it — where sorting by a single column gives
  * perfect pruning on that column and none on the others. (Same idea as
  * the layout clustering in Delta/Iceberg `OPTIMIZE ZORDER BY`, built here
  * from public bit-interleaving arithmetic.)
  */
object Layout {

  /** Morton (Z-order) interleave of `cols` as a single long.
    *
    * Each column is masked to its low `bits` bits (callers bucket/scale
    * first — e.g. `pmod(hash, 1024)` or a range-rank); bit `i` of
    * dimension `d` lands at position `i * nDims + d` of the result. All
    * shift amounts are PLAN-TIME constants, so the whole key is a static
    * sum of `bits × nDims` mask-and-multiply terms — plain codegen'd
    * long arithmetic, no HOFs, no UDF: the masked bit `v & (1<<i)`
    * already carries weight `2^i`, so multiplying by
    * `2^(i*(n-1) + d)` lands it at `2^(i*n + d)`.
    *
    * @param bits per-dimension bit width; `bits * cols.size` ≤ 62 keeps
    *             the key positive in a signed long on every engine. */
  def zorderValue(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least 2 dimensions (1 dim = plain sort)")
    require(bits >= 1 && bits * n <= 62,
      s"bits*dims must fit a positive signed long, got $bits*$n")
    val terms = for {
      (c, d) <- cols.zipWithIndex
      v = c.cast("long").bitwiseAND(lit((1L << bits) - 1))
      i <- 0 until bits
    } yield v.bitwiseAND(lit(1L << i)) * lit(1L << (i * (n - 1) + d))
    terms.reduce(_ + _)
  }

  /** Cluster a frame for writing: range-partition on the z-key (each
    * output file covers a contiguous z-range = a small set of dimension
    * rectangles) and sort within partitions (row-group stats tighten the
    * same way). `numPartitions` sizes output files; the z-key column is
    * kept (`zCol`) so writers can also use it as a sort/bucket key.
    *
    * The range partitioner samples the z-distribution, so partition
    * BOUNDARIES are data-dependent (not oracle-replayed); the z-key
    * itself is exact deterministic arithmetic (q114). */
  def clusterByZOrder(df: DataFrame, dims: Seq[Column], bits: Int,
                      numPartitions: Int, zCol: String = "zval"): DataFrame =
    df.withColumn(zCol, zorderValue(dims, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(zCol)

  /** Length-bucketed batch assignment — the padding-minimization layout
    * every sequence-model data loader applies (bucketed batching: group
    * similar-length sequences so each fixed-size batch pads to its own
    * max, not the global one). Documents are sharded by id (batching is
    * sequential only WITHIN a shard, so shards assign independently — the
    * same parallelism contract as
    * [[graft.text.TextAnalysis.packSequences]]; no global window, no
    * single-partition bottleneck), ordered inside the shard either by id
    * (`byLength = false`, the naive arrival-order baseline) or by
    * (length, id), and cut into `batchSize`-row batches.
    *
    * Returns per-batch stats: size, max/sum length, and `padding` =
    * `max_len · n_docs − sum_len` — the wasted token slots the batch pays
    * when padded to its max. Pure integer window arithmetic, replayable
    * by any engine; comparing the two orderings on the same corpus
    * quantifies the layout win (the spec shows >5× padding reduction on
    * the fixture corpus). */
  def batchByLength(df: DataFrame, idCol: String, lenCol: Column,
                    batchSize: Int, nShards: Int,
                    byLength: Boolean): DataFrame = {
    require(batchSize >= 1 && nShards >= 1,
      "batchSize and nShards must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard"))
      .orderBy(
        (if (byLength) Seq(col("len").asc) else Seq.empty) :+
          col(idCol).asc: _*)
    df.select(col(idCol), lenCol.cast("long").as("len"),
        pmod(col(idCol), lit(nShards)).cast("long").as("shard"))
      .withColumn("batch_id",
        floor((row_number().over(w) - 1) / lit(batchSize.toDouble)))
      .groupBy(col("shard"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("len")).as("max_len"),
        sum(col("len")).as("sum_len"))
      .withColumn("padding",
        col("max_len") * col("n_docs") - col("sum_len"))
  }

  /** Per-file min/max/count manifest of a written dataset — the skipping
    * index the layout exists for. One scan + one hash aggregation on the
    * file path; readers intersect a predicate's box with the manifest and
    * read only matching files (the external-manifest form of what parquet
    * row-group stats do inside a file, usable from ANY engine and cheap to
    * keep in a small side table at 100 TB: one row per file).
    *
    * Read the dataset back with exactly the columns to index;
    * `spark.read.parquet(path)` + this = manifest maintenance after a
    * compaction/cluster job. */
  def statsManifest(df: DataFrame, statCols: Seq[String]): DataFrame =
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        statCols.flatMap(c => Seq(
          min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** The `kHashes` Bloom bit positions of one key: seeded portable hashes
    * mod `mBits` (hex60(s"${i}_$key") % m for i < k), as an array column.
    * The portable family makes the whole filter a pure function of the key
    * string — any engine (and the DuckDB oracle) rebuilds identical
    * filters. */
  def bloomPositions(key: Column, mBits: Int, kHashes: Int): Column =
    array((0 until kHashes).map(i =>
      pmod(graft.functions.PortableHash.seeded(i, key), lit(mBits.toLong))): _*)

  /** Per-file Bloom-filter bits of a key column: DISTINCT (file, bit)
    * rows — the join-friendly form of the filter. Complements
    * [[statsManifest]] for the predicate class min/max CANNOT prune:
    * point lookups on high-cardinality keys whose values interleave
    * across files (every file's [min, max] spans the probe, yet almost
    * no file actually contains it). Parquet row-group bloom filters do
    * this inside a file; this is the external, engine-portable manifest
    * of the same idea — one row per set bit, ≤ `mBits` rows per file.
    *
    * `fileCol` is the file/shard identity — `input_file_name()` after a
    * real write, or any synthetic shard expression when auditing a
    * layout before writing it. */
  def bloomBits(df: DataFrame, fileCol: Column, keyCol: Column,
                mBits: Int, kHashes: Int): DataFrame = {
    require(mBits >= 2 && kHashes >= 1, "need mBits >= 2, kHashes >= 1")
    df.select(fileCol.as("file"),
        explode(bloomPositions(keyCol.cast("string"), mBits, kHashes))
          .as("bit"))
      .distinct()
  }

  /** Aggregated persistable form: one manifest row per file with the set
    * bits as a sorted array (plus fill stats — `n_bits_set / mBits` is
    * the saturation that drives the false-positive rate). */
  def bloomManifest(df: DataFrame, fileCol: Column, keyCol: Column,
                    mBits: Int, kHashes: Int): DataFrame =
    bloomBits(df, fileCol, keyCol, mBits, kHashes)
      .groupBy(col("file"))
      .agg(count(lit(1)).as("n_bits_set"),
        sort_array(collect_list(col("bit"))).as("bits"))

  /** Probe the bit manifest: for each probe key, the files that MAY
    * contain it — a file qualifies iff ALL `kHashes` of the key's bit
    * positions are set in that file's filter (count-match on the
    * bit-position equi-join; no false negatives by construction, false
    * positives bounded by filter saturation).
    *
    * Scale shape: the probe set is a handful of point-lookup keys and the
    * manifest is one row per (file, set bit) — both sides are tiny next
    * to the data they prune, the join is a broadcast of the probe
    * positions, and the scan that follows reads ONLY the candidate files.
    */
  def bloomProbe(bits: DataFrame, probes: DataFrame, probeCol: String,
                 mBits: Int, kHashes: Int): DataFrame = {
    val ppos = probes
      .select(col(probeCol),
        explode(bloomPositions(col(probeCol).cast("string"), mBits, kHashes))
          .as("bit"))
      .distinct()
    val npos = ppos.groupBy(col(probeCol)).agg(count(lit(1)).as("__np"))
    ppos.join(bits, Seq("bit"))
      .groupBy(col(probeCol), col("file"))
      .agg(count(lit(1)).as("__hits"))
      .join(npos, Seq(probeCol))
      .where(col("__hits") === col("__np"))
      .select(col(probeCol), col("file"))
  }
}
