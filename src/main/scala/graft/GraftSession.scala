package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's canonical configuration.
  *
  * Scale notes (100 TB design): these settings are the *local* profile; on a
  * real cluster the same builder is used but `master`/memory come from
  * spark-submit. AQE is always on — it handles skew-join splitting and
  * runtime shuffle-partition coalescing, which is our first line of defense
  * at 1000-executor scale. Session timezone is pinned to UTC so timestamp
  * semantics never depend on cluster-local state (SURVEY §7 hard-part #5).
  */
object GraftSession {

  /** Apply graft's canonical confs to any builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // parallelismFirst stays at its default (true): size-based
      // coalescing (parallelismFirst=false + advisory 256m, guide §9)
      // was MEASURED in round 17 and reverted — it coalesces this
      // engine's compute-dense small shuffles (portable-MD5 hashing,
      // posting-list pair emits) onto too few cores and a 20-query spine
      // regressed 39.5 → 47.2 s (q133 3.9 → 7.7 s). Bytes-per-CPU-second
      // here is low, so parallelism, not partition size, is the binding
      // constraint — on a production cluster the advisory size only
      // matters once shuffles exceed cores × advisory, where the default
      // behaves identically.
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // AQE SMJ→shuffled-hash conversion, size-gated at runtime (guide
      // §3.1): a sort-merge join whose post-shuffle partitions ALL fit
      // under the threshold skips both sorts and builds a per-partition
      // hash table instead. Unlike a global preferSortMergeJoin=false
      // this cannot OOM a fat build partition at scale — partitions over
      // the threshold keep the sort-merge plan. Default is 0 (off).
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.filterPushdown", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      // events.parquet stores TIMESTAMP(NANOS) which Spark's vectorized
      // reader rejects by default; read as long and convert (Tables.load).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors.min(32)): SparkSession = {
    val s = tune(
      SparkSession.builder().master(s"local[$cores]").appName("graft"),
      shufflePartitions = cores
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
