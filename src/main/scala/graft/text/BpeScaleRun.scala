package graft.text

import org.apache.spark.sql.functions._

/** Dev tool (SCALE.md evidence, not part of the library surface): train
  * BPE at a REAL vocabulary size over a documents fixture and report
  * wall time + driver heap — the measurement VERDICT r10 asked for after
  * [[TextAnalysis.bpeMergeTableLocal]] lifted the merge cap.
  *
  * Run: `runMain graft.text.BpeScaleRun <sfDir> [merges=30000]`.
  * Prints one line: merges requested/learned, type-dictionary size, wall
  * seconds (corpus pass + driver loop split out), and used heap after a
  * GC — the collected type dictionary plus the loop's inverted index is
  * the only driver state that scales. */
object BpeScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = if (args.length > 1) args(1).toInt else 30000
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val t0 = System.nanoTime()
    // corpus-pass-only baseline: the same type dictionary the trainer
    // collects, timed separately so the driver-loop share is explicit
    val nTypes = docs
      .select(explode(TextAnalysis.tokens(col("text"))).as("__w"))
      .where(length(col("__w")) > 0)
      .select(countDistinct(col("__w"))).head().getLong(0)
    val tPass = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val table = TextAnalysis.bpeMergeTableLocal(docs, "text", merges)
    val learned = table.count()
    val tTrain = (System.nanoTime() - t1) / 1e9

    val rt = Runtime.getRuntime
    System.gc()
    val heapMb = (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
    println(f"""{"tool":"bpe_scale","sf":"$sfDir","merges_requested":$merges,""" +
      f""""merges_learned":$learned,"n_types":$nTypes,""" +
      f""""corpus_pass_sec":$tPass%.2f,"train_sec":$tTrain%.2f,""" +
      f""""driver_heap_mb":$heapMb}""")
  }
}
