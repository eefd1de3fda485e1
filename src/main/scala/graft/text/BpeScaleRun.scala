package graft.text

import org.apache.spark.sql.functions._

/** Dev tool (SCALE.md evidence, not part of the library surface): train
  * BPE at a REAL vocabulary size over a documents fixture and report
  * wall time + driver heap — the measurement VERDICT r10 asked for after
  * [[TextAnalysis.bpeMergeTableLocal]] lifted the merge cap.
  *
  * Run: `runMain graft.text.BpeScaleRun <sfDir> [merges=30000] [mode]`.
  * Prints one line: merges requested/learned, type-dictionary size, wall
  * seconds (corpus pass + driver loop split out), and used heap after a
  * GC — the collected type dictionary plus the loop's inverted index is
  * the only driver state that scales.
  *
  * `mode=fixture` (default) trains on the documents text as-is. The
  * synthetic corpus has a CLOSED ~31-word vocabulary, so training runs
  * dry after ~100 merges — that bounds the fixture measurement, not the
  * trainer. `mode=stress` derives a realistic-size OPEN type dictionary
  * deterministically from the same fixture (one 32-hex-char word per
  * doc_id: `md5(doc_id)`), giving |types| = |docs| (~500k at sf1) with
  * rich shared-substring structure over the 16-char hex alphabet — the
  * regime the 30k-merge driver loop actually has to survive. */
object BpeScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val merges = if (args.length > 1) args(1).toInt else 30000
    val mode = if (args.length > 2) args(2) else "fixture"
    val spark = graft.GraftSession.local()
    spark.sparkContext.setLogLevel("WARN")
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    // stress[K]: K hex words per doc (default 1) -> |types| = K * |docs|
    val docs = mode match {
      case s if s.startsWith("stress") =>
        val k = if (s.length > 6) s.drop(6).toInt else 1
        raw.select(explode(sequence(lit(0), lit(k - 1))).as("__i"),
            col("doc_id"))
          .select(md5(concat_ws("_", col("doc_id"), col("__i"))).as("text"))
      case _ => raw
    }

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
    // peak across heap pools: the loop's working set (type symbols +
    // pair stats + inverted pair->word index) shows here, not in the
    // post-GC retained number
    import scala.jdk.CollectionConverters._
    val peakMb = java.lang.management.ManagementFactory.getMemoryPoolMXBeans
      .asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getPeakUsage.getUsed).sum / (1024 * 1024)
    println(f"""{"tool":"bpe_scale","sf":"$sfDir","merges_requested":$merges,""" +
      f""""merges_learned":$learned,"n_types":$nTypes,""" +
      f""""corpus_pass_sec":$tPass%.2f,"train_sec":$tTrain%.2f,""" +
      f""""driver_heap_mb":$heapMb,"driver_heap_peak_mb":$peakMb}""")
  }
}
