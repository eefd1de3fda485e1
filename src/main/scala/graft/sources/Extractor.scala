package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Resource

/** Partitioned multi-source extraction (SURVEY §2.1 first row) — the engine
  * analogue of `GenericExtractor.extract`
  * (`/root/reference/src/pudl/extract/extractor.py:243-290`): per partition
  * (year/quarter/file) load → rename via a per-partition column map →
  * align columns → concat → enforce the declared schema.
  *
  * The reference fans out one Dagster process per partition then concats
  * in-memory; here each partition is a lazy DataFrame and the union is one
  * plan — Spark schedules the file reads in parallel and nothing
  * materializes until the sink.
  */
object Extractor {

  /** One extraction partition: where to read and how its raw columns map
    * onto canonical names (raw → canonical; unmapped columns are dropped). */
  case class Partition(path: String, format: String = "parquet",
                       columnMap: Map[String, String] = Map.empty,
                       options: Map[String, String] = Map.empty)

  def extractPartition(spark: SparkSession, p: Partition): DataFrame = {
    val raw = spark.read.format(p.format).options(p.options).load(p.path)
    val renamed = p.columnMap.foldLeft(raw) { case (df, (from, to)) =>
      if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
    if (p.columnMap.nonEmpty) {
      val keep = p.columnMap.values.toSeq.filter(renamed.columns.contains)
      renamed.select(keep.map(col): _*)
    } else renamed
  }

  /** Extract all partitions, align by name (missing columns → NULL), and
    * enforce the declared schema — `concat_pages` + `enforce_schema`
    * (`extractor.py:292-327`, `metadata/classes.py:1868-1930`). */
  def extract(spark: SparkSession, partitions: Seq[Partition],
              resource: Resource): DataFrame = {
    val frames = partitions.map(extractPartition(spark, _))
    val unioned = frames.reduce(_.unionByName(_, allowMissingColumns = true))
    resource.enforceSchema(unioned)
  }
}
