package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.CheckRunner
import graft.checks.CheckRunner._
import graft.functions.AggFunctions._
import graft.operators.{Dedup, Harvest}
import graft.schema.{Field, FieldType, Resource}
import graft.sources.ParquetSink

/** End-to-end pipeline demo: the reference's extract → transform →
  * harvest → output → validate asset graph (SURVEY §3.1) collapsed into
  * one lazy Catalyst lineage with explicit parquet checkpoints only at
  * named outputs. Run: `runMain graft.Etl <sfDir> <outDir>`.
  *
  * Dagster process boundaries become shuffle boundaries; the only
  * materializations are the two declared output tables and the check
  * results.
  */
object Etl {

  val customerSummary: Resource = Resource("out_customer_summary", Seq(
    Field("c_custkey", FieldType.Integer, required = true),
    Field("segment", FieldType.Str,
      enum = Some(Seq("BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE"))),
    Field("n_orders", FieldType.Integer),
    Field("lifetime_value", FieldType.Number),
    Field("latest_order", FieldType.Datetime)),
    primaryKey = Seq("c_custkey"))

  val supplierYearly: Resource = Resource("out_supplier_yearly", Seq(
    Field("s_suppkey", FieldType.Integer, required = true),
    Field("ship_year", FieldType.Year, required = true),
    Field("revenue", FieldType.Number),
    Field("wavg_discount", FieldType.Number)),
    primaryKey = Seq("s_suppkey", "ship_year"))

  /** Training-corpus layout: canonical (deduped) docs with their stable
    * split membership and packed context-window placement. */
  val corpusPacked: Resource = Resource("out_corpus_packed", Seq(
    Field("doc_id", FieldType.Integer, required = true),
    Field("split", FieldType.Str,
      enum = Some(Seq("train", "val", "test"))),
    Field("n_tokens", FieldType.Integer),
    Field("shard", FieldType.Integer),
    Field("chunk_id", FieldType.Integer)),
    primaryKey = Seq("doc_id"))

  /** Build both outputs as one lineage over the fixture tables. */
  def build(spark: SparkSession, sfDir: String): Map[String, DataFrame] = {
    val orders = Tables.load(spark, sfDir, "orders")
    val customer = Tables.load(spark, sfDir, "customer")
    val lineitem = Tables.load(spark, sfDir, "lineitem")

    // transform + harvest: per-customer rollup with modal-segment harvesting
    val perCustomer = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("lifetime_value"),
        max(col("o_orderdate")).as("latest_order"))
    val segment = Harvest.occurrenceConsistency(
        customer.select(col("c_custkey"), col("c_mktsegment")),
        Seq("c_custkey"), "c_mktsegment", strictness = 0.0)
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val custOut = customer.select("c_custkey")
      .join(segment, Seq("c_custkey"), "left")
      .join(perCustomer, Seq("c_custkey"), "left")

    val suppOut = lineitem
      .groupBy(col("l_suppkey").as("s_suppkey"),
        year(col("l_shipdate")).as("ship_year"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"),
        weightedAvgExact(col("l_discount"), col("l_quantity"), 2)
          .as("wavg_discount"))

    // training-data stage: exact dedup -> deterministic split -> packing,
    // one lazy lineage over the documents fixture
    val documents = Tables.load(spark, sfDir, "documents")
    val canonical = documents.join(
      graft.dedup.NearDup.exactDupGroups(documents, "doc_id", "text")
        .where(!col("is_dup")).select("doc_id"),
      Seq("doc_id"))
    val packed = graft.text.TextAnalysis.packSequences(
      canonical, "doc_id", "text", budget = 512, nShards = 8)
    val corpusOut = packed.join(
        graft.operators.Sampling.deterministicSplit(
            canonical.select(col("doc_id")), "doc_id",
            Seq("train" -> 80, "val" -> 10, "test" -> 10))
          .select(col("doc_id"), col("split")),
        Seq("doc_id"))
      .select("doc_id", "split", "n_tokens", "shard", "chunk_id")

    Map(customerSummary.name -> custOut, supplierYearly.name -> suppOut,
      corpusPacked.name -> corpusOut)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_etl").toString
    val spark = GraftSession.local()
    val outputs = build(spark, sfDir)

    ParquetSink.write(outputs(customerSummary.name), customerSummary,
      s"$outDir/${customerSummary.name}")
    ParquetSink.write(outputs(supplierYearly.name), supplierYearly,
      s"$outDir/${supplierYearly.name}", partitionBy = Seq("ship_year"))
    // training corpus partitioned by split: downstream loaders prune to
    // their split without touching the others
    ParquetSink.write(outputs(corpusPacked.name), corpusPacked,
      s"$outDir/${corpusPacked.name}", partitionBy = Seq("split"))
    // legacy single-file mirror of both outputs — the reference's
    // PudlMixedFormatIOManager writes Parquet AND SQLite side by side
    graft.sources.SqliteSink.write(
      outputs.toSeq.map { case (n, df) => n -> df.orderBy(df.columns.head) },
      s"$outDir/graft.sqlite")

    // validation layer over the written outputs (dbt analogue)
    val results = Seq(
      customerSummary.name -> CheckRunner.run(
        spark.read.parquet(s"$outDir/${customerSummary.name}"),
        CheckRunner.fromResource(customerSummary)),
      supplierYearly.name -> CheckRunner.run(
        spark.read.parquet(s"$outDir/${supplierYearly.name}"),
        CheckRunner.fromResource(supplierYearly) :+
          ColumnsRatio("out_supplier_yearly:rev_per_discount_sane",
            "revenue", "revenue", 0.999, 1.001)),
      corpusPacked.name -> CheckRunner.run(
        spark.read.parquet(s"$outDir/${corpusPacked.name}"),
        CheckRunner.fromResource(corpusPacked))
    )
    results.foreach { case (table, df) =>
      println(s"== checks: $table ==")
      df.collect().foreach(r => println(s"  ${r.mkString(" | ")}"))
    }
    val failed = results.map(_._2.where(!col("passed")).count()).sum
    println(s"ETL complete -> $outDir (failed checks: $failed)")
    if (failed > 0) sys.exit(1)
  }
}
