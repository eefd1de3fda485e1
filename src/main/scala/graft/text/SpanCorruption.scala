package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** T5-style span corruption (Raffel et al., JMLR 2020 §3.1.4; UL2's
  * denoisers, Tay et al. 2022, are the same operator at other
  * rate/span settings): the corpus-side step that turns raw documents
  * into (corrupted input, target) pairs for denoising pretraining.
  * Tokens partition into fixed-length blocks of `spanLen`; a
  * deterministic portable-hash coin masks each block with probability
  * `rateNum/rateDen` (defaults 3/20 = 15%, spans of 3 — the T5 paper's
  * settings); masked blocks collapse to `<extra_id_K>` sentinels in the
  * input (K = 0-based rank of the masked block within the doc) and
  * expand to sentinel + original tokens in the target, which ends with
  * the terminal sentinel `<extra_id_n_spans>` — the exact sentinel
  * numbering contract T5 training expects.
  *
  * Determinism & scale: the coin is hash(doc, block) — no RNG state, so
  * any partitioning, retry, or engine produces the same masks (the
  * portable 60-bit MD5-prefix family replays in the SQL oracle). The
  * whole operator is one explode + windows on the doc key + one grouped
  * reassembly: a single exchange on `idCol`, reused between the window
  * and the aggregation. At 100 TB this is a map-shaped pass over the
  * corpus — state per doc is the doc itself, nothing global.
  */
object SpanCorruption {

  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  spanLen: Int = 3, rateNum: Int = 3,
                  rateDen: Int = 20): DataFrame = {
    require(spanLen >= 1, "spanLen must be >= 1")
    require(rateNum >= 0 && rateDen >= 1 && rateNum <= rateDen,
      "need 0 <= rateNum <= rateDen, rateDen >= 1")
    val words = docs
      .select(col(idCol), posexplode(split(col(textCol), " ")))
      .toDF(idCol, "pos", "tok")
      .where(col("tok") =!= "")
    val blocked = words
      .withColumn("blk", floor(col("pos") / spanLen).cast("long"))
      .withColumn("masked",
        pmod(graft.functions.PortableHash.hex60(concat(
            col(idCol).cast("string"), lit("_"), col("blk").cast("string"))),
          lit(rateDen.toLong)) < rateNum)
      .withColumn("first", col("pos") % spanLen === 0)
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = blocked
      // K: 0-based rank of this row's block among the doc's masked blocks
      .withColumn("k",
        sum(when(col("masked") && col("first"), 1L).otherwise(0L)).over(w)
          - 1)
      .withColumn("in_tok",
        when(!col("masked"), col("tok"))
          .when(col("first"),
            concat(lit("<extra_id_"), col("k"), lit(">"))))
      .withColumn("tg_tok",
        when(col("masked") && col("first"),
            concat(lit("<extra_id_"), col("k"), lit("> "), col("tok")))
          .when(col("masked"), col("tok")))
    def joined(field: String) = array_join(
      transform(
        filter(array_sort(collect_list(struct(col("pos"), col(field).as("t")))),
          x => x.getField("t").isNotNull),
        x => x.getField("t")),
      " ")
    toks.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("masked") && col("first"), 1L).otherwise(0L))
          .as("n_spans"),
        joined("in_tok").as("input_text"),
        joined("tg_tok").as("tg"))
      .withColumn("target_text",
        ltrim(concat(col("tg"), lit(" <extra_id_"), col("n_spans"),
          lit(">"))))
      .drop("tg")
  }
}
