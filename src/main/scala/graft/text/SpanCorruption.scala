package graft.text

import org.apache.spark.sql.{Column, DataFrame}
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
      .toDF(idCol, "raw_pos", "tok")
      .where(col("tok") =!= "")
      // block positions are assigned AFTER dropping the empty tokens a
      // repeated-whitespace split produces: on raw positions, a block
      // whose first slot (raw_pos % spanLen == 0) fell on an empty token
      // would have no "first" row — no <extra_id_K> sentinel in the input
      // while its surviving tokens still move to the target, silently
      // breaking the reconstruction invariant. row_number shares the
      // doc-key exchange the k/reassembly windows already pay.
      .withColumn("pos",
        row_number().over(
          Window.partitionBy(col(idCol)).orderBy(col("raw_pos"))) - 1)
      .drop("raw_pos")
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

  /** PrefixLM split — UL2's S-denoiser (sequential denoising): the doc
    * splits at a deterministic per-doc fraction (hash-drawn from
    * 25–74% of its length), input = prefix, target = suffix. Pure
    * per-row array arithmetic (split/slice/array_join) — ZERO shuffle;
    * the one-token floor and the n−1 ceiling keep both sides non-empty
    * for docs of ≥ 2 tokens (a 1-token doc gets an empty target,
    * deterministically on both engines). Output schema matches
    * [[spanCorrupt]] with n_spans = 1. */
  def prefixLmSplit(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val words = filter(split(col(textCol), " "), w => w =!= "")
    val n = size(words)
    val coin = pmod(graft.functions.PortableHash.hex60(
      concat(lit("plm_"), col(idCol).cast("string"))), lit(50L)) + 25
    val splitN = greatest(lit(1L),
      least((n - 1).cast("long"), (n * coin / lit(100)).cast("long")))
    docs.select(col(idCol),
      n.cast("long").as("n_tokens"), lit(1L).as("n_spans"),
      array_join(slice(words, lit(1), splitN.cast("int")), " ")
        .as("input_text"),
      array_join(slice(words, (splitN + 1).cast("int"),
        greatest(lit(0), n - splitN.cast("int"))), " ").as("target_text"))
  }

  /** Fill-in-the-middle (Bavarian et al. 2022, arXiv:2207.14255 — the
    * code-model pretraining transform): a `rateNum/rateDen` hash coin
    * selects docs; a selected doc splits at two hash-drawn token points
    * 0 ≤ i ≤ j ≤ n and re-serializes in PSM order —
    * `<PRE> prefix <SUF> suffix <MID> middle` — so the model learns to
    * infill; unselected docs pass through verbatim (the paper's
    * joint-training recipe). All draws are hash(doc) integer arithmetic
    * (uniform over the valid (i, j) grid via two modular draws), so any
    * engine reproduces the same splits; the whole operator is per-row
    * array slicing — ZERO shuffle, a map-shaped corpus pass at any
    * scale. Output: (id, n_tokens, fim_applied, split_i, split_j,
    * fim_text). */
  def fimTransform(docs: DataFrame, idCol: String, textCol: String,
                   rateNum: Int = 3, rateDen: Int = 4): DataFrame = {
    require(rateNum >= 0 && rateDen >= 1 && rateNum <= rateDen,
      "need 0 <= rateNum <= rateDen, rateDen >= 1")
    def coin(seed: String, mod: Column): Column =
      pmod(graft.functions.PortableHash.hex60(
        concat(lit(seed), col(idCol).cast("string"))), mod)
    val words = filter(split(col(textCol), " "), w => w =!= "")
    val n = size(words)
    val applied = n >= 1 && coin("fimr_", lit(rateDen.toLong)) < rateNum
    val i = coin("fima_", (n + 1).cast("long")).cast("int")
    val j = (i + coin("fimb_", (n - i + 1).cast("long"))).cast("int")
    def seg(from: Column, to: Column) =
      array_join(slice(words, from, greatest(lit(0), to - from + 1)), " ")
    docs.select(col(idCol), n.cast("long").as("n_tokens"),
      applied.as("fim_applied"),
      when(applied, i.cast("long")).as("split_i"),
      when(applied, j.cast("long")).as("split_j"),
      when(applied, concat(
          lit("<PRE> "), seg(lit(1), i),
          lit(" <SUF> "), seg(j + 1, n),
          lit(" <MID> "), seg(i + 1, j)))
        .otherwise(array_join(words, " ")).as("fim_text"))
  }

  /** UL2 mixture-of-denoisers (Tay et al. 2022): each doc is assigned
    * ONE denoiser by a deterministic hash draw — R (regular span
    * corruption, 15% / span 3) at weight 2/4, S (PrefixLM split) at
    * 1/4, X (extreme: 50% / span 8) at 1/4 — and its input gains the
    * paradigm token (`[R] `/`[S] `/`[X] `) UL2 conditions on. Docs are
    * FILTERED to their denoiser before construction (the hash predicate
    * prunes at the scan), so each doc is processed exactly once; the
    * union is three independent map-shaped lanes. */
  def ul2Mixture(docs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val den = pmod(graft.functions.PortableHash.hex60(
      concat(lit("ul2_"), col(idCol).cast("string"))), lit(4L))
    def branded(df: DataFrame, tag: String) = df
      .withColumn("denoiser", lit(tag))
      .withColumn("input_text",
        concat(lit(s"[$tag] "), col("input_text")))
      .select(col(idCol), col("denoiser"), col("n_tokens"),
        col("n_spans"), col("input_text"), col("target_text"))
    branded(spanCorrupt(docs.where(den <= 1), idCol, textCol,
        spanLen = 3, rateNum = 3, rateDen = 20), "R")
      .unionByName(branded(prefixLmSplit(docs.where(den === 2),
        idCol, textCol), "S"))
      .unionByName(branded(spanCorrupt(docs.where(den === 3), idCol,
        textCol, spanLen = 8, rateNum = 10, rateDen = 20), "X"))
  }
}
