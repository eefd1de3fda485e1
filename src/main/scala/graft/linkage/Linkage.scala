package graft.linkage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis
import graft.graph.ConnectedComponents
import graft.dedup.NearDup
import graft.similarity.Similarity

/** Record-linkage kit (SURVEY §2.11): TF-IDF term weighting, blocked fuzzy
  * joins, and pairwise match scoring — the Spark-first re-expression of the
  * reference's embed_dataframe / eia_ferc1_record_linkage surface.
  *
  * Scale design: candidate pairs are always *blocked* (equi-join on a
  * blocking key) — the all-pairs product never materializes. TF-IDF is two
  * hash aggregations; document count comes from an unpartitioned window
  * (computed map-side, no collect).
  */
object Linkage {

  /** Per-document TF-IDF terms: tf, df, idf = ln(N/df), score = tf·idf.
    * Reference: TextVectorizer
    * (`/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:196-208`). */
  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol),
      explode(TextAnalysis.tokens(col(textCol))).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = df.select(count(lit(1)).as("n_docs"))
    tf.join(dfreq, "term").crossJoin(n)
      .withColumn("idf", log(col("n_docs").cast("double") / col("df")))
      .withColumn("score", col("tf") * col("idf"))
  }

  /** Top TF-IDF term per document. Ranking uses the integer pair
    * (tf desc, df asc, term asc) — same order as tf·ln(N/df) for fixed N but
    * exact, so it reproduces bit-identically on any engine. */
  def tfidfTopTerm(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scored = tfidf(df, idCol, textCol)
    scored
      .withColumn("rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("tf").desc, col("df").asc, col("term").asc)))
      .where(col("rk") === 1)
      .select(col(idCol), col("term").as("top_term"), col("tf"), col("df"),
        round(col("score"), 6).as("tfidf"))
  }

  /** Skew guard for blocked pair joins: salt oversized blocks into
    * sub-blocks so no single shuffle group holds more than ~`maxBlock`
    * left rows in EXPECTATION (salts are hash-assigned, so a group can
    * exceed the cap by a small factor from hash unevenness; the bound is
    * statistical, not hard). The guard is ONE-SIDED: block sizes are
    * measured on the LEFT side only and every right row of a hot block
    * replicates to all of its salts, so per-task work is bounded by
    * ~maxBlock·R for a block with R right rows — a key that is
    * degenerate on the RIGHT alone is not split (put the skewed side on
    * the left, or pick maxBlock from [[blockProfile]]'s per-side counts;
    * a 2-D both-sides salt is the big-joins-big extension).
    * SEMANTICS-PRESERVING — the classic manual skew-join
    * split, NOT a recall-lossy cap: a hot block of L left rows gets
    * ceil(L/maxBlock) salts, each left row lands in exactly one salt
    * (deterministic hash of the whole left row) and each right row is
    * replicated to every salt of its block, so the joined pair set is
    * bit-identical to the unguarded equi-join while the degenerate key
    * (a very common name prefix at 100 TB) is spread across
    * ceil(L/maxBlock) tasks instead of one quadratic hot partition.
    * AQE's OptimizeSkewedJoin cannot do this — it splits skewed
    * *partitions*, and a single giant key stays in one task.
    *
    * Scale: one extra map-side-combinable count over the left side; the
    * oversized-key frame is broadcast and small by construction (each
    * key holds > maxBlock rows, so there are at most N/maxBlock of
    * them). Returns (saltedLeft, saltedRight, joinKeyNames); callers
    * join on the returned names and drop them. Left/right must have
    * disjoint non-key column names. */
  def saltBySize(left: DataFrame, right: DataFrame,
                 leftKeys: Seq[Column], rightKeys: Seq[Column],
                 maxBlock: Int): (DataFrame, DataFrame, Seq[String]) = {
    require(maxBlock >= 1, "maxBlock must be >= 1")
    require(leftKeys.size == rightKeys.size, "key lists must align")
    val names = leftKeys.indices.map(i => s"__bk$i")
    val l = left.select(
      left.columns.map(col) ++ leftKeys.zip(names).map { case (c, n) => c.as(n) }: _*)
    val r = right.select(
      right.columns.map(col) ++ rightKeys.zip(names).map { case (c, n) => c.as(n) }: _*)
    val hot = l.groupBy(names.map(col): _*)
      .agg(count(lit(1)).as("__bn"))
      .where(col("__bn") > maxBlock)
      .select(names.map(col) :+
        ceil(col("__bn") / lit(maxBlock.toDouble)).cast("int").as("__nsalt"): _*)
    val saltedL = l.join(broadcast(hot), names, "left")
      .withColumn("__salt",
        when(col("__nsalt").isNull, lit(0)).otherwise(
          pmod(xxhash64(left.columns.map(col): _*),
            col("__nsalt").cast("long")).cast("int")))
      .drop("__nsalt")
    val saltedR = r.join(broadcast(hot), names, "left")
      .withColumn("__salt", explode(
        sequence(lit(0), coalesce(col("__nsalt"), lit(1)) - 1)))
      .drop("__nsalt")
    (saltedL, saltedR, names :+ "__salt")
  }

  /** Two-dimensional skew guard for big-joins-big: [[saltBySize]]'s
    * bound is one-sided (left block size), so a key degenerate on BOTH
    * sides still concentrates maxBlock·R pairs in each salt. This
    * variant sizes BOTH sides and decomposes each hot block's L×R pair
    * matrix into a grid of ~maxBlock×maxBlock tiles: the left side
    * hashes into one of ceil(L/maxBlock) row-salts and replicates across
    * the ceil(R/maxBlock) column-salts, the right side symmetrically, and
    * the join key gains (row-salt, column-salt) — every tile is its own
    * shuffle group, every (l, r) pair meets in EXACTLY one tile, so the
    * output is pair-for-pair identical to the plain equi-join while no
    * task holds more than ~maxBlock rows of either side (in expectation;
    * salts are hash-assigned).
    *
    * Cost: hot-block rows replicate ceil(other-side/maxBlock) times —
    * the classic blocked-matrix trade (total replicated volume
    * L·ceil(R/m) + R·ceil(L/m), vs the unguarded single task doing L·R
    * work serially). Cold keys pay one broadcast-probe each and a
    * 1-element generator. The hot-key frame broadcasts: at most
    * N/maxBlock keys per side by construction. */
  def saltBySize2D(left: DataFrame, right: DataFrame,
                   leftKeys: Seq[Column], rightKeys: Seq[Column],
                   maxBlock: Int): (DataFrame, DataFrame, Seq[String]) = {
    require(maxBlock >= 1, "maxBlock must be >= 1")
    require(leftKeys.size == rightKeys.size, "key lists must align")
    val names = leftKeys.indices.map(i => s"__bk$i")
    val l = left.select(
      left.columns.map(col) ++ leftKeys.zip(names).map { case (c, n) => c.as(n) }: _*)
    val r = right.select(
      right.columns.map(col) ++ rightKeys.zip(names).map { case (c, n) => c.as(n) }: _*)
    def sizes(side: DataFrame, out: String) = side
      .groupBy(names.map(col): _*)
      .agg(ceil(count(lit(1)) / lit(maxBlock.toDouble)).cast("int").as(out))
      .where(col(out) > 1)
    // per-key salt grid (nsl row-salts × nsr column-salts); keys hot on
    // neither side are absent (grid 1×1)
    val hot = sizes(l, "__nsl").join(sizes(r, "__nsr"), names.toSeq, "full")
      .select(names.map(col) :+
        coalesce(col("__nsl"), lit(1)).as("__nsl") :+
        coalesce(col("__nsr"), lit(1)).as("__nsr"): _*)
    val saltedL = l.join(broadcast(hot), names, "left")
      .withColumn("__sl",
        when(col("__nsl").isNull, lit(0)).otherwise(
          pmod(xxhash64(left.columns.map(col): _*),
            col("__nsl").cast("long")).cast("int")))
      .withColumn("__sr", explode(
        sequence(lit(0), coalesce(col("__nsr"), lit(1)) - 1)))
      .drop("__nsl", "__nsr")
    val saltedR = r.join(broadcast(hot), names, "left")
      .withColumn("__sr",
        when(col("__nsr").isNull, lit(0)).otherwise(
          pmod(xxhash64(right.columns.map(col): _*),
            col("__nsr").cast("long")).cast("int")))
      .withColumn("__sl", explode(
        sequence(lit(0), coalesce(col("__nsl"), lit(1)) - 1)))
      .drop("__nsl", "__nsr")
    (saltedL, saltedR, names ++ Seq("__sl", "__sr"))
  }

  /** Equi-join with the [[saltBySize2D]] both-sides guard; output equals
    * the plain equi-join pair-for-pair. */
  def skewGuardedJoin2D(left: DataFrame, right: DataFrame,
                        leftKeys: Seq[Column], rightKeys: Seq[Column],
                        maxBlock: Int): DataFrame = {
    val (l, r, names) = saltBySize2D(left, right, leftKeys, rightKeys, maxBlock)
    l.join(r, names).drop(names: _*)
  }

  /** Equi-join `left` and `right` on aligned key expressions with the
    * [[saltBySize]] skew guard; output carries all left + right columns
    * (internal key/salt columns dropped). Pair-for-pair identical to
    * `left.join(right, leftKeys zip rightKeys map (l === r) reduce (&&))`. */
  def skewGuardedJoin(left: DataFrame, right: DataFrame,
                      leftKeys: Seq[Column], rightKeys: Seq[Column],
                      maxBlock: Int): DataFrame = {
    val (l, r, names) = saltBySize(left, right, leftKeys, rightKeys, maxBlock)
    l.join(r, names).drop(names: _*)
  }

  /** Per-rule both-sides-hot detection for [[unionBlocks]] routing: a
    * rule whose hottest block exceeds `maxBlock` rows on BOTH sides is
    * in the big-joins-big regime where the 1-D guard's per-salt bound
    * (~maxBlock · R) is itself quadratic — those rules should take the
    * [[saltBySize2D]] tile decomposition instead. Null-key groups are
    * excluded (they never equi-join, same discipline as
    * [[calibrateMaxBlock]]). Cost: one map-side-combinable count per
    * side per rule, all 1-row maxima unioned into a SINGLE job and one
    * 2·rules-row collect (bounded by contract). */
  def detectBothSidesHot(left: DataFrame, right: DataFrame,
                         rules: Seq[(Seq[Column], Seq[Column])],
                         maxBlock: Int): Seq[Boolean] = {
    require(rules.nonEmpty, "need at least one blocking rule")
    require(maxBlock >= 1, "maxBlock must be >= 1")
    // Round 18: the per-(rule, side) union form planned 2·|rules|
    // aggregation subtrees over re-planned side lineages; the fused
    // [[hottestBlocks]] scans each side once. Same detector output.
    hottestBlocks(left, right, rules).map { case (l, r) =>
      l > maxBlock && r > maxBlock
    }
  }

  /** Multi-rule candidate generation — splink's
    * `blocking_rules_to_generate_predictions` union semantics, the
    * reference's actual candidate shape (it ORs 10 blocking rules,
    * eia_ferc1_model_config.py:12-33, consumed at
    * eia_ferc1_record_linkage.py:137-180): each rule is a conjunction of
    * aligned equi-key expressions; a pair matched by several rules is
    * kept ONCE, labeled `match_key` = the index of the FIRST rule that
    * matched (splink emits the same via sequential `AND NOT
    * previous-rule` SQL; union + min-rule dedup is the equivalent
    * declarative form) and `n_rules` = how many rules generated it.
    *
    * Scale: K blocked equi-joins (never all-pairs) + ONE shuffle on the
    * (leftId, rightId) pair key for the cross-rule dedup window. Pass
    * `maxBlock > 0` to route every rule's join through the
    * [[saltBySize]] skew guard. Left/right must have disjoint column
    * names (including the id columns), and `leftId` / `rightId` must each
    * UNIQUELY identify their side's rows (splink's `unique_id` contract):
    * the cross-rule dedup keeps one row per (leftId, rightId), so
    * duplicate ids would silently collapse distinct candidate rows.
    *
    * `rules2D(i)` routes rule i through the [[saltBySize2D]] tile guard
    * instead of the 1-D guard (same pair set either way) — feed it
    * [[detectBothSidesHot]] so rules whose hottest block is degenerate
    * on BOTH sides get the blocked-matrix decomposition the 1-D salt
    * cannot bound. Shorter-than-rules (or empty) vectors default the
    * remaining rules to the 1-D guard. */
  def unionBlocks(left: DataFrame, right: DataFrame,
                  leftId: String, rightId: String,
                  rules: Seq[(Seq[Column], Seq[Column])],
                  maxBlock: Int = 0,
                  rules2D: Seq[Boolean] = Nil): DataFrame = {
    require(rules.nonEmpty, "need at least one blocking rule")
    // Round 18 (plan-size diet, the q189/ruleKeyCounts discipline applied
    // to the pair join itself): the per-rule form planned one join PER
    // RULE over re-planned copies of each side's whole lineage — q190's
    // 10 production rules produced a 718-line / 24-Exchange initial plan,
    // and every branch re-EXECUTED the side subtrees (the Metaphone
    // codes were computed 10× per row). Fused: each side is computed
    // ONCE, an explode emits one (rule, key) row per rule, and ONE
    // equi-join on (rule, encoded key) replaces all K joins — the same
    // total shuffle bytes (K joins × n rows each ≡ one join × K·n rows),
    // K× fewer exchanges/stages and 1× side computation. Key tuples use
    // the [[ruleKeyCounts]] array<string> encoding, whose equality is
    // exactly the typed null-unsafe conjunction when both sides of every
    // aligned key share one atomic type: distinct values of one SQL type
    // cast to distinct strings (Double/Float pre-normalized -0.0 → 0.0;
    // all-NaN-equal matches Spark's join semantics, both sides reading
    // "NaN"), and any-null key tuples are dropped up front. Rules with
    // mismatched or non-atomic key types — and every maxBlock > 0 salted
    // path — keep the per-rule joins.
    val fusable = maxBlock <= 0 && rules.size > 1 &&
      rules.forall { case (lk, rk) =>
        lk.size == rk.size && lk.zip(rk).forall { case (a, b) =>
          val ta = left.select(a).schema.head.dataType
          val tb = right.select(b).schema.head.dataType
          ta == tb && stringEncodable(ta)
        }
      }
    val unioned =
      if (fusable) {
        val lT = tagRules(left, rules.map(_._1), "__lrule", "__lkey")
        val rT = tagRules(right, rules.map(_._2), "__rrule", "__rkey")
        lT.join(rT, col("__lrule") === col("__rrule") &&
            col("__lkey") === col("__rkey"))
          .select(left.columns.map(col) ++ right.columns.map(col) :+
            col("__lrule").as("match_key"): _*)
      } else {
        rules.zipWithIndex.map { case ((lk, rk), i) =>
          val j =
            if (maxBlock > 0 && rules2D.lift(i).getOrElse(false))
              skewGuardedJoin2D(left, right, lk, rk, maxBlock)
            else if (maxBlock > 0)
              skewGuardedJoin(left, right, lk, rk, maxBlock)
            else left.join(right,
              lk.zip(rk).map { case (a, b) => a === b }.reduce(_ && _))
          j.withColumn("match_key", lit(i))
        }.reduce(_.unionByName(_))
      }
    val pair = Window.partitionBy(col(leftId), col(rightId))
    unioned
      .withColumn("n_rules", count(lit(1)).over(pair))
      .withColumn("__rn",
        row_number().over(pair.orderBy(col("match_key"))))
      .where(col("__rn") === 1)
      .drop("__rn")
  }

  /** Types whose cast-to-string is injective on SQL-distinct values —
    * the precondition for the [[tagRules]] encoded-key join to replay
    * the typed equi-join exactly. */
  private def stringEncodable(t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case StringType | IntegerType | LongType | ShortType | ByteType |
           BooleanType | DateType | TimestampType | DoubleType | FloatType =>
        true
      case _: DecimalType => true
      case _ => false
    }
  }

  /** Tag every row of `df` with one (rule index, encoded key) pair per
    * rule whose key tuple is fully non-null — the payload-carrying twin
    * of [[ruleKeyCounts]]'s explode (same encoding, same null and float
    * discipline), used by the fused [[unionBlocks]] join. */
  private def tagRules(df: DataFrame, sides: Seq[Seq[Column]],
                       ruleCol: String, keyCol: String): DataFrame = {
    def norm(c: Column): Column =
      df.select(c).schema.head.dataType match {
        case org.apache.spark.sql.types.DoubleType =>
          when(c === lit(0.0d), lit(0.0d)).otherwise(c)
        case org.apache.spark.sql.types.FloatType =>
          when(c === lit(0.0f), lit(0.0f)).otherwise(c)
        case _ => c
      }
    df.select(col("*"), explode(array(sides.zipWithIndex.map {
        case (ks, i) =>
          struct(lit(i).as("r"),
            when(ks.map(_.isNotNull).reduce(_ && _),
              array(ks.map(k => norm(k).cast("string")): _*)).as("k"))
      }: _*)).as("__rk"))
      .where(col("__rk.k").isNotNull)
      .select(col("*"), col("__rk.r").as(ruleCol), col("__rk.k").as(keyCol))
      .drop("__rk")
  }

  /** Blocking-rule pre-flight — splink's
    * `count_comparisons_from_blocking_rule` analysis (the tool used to
    * budget the reference's 10 prediction rules before running them):
    * for each rule, the candidate-pair volume computed from per-block
    * cardinalities — sum over blocks of nL·nR — WITHOUT materializing a
    * single pair. At 100 TB this is how a rule set is chosen and how
    * [[saltBySize]]'s maxBlock is calibrated: two map-side-combinable
    * counts + one (small) key-cardinality join per rule, never the
    * quadratic pair frame itself. Returns one row per rule:
    * (match_key, n_blocks, n_pairs, max_block_pairs). */
  /** Fused per-(rule, block-key) cardinalities — ONE scan of `df` serves
    * every rule: an explode emits one (rule, key) row per rule (the same
    * ×|rules| replication a grouping-sets Expand would produce) and one
    * aggregation counts all blocks. Key tuples are encoded as
    * array<string> (rule arity varies); the encoding preserves each
    * rule's typed-groupBy semantics exactly: distinct values of one SQL
    * type cast to distinct strings, rows with ANY null key component are
    * dropped up front (null keys never survive the null-unsafe equi-joins
    * this profiles), and float keys are pre-normalized (-0.0 → 0.0,
    * matching the aggregate's NormalizeFloatingNumbers) so the string
    * grouping can never split a group the typed grouping merged. */
  private def ruleKeyCounts(df: DataFrame, sides: Seq[Seq[Column]],
                            cnt: String): DataFrame = {
    def norm(c: Column): Column =
      df.select(c).schema.head.dataType match {
        case org.apache.spark.sql.types.DoubleType =>
          when(c === lit(0.0d), lit(0.0d)).otherwise(c)
        case org.apache.spark.sql.types.FloatType =>
          when(c === lit(0.0f), lit(0.0f)).otherwise(c)
        case _ => c
      }
    df.select(explode(array(sides.zipWithIndex.map { case (ks, i) =>
        struct(lit(i).as("r"),
          when(ks.map(_.isNotNull).reduce(_ && _),
            array(ks.map(k => norm(k).cast("string")): _*)).as("k"))
      }: _*)).as("__rk"))
      .select(col("__rk.r").as("__rule"), col("__rk.k").as("__key"))
      .where(col("__key").isNotNull)
      .groupBy(col("__rule"), col("__key"))
      .agg(count(lit(1)).as(cnt))
  }

  /** Per-rule hottest block size on one side, from the fused counts:
    * (__rule, __mx) — rules whose every row has a null key component are
    * absent (callers default them to 0). */
  private def hottestPerRule(df: DataFrame,
                             sides: Seq[Seq[Column]]): DataFrame =
    ruleKeyCounts(df, sides, "__n")
      .groupBy(col("__rule")).agg(max(col("__n")).as("__mx"))

  /** Per-rule hottest (left, right) block sizes in ONE driver action —
    * the shared pre-flight [[calibrateMaxBlock]] and
    * [[detectBothSidesHot]] both derive from, exposed so a caller that
    * needs both (the linkage capstone) pays one barrier instead of two.
    * Each side is scanned once (fused explode, not one aggregation per
    * rule); the collect is 2·|rules| rows, bounded by contract. */
  def hottestBlocks(left: DataFrame, right: DataFrame,
                    rules: Seq[(Seq[Column], Seq[Column])]): Seq[(Long, Long)] = {
    require(rules.nonEmpty, "need at least one blocking rule")
    val rows = hottestPerRule(left, rules.map(_._1))
      .select(col("__rule"), lit(0).as("__side"), col("__mx"))
      .unionByName(hottestPerRule(right, rules.map(_._2))
        .select(col("__rule"), lit(1).as("__side"), col("__mx")))
      .collect()
    val m = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    rules.indices.map(i =>
      (m.getOrElse((i, 0), 0L), m.getOrElse((i, 1), 0L)))
  }

  /** The [[calibrateMaxBlock]] clamp formula over an already-measured
    * hottest-right-block size (0 or negative = empty profile). */
  def maxBlockFromHottest(maxRight: Long,
                          targetPairsPerTask: Long = 4L * 1000 * 1000,
                          minBlock: Int = 1024,
                          maxCap: Int = 1 << 20): Int = {
    require(targetPairsPerTask >= 1 && minBlock >= 1 && maxCap >= minBlock,
      "need targetPairsPerTask >= 1 and 1 <= minBlock <= maxCap")
    if (maxRight <= 0L) maxCap // empty right side: nothing to guard
    else math.min(maxCap.toLong,
      math.max(minBlock.toLong, targetPairsPerTask / maxRight)).toInt
  }

  def blockProfile(left: DataFrame, right: DataFrame,
                   rules: Seq[(Seq[Column], Seq[Column])]): DataFrame = {
    require(rules.nonEmpty, "need at least one blocking rule")
    // Round 18 (plan-size diet): the per-rule form planned 2 aggregations
    // + 1 join PER RULE over re-planned copies of each side's whole
    // lineage — q189's 10 production rules produced a 1173-line /
    // 80-Exchange initial plan whose driver-side analysis dominated the
    // lane, and at scale it re-scanned each side once per rule. Fused:
    // each side is scanned ONCE, an explode emits one (rule, key) row per
    // rule (the same ×|rules| row replication a grouping-sets Expand
    // would produce), ONE aggregation counts every rule's blocks, and ONE
    // join multiplies the per-block cardinalities. Key tuples are encoded
    // as array<string> (rule arity varies); the encoding preserves the
    // per-rule groupBy semantics exactly: distinct values of one SQL type
    // cast to distinct strings, rows with ANY null key component are
    // dropped up front (the old null-unsafe join dropped their blocks),
    // and float keys are pre-normalized (-0.0 → 0.0, matching the
    // aggregate's NormalizeFloatingNumbers) so the string grouping can
    // never split a group the typed grouping merged.
    val spark = left.sparkSession
    val lc = ruleKeyCounts(left, rules.map(_._1), "__nl")
    val rc = ruleKeyCounts(right, rules.map(_._2), "__nr")
    // per-block products and their sum are computed in decimal(38,0):
    // at the 100 TB scale this tool exists for, a single hot block's
    // nl*nr (or the rule total) can exceed Long and non-ANSI Long
    // arithmetic would wrap SILENTLY NEGATIVE — garbage exactly when
    // the budget matters. The final cast back to long (the driver's
    // BIGINT oracle type) nulls on overflow instead of wrapping, so an
    // over-budget rule reads as an obviously-broken null, never as a
    // plausible small number.
    val prof = lc.join(rc, Seq("__rule", "__key"))
      .select(col("__rule"),
        (col("__nl").cast("decimal(38,0)") * col("__nr")).as("__bp"))
      .groupBy(col("__rule"))
      .agg(count(lit(1)).as("n_blocks"),
        sum(col("__bp")).cast("long").as("n_pairs"),
        max(col("__bp")).cast("long").as("max_block_pairs"))
    // a rule with zero joined blocks must still report its row (the old
    // per-rule global aggregates emitted one row per rule unconditionally)
    spark.range(rules.size)
      .select(col("id").cast("int").as("match_key"))
      .join(prof, col("match_key") === col("__rule"), "left")
      .select(col("match_key"),
        coalesce(col("n_blocks"), lit(0L)).as("n_blocks"),
        col("n_pairs"), col("max_block_pairs"))
  }

  /** Data-derived `maxBlock` for [[saltBySize]] / [[unionBlocks]]: the
    * 1-D guard bounds per-salt pair work at ~maxBlock · R, where R is the
    * hottest key's RIGHT-side row count — so the left-block cap that
    * holds one shuffle group to `targetPairsPerTask` pairs is
    * targetPairsPerTask / max R. This computes max R from the same
    * map-side-combinable per-key counts [[blockProfile]] uses (pairs are
    * never materialized): one small aggregate per rule, max across rules
    * (because [[unionBlocks]] applies ONE cap to every rule's join), one
    * 1-row collect (bounded by contract). The result is clamped to
    * [minBlock, maxCap]: a fixture-degenerate right side (max R ≈ corpus)
    * must not drive the cap to 1 and salt EVERYTHING, and an empty or
    * all-cold profile must not disable the guard entirely. Calibrating
    * from the data replaces a static guess that is either too tight
    * (needless replication) or too loose (the quadratic hot task the
    * guard exists to prevent) when block-size distributions drift —
    * exactly the pre-flight→run discipline splink documents for its
    * blocking rules. */
  def calibrateMaxBlock(right: DataFrame, rightRules: Seq[Seq[Column]],
                        targetPairsPerTask: Long = 4L * 1000 * 1000,
                        minBlock: Int = 1024,
                        maxCap: Int = 1 << 20): Int = {
    require(rightRules.nonEmpty, "need at least one blocking rule")
    require(targetPairsPerTask >= 1 && minBlock >= 1 && maxCap >= minBlock,
      "need targetPairsPerTask >= 1 and 1 <= minBlock <= maxCap")
    // Round 18: one fused scan of `right` for every rule (ruleKeyCounts
    // drops null-key rows — they never survive the null-unsafe
    // equi-joins, and a mostly-null blocking key would otherwise drive
    // max R toward the corpus size and over-salt every rule), then the
    // driver-side clamp. One action, |rules| rows collected.
    val row = hottestPerRule(right, rightRules)
      .agg(max(col("__mx"))).head
    maxBlockFromHottest(if (row.isNullAt(0)) 0L else row.getLong(0),
      targetPairsPerTask, minBlock, maxCap)
  }

  /** Blocked fuzzy join: equi-join on `blockKeys`, keep pairs with
    * levenshtein(leftText, rightText) <= maxDist. Reference:
    * StringSimilarityScorer over blocked candidates
    * (`/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:356-500`).
    * `maxBlock > 0` turns on the [[saltBySize]] skew guard (identical
    * results, bounded shuffle groups); 0 = plain equi-join (default —
    * the oracle lanes keep the unguarded plan their PlanSpec pins). */
  def blockedFuzzyJoin(left: DataFrame, right: DataFrame, blockKeys: Seq[String],
                       leftText: String, rightText: String,
                       maxDist: Int, maxBlock: Int = 0): DataFrame =
    blockedPairs(left, right, blockKeys, maxBlock)
      .withColumn("name_dist", levenshtein(col(leftText), col(rightText)))
      .where(col("name_dist") <= maxDist)

  /** Blocked fuzzy join under Jaro–Winkler — the reference's actual string
    * metric (recordlinkage's jarowinkler,
    * `/root/reference/src/pudl/analysis/record_linkage/embed_dataframe.py:346-371`):
    * equi-join on `blockKeys`, keep pairs with similarity >= `minSim`. The
    * native [[graft.plans.JaroWinkler]] expression matches DuckDB's
    * `jaro_winkler_similarity` bit-for-bit, so the operator is
    * SQL-oracle-replayable. `maxBlock` as in [[blockedFuzzyJoin]]. */
  def blockedFuzzyJoinJw(left: DataFrame, right: DataFrame,
                         blockKeys: Seq[String], leftText: String,
                         rightText: String, minSim: Double,
                         maxBlock: Int = 0): DataFrame =
    blockedPairs(left, right, blockKeys, maxBlock)
      .withColumn("name_sim",
        graft.plans.JaroWinkler(col(leftText), col(rightText)))
      .where(col("name_sim") >= minSim)

  /** USING-join on shared `blockKeys` column names, optionally skew-
    * guarded; output schema matches `left.join(right, blockKeys)`
    * (one copy of each key column). */
  private def blockedPairs(left: DataFrame, right: DataFrame,
                           blockKeys: Seq[String], maxBlock: Int): DataFrame =
    if (maxBlock <= 0) left.join(right, blockKeys)
    else {
      // rename right's key columns first so the guarded join never holds
      // two attributes with the same name; drop the copies afterwards —
      // same columns as `left.join(right, blockKeys)` (one key copy)
      val rkNames = blockKeys.map(k => s"__rk_$k")
      val renamed = blockKeys.zip(rkNames).foldLeft(right) {
        case (d, (k, rk)) => d.withColumnRenamed(k, rk)
      }
      skewGuardedJoin(left, renamed,
          blockKeys.map(col), rkNames.map(col), maxBlock)
        .drop(rkNames: _*)
    }

  /** Logistic match score over fixed-weight features — the shape of the
    * reference's pair-match model
    * (`/root/reference/src/pudl/analysis/record_linkage/eia_ferc1_record_linkage.py:137-393`)
    * with deterministic literal weights (training lives in MLlib's
    * LogisticRegression when labels exist). */
  def logisticScore(features: Seq[(Column, Double)], bias: Double): Column = {
    val z = features.map { case (f, w) => f * w }.reduce(_ + _) + lit(bias)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train the pair-match logistic model in-engine — the reference's
    * train step (`/root/reference/src/pudl/analysis/record_linkage/
    * eia_ferc1_record_linkage.py:137-393`, LogisticRegression over
    * labeled candidate pairs) — and hand back `(weights, intercept)` for
    * plan-time-literal scoring through [[logisticScore]]. Unregularized
    * MLE with a tight tolerance: on a saturated design (discrete
    * features covering every cell) the fitted probabilities equal the
    * empirical cell rates exactly, which is what makes the train→score
    * loop oracle-replayable (the SQL recomputes the cell rates instead
    * of re-running LBFGS).
    *
    * Scale: training data is the BLOCKED candidate-pair frame (never the
    * cross product); LBFGS cost is one treeAggregate pass per iteration
    * over (features, label) — a few dozen passes over an
    * already-reduced frame. The collect is the coefficient vector:
    * O(n_features). */
  def trainPairMatcher(pairs: DataFrame, featureCols: Seq[String],
                       labelCol: String, maxIter: Int = 500,
                       tol: Double = 1e-12,
                       trainPartitions: Int = 1): (Seq[Double], Double) = {
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.feature.VectorAssembler
    // localCheckpoint the (features, label) projection: every LBFGS
    // iteration re-reads the training frame, and without materialization
    // each pass would re-run the candidate-pair lineage (blocked join +
    // string distances) — the measured cost of q158 before this was the
    // join × iterations, not the optimizer.
    // trainPartitions sizes the per-pass parallelism: the default 1 suits
    // fixture-scale frames ((features, label) doubles are tiny, and 1 task
    // per LBFGS pass beats 32 near-empty tasks on scheduling latency);
    // large candidate-pair frames pass a bigger count — or 0 to keep the
    // input partitioning — so the gradient passes stay parallel instead
    // of serializing through one task.
    val projected = pairs.select((featureCols :+ labelCol).map(c =>
      col(c).cast("double").as(c)): _*)
    val training = (if (trainPartitions > 0) projected.coalesce(trainPartitions)
                    else projected).localCheckpoint()
    try {
      val assembled = new VectorAssembler().setInputCols(featureCols.toArray)
        .setOutputCol("__features")
        .transform(training)
      val model = new LogisticRegression()
        .setFeaturesCol("__features").setLabelCol(labelCol)
        .setMaxIter(maxIter).setTol(tol).setRegParam(0.0)
        .fit(assembled)
      (model.coefficients.toArray.toSeq, model.intercept)
    } finally graft.util.SessionHygiene.releaseCheckpoint(training)
  }

  /** Cross-year entity linkage — the full `link_ids_cross_year` graph
    * (`/root/reference/src/pudl/analysis/record_linkage/link_cross_year.py:299-360`)
    * re-expressed as a composition of the implemented distributed stages:
    *
    *  1. **Edges with year penalty**: banded sign-bit blocking +
    *     exact-cosine filter ([[Similarity.cosineNearDupPairs]]) replaces
    *     the O(n²) `DistanceMatrix` memmap; the reference's same-year
    *     distance penalty (`compute_distance_with_year_penalty`) becomes
    *     dropping same-year edges — the penalty exists precisely so DBSCAN
    *     never merges two same-year records directly.
    *  2. **Cluster**: eps-graph connected components
    *     ([[ConnectedComponents.run]]) ≈ DBSCAN with min_samples≈1
    *     (deviation documented at `cluster_records_dbscan`).
    *  3. **Split**: same-year records can still chain together
    *     transitively, so clusters with duplicate years are re-split
    *     greedily per cluster ([[NearDup.splitClusters]]).
    *  4. **Orphans**: unclustered records join the label of their nearest
    *     clustered neighbor when cosine ≥ `assignThreshold` (the
    *     reference's looser agglomerative `distance_threshold = 0.5`),
    *     else keep a singleton label — single-linkage nearest-neighbor
    *     stands in for average-linkage agglomerative (deviation noted at
    *     `nearestAssign`).
    *
    * The stable `record_label` is the minimum member id of the final
    * cluster — deterministic under any partitioning.
    *
    * `blockOrphans = true` (the DEFAULT — this is the 100 TB path) routes
    * step 4 through the banded LSH candidate join
    * ([[Similarity.nearestAssignBlocked]], same plane family as step 1);
    * the orphans × clustered cross join never forms. Pass `false` for the
    * exact brute-force nearest-neighbor semantics (bounded corpora /
    * oracle replay — q97 does this explicitly).
    *
    * INSTRUMENTATION (round 17 — the five-round q97 driver-vs-builder gap):
    * each of the lane's ≤3 blocking actions prints ONE stderr line,
    * `[linkage] linkIdsCrossYear stage=<name> wall=<s>`, naming the stages
    * whose lazy work that barrier absorbs — `cc:edge-materialize` (banded
    * near-pair edges + the distinct-edge count), `cc:label` (union-find /
    * star loop), and `finalize` (year re-split + orphan top-1 join + the
    * final label union, all inside the returned frame's localCheckpoint) —
    * plus a `total` line. Wall time only, measured around the blocking
    * call; zero extra jobs, zero plan change. A contended environment
    * shows up as ONE of these lines inflating: that line is the next
    * fix's target.
    *
    * @return (idCol, yearCol, record_label) */
  def linkIdsCrossYear(records: DataFrame, idCol: String, yearCol: String,
                       embCol: String, dim: Int, simThreshold: Double,
                       assignThreshold: Double,
                       nBits: Int = 24, bands: Int = 4,
                       blockOrphans: Boolean = true,
                       // Some(t): reference-parity re-split — per-cluster
                       // AVERAGE-linkage agglomerative at distance
                       // threshold t (sklearn semantics; may keep
                       // near-identical same-year records together).
                       // None (default): windowed greedy first-fit, which
                       // guarantees one record per year per sub-cluster
                       // and replays in SQL (q97's oracle).
                       agglomerativeSplit: Option[Double] = None): DataFrame = {
    val tTotal = System.nanoTime()
    def announce(stage: String, wall: Double): Unit =
      System.err.println(
        f"[linkage] linkIdsCrossYear stage=$stage wall=$wall%.3fs")
    val ids = records.select(col(idCol).cast("long").as(idCol),
      col(yearCol), col(embCol))
    // 1. blocked near-pair edges, same-year pairs vetoed
    val edges = Similarity
      .cosineNearDupPairs(ids, idCol, embCol, dim, simThreshold, nBits, bands)
      .join(ids.select(col(idCol).as("id_a"), col(yearCol).as("__ya")), "id_a")
      .join(ids.select(col(idCol).as("id_b"), col(yearCol).as("__yb")), "id_b")
      .where(col("__ya") =!= col("__yb"))
      .select("id_a", "id_b")
    // 2. cluster (the CC call's two blocking actions announce themselves;
    // cc:edge-materialize absorbs the whole step-1 edge lineage)
    val cc = ConnectedComponents.run(edges, "id_a", "id_b", timer = announce)
      .withColumnRenamed("v", idCol)
    // 3. re-split clusters that chained duplicate years together
    val clustered = ids.join(cc, Seq(idCol))
    // (id, label) pairs are reused by two downstream branches (orphan
    // scoring, the final union); the lazy persist below shares the split
    // window's result between them without its own materialization round.
    // Linkage labels are ids+longs — tiny relative to the embedding
    // corpus at any scale.
    val split = agglomerativeSplit match {
      case Some(t) => NearDup.splitClustersAgglomerative(
          clustered, "component", idCol, yearCol, embCol, t)
        // the agglomerative splitter's 3-column output is oracle-pinned
        // (q119) — re-attach the year here; the rare reference-parity
        // branch keeps its old join count
        .join(ids.select(col(idCol), col(yearCol)), Seq(idCol))
      case None =>
        // one exchange serves BOTH windows below (round 18): hash on
        // component alone clusters every (component, year) group AND
        // every (component, sub_cluster) group, so the split row_number
        // and the record_label min reuse it instead of exchanging twice.
        // Components are eps-graph clusters (entity × years) — bounded by
        // construction, so keying the shuffle on component alone cannot
        // create a hot partition a (component, year) key would have split.
        // keepKey carries the original-typed year through, which removes
        // the final reattach join over the whole record set.
        NearDup.splitClusters(clustered.repartition(col("component")),
          "component", idCol, yearCol, keepKey = true)
    }
    // CONTENTION SHAPE: every eager materialization here is a driver
    // barrier whose cost is the slowest straggler's — under host
    // contention the lane's wall time multiplies by the number of
    // barriers, not by its work (driver-vs-quiet gaps of 2-5× over three
    // rounds with untouched code). So `labeled` is persisted LAZILY (the
    // orphan-scoring branch and the final union both read it, but its
    // blocks materialize inside the one final job instead of in a
    // dedicated round), and the assigned/singleton split is a single
    // left join on the top-1 frame rather than an eager checkpoint plus
    // an anti-join round. The whole stage-3/4 composition now runs in
    // ONE blocking job (the returned frame's localCheckpoint).
    val labeled = split
      .withColumn("record_label", min(col(idCol)).over(
        Window.partitionBy(col("component"), col("sub_cluster"))))
      .select(col(idCol), col(yearCol), col("record_label"))
      .persist()
    // 4. orphans: nearest clustered neighbor if close enough, else singleton
    val orphans = ids.join(cc.select(idCol), Seq(idCol), "left_anti")
    val labeledRows = ids.join(
      labeled.select(col(idCol), col("record_label")), Seq(idCol))
    val nearest =
      if (blockOrphans) Similarity.nearestAssignBlocked(
        orphans, labeledRows, idCol, embCol, "record_label", dim, nBits, bands)
      else Similarity.nearestAssign(
        orphans, labeledRows, idCol, embCol, "record_label")
    // nearest is top-1 per orphan, so the left join matches ≤ 1 row: an
    // orphan whose best cosine clears the threshold takes its neighbor's
    // label, every other orphan keeps its own id as a singleton label —
    // same pair set as the old eager assigned-checkpoint + anti-join,
    // without the two extra blocking rounds
    val orphanLabels = orphans.select(col(idCol), col(yearCol))
      .join(nearest.where(col("cosine") >= assignThreshold)
          .select(col("orphan_id").as(idCol),
            col("assigned_cluster").as("__asg")),
        Seq(idCol), "left")
      .select(col(idCol), col(yearCol),
        coalesce(col("__asg"), col(idCol).cast("long")).as("record_label"))
    // materialize the (small: ids + labels) result eagerly, then release
    // the shared intermediate — nothing persisted outlives the call except
    // the returned frame's own blocks (harness-released per query).
    // labeled ∪ orphanLabels covers every id exactly once and both
    // branches carry the year, so the old (ids ⋈ union) reattach join —
    // one more shuffle/broadcast stage over the whole record set — is
    // gone (round 18); rows are identical by construction.
    val tFin = System.nanoTime()
    val out = labeled.unionByName(orphanLabels)
      .select(col(idCol), col(yearCol), col("record_label"))
      .localCheckpoint()
    announce("finalize", (System.nanoTime() - tFin) / 1e9)
    labeled.unpersist(blocking = false)
    announce("total", (System.nanoTime() - tTotal) / 1e9)
    out
  }
}
