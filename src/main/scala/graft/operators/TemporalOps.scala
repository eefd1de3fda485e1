package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins, densification, changelog (SURVEY §2.1, §2.3).
  *
  * Scale design: all operators join/aggregate on (entity keys × coarse time)
  * — the shuffle key is the entity, never a global sort. Densification emits
  * rows via `explode(sequence(...))` per key, fully distributed.
  */
object TemporalOps {

  /** Temporal-granularity equi-join: join a fine-grained left to a
    * coarser-grained right on keys + the truncated date, keeping the finest
    * date column. Reference: `date_merge`
    * (`/root/reference/src/pudl/helpers.py:612-718`) — it splits dates into
    * y/q/m parts and joins on the selected grain; the Spark-native form
    * derives the truncation at plan time.
    *
    * @param grain one of "year", "quarter", "month", "day"
    */
  def dateMerge(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftDate: String, rightDate: String, grain: String,
                how: String = "left"): DataFrame = {
    val l = left.withColumn("__grain", date_trunc(grain, col(leftDate)))
    val r = right.withColumn("__grain", date_trunc(grain, col(rightDate)))
      .drop(rightDate)
    l.join(r, keys :+ "__grain", how).drop("__grain")
  }

  /** As-of (backward) join: each left row picks the most recent right row
    * with rightTs ≤ leftTs within its key group — pandas `merge_asof` /
    * DuckDB `ASOF JOIN` semantics, equal timestamps match.
    *
    * Spark has no as-of physical operator; the naive key-equi join +
    * range filter explodes with per-key history length. This form is the
    * scale-correct one: tag both sides, union, and run ONE window over
    * (key, ts) carrying the last non-null right payload forward — both
    * inputs shuffle once on the key and the match falls out of a single
    * sorted pass, O(left + right) rows. Ties among right rows on the same
    * (key, ts) resolve to the greatest payload tuple (deterministic under
    * any partitioning); pre-aggregate the right side to unique (key, ts)
    * when a different rule is needed.
    *
    * @param matchedTsName   output column holding the matched right ts
    * @param toleranceSeconds when set, matches older than this many
    *                         seconds before the left ts are nulled out
    *                         (merge_asof `tolerance`)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               matchedTsName: String = "matched_ts",
               toleranceSeconds: Option[Long] = None): DataFrame = {
    val leftCols = left.columns.filterNot(keys.contains).toSeq
    val payloadCols = right.columns
      .filterNot(c => keys.contains(c) || c == rightTs).toSeq
    // output = left columns ++ matchedTsName ++ right payload columns: any
    // overlap would emit ambiguous duplicate names (pandas merge_asof
    // suffixes; we require the caller to rename instead — explicit > silent)
    val clash = (payloadCols :+ matchedTsName).filter(c =>
      left.columns.contains(c)) ++
      (if (payloadCols.contains(matchedTsName)) Seq(matchedTsName) else Nil)
    require(clash.isEmpty,
      s"asofJoin output name collision on ${clash.distinct.mkString(", ")}: " +
        "rename right payload columns (or pick a different matchedTsName) " +
        "so they are disjoint from left columns")
    val internal = Seq("__ts", "__isLeft", "__payload", "__m")
    val internalClash = (left.columns ++ right.columns).filter(internal.contains)
    require(internalClash.isEmpty,
      s"asofJoin reserves ${internalClash.distinct.mkString(", ")}; rename input columns")
    val rt = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__isLeft"),
        struct(col(rightTs).cast("timestamp").as("__mts") +:
          payloadCols.map(col): _*).as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val payloadType = rt.schema("__payload").dataType
    val lt = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__isLeft"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      // right rows sort before left at equal ts (equal timestamps match);
      // right-row ties resolve by payload order -> last = greatest tuple
      .orderBy(col("__ts").asc, col("__isLeft").asc, col("__payload").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lt.unionByName(rt)
      .withColumn("__m", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__isLeft") === 1)
    val gated = toleranceSeconds match {
      case Some(t) => when(col("__m").isNotNull &&
        col("__ts").cast("long") - col("__m.__mts").cast("long") <= t,
        col("__m"))
      case None => col("__m")
    }
    matched.withColumn("__m", gated)
      .select(keys.map(col) ++ leftCols.map(col) ++
        (col("__m.__mts").as(matchedTsName) +:
          payloadCols.map(c => col(s"__m.$c").as(c))): _*)
  }

  /** Range (interval-containment) join: pair each point with every
    * interval of its key group satisfying start ≤ t ≤ end — without the
    * nested-loop join Spark would otherwise plan for an inequality
    * condition.
    *
    * Blocking: intervals explode to the coarse time buckets they overlap
    * (width `bucketSeconds`), points map to their single bucket, and
    * candidates meet in an ordinary (keys, bucket) equi-join; the exact
    * BETWEEN filter runs inside buckets only. A true pair meets in
    * exactly one bucket — the point's — so no dedup pass is needed.
    * Shuffle keys are (keys, bucket); candidate volume per point is the
    * intervals overlapping its bucket, tuned by `bucketSeconds` (≈ median
    * interval length is a good default). The same shape as the spatial
    * grid join (SpatialOps.overlayBoxes), one dimension down. */
  def intervalJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                   tCol: String, startCol: String, endCol: String,
                   bucketSeconds: Long): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val p = points.withColumn("__b",
      floor(col(tCol).cast("timestamp").cast("long") / bucketSeconds))
    // end < start can never satisfy BETWEEN — drop such intervals up
    // front (sequence() would throw on a descending range, where the SQL
    // semantics are "matches nothing")
    val iv = intervals.where(col(endCol) >= col(startCol))
      .withColumn("__b", explode(sequence(
        floor(col(startCol).cast("timestamp").cast("long") / bucketSeconds),
        floor(col(endCol).cast("timestamp").cast("long") / bucketSeconds))))
    p.join(iv, keys :+ "__b")
      .where(col(tCol).between(col(startCol), col(endCol)))
      .drop("__b")
  }

  /** Densify a keyed timeseries to a fixed `step` between each key's min and
    * max observed date, then forward-fill `fillCols` from the last non-null.
    * Reference: `expand_timeseries` (`/root/reference/src/pudl/helpers.py:719-806`),
    * `full_timeseries_date_merge` (`:560-596`).
    *
    * The dense spine is built per key with `sequence()` + `explode` — no
    * driver-side calendar, no cross join; scales with #keys × #periods.
    */
  def expandTimeseries(df: DataFrame, keys: Seq[String], dateCol: String,
                       step: String, fillCols: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val spine = df.groupBy(keyCols: _*)
      .agg(min(col(dateCol)).as("__lo"), max(col(dateCol)).as("__hi"))
      .select(keyCols :+ explode(
        sequence(col("__lo"), col("__hi"), expr(s"INTERVAL $step"))).as(dateCol): _*)
    val joined = spine.join(df, keys :+ dateCol, "left")
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    fillCols.foldLeft(joined) { (acc, c) =>
      acc.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** Collapse a snapshot history into a changelog: keep only rows where any
    * tracked column differs from the previous snapshot of the same key.
    * Reference: `make_changelog` (`/root/reference/src/pudl/helpers.py:2627-2659`).
    * Null-safe comparison (`<=>`), matching pandas' NaN-equal shift compare.
    */
  def changelog(df: DataFrame, keys: Seq[String], order: Seq[Column],
                tracked: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val anyChanged = tracked
      .map(c => !(col(c) <=> lag(col(c), 1).over(w)))
      .reduce(_ || _)
    val isFirst = row_number().over(w) === 1
    df.withColumn("__keep", isFirst || anyChanged)
      .where(col("__keep")).drop("__keep")
  }

  /** SCD2 validity intervals: compress a per-key history to its change
    * rows ([[changelog]]) and close each with the NEXT change's
    * timestamp — `fromName` inclusive, `toName` exclusive, NULL while
    * current. The standard warehouse dimension-history build (the
    * interval form of the reference's best-snapshot/apply-diffs family):
    * joining facts back is then `fact.ts >= from AND (to IS NULL OR
    * fact.ts < to)` — or [[asofJoin]] on the change rows directly.
    *
    * Both windows (the change detection and the closing `lead`) share
    * the same (keys, order) clustering, so the plan pays ONE hash
    * exchange; the second window adds only a sort over already-clustered
    * rows. At 100 TB the output is the compressed history — one row per
    * change, not per snapshot.
    *
    * @param order  total order within key (include a tiebreaker column —
    *               interval semantics need an unambiguous sequence)
    * @param tsCol  the column whose values become the interval bounds */
  def scd2Intervals(df: DataFrame, keys: Seq[String], order: Seq[Column],
                    tsCol: String, tracked: Seq[String],
                    fromName: String = "effective_from",
                    toName: String = "effective_to"): DataFrame = {
    // same explicit-beats-silent rule as asofJoin: the four output columns
    // would otherwise silently overwrite same-named input columns
    val clash = df.columns.toSet
      .intersect(Set(fromName, toName, "version", "is_current"))
    require(clash.isEmpty,
      s"scd2Intervals: input already has output column(s) ${clash.mkString(", ")} — " +
        "rename them or pass different fromName/toName")
    val chg = changelog(df, keys, order, tracked)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    chg.withColumn(fromName, col(tsCol))
      .withColumn(toName, lead(col(tsCol), 1).over(w))
      .withColumn("version", row_number().over(w))
      .withColumn("is_current", col(toName).isNull)
  }

  /** Apply a CDC changelog to a base snapshot — the inverse of
    * [[changelog]] and the batch form of warehouse MERGE/upsert: the
    * LAST change per key (by `order`, descending semantics supplied by
    * the caller) wins; an upsert (`op != deleteOp`) replaces the key's
    * data columns wholesale (including explicit nulls — this is
    * op-driven replacement, NOT coalesce), a delete drops the key, and
    * keys with no change pass through. Changes for unseen keys insert.
    *
    * Scale shape: one window dedup over the changes (same
    * WindowGroupLimit map-side rank-1 cap as every keepFirst) + one
    * key-partitioned full-outer join — both sides shuffle once on the
    * key, AQE handles skewed hot keys. No collects, no broadcasts of
    * the data. At 100 TB this is the nightly "apply the day's CDC tail
    * to the snapshot" pass: cost is one co-partitioned merge, not a
    * rewrite of history.
    *
    * @param order  total order over a key's changes, LATEST FIRST
    *               (e.g. `Seq(col("seq").desc)`) — must be total or
    *               last-wins is ambiguous
    * @param opCol  change-operation column in `changes`
    * @param dataCols  payload columns present in both frames
    * @param deleteOp  `opCol` value that deletes the key */
  def applyChangelog(base: DataFrame, changes: DataFrame, keys: Seq[String],
                     order: Seq[Column], opCol: String,
                     dataCols: Seq[String],
                     deleteOp: String = "D"): DataFrame = {
    val latest = graft.operators.Dedup.keepFirst(changes, keys, order)
      .select(keys.map(col) ++ (col(opCol).as("__op") +:
        dataCols.map(c => col(c).as(s"__chg_$c"))): _*)
    base.select(keys.map(col) ++ dataCols.map(col): _*)
      .join(latest, keys, "full_outer")
      .where(col("__op").isNull || col("__op") =!= deleteOp)
      .select(keys.map(col) ++ dataCols.map(c =>
        when(col("__op").isNotNull, col(s"__chg_$c"))
          .otherwise(col(c)).as(c)): _*)
  }

  /** Row-level diff report between two snapshots of the same table — the
    * nightly-build audit ("what changed since yesterday") behind the
    * reference's golden row-count validation layer
    * (`/root/reference/dbt/seeds/etl_full_row_counts.csv` et al.), but at
    * column granularity: every key is classified `added` / `removed` /
    * `changed` / `unchanged`, with the null-safe list of changed columns.
    *
    * Scale: one co-partitioned full-outer join on the key (both sides
    * shuffle once; AQE skew handling applies) and pure per-row
    * expressions — no collects, no windows; cost is |old| + |new|
    * regardless of how much changed. Output: keys + (status,
    * changed_cols, n_changed). */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame, keys: Seq[String],
                    compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && compareCols.nonEmpty,
      "need keys and compare columns")
    val o = oldDf.select(keys.map(col) ++
      (lit(true).as("__in_old") +: compareCols.map(c => col(c).as(s"__o_$c"))): _*)
    val n = newDf.select(keys.map(col) ++
      (lit(true).as("__in_new") +: compareCols.map(c => col(c).as(s"__n_$c"))): _*)
    val joined = o.join(n, keys, "full_outer")
    val changed = compareCols.map(c =>
      when(!(col(s"__o_$c") <=> col(s"__n_$c")), lit(c)))
    val changedArr = array_compact(array(changed: _*))
    joined.select(keys.map(col) ++ Seq(
      when(col("__in_old").isNull, lit("added"))
        .when(col("__in_new").isNull, lit("removed"))
        .when(size(changedArr) > 0, lit("changed"))
        .otherwise(lit("unchanged")).as("status"),
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        concat_ws(",", changedArr)).as("changed_cols"),
      when(col("__in_old").isNotNull && col("__in_new").isNotNull,
        size(changedArr).cast("long")).otherwise(lit(0L)).as("n_changed")): _*)
  }

  /** Time-travel read over an SCD2 history ([[scd2Intervals]] output):
    * the rows valid at instant `at` — `from <= at < to`, open `to`
    * (NULL) meaning current. A narrow filter: at 100 TB this rides
    * min/max row-group pruning on the interval columns, never a shuffle. */
  def snapshotAt(hist: DataFrame, at: Column,
                 fromCol: String = "effective_from",
                 toCol: String = "effective_to"): DataFrame =
    hist.where(col(fromCol) <= at &&
      (col(toCol).isNull || at < col(toCol)))
}
