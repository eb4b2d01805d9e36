package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch relational operator library — each function is one operator family
  * from SURVEY.md §2, re-expressed as a declarative DataFrame program so
  * Catalyst keeps full freedom (pushdown, pruning, join selection, AQE).
  *
  * Scale notes are attached per operator: every shuffle is on the natural key
  * of the operation, small dimensions are broadcast by the caller, and no
  * operator ever collects to the driver.
  */
object Relational {

  /** W1 — latest record per key (reference `Silver/05-silver.py:25-31`).
    *
    * Uses `rank` (NOT `row_number`): two records tied on `orderCol` both
    * survive, preserving the reference's CDC tie semantics. One shuffle on
    * `keys`; state is a per-partition sort — scales linearly with data/keys.
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], orderCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol).desc)
    df.withColumn("__rank", rank().over(w)).filter(col("__rank") === 1).drop("__rank")
  }

  /** D1 (deterministic batch form) — keyed dedup keeping the first row by
    * `tiebreak` (reference `dropDuplicates` keeps an arbitrary row —
    * `Silver/05-silver.py:78-79`; we pin a total order so results are
    * oracle-comparable). `row_number` (not `rank`): exactly one survivor.
    */
  def dedupKeyed(df: DataFrame, keys: Seq[String], tiebreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tiebreak: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** J4 — interval pairing join (sessionization): pair each `start` row with
    * `stop` rows of the same key where `stop.ts ∈ (start.ts, start.ts + maxGap)`
    * — open interval on both ends, verbatim from
    * `Silver/05-silver.py:395-396` (`end > start AND end < start + 3h`).
    *
    * Physical shape: shuffle both sides on `keys` → hash join + residual range
    * filter. At 100 TB the equi key carries the join; the range predicate is a
    * post-filter, so state ∝ rows-per-key within the gap, not the table size.
    */
  def intervalPairJoin(
      starts: DataFrame, stops: DataFrame, keys: Seq[String],
      startTs: String, stopTs: String, maxGap: Column): DataFrame = {
    val cond = keys.map(k => starts(k) === stops(k)).reduce(_ && _) &&
      stops(stopTs) > starts(startTs) &&
      stops(stopTs) < starts(startTs) + maxGap
    starts.join(stops, cond, "inner")
  }

  /** J5/J7 — point-in-interval assignment: attach each point row to interval
    * rows of the same key where `pt ∈ (lo, hi]` (half-open, verbatim from
    * `Silver/05-silver.py:459-461`). For the closed `BETWEEN` flavor of the
    * gym-summary view (`Setup/02-setup.py:253`) use [[pointInClosedInterval]].
    */
  def pointInInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pt: String, lo: String, hi: String): DataFrame = {
    val cond = keys.map(k => points(k) === intervals(k)).reduce(_ && _) &&
      points(pt) > intervals(lo) && points(pt) <= intervals(hi)
    points.join(intervals, cond, "inner")
  }

  /** J7 — closed-interval containment (`BETWEEN lo AND hi`),
    * `Setup/02-setup.py:250-254`. */
  def pointInClosedInterval(
      points: DataFrame, intervals: DataFrame, keys: Seq[String],
      pt: String, lo: String, hi: String): DataFrame = {
    val cond = keys.map(k => points(k) === intervals(k)).reduce(_ && _) &&
      points(pt).between(intervals(lo), intervals(hi))
    points.join(intervals, cond, "inner")
  }

  /** A1 — per-group stats aggregation (reference `Gold/06-gold.py:93-95`):
    * min/avg/max/count of `valueCol` grouped by `keys`. Map-side partial
    * aggregation is automatic (hash agg), so the shuffle carries one row per
    * (partition, key) — the 100 TB-safe shape.
    */
  def groupStats(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      min(col(valueCol)).as("min_" + valueCol),
      avg(col(valueCol)).as("avg_" + valueCol),
      max(col(valueCol)).as("max_" + valueCol),
      count(col(valueCol)).as("num_recordings"))

  /** P9 — validity flag (reference `Silver/05-silver.py:271`). */
  def validityFlag(value: Column): Column =
    when(value <= 0, lit(false)).otherwise(lit(true))

  /** P10 — chained-`when` binning (reference age_bins,
    * `Silver/05-silver.py:291-304`). Generic over any numeric column:
    * `bounds` are the inclusive-exclusive bin edges, `labels.length ==
    * bounds.length + 1`; null/out-of-range → `invalidLabel`.
    * The reference's `current_date()` nondeterminism is removed by taking the
    * already-computed numeric column (callers inject the clock — SURVEY §7.1).
    */
  def binned(value: Column, bounds: Seq[Double], labels: Seq[String],
             invalidLabel: String): Column = {
    require(labels.length == bounds.length + 1,
      s"need ${bounds.length + 1} labels for ${bounds.length} bounds")
    val first = when(value < bounds.head, labels.head)
    val mid = bounds.indices.drop(1).foldLeft(first) { (acc, i) =>
      acc.when(value >= bounds(i - 1) && value < bounds(i), labels(i))
    }
    mid.when(value >= bounds.last, labels.last).otherwise(lit(invalidLabel))
  }

  /** Reference age_bins verbatim semantics (`Silver/05-silver.py:291-304`)
    * with an injected as-of date for determinism: age = floor(months_between
    * (asOf, dob)/12), 11 bins "under 18" … "95+", else "invalid age". */
  def ageBins(dob: Column, asOf: Column): Column = {
    val age = floor(months_between(asOf, dob) / 12)
    binned(age, Seq(18, 25, 35, 45, 55, 65, 75, 85, 95),
      Seq("under 18", "18-25", "25-35", "35-45", "45-55",
          "55-65", "65-75", "75-85", "85-95", "95+"),
      "invalid age")
  }

  /** O2 — deterministic top-k per group: dense ordering by `order` then
    * `tiebreak` so exactly k rows survive per key. One shuffle on `keys`.
    */
  def topKPerGroup(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   k: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= k).drop("__rn")
  }

  // ── skew-safe variants ──────────────────────────────────────────────────
  // The window forms above sort whole key-partitions; one celebrity key puts
  // its entire history through a single reducer's sort. These variants trade
  // the sort for aggregation shapes with map-side partial state, at identical
  // results (property-tested in RelationalSpec).

  /** Skew-safe [[dedupKeyed]]: `min_by`-style aggregation instead of a
    * window sort — partial aggregation keeps ONE row of state per key per
    * map task regardless of skew, so a hot key costs O(1) reducer memory
    * instead of an O(rows-per-key) sort. `tiebreak` columns must form a
    * total order (same contract as [[dedupKeyed]]). */
  def dedupKeyedAgg(df: DataFrame, keys: Seq[String],
                    tiebreak: Seq[String]): DataFrame = {
    val payload = struct(
      (tiebreak ++ df.columns.filterNot(tiebreak.contains)).map(col): _*)
    val keyCols = keys.map(col)
    // min over a struct = lexicographic min over (tiebreak..., rest...) —
    // exactly row_number()=1 under ORDER BY tiebreak ASC
    df.groupBy(keyCols: _*).agg(min(payload).as("__row"))
      .select(df.columns.map(c => col("__row").getField(c).as(c)).toIndexedSeq: _*)
  }

  /** J9 — as-of join: attach to each left row the latest right row with
    * `right.ts <= left.ts` on the same key (the point-in-time lookup behind
    * feature back-fills, price marks, "last heartbeat before the error").
    * Left-outer: unmatched left rows keep null payload.
    *
    * Deliberately NOT a θ-join on `r.ts <= l.ts` — that predicate has no
    * equi component on time, so per key it degenerates to a nested-loop /
    * exploded range join whose cost is |left|·|right| within the key. The
    * scalable shape is the union trick: tag both sides, union, ONE shuffle
    * on `keys`, one per-partition sort by `(ts, side)` (right rows sort
    * before left rows at equal ts so `r.ts == l.ts` matches — DuckDB
    * `ASOF ... ON l.ts >= r.ts` semantics), then carry the last non-null
    * right payload forward with a running `last(ignoreNulls)` frame. Cost is
    * sort + linear scan regardless of how sparse or dense either side is.
    *
    * Contract: `right` must be unique per `(keys, rightTs)` — pre-dedup with
    * [[dedupKeyedAgg]] otherwise, or equal-ts right rows would be picked
    * arbitrarily. `rightPayload` names must not collide with left columns.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPayload: Seq[String]): DataFrame = {
    val rPay = struct(rightPayload.map(col): _*)
    val rPayType = right.select(rPay.as("p")).schema("p").dataType
    val lRows = left.select(
      left.columns.map(col).toIndexedSeq
        :+ col(leftTs).as("__ts") :+ lit(1).as("__side")
        :+ lit(null).cast(rPayType).as("__rpay"): _*)
    val rRows = right.select(
      left.schema.map { f =>
        if (keys.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)
      }.toIndexedSeq
        :+ col(rightTs).as("__ts") :+ lit(0).as("__side")
        :+ rPay.as("__rpay"): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lRows.unionByName(rRows)
      .withColumn("__asof", last(col("__rpay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toIndexedSeq
        ++ rightPayload.map(p => col("__asof").getField(p).as(p)): _*)
  }

  /** Skew-safe [[topKPerGroup]]: two-phase — salt splits each key over
    * `saltFactor` reducers for a local top-k (bounding any single sort at
    * rows-per-key / saltFactor), then the k·saltFactor survivors per key go
    * through the exact global top-k. Result is identical to the one-phase
    * form because a group's true top-k rows always survive their salt's
    * local top-k. `order` must be expressed over column NAMES (deterministic
    * salt derives from the full row). */
  def topKPerGroupSalted(df: DataFrame, keys: Seq[String], order: Seq[Column],
                         k: Int, saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val local = {
      val w = Window.partitionBy((keys :+ "__salt").map(col): _*).orderBy(order: _*)
      salted.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k).drop("__rn", "__salt")
    }
    topKPerGroup(local, keys, order, k)
  }

  /** Sequential-pattern (funnel) counting — how many users reach each stage
    * of an ordered event sequence, where stage i+1 must occur strictly
    * after the user's stage-i time and within `windowUs` of it (exact
    * integer µs — CLAUDE.md rule 1). Returns one row per stage:
    * (`stage` = "<i>_<type>", `n_users`).
    *
    * Shape: per-stage min-timestamp aggregation, then an equi-join to the
    * previous stage's relation — every shuffle is on the user key, and the
    * per-stage relations shrink monotonically (stage k+1's input is
    * filtered by stage k's survivors). Each stage's event filter is pushed
    * to its own scan (`PushedFilters: EqualTo(event_type, ...)`), so a
    * 100 TB corpus reads only the funnel's event types; the chained joins
    * all hash on `userCol`, so AQE reuses the partitioning and can
    * broadcast late stages as they shrink below the threshold. */
  def funnel(ev: DataFrame, userCol: String, tsCol: String, typeCol: String,
             stages: Seq[String], windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(windowUs > 0, s"windowUs must be positive, got $windowUs")
    var reached = ev.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
    var out = reached.agg(count(lit(1)).as("n_users"))
      .select(lit(s"1_${stages.head}").as("stage"), col("n_users"))
    stages.zipWithIndex.drop(1).foreach { case (st, i) =>
      reached = ev.filter(col(typeCol) === st)
        .join(reached, Seq(userCol))
        .filter(col(tsCol) > col("__t") && col(tsCol) <= col("__t") + windowUs)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      out = out.unionAll(reached.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$st").as("stage"), col("n_users")))
    }
    out
  }

  /** k-ANONYMITY ROLLUP — privacy-preserving grouped aggregates: groups
    * identified by `keys` whose DISTINCT-`idCol` population is below `k`
    * are folded into one `*`-masked bucket, so no output row describes
    * fewer than k individuals while the totals still reconcile (the
    * suppressed mass is reported, not dropped — the standard suppression
    * form of k-anonymity for release-ready aggregates).
    *
    * Shape at 100 TB: group sizes are one grouped count-distinct
    * (map-side partial), and the size relation has #groups rows — tiny
    * relative to the corpus — so the tag join is an explicit broadcast;
    * the corpus is shuffled once, on the masked keys, for the final
    * aggregate. Masked key columns come back as strings (`*` is not a
    * member of most key domains). */
  def kAnonRollup(df: DataFrame, keys: Seq[String], idCol: String, k: Long,
                  aggs: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && k >= 1, "need grouping keys and k >= 1")
    val sizes = df.groupBy(keys.map(col).toIndexedSeq: _*)
      .agg(countDistinct(col(idCol)).as("__grp_n"))
    val tagged = df.join(broadcast(sizes), keys)
    val masked = keys.foldLeft(tagged)((d, key) =>
      d.withColumn(key,
        when(col("__grp_n") < k, lit("*")).otherwise(col(key).cast("string"))))
    masked.groupBy(keys.map(col).toIndexedSeq: _*).agg(aggs.head, aggs.tail: _*)
  }
}
