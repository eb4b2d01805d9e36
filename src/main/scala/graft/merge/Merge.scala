package graft.merge

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE semantics without Delta — the one genuinely custom component
  * (SURVEY.md §2.6, §7.3). Each flavor is a pure DataFrame program: Catalyst
  * plans the underlying joins (broadcast when the batch is small, shuffled
  * hash otherwise — AQE decides), so the same code is correct at 60k rows and
  * at 100 TB. All five reference MERGE statements map onto these.
  *
  * Conventions: `target` and `batch` share a schema; `keys` is the natural
  * key. Every function returns the new target content — persistence is the
  * caller's job (see [[ParquetTable]] for rewrite-and-swap).
  */
object Merge {

  private def keyCond(a: DataFrame, b: DataFrame, keys: Seq[String]): Column =
    keys.map(k => a(k) <=> b(k)).reduce(_ && _)

  /** Null-safe (`<=>`) left-anti: rows of `from` whose key is absent from
    * `against`. Using-column anti-joins never match null keys, which would
    * re-insert a null-keyed row on every replay and break idempotency —
    * all merge flavors use `<=>` key equality uniformly. */
  private def antiByKey(from: DataFrame, against: DataFrame, keys: Seq[String]): DataFrame = {
    val a = against.select(keys.map(k => col(k).as("__a_" + k)).toIndexedSeq: _*).distinct()
    val cond = keys.map(k => from(k) <=> a("__a_" + k)).reduce(_ && _)
    from.join(a, cond, "left_anti")
  }

  /** M1 — insert-only / idempotent append (`WHEN NOT MATCHED THEN INSERT *`,
    * reference `Silver/05-silver.py:50-55,208-213,254-259,359-364`).
    * Survivors = batch rows whose key is absent from target. Left-anti join:
    * one shuffle on `keys` (or broadcast of the smaller side under AQE).
    */
  def insertOnly(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    target.unionByName(antiByKey(batch, target, keys))

  /** M4 — SCD Type-1 unconditional upsert (`WHEN MATCHED UPDATE SET *, WHEN
    * NOT MATCHED INSERT *`, reference `Silver/05-silver.py:314-321`).
    * Batch wins on key collision. `batch` must be key-unique (the reference
    * guarantees this via its pre-merge rank filter).
    */
  def scd1(target: DataFrame, batch: DataFrame, keys: Seq[String]): DataFrame =
    batch.unionByName(antiByKey(target, batch, keys))

  /** M3 — CDC upsert with recency guard (`WHEN MATCHED AND a.updated <
    * b.updated THEN UPDATE SET *`, reference `Silver/05-silver.py:159-167`).
    * The batch is first collapsed to the latest record per key (rank=1 with
    * ties kept is the reference semantic; here key-uniqueness is required, so
    * callers pre-apply `Relational.latestPerKey` + a deterministic tiebreak).
    * Matched target rows are replaced only when the batch row is strictly
    * newer on `recencyCol`.
    */
  def cdcUpsert(target: DataFrame, batch: DataFrame, keys: Seq[String],
                recencyCol: String): DataFrame = {
    val b = batch.select(batch.columns.map(c => col(c).as("__b_" + c)).toIndexedSeq: _*)
    val cond = keys.map(k => target(k) <=> b("__b_" + k)).reduce(_ && _)
    val joined = target.join(b, cond, "full_outer")
    // For each output column: batch value when (no target row) OR (newer), else target value.
    val takeBatch = target(keys.head).isNull ||
      (b("__b_" + recencyCol).isNotNull && target(recencyCol) < b("__b_" + recencyCol))
    joined.select(target.columns.map { c =>
      when(takeBatch, b("__b_" + c)).otherwise(target(c)).as(c)
    }.toIndexedSeq: _*)
  }

  /** M2 — conditional single-column update + insert (gym_logs logout
    * extension: `WHEN MATCHED AND b.logout > a.login AND b.logout > a.logout
    * THEN UPDATE SET logout`, reference `Silver/05-silver.py:108-115`).
    * Generic: on match, replace `updateCol` with the batch value when
    * `guard(targetRow, batchRow)` holds; unmatched batch rows are inserted.
    */
  def conditionalUpdate(target: DataFrame, batch: DataFrame, keys: Seq[String],
                        updateCol: String,
                        guard: (String => Column, String => Column) => Column): DataFrame = {
    val b = batch.select(batch.columns.map(c => col(c).as("__b_" + c)).toIndexedSeq: _*)
    val cond = keys.map(k => target(k) <=> b("__b_" + k)).reduce(_ && _)
    val joined = target.join(b, cond, "full_outer")
    val tc: String => Column = c => target(c)
    val bc: String => Column = c => b("__b_" + c)
    val matched = target(keys.head).isNotNull && b("__b_" + keys.head).isNotNull
    joined.select(target.columns.map { c =>
      val out =
        if (c == updateCol)
          when(matched && guard(tc, bc), bc(c))
            .otherwise(coalesce(tc(c), bc(c)))
        else coalesce(tc(c), bc(c))
      out.as(c)
    }.toIndexedSeq: _*)
  }

  /** M6 — delete-matched (`WHEN MATCHED [AND cond] THEN DELETE` — beyond
    * the reference's five flavors; the Delta MERGE arm every GDPR /
    * right-to-be-forgotten pipeline runs). Target rows with a matching
    * batch key are REMOVED — all of them, or only those where some
    * matching batch row satisfies `guard` — and batch rows are never
    * inserted. Plan shape: one left-anti join on `keys` (+ guard), so the
    * same single-shuffle cost class as M1, and through
    * [[ParquetTable.merge]] only the buckets holding requested keys are
    * rewritten — O(touched partitions) erasure, which is the property that
    * makes per-user deletion affordable on a 100 TB table. Idempotent by
    * construction: re-applying the same deletion batch is a no-op. */
  def deleteMatched(target: DataFrame, batch: DataFrame, keys: Seq[String],
                    guard: Option[(String => Column, String => Column) => Column] = None)
      : DataFrame =
    guard match {
      case None => antiByKey(target, batch, keys)
      case Some(g) =>
        val b = batch.select(batch.columns.map(c => col(c).as("__b_" + c)).toIndexedSeq: _*)
        val cond = keys.map(k => target(k) <=> b("__b_" + k)).reduce(_ && _)
        val tc: String => Column = c => target(c)
        val bc: String => Column = c => b("__b_" + c)
        target.join(b, cond && g(tc, bc), "left_anti")
    }

  /** M5 — explicit-column-list upsert (gold summary,
    * `Gold/06-gold.py:31-80`): same plan shape as M4 but only `updateCols`
    * change on match; other target columns are preserved.
    */
  def upsertColumns(target: DataFrame, batch: DataFrame, keys: Seq[String],
                    updateCols: Seq[String]): DataFrame = {
    val b = batch.select(batch.columns.map(c => col(c).as("__b_" + c)).toIndexedSeq: _*)
    val cond = keys.map(k => target(k) <=> b("__b_" + k)).reduce(_ && _)
    val joined = target.join(b, cond, "full_outer")
    val inserted = target(keys.head).isNull
    joined.select(target.columns.map { c =>
      val out =
        if (updateCols.contains(c) || keys.contains(c))
          coalesce(b("__b_" + c), target(c))
        else when(inserted, b("__b_" + c)).otherwise(target(c))
      out.as(c)
    }.toIndexedSeq: _*)
  }
}
