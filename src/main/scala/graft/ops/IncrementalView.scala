package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental view maintenance: keep a per-group (count, integer sums)
  * aggregate current by applying a change feed
  * ([[graft.merge.ParquetTable.changes]]) instead of re-aggregating the
  * table — the materialized-view half of the CDF story (Delta's
  * "incrementally process changes" pattern; classical IVM for
  * SUM/COUNT-able aggregates).
  *
  * Contract: measures are LONG (exact integer domain — callers working in
  * currency convert to cents first). Integer addition is associative, so
  * delta application is EXACTLY equal to recomputing over the new snapshot,
  * regardless of grouping or order — no float-summation caveat. A row's
  * contribution enters with sign +1 (`insert`, `update_postimage`) or −1
  * (`delete`, `update_preimage`); an update that moves a row across groups
  * therefore decrements the old group and increments the new one with no
  * special casing. Groups whose maintained count reaches 0 are dropped,
  * matching what a recompute over the snapshot would produce.
  *
  * Scale: cost is one aggregate over the DELTA (batch-sized) plus a keyed
  * full-outer join against the prior aggregate (group-cardinality-sized) —
  * never a scan of the table. Both shuffles are on the group key.
  */
object IncrementalView {
  /** `prior` has columns `groupKeys :+ "n" :+ sumCols` (the maintained
    * aggregate); `changes` is a CDF frame carrying `groupKeys`, the measure
    * source columns in `sumCols`, and `_change_type`. Returns the updated
    * aggregate, same shape as `prior`. */
  def applyDelta(prior: DataFrame, changes: DataFrame,
                 groupKeys: Seq[String], sumCols: Seq[String]): DataFrame = {
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(concat(lit("unknown _change_type: "),
        col("_change_type"))).cast("long")) // loud beats silently dropped
    val deltas = changes
      .groupBy(groupKeys.map(col): _*)
      .agg(sum(sign).as("_dn"),
        sumCols.map(c => sum(col(c) * sign).as(s"_d_$c")): _*)
    prior.join(deltas, groupKeys, "full_outer")
      .select(groupKeys.map(col) ++
        Seq((coalesce(col("n"), lit(0L)) + coalesce(col("_dn"), lit(0L))).as("n")) ++
        sumCols.map(c =>
          (coalesce(col(c), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L))).as(c)): _*)
      .filter(col("n") =!= 0L)
  }
}
