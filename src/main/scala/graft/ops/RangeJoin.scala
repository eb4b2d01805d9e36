package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range joins WITHOUT an equi key.
  *
  * The interval joins in [[Relational]] ride an equi key (user_id) — Catalyst
  * plans them as hash joins with a residual range filter, which scales. A
  * range predicate with NO equi component (`pt BETWEEN lo AND hi` across the
  * whole corpus) is different: Spark's only native plans are broadcast
  * nested-loop or cartesian + filter — O(|points|·|intervals|) work, the
  * classic 100 TB cliff.
  *
  * [[binnedPointInterval]] is the standard fix (the same rewrite behind
  * Databricks' range-join "bin join" hint): quantize the range dimension into
  * fixed-width bins, replicate each interval to every bin it overlaps, join
  * point-bin = interval-bin as an EQUI join, then apply the exact range
  * predicate as a residual filter. Work becomes O(matches + intervals ·
  * span/binWidth) with an ordinary shuffled hash join — pick `binWidth` near
  * the typical interval span so replication stays O(1) per interval.
  */
object RangeJoin {

  /** Equi-rewritten point-in-interval join: rows of `points` paired with
    * rows of `intervals` where `pt ∈ [lo, hi]` (closed bounds).
    *
    * Bin ids use integral `div` (never float division — epoch µs values
    * lose low bits past 2^53 in doubles); a (point, interval) pair meets in
    * exactly one bin (the point's), so no post-join dedup is needed.
    * Contract: `points` and `intervals` must have disjoint column names, and
    * `lo`/`hi`/`pt` must be non-negative integral columns (epoch µs).
    */
  def binnedPointInterval(points: DataFrame, pt: String,
                          intervals: DataFrame, lo: String, hi: String,
                          binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points.withColumn("__bin", expr(s"`$pt` div ${binWidth}L"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(expr(s"`$lo` div ${binWidth}L"),
                       expr(s"`$hi` div ${binWidth}L"))))
    p.join(iv, Seq("__bin"))
      .filter(col(pt) >= col(lo) && col(pt) <= col(hi))
      .drop("__bin")
  }
}
