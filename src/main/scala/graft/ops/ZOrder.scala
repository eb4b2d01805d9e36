package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.InterleaveBits

/** Multi-dimensional data clustering for scan-time skipping (the
  * `OPTIMIZE ZORDER BY` analog).
  *
  * A single-key sort ([[graft.merge.ParquetTable.writeTo]]'s merge-key sort)
  * gives row-group pruning on the LEADING key only; queries filtering on a
  * second column scan everything. Z-ordering sorts by the Morton interleave
  * of both columns, so every row group covers a small rectangle of the
  * 2-D key space and min/max stats prune on either column.
  *
  * At 100 TB the write is one `repartitionByRange` on the z-code (range
  * exchange with sampled bounds — no global sort on one reducer) + a
  * per-partition sort; the z-code itself is a codegen'd expression.
  */
object ZOrder {

  private val FuncName = "interleave_bits"

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => InterleaveBits(exprs.head, exprs(1)), "built-in")

  /** Morton z-code of two non-negative int columns; call [[register]]
    * first. Columns with skewed/unbounded domains should be rank-bucketed
    * first ([[rankBucket]]) — interleaving raw values wastes z-bits on
    * empty regions of the domain. */
  def zkey(a: Column, b: Column): Column =
    call_function(FuncName, a.cast("int"), b.cast("int"))

  /** Equi-depth bucket id (0..buckets-1) of `c` — normalizes any orderable
    * domain for [[zkey]]. NOTE: `percent_rank` runs a single-partition
    * window; use only on bounded relations (dimension tables, samples). For
    * full-corpus normalization compute approximate range bounds instead
    * (the repartitionByRange sampler shape). */
  def rankBucket(c: Column, buckets: Int): Column =
    least(floor(percent_rank().over(
      org.apache.spark.sql.expressions.Window.orderBy(c)) * buckets),
      lit(buckets - 1)).cast("int")

  /** Write `df` clustered by the z-order of two int columns: range-partition
    * on the z-code (sampled bounds, parallel), sort within partitions, write
    * parquet. Readers filtering on either column get row-group pruning from
    * the parquet min/max stats (ZOrderSpec proves it with a negative
    * control). */
  def clusteredWrite(df: DataFrame, a: String, b: String,
                     path: String, nFiles: Int): Unit = {
    register(df.sparkSession)
    val z = zkey(col(a), col(b)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
