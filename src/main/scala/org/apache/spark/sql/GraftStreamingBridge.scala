package org.apache.spark.sql

/** Bridge into `private[sql] SparkSession.internalCreateDataFrame` — the
  * call every built-in DSv1 streaming source uses to hand its per-batch
  * DataFrame back to the engine with `isStreaming = true` (MicroBatchExecution
  * asserts the flag on whatever `Source.getBatch` returns). Same pattern as
  * [[GraftUdafBridge]] / `StateStoreCoordinatorInit`.
  */
object GraftStreamingBridge {

  /** Re-tag a batch DataFrame as a streaming micro-batch: same rows, same
    * schema, `isStreaming = true`. The underlying RDD stays lazy — the scan
    * executes when the micro-batch runs, not here. */
  def asStreaming(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = true)
  }

  /** The inverse: a micro-batch frame handed to `Sink.addBatch` carries the
    * streaming tag, which batch writers refuse — re-tag it batch (same
    * rows, same lazy RDD) so the sink can run a normal write. */
  def asBatch(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[classic.Dataset[Row]]
    ds.sparkSession.internalCreateDataFrame(
      ds.queryExecution.toRdd, ds.schema, isStreaming = false)
  }
}
