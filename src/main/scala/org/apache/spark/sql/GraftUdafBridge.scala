package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.aggregate.ScalaAggregator
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedAggregator}

/** Bridge into the `private[sql]` [[UserDefinedAggregator]] constructor —
  * the exact object `spark.udf.register(name, functions.udaf(agg, enc))`
  * builds internally. `GraftExtensions` needs it to inject typed
  * `Aggregator`s ([[graft.functions.Sketches]]) as SQL functions through
  * `SparkSessionExtensions.injectFunction`, which has no session to call
  * `udf.register` on. Same pattern as `StateStoreCoordinatorInit`.
  */
object GraftUdafBridge {

  /** Plan `agg(children.head)` as the [[ScalaAggregator]] aggregate
    * function, identically to the registered-udaf path. */
  def aggregate[B, O](
      agg: Aggregator[String, B, O],
      name: String,
      children: Seq[Expression]): Expression =
    ScalaAggregator(
      UserDefinedAggregator(agg, Encoders.STRING, Some(name)), children)
}
