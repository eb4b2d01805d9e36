package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Consistent (deterministic) min-k sampling — the `Aggregator[IN, BUF, OUT]`
  * extension point (SURVEY.md §7.4 ladder, typed-aggregate rung).
  *
  * Keeps the k elements with the smallest hash per group. Because the
  * "random" priority is a content hash, the sample is reproducible across
  * runs, engines and partitionings (same property family as MinHash): the
  * standard way to draw stable training-data subsets. The buffer is a
  * bounded sorted list, merged associatively — partial aggregation works, so
  * the shuffle carries ≤ k rows per (partition, group) at any scale.
  *
  * IN = (id, hashKey); OUT = ids of the k smallest hashKeys (hash-ordered).
  */
class MinKSample(k: Int) extends Aggregator[(Long, String), List[(String, Long)], Seq[Long]] {
  require(k >= 1, "k must be >= 1")

  override def zero: List[(String, Long)] = Nil

  private def trim(l: List[(String, Long)]): List[(String, Long)] =
    l.sortBy(identity).take(k)

  override def reduce(buf: List[(String, Long)], in: (Long, String)): List[(String, Long)] =
    trim((in._2, in._1) :: buf)

  override def merge(a: List[(String, Long)], b: List[(String, Long)]): List[(String, Long)] =
    trim(a ++ b)

  override def finish(buf: List[(String, Long)]): Seq[Long] = buf.map(_._2)

  override def bufferEncoder: Encoder[List[(String, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[(String, Long)]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
