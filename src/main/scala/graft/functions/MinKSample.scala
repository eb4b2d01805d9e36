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

object MinKValues {
  /** One sampled row: content hash (the deterministic "random" priority)
    * and the measured value it carries. */
  final case class HV(h: String, v: Double)
}

/** Consistent min-k sampling that CARRIES A VALUE — the sample-based
  * quantile sketch (q47). Keeps the (hash, value) pairs with the k
  * smallest content hashes; the value distribution of that sample
  * estimates any quantile, and because min-k of a union equals min-k of
  * the per-part min-k's (exactly — no approximation in the MERGE, only in
  * the sampling), per-group samples roll up to the global sample
  * bit-identically. A 100 TB pipeline keeps one ≤k-row sample per
  * day/source and answers global percentiles from samples alone, no
  * rescan — the quantile sibling of [[graft.functions.Sketches.KmvSketch]].
  *
  * Buffer discipline follows `Sketches.Kmv`: sorted array, O(1) full-buffer
  * reject on the hot path, binary-search insert, linear sorted merge.
  * Distinct on hash (md5 of a unique key — collisions don't occur; a true
  * duplicate row would mean duplicate input keys and keeps the first).
  */
class MinKValues(k: Int)
    extends Aggregator[(String, Double), Array[MinKValues.HV], Seq[MinKValues.HV]] {
  import MinKValues.HV
  require(k >= 1, "k must be >= 1")

  override def zero: Array[HV] = Array.empty

  override def reduce(buf: Array[HV], in: (String, Double)): Array[HV] = {
    val n = buf.length
    val h = in._1
    if (n == k && h.compareTo(buf(n - 1).h) >= 0) return buf // common case
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (buf(mid).h.compareTo(h) < 0) lo = mid + 1 else hi = mid
    }
    if (lo < n && buf(lo).h == h) return buf // duplicate hash
    val outLen = math.min(n + 1, k)
    val out = new Array[HV](outLen)
    System.arraycopy(buf, 0, out, 0, lo)
    out(lo) = HV(h, in._2)
    System.arraycopy(buf, lo, out, lo + 1, outLen - 1 - lo)
    out
  }

  override def merge(a: Array[HV], b: Array[HV]): Array[HV] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[HV](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    while (o < out.length && (i < a.length || j < b.length)) {
      val cmp =
        if (i == a.length) 1
        else if (j == b.length) -1
        else a(i).h.compareTo(b(j).h)
      if (cmp < 0) { out(o) = a(i); i += 1 }
      else if (cmp > 0) { out(o) = b(j); j += 1 }
      else { out(o) = a(i); i += 1; j += 1 }
      o += 1
    }
    if (o < out.length) java.util.Arrays.copyOf(out, o) else out
  }

  override def finish(buf: Array[HV]): Seq[HV] = buf.toIndexedSeq

  override def bufferEncoder: Encoder[Array[HV]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[HV]]()

  override def outputEncoder: Encoder[Seq[HV]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[HV]]()
}
