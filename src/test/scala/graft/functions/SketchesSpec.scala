package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import graft.functions.Sketches.{Cms, Hll, Kmv}

/** Pins the algebra that makes the sketch Aggregators safe to run as
  * partial-merge aggregates at any parallelism: `merge` must be associative
  * and commutative (Spark merges partition buffers in arbitrary tree order),
  * `reduce` must commute with `merge` (map-side partial agg), and estimates
  * must not depend on how the input was partitioned. */
class SketchesSpec extends SparkSpec {

  private def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  private val keys = (1 to 5000).map(i => (i * 7919 % 4001).toString)
  private val hashes = keys.map(md5Hex)

  private def chunks[T](xs: Seq[T], n: Int): Seq[Seq[T]] =
    xs.grouped(math.max(1, xs.length / n)).toSeq

  test("KMV merge is associative/commutative; estimate is partition-independent") {
    val agg = new Kmv(64)
    def bufOf(xs: Seq[String]) = xs.foldLeft(agg.zero)(agg.reduce)
    val parts = chunks(hashes, 3).map(bufOf)
    val left = parts.reduceLeft(agg.merge)
    val right = parts.reduceRight(agg.merge)
    assert(left.toSeq == right.toSeq, "merge associativity")
    assert(agg.merge(parts(1), parts(0)).toSeq == agg.merge(parts(0), parts(1)).toSeq,
      "merge commutativity")
    val whole = agg.finish(bufOf(hashes))
    assert(agg.finish(left) == whole, "estimate must not depend on partitioning")
    // duplicates never perturb the buffer (KMV is a DISTINCT sketch)
    assert(bufOf(hashes ++ hashes).toSeq == bufOf(hashes).toSeq)
    // the buffer invariant the O(1) reject path relies on: sorted, distinct, ≤k
    val b = bufOf(hashes)
    assert(b.length == 64 && b.toSeq == b.toSeq.distinct.sorted, "sorted distinct ≤k")
    // and the estimate lands near the true distinct count (4001-key domain)
    assert(math.abs(whole - keys.distinct.size) < keys.distinct.size * 0.3, whole)
  }

  test("HLL merge is associative/commutative; estimate is partition-independent") {
    val agg = new Hll
    def bufOf(xs: Seq[String]) = xs.foldLeft(agg.zero)(agg.reduce)
    val parts = chunks(hashes, 4).map(bufOf)
    val treeMerge = agg.merge(agg.merge(bufOf(chunks(hashes, 4)(0)), bufOf(chunks(hashes, 4)(1))),
      agg.merge(bufOf(chunks(hashes, 4)(2)), bufOf(chunks(hashes, 4).drop(3).flatten)))
    val seqMerge = parts.map(_.clone).reduceLeft(agg.merge)
    assert(treeMerge.toSeq == seqMerge.toSeq, "merge associativity")
    val ba = agg.merge(bufOf(chunks(hashes, 4)(0)), bufOf(chunks(hashes, 4)(1)))
    val ab = agg.merge(bufOf(chunks(hashes, 4)(1)), bufOf(chunks(hashes, 4)(0)))
    assert(ba.toSeq == ab.toSeq, "merge commutativity")
    assert(agg.finish(treeMerge) == agg.finish(bufOf(hashes)),
      "estimate must not depend on partitioning")
    assert(math.abs(agg.finish(treeMerge) - keys.distinct.size) < keys.distinct.size * 0.2)
  }

  test("CMS merge is associative/commutative; counters overestimate-only") {
    val agg = new Cms(4, 64)
    def bufOf(xs: Seq[String]) = xs.foldLeft(agg.zero)(agg.reduce)
    val parts = chunks(keys, 4).map(bufOf)
    val treeMerge = agg.merge(agg.merge(bufOf(chunks(keys, 4)(0)), bufOf(chunks(keys, 4)(1))),
      agg.merge(bufOf(chunks(keys, 4)(2)), bufOf(chunks(keys, 4).drop(3).flatten)))
    val seqMerge = parts.map(_.clone).reduceLeft(agg.merge)
    assert(treeMerge.toSeq == seqMerge.toSeq, "merge associativity")
    val whole = bufOf(keys)
    assert(treeMerge.toSeq == whole.toSeq, "partition-independent counters")
    assert(whole.sum == 4L * keys.length, "every row lands in d counters")
    // the CMS guarantee: a key's min counter is never below its true count
    val trueCounts = keys.groupBy(identity).view.mapValues(_.size).toMap
    trueCounts.foreach { case (key, n) =>
      val est = (0 until 4).map { r =>
        val b = Integer.parseInt(md5Hex(s"$r|$key").substring(0, 2), 16) % 64
        whole(r * 64 + b)
      }.min
      assert(est >= n, s"CMS underestimated $key: $est < $n")
    }
  }
}
