package graft.functions

import java.security.MessageDigest

import graft.SparkSpec
import graft.functions.Sketches.{Cms, CmsMerge, Hll, HllMerge, HllSketch, Kmv, KmvMerge, KmvSketch}

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

  test("rollup ≡ flat for all three sketch families (the q44/q45/q46 contract)") {
    val groups = chunks(hashes, 7) // arbitrary partition of the rows
    // KMV: merge of per-group buffers = flat estimate
    val kmv = new Kmv(64); val kmvSk = new KmvSketch(64); val kmvMg = new KmvMerge(64)
    val kmvBufs = groups.map(g => kmvSk.finish(g.foldLeft(kmvSk.zero)(kmvSk.reduce)))
    assert(kmvMg.finish(kmvBufs.foldLeft(kmvMg.zero)(kmvMg.reduce)) ==
      kmv.finish(hashes.foldLeft(kmv.zero)(kmv.reduce)))
    // HLL: max-merge of per-group registers = flat estimate
    val hll = new Hll; val hllSk = new HllSketch; val hllMg = new HllMerge
    val hllBufs = groups.map(g => hllSk.finish(g.foldLeft(hllSk.zero)(hllSk.reduce)))
    assert(hllMg.finish(hllBufs.foldLeft(hllMg.zero)(hllMg.reduce)) ==
      hll.finish(hashes.foldLeft(hll.zero)(hll.reduce)))
    // CMS: sum-merge of per-group matrices = flat counter matrix
    val cms = new Cms(4, 64); val cmsMg = new CmsMerge(4, 64)
    val keyGroups = chunks(keys, 7)
    val cmsBufs = keyGroups.map(g => cms.finish(g.foldLeft(cms.zero)(cms.reduce)))
    assert(cmsBufs.foldLeft(cmsMg.zero)(cmsMg.reduce).toSeq ==
      keys.foldLeft(cms.zero)(cms.reduce).toSeq)
  }

  test("merge aggregators reject malformed or mismatched-parameter inputs") {
    val kmvMg = new KmvMerge(64)
    // a buffer from a LARGER-k sketch must fail loudly, not mis-estimate
    val big = new KmvSketch(128)
    val bigBuf = big.finish(hashes.foldLeft(big.zero)(big.reduce))
    assertThrows[IllegalArgumentException](kmvMg.reduce(kmvMg.zero, bigBuf))
    // a non-sketch (unsorted) array must fail, not corrupt the merge
    assertThrows[IllegalArgumentException](
      kmvMg.reduce(kmvMg.zero, Seq("ff", "00")))
    assertThrows[IllegalArgumentException](
      new HllMerge().reduce(new HllMerge().zero, Seq(1, 2, 3)))
    assertThrows[IllegalArgumentException](
      new CmsMerge(4, 64).reduce(new CmsMerge(4, 64).zero, Seq(1L, 2L)))
  }
}
