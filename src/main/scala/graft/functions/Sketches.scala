package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable sketch aggregators — KMV / HLL / CMS as typed
  * `Aggregator[IN, BUF, OUT]`s (the [[MinKSample]] extension rung).
  *
  * The q30/q39/q41 queries first built these sketches as query-shaped
  * aggregations (groupBy + explode); these classes expose the same math as
  * reusable COLUMNS with partial-merge state, which is what a 100 TB rollup
  * actually calls: the buffer is bounded (≤k hashes / 256 registers / d·w
  * counters) at ANY corpus size, `merge` is associative and commutative
  * (SketchesSpec proves it), so Spark's partial aggregation pushes the whole
  * reduction map-side and the shuffle carries one buffer per partition —
  * and the same buffers merge across days/sources without rescanning.
  *
  * Float parity is preserved from the query versions BIT-for-bit: every
  * estimate is computed from md5-derived integers with the identical
  * operation order the SQL expressions (and the DuckDB oracles) use, so the
  * driver rows stay hash-green running on these implementations.
  */
object Sketches {

  private val hexVal: Array[Int] = {
    val a = Array.fill(128)(-1)
    "0123456789abcdef".zipWithIndex.foreach { case (c, i) => a(c) = i }
    a
  }

  /** Parse `len` lowercase-hex chars of `s` from `off` — the JVM mirror of
    * `conv(substring(s, off+1, len), 16, 10)`. */
  private def parseHex(s: String, off: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 4) | hexVal(s.charAt(off + i)); i += 1 }
    v
  }

  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Lowercase-hex md5, the JVM mirror of SQL `md5(key)`. */
  private def md5Hex(key: String): String = {
    val bytes = md.get().digest(key.getBytes("UTF-8"))
    val sb = new java.lang.StringBuilder(32)
    bytes.foreach { b =>
      sb.append("0123456789abcdef".charAt((b >> 4) & 0xf))
      sb.append("0123456789abcdef".charAt(b & 0xf))
    }
    sb.toString
  }

  /** KMV distinct-count sketch over pre-hashed keys (feed it SQL
    * `md5(key)` so the hot hash stays codegen'd). Buffer = the ≤k smallest
    * DISTINCT hashes, kept sorted ascending; estimate = (k-1)/U_k with U_k
    * the k-th hash's 32-bit prefix as a dyadic rational — exactly q30's
    * expression, so the estimate is bit-identical to the SQL/DuckDB
    * computation.
    *
    * The hot path is O(1): once the buffer is full, any hash ≥ the current
    * k-th minimum is rejected with no allocation — at a uniform hash
    * distribution that is all but k/n of a 100 TB scan's rows. Survivors
    * insert by binary search + arraycopy (O(log k) compares, one ≤k-slot
    * copy) instead of the old list sort. */
  class Kmv(k: Int) extends Aggregator[String, Array[String], Double] {
    require(k >= 2, "k must be >= 2")

    override def zero: Array[String] = Array.empty

    override def reduce(buf: Array[String], h: String): Array[String] = {
      val n = buf.length
      if (n == k && h.compareTo(buf(n - 1)) >= 0) return buf // common case
      // binary search for the insertion point in the sorted buffer
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (buf(mid).compareTo(h) < 0) lo = mid + 1 else hi = mid
      }
      if (lo < n && buf(lo) == h) return buf // duplicate (DISTINCT sketch)
      val outLen = math.min(n + 1, k)
      val out = new Array[String](outLen)
      System.arraycopy(buf, 0, out, 0, lo)
      out(lo) = h
      System.arraycopy(buf, lo, out, lo + 1, outLen - 1 - lo)
      out
    }

    override def merge(a: Array[String], b: Array[String]): Array[String] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      // merge two sorted distinct runs, dropping cross-buffer duplicates,
      // keeping only the k smallest
      val out = new Array[String](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var o = 0
      while (o < out.length && (i < a.length || j < b.length)) {
        val cmp =
          if (i == a.length) 1
          else if (j == b.length) -1
          else a(i).compareTo(b(j))
        if (cmp < 0) { out(o) = a(i); i += 1 }
        else if (cmp > 0) { out(o) = b(j); j += 1 }
        else { out(o) = a(i); i += 1; j += 1 }
        o += 1
      }
      if (o < out.length) java.util.Arrays.copyOf(out, o) else out
    }

    override def finish(buf: Array[String]): Double =
      if (buf.length < k) buf.length.toDouble
      else {
        val frac = parseHex(buf(k - 1), 0, 8).toDouble / 4294967296.0
        (k - 1).toDouble / frac
      }

    override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** The rollup half of the KMV story: [[KmvSketch]] emits the per-group
    * BUFFER (the ≤k smallest hashes) instead of the estimate, and
    * [[KmvMerge]] aggregates those buffers into the global estimate without
    * ever seeing a raw key again. Because a KMV union is exact
    * (min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B))), the rolled-up estimate is
    * bit-identical to a flat [[Kmv]] over the union — which is what lets a
    * 100 TB pipeline keep one ≤k-hash sketch per day/source and answer
    * global distincts from sketches alone, no rescan. */
  class KmvSketch(k: Int) extends Aggregator[String, Array[String], Seq[String]] {
    private val kmv = new Kmv(k)
    override def zero: Array[String] = kmv.zero
    override def reduce(buf: Array[String], h: String): Array[String] = kmv.reduce(buf, h)
    override def merge(a: Array[String], b: Array[String]): Array[String] = kmv.merge(a, b)
    override def finish(buf: Array[String]): Seq[String] = buf.toIndexedSeq
    override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
    override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
  }

  /** Merge pre-built KMV buffers (the [[KmvSketch]] output) into the global
    * estimate. Input rows are whole sketches, so the second-level agg is
    * O(groups · k) — it never re-expands raw keys. Estimate math is
    * [[Kmv.finish]] verbatim, hence bit-identical to the flat sketch. */
  class KmvMerge(k: Int) extends Aggregator[Seq[String], Array[String], Double] {
    private val kmv = new Kmv(k)
    override def zero: Array[String] = kmv.zero
    override def reduce(buf: Array[String], sk: Seq[String]): Array[String] = {
      // Invariant check (cheap, O(len), second-level agg only): the input
      // must be a KMV buffer from a KmvSketch with the SAME k — a larger-k
      // buffer or a non-sketch array would silently corrupt the merge (e.g.
      // buf.length returned as an "exact" count via the under-full branch).
      val arr = sk.toArray
      require(arr.length <= k,
        s"KmvMerge(k=$k): input sketch has ${arr.length} hashes — built with a larger k?")
      var i = 1
      while (i < arr.length) {
        require(arr(i - 1).compareTo(arr(i)) < 0,
          "KmvMerge: input is not a sorted-distinct KMV buffer")
        i += 1
      }
      kmv.merge(buf, arr)
    }
    override def merge(a: Array[String], b: Array[String]): Array[String] = kmv.merge(a, b)
    override def finish(buf: Array[String]): Double = kmv.finish(buf)
    override def bufferEncoder: Encoder[Array[String]] = ExpressionEncoder[Array[String]]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** The rollup half of the HLL story (q45, mirroring [[KmvSketch]]): emit
    * the per-group 256-register array instead of the estimate. Registers
    * are max-mergeable, and max over any partition of the rows equals max
    * over the union, so [[HllMerge]] over per-group registers is
    * bit-identical to a flat [[Hll]] over the union. */
  class HllSketch extends Aggregator[String, Array[Int], Seq[Int]] {
    private val hll = new Hll
    override def zero: Array[Int] = hll.zero
    override def reduce(buf: Array[Int], h: String): Array[Int] = hll.reduce(buf, h)
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = hll.merge(a, b)
    override def finish(buf: Array[Int]): Seq[Int] = buf.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Seq[Int]] = ExpressionEncoder[Seq[Int]]()
  }

  /** Merge pre-built HLL register arrays (the [[HllSketch]] output) into the
    * global estimate by elementwise max — O(groups · 256), never re-reads a
    * raw key. Estimate math is [[Hll.finish]] verbatim. */
  class HllMerge extends Aggregator[Seq[Int], Array[Int], Double] {
    private val hll = new Hll
    override def zero: Array[Int] = hll.zero
    override def reduce(buf: Array[Int], sk: Seq[Int]): Array[Int] = {
      require(sk.length == 256,
        s"HllMerge: input has ${sk.length} registers, expected 256 (p=8)")
      var i = 0
      while (i < 256) { val v = sk(i); if (v > buf(i)) buf(i) = v; i += 1 }
      buf
    }
    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = hll.merge(a, b)
    override def finish(buf: Array[Int]): Double = hll.finish(buf)
    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** Merge pre-built CMS counter matrices (the [[Cms]] output) by elementwise
    * sum — counters are exact longs, so the merged matrix is identical to a
    * flat [[Cms]] over the union, and any heavy-hitter probe against it gives
    * the flat answer. O(groups · d·w), never re-hashes a raw key (q46). */
  class CmsMerge(d: Int, w: Int) extends Aggregator[Seq[Long], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], sk: Seq[Long]): Array[Long] = {
      require(sk.length == d * w,
        s"CmsMerge(d=$d, w=$w): input has ${sk.length} cells, expected ${d * w}")
      var i = 0
      while (i < buf.length) { buf(i) += sk(i); i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** HyperLogLog (raw estimator, p=8) over pre-hashed keys. Buffer = 256
    * max-rho registers (0 = untouched, contributing 2^0 to the harmonic sum
    * like q39's `(256 - n_occ)` term); estimate via the exact-integer dyadic
    * sum Σ2^(52−M) with the 2^52 scale divided out once — the identical
    * operation order as q39's SQL, hence bit-identical. */
  class Hll extends Aggregator[String, Array[Int], Double] {

    override def zero: Array[Int] = new Array[Int](256)

    override def reduce(buf: Array[Int], h: String): Array[Int] = {
      val bucket = parseHex(h, 0, 2).toInt
      val v = parseHex(h, 2, 13) // 52 bits
      // smallest r in 1..52 with v >= 2^(52-r), else 52 (q39's CASE chain)
      val rho = if (v == 0L) 52 else 52 - (63 - java.lang.Long.numberOfLeadingZeros(v))
      if (rho > buf(bucket)) buf(bucket) = rho
      buf
    }

    override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
      var i = 0
      while (i < 256) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Int]): Double = {
      var s = 0L; var i = 0
      while (i < 256) { s += 1L << (52 - buf(i)); i += 1 }
      0.7213 / (1.0 + 1.079 / 256) * 65536 * 4503599627370496.0 / s.toDouble
    }

    override def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
    override def outputEncoder: Encoder[Double] = ExpressionEncoder[Double]()
  }

  /** Count-Min sketch: d rows × w counters over RAW string keys (each row r
    * buckets by md5("r|" || key), matching q41's SQL bucket function
    * byte-for-byte). Output is the flattened counter matrix — probing is a
    * plain `element_at` per hash row, so heavy-hitter queries stay in
    * codegen. Counters are exact longs: merge = elementwise sum. */
  class Cms(d: Int, w: Int) extends Aggregator[String, Array[Long], Seq[Long]] {
    require(d >= 1 && w >= 2 && w <= 256, "need 1<=d, 2<=w<=256 (2-hex-digit bucket)")

    override def zero: Array[Long] = new Array[Long](d * w)

    override def reduce(buf: Array[Long], key: String): Array[Long] = {
      var r = 0
      while (r < d) {
        val b = parseHex(md5Hex(s"$r|$key"), 0, 2).toInt % w
        buf(r * w + b) += 1L
        r += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(buf: Array[Long]): Seq[Long] = buf.toIndexedSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }
}
