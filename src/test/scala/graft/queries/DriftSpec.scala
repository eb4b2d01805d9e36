package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** d64's CUSUM closed form (S⁺ = P − min(0, min prefix P)) against an
  * INDEPENDENT sequential reimplementation (the textbook recursion
  * s⁺ᵢ = max(0, s⁺ᵢ₋₁ + xᵢ − k)), plus the 5-field monoid composition the
  * s45 streaming twin folds batches with. */
class DriftSpec extends SparkSpec {

  /** Per-segment CUSUM summary: total, min/max prefix (empty included),
    * max drawup (S⁺ max) and max drawdown (S⁻ max). */
  case class Seg(t: Long, mn: Long, mx: Long, up: Long, dn: Long)
  object Seg {
    val empty: Seg = Seg(0, 0, 0, 0, 0)
    def one(x: Long): Seg =
      Seg(x, math.min(0, x), math.max(0, x), math.max(0, x), math.max(0, -x))
    def compose(a: Seg, b: Seg): Seg = Seg(
      a.t + b.t,
      math.min(a.mn, a.t + b.mn),
      math.max(a.mx, a.t + b.mx),
      math.max(math.max(a.up, b.up), a.t + b.mx - a.mn),
      math.max(math.max(a.dn, b.dn), a.mx - (a.t + b.mn)))
  }

  private def textbook(xs: Seq[Long]): (Long, Long) = {
    var sUp = 0L; var sDn = 0L; var mUp = 0L; var mDn = 0L
    xs.foreach { x =>
      sUp = math.max(0L, sUp + x); mUp = math.max(mUp, sUp)
      sDn = math.max(0L, sDn - x); mDn = math.max(mDn, sDn)
    }
    (mUp, mDn)
  }

  test("closed-form window CUSUM == textbook sequential recursion " +
      "per source on sf0.001") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val k = docs.map(_._3).sum / docs.length
    val expected = docs.groupBy(_._1).map { case (src, rows) =>
      val xs = rows.sortBy(_._2).map(_._3 - k).toSeq
      src -> textbook(xs)
    }
    val got = Registry.queries("d64_cusum_drift")(spark, sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (src, (up, dn)) =>
      assert(got(src) == ((up, dn)), s"source $src: got ${got(src)}, want ($up, $dn)")
    }
  }

  test("segment monoid composes to the full-series statistic at every " +
      "split point (the s45 per-batch fold)") {
    val rng = new scala.util.Random(42)
    val xs = Seq.fill(60)(rng.nextInt(21).toLong - 10)
    val full = xs.map(Seg.one).foldLeft(Seg.empty)(Seg.compose)
    assert((full.up, full.dn) == textbook(xs), "monoid vs textbook")
    (0 to xs.length).foreach { i =>
      val (a, b) = xs.splitAt(i)
      val segA = a.map(Seg.one).foldLeft(Seg.empty)(Seg.compose)
      val segB = b.map(Seg.one).foldLeft(Seg.empty)(Seg.compose)
      assert(Seg.compose(segA, segB) == full, s"split at $i diverged")
    }
  }

  test("flag gate non-degenerate: >=1 flagged, >=1 unflagged") {
    val out = Registry.queries("d64_cusum_drift")(spark, sf001).collect()
    val flagged = out.count(_.getBoolean(6))
    assert(flagged >= 1 && flagged < out.length)
  }

  test("d65 episode loop == imperative reset recursion (Page's procedure)") {
    val docs = graft.sources.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
    val k = docs.map(_._3).sum / docs.length
    // global max drawup, then h = 40% of it (the query's derivation)
    val gm = docs.groupBy(_._1).values.map { rows =>
      var s = 0L; var m = 0L
      rows.sortBy(_._2).foreach { case (_, _, n) =>
        s = math.max(0L, s + (n - k)); m = math.max(m, s)
      }
      m
    }.max
    val h = gm * 2 / 5
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, rows) =>
      var s = 0L; var no = 0
      rows.sortBy(_._2).toSeq.flatMap { case (_, d, n) =>
        s = math.max(0L, s + (n - k))
        if (s >= h) { no += 1; s = 0L; Some((src, no, d)) } else None
      }
    }.toSet
    val got = Registry.queries("d65_cusum_alarms")(spark, sf001)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(got == expected, s"episode loop diverged: got $got want $expected")
  }
}
