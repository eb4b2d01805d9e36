package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** d66's relational KS form (grid + cumulative window + cross-multiplied
  * numerator) against an independent sequential reimplementation: the
  * textbook two-sample statistic D = max |F₁(x) − F₂(x)| over the binned
  * samples, computed by a driver-side merge walk. */
class KsDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Textbook: KS numerator max_b |cum1(b)·n2 − cum2(b)·n1| over the union
    * of bins, plus the first bin achieving it. */
  private def textbook(xs: Seq[Long], ys: Seq[Long]): (Long, Long) = {
    val bins = (xs ++ ys).distinct.sorted
    val n1 = xs.size.toLong; val n2 = ys.size.toLong
    var c1 = 0L; var c2 = 0L; var best = -1L; var bestBin = Long.MaxValue
    bins.foreach { b =>
      c1 += xs.count(_ == b); c2 += ys.count(_ == b)
      val d = math.abs(c1 * n2 - c2 * n1)
      if (d > best) { best = d; bestBin = b }
    }
    (best, bestBin)
  }

  test("d66: relational KS equals the sequential two-sample walk, per source") {
    val out = TextQueries.defs.find(_.name == "d66_ks_drift").get
      .spark(spark, sf)
      .select("source", "ks_num", "ks_bin", "n_src", "n_rest")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val doc = graft.sources.Tables.documents(spark, sf)
      .select(col("source"), col("n_chars"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val w = math.max(8L, doc.map(_._2).max / 32L)
    val organic = doc.map { case (s, n) => (s, n / w) }
    val plantSrc = doc.map(_._1).min
    val plant = doc.filter(_._1 == plantSrc)
      .map { case (_, n) => ("__shifted__", (n / 2) / w) }

    (organic ++ plant).map(_._1).distinct.foreach { s =>
      val own =
        if (s == "__shifted__") plant.map(_._2)
        else organic.filter(_._1 == s).map(_._2)
      val rest =
        if (s == "__shifted__") organic.map(_._2)
        else organic.filter(_._1 != s).map(_._2)
      val (num, bin) = textbook(own, rest)
      val (qNum, qBin, qN1, qN2) = out(s)
      assert(qN1 == own.size.toLong && qN2 == rest.size.toLong, s"counts for $s")
      assert(qNum == num, s"KS numerator for $s: query $qNum vs walk $num")
      // the relational grid ranges over MORE bins (all sources' bins), but
      // an unoccupied bin carries its predecessor's dnum, so the min-bin
      // tie-break lands on the same occupied bin the walk finds
      assert(qBin == bin, s"argmax bin for $s: query $qBin vs walk $bin")
    }
  }
}
