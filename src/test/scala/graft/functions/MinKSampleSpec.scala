package graft.functions

import graft.SparkSpec

class MinKSampleSpec extends SparkSpec {
  import spark.implicits._

  test("min-k sample is deterministic and partition-independent") {
    val data = (1L to 100L).map(i => ("g" + (i % 3), i, f"h${100 - i}%03d"))
    def run(parts: Int) = {
      val ds = spark.createDataset(data).repartition(parts).as[(String, Long, String)]
      ds.groupByKey(_._1).mapValues(r => (r._2, r._3))
        .agg(new MinKSample(4).toColumn.name("s"))
        .collect().toMap
    }
    val a = run(1)
    val b = run(7)
    assert(a == b) // merge order can't change the result
    assert(a.values.forall(_.size == 4))
  }

  test("sample = the k smallest hash keys, ties by id") {
    val ds = Seq(("g", 1L, "b"), ("g", 2L, "a"), ("g", 3L, "a"), ("g", 4L, "c"))
      .toDS().as[(String, Long, String)]
    val got = ds.groupByKey(_._1).mapValues(r => (r._2, r._3))
      .agg(new MinKSample(3).toColumn.name("s"))
      .collect().head._2
    assert(got == Seq(2L, 3L, 1L)) // a<a<b, tie (a,2)<(a,3)
  }

  // --- MinKValues (the value-carrying sibling behind q47) ---

  private def hv(pairs: (String, Double)*): Array[MinKValues.HV] = {
    val agg = new MinKValues(4)
    pairs.foldLeft(agg.zero)((b, p) => agg.reduce(b, p))
  }

  test("MinKValues: rollup merge is EXACT — min-k of per-part samples = flat min-k") {
    val agg = new MinKValues(4)
    val data = (1 to 50).map(i => (Md5.hex(i.toString), i.toDouble))
    val flat = data.foldLeft(agg.zero)((b, p) => agg.reduce(b, p))
    // any partitioning of the input must merge to the identical sample
    for (split <- Seq(7, 13, 25)) {
      val parts = data.grouped(split).map(g =>
        g.foldLeft(agg.zero)((b, p) => agg.reduce(b, p)))
      val merged = parts.foldLeft(agg.zero)(agg.merge)
      assert(merged.toSeq == flat.toSeq, s"split=$split diverged")
    }
  }

  test("MinKValues: buffer stays sorted-by-hash, bounded at k, value rides along") {
    val buf = hv(("d", 4.0), ("b", 2.0), ("e", 5.0), ("a", 1.0), ("c", 3.0), ("f", 6.0))
    assert(buf.map(_.h).toSeq == Seq("a", "b", "c", "d"))
    assert(buf.map(_.v).toSeq == Seq(1.0, 2.0, 3.0, 4.0))
    // full-buffer reject keeps the array identical (reference equality = O(1) path)
    val agg = new MinKValues(4)
    assert(agg.reduce(buf, ("z", 99.0)) eq buf)
    // duplicate hash keeps the first value
    assert(agg.reduce(buf, ("a", 42.0)).find(_.h == "a").get.v == 1.0)
  }
}
