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
}
