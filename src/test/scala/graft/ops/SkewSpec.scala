package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin result equals the plain join") {
    val large = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val small = spark.read.parquet(s"$sf001/part.parquet")
      .select("p_partkey", "p_brand")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = large.join(small, Seq("l_partkey"))
      .groupBy("p_brand").count()
      .as[(String, Long)].collect().toMap
    val saltedRes = Skew.saltedJoin(large, small, Seq("l_partkey"), 7)
      .groupBy("p_brand").count()
      .as[(String, Long)].collect().toMap
    assert(saltedRes == plain)
  }

  test("salt is deterministic across evaluations") {
    val df = spark.read.parquet(s"$sf001/orders.parquet").limit(100)
    val a = Skew.salted(df, 8).select("__salt").as[Int].collect()
    val b = Skew.salted(df, 8).select("__salt").as[Int].collect()
    assert(a.toSeq == b.toSeq)
    assert(a.forall(s => s >= 0 && s < 8))
  }
}
