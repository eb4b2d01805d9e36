package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val df = (0L until 4000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
    .toDF("id", "s")

  test("stratifiedSample hits per-stratum rates within binomial tolerance") {
    val kept = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 0.25), defaultRate = 0.75, salt = "t")
    val byS = kept.groupBy("s").count().as[(String, Long)].collect().toMap
    // 2000 trials each; 5σ ≈ 97 (a), 48 (b)
    assert(math.abs(byS("a") - 500) < 100, s"a=${byS("a")}")
    assert(math.abs(byS("b") - 1500) < 100, s"b=${byS("b")}")
  }

  test("stratifiedSample is partition-independent and replay-stable") {
    val once = Sampling.stratifiedSample(df, "id", "s",
      Map("a" -> 0.5), 0.5, "t").select("id").as[Long].collect().toSet
    val again = Sampling.stratifiedSample(df.repartition(13), "id", "s",
      Map("a" -> 0.5), 0.5, "t").select("id").as[Long].collect().toSet
    assert(once == again)
  }

  test("different salts draw decorrelated samples") {
    val s1 = Sampling.stratifiedSample(df, "id", "s", Map(), 0.5, "one")
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(df, "id", "s", Map(), 0.5, "two")
      .select("id").as[Long].collect().toSet
    val overlap = (s1 & s2).size.toDouble
    // independent 0.5 samples overlap ~ |s1|/2; identical would be ~|s1|
    assert(overlap < s1.size * 0.75 && overlap > s1.size * 0.25)
  }
}
