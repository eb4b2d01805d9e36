package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  test("prunedEquiJoin equals the plain join (no false negatives survive)") {
    val rng = new scala.util.Random(23)
    val fact = (0 until 2000).map(i => (i, rng.nextInt(500).toLong)).toDF("fid", "fk")
    val dim = (0 until 500 by 7).map(k => (k.toLong, s"d$k")).toDF("dk", "dv")
    val plain = fact.join(dim, $"fk" === $"dk")
      .select("fid", "fk", "dv").as[(Int, Long, String)].collect().toSet
    val pruned = BloomPrune.prunedEquiJoin(fact, dim, "fk", "dk", expectedItems = 100)
      .select("fid", "fk", "dv").as[(Int, Long, String)].collect().toSet
    assert(pruned == plain)
  }

  test("bloom probe actually prunes: pre-join row count shrinks toward selectivity") {
    BloomPrune.register(spark)
    val fact = (0 until 5000).map(i => (i, i.toLong % 1000)).toDF("fid", "fk")
    val dim = (0L until 50L).map(k => (k, s"d$k")).toDF("dk", "dv")
    val bloom = dim.stat.bloomFilter("dk", 50, 0.01)
    val kept = fact.filter(
      call_function("bloom_might_contain", $"fk", lit(BloomPrune.serialize(bloom))))
      .count()
    // true matches: 50/1000 keys → 250 rows; 1% fpp leaves headroom to 400
    assert(kept >= 250 && kept <= 400, s"kept=$kept")
  }

  test("native probe agrees between interpreted eval and codegen on int keys") {
    BloomPrune.register(spark)
    val dim = (0L until 64L).map(k => (k * 3, "x")).toDF("dk", "dv")
    val bloom = dim.stat.bloomFilter("dk", 64, 0.001)
    val lit0 = lit(BloomPrune.serialize(bloom))
    val probe = (0 until 200).map(i => Tuple1(i)).toDF("k")
      .select($"k", call_function("bloom_might_contain", $"k", lit0).as("hit"))
      .as[(Int, Boolean)].collect()
    // every true multiple-of-3 key in range must hit (no false negatives)
    probe.foreach { case (k, hit) =>
      if (k % 3 == 0 && k <= 189) assert(hit, s"false negative at $k")
    }
  }
}
