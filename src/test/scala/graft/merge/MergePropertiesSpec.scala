package graft.merge

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property-based invariants of the merge family — the contracts the
  * medallion pipeline's idempotency rests on — checked over randomized
  * target/batch frames (small key cardinality to force collisions).
  * Raw ScalaCheck generators with fixed seeds (the scalatest-scalacheck
  * bridge isn't on the classpath): deterministic, still adversarial.
  */
class MergePropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen = Gen.listOfN(12,
    Gen.zip(Gen.choose(0, 5), Gen.choose(0, 100), Gen.alphaLowerStr.map(_.take(4))))

  private def sample(seed: Long): List[(Int, Int, String)] =
    rowGen.apply(Gen.Parameters.default, Seed(seed)).get

  private def dedupByKey(rows: List[(Int, Int, String)]) =
    rows.groupBy(_._1).map(_._2.head).toList

  private def cases = (0 until 8).map(i => (sample(i * 2L), sample(i * 2L + 1)))

  test("property: insertOnly is idempotent and never loses target rows") {
    cases.foreach { case (t, b) =>
      val target = dedupByKey(t).toDF("k", "ord", "v")
      val batch = dedupByKey(b).toDF("k", "ord", "v")
      val once = Merge.insertOnly(target, batch, Seq("k")).cache()
      val twice = Merge.insertOnly(once, batch, Seq("k"))
      assert(once.count() == twice.count())
      assert(target.join(once, Seq("k", "ord", "v"), "left_anti").count() == 0)
      val keys = once.select("k").as[Int].collect().toSet
      assert(keys == (dedupByKey(t).map(_._1) ++ dedupByKey(b).map(_._1)).toSet)
      once.unpersist()
    }
  }

  test("property: scd1 equals batch-wins map merge") {
    cases.foreach { case (t, b) =>
      val tm = dedupByKey(t).map(r => r._1 -> r).toMap
      val bm = dedupByKey(b).map(r => r._1 -> r).toMap
      val expected = (tm ++ bm).values.toSet
      val got = Merge.scd1(dedupByKey(t).toDF("k", "ord", "v"),
          dedupByKey(b).toDF("k", "ord", "v"), Seq("k"))
        .as[(Int, Int, String)].collect().toSet
      assert(got == expected)
    }
  }

  test("property: cdcUpsert keeps the newer record per key") {
    cases.foreach { case (t, b) =>
      val tm = dedupByKey(t).map(r => r._1 -> r).toMap
      val bm = dedupByKey(b).map(r => r._1 -> r).toMap
      val expected = (tm.keySet ++ bm.keySet).map { k =>
        (tm.get(k), bm.get(k)) match {
          case (Some(tr), Some(br)) => if (tr._2 < br._2) br else tr
          case (Some(tr), None) => tr
          case (None, Some(br)) => br
          case _ => sys.error("unreachable")
        }
      }
      val got = Merge.cdcUpsert(dedupByKey(t).toDF("k", "ord", "v"),
          dedupByKey(b).toDF("k", "ord", "v"), Seq("k"), "ord")
        .as[(Int, Int, String)].collect().toSet
      assert(got == expected)
    }
  }
}
