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

  test("bucketed merge: partition-scoped result equals full-rewrite result, " +
      "untouched bucket files are byte-identical") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("ord", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    def filesOf(dir: Path): Map[String, (Long, Long)] =
      Files.walk(dir).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => dir.relativize(p).toString ->
          (Files.size(p), Files.getLastModifiedTime(p).toMillis)).toMap

    val dir = Files.createTempDirectory("bucketed-").toString
    val bucketed = new ParquetTable(spark, dir, schema, Some((Seq("k"), 8)))
    // wide key range → every bucket populated
    val initial = (0 until 64).map(k => (k, k, s"v$k")).toDF("k", "ord", "v")
    bucketed.overwrite(initial)
    val before = filesOf(Path.of(dir, "current"))

    // batch touching a handful of keys → few buckets
    val batch = Seq((3, 100, "B3"), (17, 100, "B17"), (90, 100, "B90"))
      .toDF("k", "ord", "v")
    bucketed.merge(batch)(Merge.scd1(_, _, Seq("k")))

    // content equals the unbucketed full-rewrite merge
    val expected = Merge.scd1(initial, batch, Seq("k"))
      .as[(Int, Int, String)].collect().toSet
    assert(bucketed.read().as[(Int, Int, String)].collect().toSet == expected)

    // untouched bucket directories: same files, same sizes, same mtimes
    val after = filesOf(Path.of(dir, "current"))
    val touched = batch.select(
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64($"k"),
          org.apache.spark.sql.functions.lit(8)).cast("int"))
      .distinct().as[Int].collect().toSet
    val untouchedBefore = before.filterNot { case (p, _) =>
      touched.exists(k => p.startsWith(s"__bucket=$k/")) }
    assert(untouchedBefore.nonEmpty, "test needs untouched buckets to be meaningful")
    untouchedBefore.foreach { case (p, meta) =>
      assert(after.get(p).contains(meta), s"untouched file changed: $p")
    }
    // touched buckets really were rewritten
    assert(before.keySet.exists(p => touched.exists(k => p.startsWith(s"__bucket=$k/"))
      && !after.contains(p)))
  }

  test("compact collapses per-append small files, preserves content, " +
      "skips already-compact buckets") {
    import java.nio.file.{Files, Path}
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val dir = Files.createTempDirectory("compact-").toString
    val t = new ParquetTable(spark, dir, schema, Some((Seq("k"), 4)))
    // five appends → ≥5 files per populated bucket
    (0 until 5).foreach(i => t.append(Seq((i, s"v$i"), (i + 16, s"w$i")).toDF("k", "v")))
    val before = t.read().as[(Int, String)].collect().toSet
    def parquetFiles(): Seq[Path] =
      Files.walk(Path.of(dir, "current")).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
    val filesBefore = parquetFiles().size
    t.compact(maxFilesPerBucket = 1)
    assert(t.read().as[(Int, String)].collect().toSet == before)
    val filesAfter = parquetFiles().size
    assert(filesAfter < filesBefore, s"no compaction: $filesBefore -> $filesAfter")
    // second compact is a no-op: every bucket already at <= 1 file
    val snapshot = parquetFiles().map(p => p.toString ->
      Files.getLastModifiedTime(p).toMillis).toMap
    t.compact(maxFilesPerBucket = 1)
    assert(parquetFiles().map(p => p.toString ->
      Files.getLastModifiedTime(p).toMillis).toMap == snapshot)
  }

  /** SCD2 model: per key an append-only version list; a batch row appends
    * iff it is strictly newer than the open version AND any tracked
    * attribute differs. (to, current) are derived by chaining — exactly what
    * [[Merge.scd2]] must produce. */
  private def scd2Model(st: Map[Int, List[(String, Int)]],
                        batch: List[(Int, String, Int)]): Map[Int, List[(String, Int)]] =
    batch.foldLeft(st) { case (m, (k, v, f)) =>
      m.get(k) match {
        case None => m + (k -> List((v, f)))
        case Some(vs) =>
          val (cv, cf) = vs.last
          if (f > cf && v != cv) m + (k -> (vs :+ (v, f))) else m
      }
    }

  private def scd2Expected(st: Map[Int, List[(String, Int)]]): Set[(Int, String, Int, Option[Int], Boolean)] =
    st.flatMap { case (k, vs) =>
      vs.zipWithIndex.map { case ((v, f), i) =>
        val to = if (i + 1 < vs.size) Some(vs(i + 1)._2) else None
        (k, v, f, to, to.isEmpty)
      }
    }.toSet

  private def emptyDim = {
    Seq.empty[(Int, String, Int)].toDF("k", "v", "eff_from")
      .withColumn("eff_to", org.apache.spark.sql.functions.lit(null).cast("int"))
      .withColumn("is_current", org.apache.spark.sql.functions.lit(true))
  }

  test("scd2: NULL key rows survive (explicit exists markers, not " +
      "keys.head.isNotNull); duplicate-key batches rejected") {
    // a current row with a NULL key is a legal <=> join participant —
    // the old isNotNull sentinel silently dropped it from the output
    val dim = Seq((Option.empty[Int], "n", 1), (Some(1), "a", 1))
      .toDF("k", "v", "eff_from")
      .withColumn("eff_to", org.apache.spark.sql.functions.lit(null).cast("int"))
      .withColumn("is_current", org.apache.spark.sql.functions.lit(true))
    val batch = Seq((Option.empty[Int], "n2", 2)).toDF("k", "v", "eff_from")
    val out = Merge.scd2(dim, batch, Seq("k"), Seq("v"))
      .as[(Option[Int], String, Int, Option[Int], Boolean)].collect().toSet
    assert(out == Set(
      (None, "n", 1, Some(2), false),    // NULL-key row closed, not dropped
      (None, "n2", 2, None, true),
      (Some(1), "a", 1, None, true)))
    // key-duplicate batch: join fan-out would emit duplicate closes. The
    // guard is write-time (assert_true in a filter — no eager per-call job,
    // ADVICE r11), so it fires when the plan EXECUTES, not at call time.
    val dup = Seq((Some(1), "x", 3), (Some(1), "y", 3)).toDF("k", "v", "eff_from")
    val lazyOut = Merge.scd2(dim, dup, Seq("k"), Seq("v")) // no job yet
    val err = intercept[Exception](lazyOut.collect())
    val messages = Iterator.iterate[Throwable](err)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(messages.exists(_.contains("at most one row per key")),
      s"expected the duplicate-key guard message, got: ${messages.mkString(" | ")}")
  }

  test("property: scd2 equals the version-chain model and re-application is a no-op") {
    (0 until 6).foreach { i =>
      val batches = (0 until 3).map(j => dedupByKey(sample(i * 10L + j))).toList
      var model = Map.empty[Int, List[(String, Int)]]
      var dim = emptyDim
      batches.foreach { b =>
        // generator emits (k, ord, v); scd2 batch is (k, v=attr, eff_from=ord)
        val bdf = b.map { case (k, ord, v) => (k, v, ord) }.toDF("k", "v", "eff_from")
        dim = Merge.scd2(dim, bdf, Seq("k"), Seq("v")).localCheckpoint(true)
        model = scd2Model(model, b.map { case (k, ord, v) => (k, v, ord) })
        val got = dim.as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
        assert(got == scd2Expected(model))
      }
      // idempotency: the last batch again — byte-identical state
      val last = batches.last.map { case (k, ord, v) => (k, v, ord) }.toDF("k", "v", "eff_from")
      val again = Merge.scd2(dim, last, Seq("k"), Seq("v"))
        .as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
      assert(again == scd2Expected(model))
    }
  }

  test("scd2 chains validity: one open version per key, intervals contiguous") {
    val b1 = List((1, "a", 10), (2, "a", 10), (3, "a", 10))
    val b2 = List((1, "b", 20), (2, "a", 20)) // key 2: identical attrs → no-op
    val b3 = List((1, "c", 30), (4, "x", 30)) // key 4: insert path
    var dim = emptyDim
    List(b1, b2, b3).foreach { b =>
      dim = Merge.scd2(dim, b.toDF("k", "v", "eff_from"), Seq("k"), Seq("v"))
        .localCheckpoint(true)
    }
    val rows = dim.as[(Int, String, Int, Option[Int], Boolean)].collect().toList
    // key 1 has a 3-version chain 10→20→30; keys 2,3 one open version; key 4 inserted
    assert(rows.count(_._1 == 1) == 3)
    rows.groupBy(_._1).foreach { case (_, vs) =>
      assert(vs.count(_._5) == 1, "exactly one current version per key")
      val sorted = vs.sortBy(_._3)
      sorted.sliding(2).foreach {
        case List(prev, next) => assert(prev._4.contains(next._3), "contiguous intervals")
        case _ => ()
      }
      assert(sorted.last._4.isEmpty && sorted.last._5)
    }
    assert(rows.filter(_._1 == 2).map(r => (r._2, r._3)) == List(("a", 10)))
    assert(rows.filter(_._1 == 4).map(r => (r._2, r._3)) == List(("x", 30)))
    // out-of-order late batch (older eff_from, different attrs) is a no-op
    val late = Merge.scd2(dim, List((1, "z", 5)).toDF("k", "v", "eff_from"), Seq("k"), Seq("v"))
      .as[(Int, String, Int, Option[Int], Boolean)].collect().toSet
    assert(late == rows.toSet)
  }

  test("bucketed merge rejects a merge function that leaks across buckets") {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))
    val dir = java.nio.file.Files.createTempDirectory("bucketed-leak-").toString
    val t = new ParquetTable(spark, dir, schema, Some((Seq("k"), 8)))
    t.overwrite((0 until 16).map(k => (k, s"v$k")).toDF("k", "v"))
    val batch = Seq((1, "B1")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      // not keyed on k: rewrites every key's row → rows land outside the
      // batch's buckets
      t.merge(batch)((cur, _) =>
        cur.withColumn("k", $"k" + 100))
    }
  }
}
