package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** TYPE WIDENING on the commit-log table (Delta `typeWidening`): lossless
  * type changes as metadata commits — no file rewrite, old files up-cast at
  * scan time, pre-widen versions time-travel back narrow, stats keep
  * pruning, lossy changes rejected. */
class WideningSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val sIF = StructType(Seq(
    StructField("k", IntegerType), StructField("x", FloatType)))

  test("int->long + float->double: metadata-only commit, mixed-file reads " +
      "up-cast, time travel serves the narrow version") {
    val t = new LogTable(spark, tmp("wd-mix-"), sIF)
    t.append(Seq((1, 1.5f), (2, 2.5f)).toDF("k", "x"))
    val filesBefore = t.liveFileNames()
    t.widenColumn("k", LongType)
    t.widenColumn("x", DoubleType)
    assert(t.liveFileNames() == filesBefore, "widening must touch no data file")
    // post-widen append carries values unrepresentable in the narrow types
    t.append(Seq((3_000_000_000L, 1e40)).toDF("k", "x"))
    val live = t.read()
    assert(live.schema("k").dataType == LongType)
    assert(live.schema("x").dataType == DoubleType)
    assert(live.as[(Long, Double)].collect().toSet ==
      Set((1L, 1.5), (2L, 2.5), (3000000000L, 1e40)))
    // the pre-widen version serves its own (narrow) schema
    val v1 = t.readVersion(1)
    assert(v1.schema("k").dataType == IntegerType)
    assert(v1.schema("x").dataType == FloatType)
    assert(v1.as[(Int, Float)].collect().toSet == Set((1, 1.5f), (2, 2.5f)))
  }

  test("widening is idempotent (no version cut) and composes with rename, " +
      "compact, and row tracking") {
    val t = new LogTable(spark, tmp("wd-comp-"), sIF, statsBy = Seq("k"),
      rowTracking = true)
    t.append(Seq((1, 1f), (2, 2f)).toDF("k", "x"))
    t.widenColumn("k", LongType)
    val v = t.currentVersion
    t.widenColumn("k", LongType) // already wide: no-op
    assert(t.currentVersion == v)
    t.renameColumn("k", "key") // mapping activates; physical name unchanged
    val ids = t.readWithRowIds().select("key", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    t.append(Seq((5_000_000_000L, 5f)).toDF("key", "x"))
    assert(t.compact(targetFileBytes = 1L << 20) > 0)
    val after = t.readWithRowIds().select("key", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(after.view.filterKeys(_ < 3).toMap == ids,
      "ids must survive the widen + rename + compact")
    assert(t.read().schema("key").dataType == LongType)
  }

  test("stats written narrow keep pruning under the widened type") {
    val t = new LogTable(spark, tmp("wd-stats-"), sIF, statsBy = Seq("k"))
    t.append(Seq((1, 1f), (2, 2f)).toDF("k", "x").coalesce(1))   // file 1: [1,2]
    t.append(Seq((10, 1f), (20, 2f)).toDF("k", "x").coalesce(1)) // file 2: [10,20]
    t.widenColumn("k", LongType)
    t.append(Seq((4_000_000_000L, 9f)).toDF("k", "x").coalesce(1)) // file 3, wide
    val hit = t.readRange("k", lit(9L), lit(30L))
    assert(hit.as[(Long, Float)].collect().map(_._1).sorted.toSeq == Seq(10L, 20L))
    assert(hit.inputFiles.length == 1, "narrow-era stats must still prune")
  }

  test("float-era stats under a double read: non-dyadic float stats must " +
      "not falsely prune (union-interval comparison)") {
    val t = new LogTable(spark, tmp("wd-fstats-"), sIF, statsBy = Seq("x"))
    // float era: stat strings are float shortest-repr ("0.1"); the stored
    // value promotes at scan to (double)0.1f ≈ 0.100000001 > 0.1d
    t.append(Seq((1, 0.1f), (2, 0.05f)).toDF("k", "x").coalesce(1))
    t.append(Seq((3, 5.0f), (4, 9.0f)).toDF("k", "x").coalesce(1))
    t.widenColumn("x", DoubleType)
    // lo sits strictly between the double parse of "0.1" (0.1d) and the
    // file's true max ((double)0.1f): a naive double-parse comparison
    // prunes the file and silently misses row k=1
    val lo = 0.1f.toDouble
    val hit = t.readRange("x", lit(lo), lit(1.0))
    assert(hit.as[(Int, Double)].collect().map(_._1).toSeq == Seq(1),
      "the float-era row at (double)0.1f must survive pruning")
    // pruning still prunes: a range hitting only the second file opens one
    val far = t.readRange("x", lit(4.0), lit(10.0))
    assert(far.inputFiles.length == 1 && far.count() == 2)
  }

  test("decimal rescale is rejected (parquet FIXED_LEN_BYTE_ARRAY cannot " +
      "rescale at scan time — needs a rewrite)") {
    val s = StructType(Seq(StructField("k", LongType),
      StructField("amt", DecimalType(6, 2))))
    val t = new LogTable(spark, tmp("wd-dec-"), s)
    t.append(Seq((1L, BigDecimal("1234.56"))).toDF("k", "amt"))
    intercept[IllegalArgumentException](t.widenColumn("amt", DecimalType(12, 4)))
  }

  test("guards: narrowing, lossy long->double, bucket key, generated, " +
      "constraint-referenced, unknown column") {
    val s = StructType(Seq(
      StructField("k", IntegerType), StructField("n", LongType),
      LogTable.generated("dbl", LongType, "n * 2"),
      StructField("g", IntegerType)))
    val t = new LogTable(spark, tmp("wd-guard-"), s,
      bucketBy = Some((Seq("k"), 2)))
    t.addConstraint("g_pos", "g >= 0")
    intercept[IllegalArgumentException](t.widenColumn("k", LongType))   // bucket key
    intercept[IllegalArgumentException](t.widenColumn("n", IntegerType))// narrowing
    intercept[IllegalArgumentException](t.widenColumn("n", DoubleType)) // lossy
    intercept[IllegalArgumentException](t.widenColumn("g", LongType))   // constraint ref
    intercept[IllegalArgumentException](t.widenColumn("zz", LongType))  // unknown
    val t2 = new LogTable(spark, tmp("wd-guard2-"), StructType(Seq(
      StructField("a", IntegerType),
      LogTable.generated("gen", IntegerType, "a + 1"))))
    intercept[IllegalArgumentException](t2.widenColumn("gen", LongType)) // generated col
    intercept[IllegalArgumentException](t2.widenColumn("a", LongType))   // gen-expr ref
  }
}
