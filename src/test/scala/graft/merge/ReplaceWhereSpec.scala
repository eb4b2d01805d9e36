package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** [[LogTable.replaceWhere]] — Delta's predicate-scoped atomic overwrite:
  * one commit drops matching live rows and inserts the batch; batch rows
  * are validated against the predicate; untouched files survive verbatim;
  * DV-deleted rows never resurrect; composes with row tracking and the
  * typed change feed. */
class ReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("one-commit replace: matching rows swapped, untouched files kept " +
      "byte-identical, non-matching rows of touched files rewritten") {
    val t = new LogTable(spark, tmp("rw-basic-"), s2)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))  // file A
    t.append(Seq((10L, "c"), (11L, "d")).toDF("k", "v").coalesce(1)) // file B
    val before = t.liveFileNames().toSet
    t.replaceWhere(col("k") === 10L, Seq((10L, "C")).toDF("k", "v"))
    assert(t.currentVersion == 3L, "replaceWhere must be ONE commit")
    val after = t.liveFileNames().toSet
    assert((before & after).nonEmpty, "file A (no matches) must be kept verbatim")
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (10L, "C"), (11L, "d")))
  }

  test("a batch row outside the predicate fails the write; nothing commits") {
    val t = new LogTable(spark, tmp("rw-guard-"), s2)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    intercept[Exception](
      t.replaceWhere(col("k") >= 10L, Seq((5L, "bad")).toDF("k", "v")))
    assert(t.currentVersion == 1L && t.read().count() == 1)
  }

  test("DV composition: a deleted row OUTSIDE the window in a touched file " +
      "stays deleted through the rewrite") {
    val t = new LogTable(spark, tmp("rw-dv-"), s2)
    t.append(Seq((1L, "out-del"), (2L, "out-keep"), (10L, "in"))
      .toDF("k", "v").coalesce(1)) // one file mixing in/out-of-window rows
    assert(t.deleteWhere(col("k") === 1L) == 1)
    t.replaceWhere(col("k") >= 10L, Seq((10L, "IN")).toDF("k", "v"))
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((2L, "out-keep"), (10L, "IN")),
      "the DV-deleted out-of-window row must not resurrect")
  }

  test("no matching live rows: pure insert, zero files removed; a file " +
      "whose only matches are DV-deleted is kept verbatim") {
    val t = new LogTable(spark, tmp("rw-none-"), s2)
    t.append(Seq((1L, "a"), (10L, "in")).toDF("k", "v").coalesce(1))
    assert(t.deleteWhere(col("k") === 10L) == 1)
    val before = t.liveFileNames().toSet
    t.replaceWhere(col("k") >= 10L, Seq((12L, "new")).toDF("k", "v"))
    assert(before.subsetOf(t.liveFileNames().toSet),
      "sole-match-deleted file must be kept, not rewritten")
    assert(t.read().as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (12L, "new")))
  }

  test("NULL predicate column: rows where cond is NULL are KEPT, not " +
      "silently dropped (SQL DELETE semantics — only cond=true rows go)") {
    val t = new LogTable(spark, tmp("rw-null-"), s2)
    // one file mixing a matching row, a non-matching row, and a NULL-key
    // row: `!cond` alone is NULL for the last one (neither kept nor
    // matched) — the remainder filter must coalesce it to kept
    t.append(Seq((Some(10L), "in"), (Some(1L), "out"), (None, "nullk"))
      .toDF("k", "v").coalesce(1))
    t.replaceWhere(col("k") >= 10L, Seq((12L, "new")).toDF("k", "v"))
    assert(t.read().as[(Option[Long], String)].collect().toSet ==
      Set((Some(1L), "out"), (None, "nullk"), (Some(12L), "new")),
      "the NULL-predicate row must survive the rewrite")
  }

  test("row tracking: kept files keep ids; rewritten remainder + batch " +
      "re-id above the watermark; typed feed shows the delete+insert") {
    val t = new LogTable(spark, tmp("rw-rt-"), s2, rowTracking = true)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1))   // ids 1,2
    t.append(Seq((10L, "c"), (11L, "d")).toDF("k", "v").coalesce(1)) // ids 3,4
    t.replaceWhere(col("k") === 10L, Seq((10L, "C")).toDF("k", "v")) // v3
    val m = t.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(m(1L) == 1L && m(2L) == 2L, "kept file keeps its ids")
    assert(m(10L) > 4L && m(11L) > 4L, "rewritten rows re-id above the hwm")
    val f = t.readChangeFeed(2, 3)
      .select(col(LogTable.ChangeTypeCol), col("k"), col("v"))
      .as[(String, Long, String)].collect().toSet
    assert(f == Set(("delete", 10L, "c"), ("delete", 11L, "d"),
      ("insert", 10L, "C"), ("insert", 11L, "d")))
  }
}
