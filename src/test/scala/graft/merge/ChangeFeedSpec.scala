package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** CHANGE DATA FEED proper ([[LogTable.readChangeFeed]] — Delta
  * `table_changes`): typed row-level changes — inserts from added files,
  * deletes from DV sidecars (exactly the commit's deletions) and from
  * rewrite-removed files' live rows; OPTIMIZE invisible; composes with row
  * tracking (changes carry the stable `_row_id`). */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def changes(t: LogTable, from: Long, to: Long,
                      ids: Boolean = false): Set[(String, Long, Long, String)] =
    t.readChangeFeed(from, to, withRowIds = ids)
      .select(col(LogTable.ChangeTypeCol), col(LogTable.CommitVersionCol),
        col("k"), col("v"))
      .as[(String, Long, Long, String)].collect().toSet

  test("append -> insert rows; DV delete -> delete rows with the deleted " +
      "values; bounded spans slice per commit") {
    val t = new LogTable(spark, tmp("cdf-basic-"), s2)
    t.append((1L to 4L).map(i => (i, s"a$i")).toDF("k", "v")) // v1
    t.deleteWhere(col("k") % 2 === 0)                          // v2
    assert(changes(t, 0, 1) ==
      (1L to 4L).map(i => ("insert", 1L, i, s"a$i")).toSet)
    assert(changes(t, 1, 2) ==
      Set(("delete", 2L, 2L, "a2"), ("delete", 2L, 4L, "a4")))
    assert(changes(t, 0, 2).size == 6)
  }

  test("overwrite decomposes into delete(pre-commit live rows) + " +
      "insert(new); previously-deleted rows do NOT re-delete") {
    val t = new LogTable(spark, tmp("cdf-ow-"), s2)
    t.append((1L to 3L).map(i => (i, s"a$i")).toDF("k", "v")) // v1
    t.deleteWhere(col("k") === 2L)                             // v2
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))                 // v3
    assert(changes(t, 2, 3) == Set(
      ("delete", 3L, 1L, "a1"), ("delete", 3L, 3L, "a3"),
      ("insert", 3L, 9L, "z")))
  }

  test("merge update appears as delete+insert in one commit; OPTIMIZE " +
      "emits nothing; feed serves the end schema across a rename") {
    val t = new LogTable(spark, tmp("cdf-mg-"), s2)
    t.append(Seq((1L, "old"), (2L, "keep")).toDF("k", "v"))   // v1
    t.merge(Seq((1L, "new")).toDF("k", "v")) { (cur, b) =>     // v2 (rewrite)
      cur.filter(col("k") =!= 1L).unionByName(b)
    }
    assert(changes(t, 1, 2) == Set(
      ("delete", 2L, 1L, "old"), ("delete", 2L, 2L, "keep"),
      ("insert", 2L, 1L, "new"), ("insert", 2L, 2L, "keep")))
    assert(t.compact(clusterBy = Seq("k")) > 0)                // v3: invisible
    assert(t.readChangeFeed(2, 3).count() == 0)
    t.renameColumn("v", "label")                               // v4: metadata
    val r = t.readChangeFeed(0, 4)
    assert(r.columns.contains("label") && !r.columns.contains("v"))
    assert(r.filter(col(LogTable.ChangeTypeCol) === "insert")
      .count() == 4) // v1: 2 inserts, v2: 2 inserts
  }

  test("row tracking composes: every change row carries the stable _row_id " +
      "(deletes keep the id they had; rewrite inserts re-id above the hwm)") {
    val t = new LogTable(spark, tmp("cdf-rt-"), s2, rowTracking = true)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // v1: ids 1,2
    t.deleteWhere(col("k") === 1L)                                 // v2
    val f = t.readChangeFeed(0, 2, withRowIds = true)
      .select(col(LogTable.ChangeTypeCol), col(LogTable.CommitVersionCol),
        col("k"), col(LogTable.RowIdCol))
      .as[(String, Long, Long, Long)].collect().toSet
    val insIds = f.collect { case ("insert", 1L, k, id) => k -> id }.toMap
    assert(insIds.values.toSeq.sorted == Seq(1L, 2L))
    assert(f.contains(("delete", 2L, 1L, insIds(1L))),
      "the delete row must carry the id the row had")
    // feed ids agree with the live read's ids for surviving rows
    val live = t.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(live(2L) == insIds(2L))
  }

  test("guards: withRowIds needs a tracked table; vacuumed spans refuse; " +
      "empty span returns an empty typed frame") {
    val u = new LogTable(spark, tmp("cdf-guard-"), s2)
    u.append(Seq((1L, "x")).toDF("k", "v"))
    intercept[IllegalArgumentException](u.readChangeFeed(0, 1, withRowIds = true))
    val e = u.readChangeFeed(1, 1)
    assert(e.count() == 0 && e.columns.contains(LogTable.ChangeTypeCol))
    u.overwrite(Seq((2L, "y")).toDF("k", "v")) // v2
    u.vacuum(retainLast = 1)
    intercept[IllegalArgumentException](u.readChangeFeed(0, 2))
  }
}
