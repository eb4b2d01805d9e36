package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** ROW TRACKING on the commit-log table (Delta `enableRowTracking`): stable
  * row ids allocated per commit from a logged high-water mark, served as
  * base + row_index (fresh files) or a materialized column (OPTIMIZE
  * rewrites), stable across deletes/compaction/clone, never reused. */
class RowTrackingSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def tracked(root: String,
                      bucketBy: Option[(Seq[String], Int)] = None): LogTable =
    new LogTable(spark, root, s2, bucketBy = bucketBy, rowTracking = true)

  private def idMap(t: LogTable): Map[Long, Long] =
    t.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap

  test("per-commit allocation: contiguous ranges from the high-water mark, " +
      "unique across commits") {
    val t = tracked(tmp("rt-alloc-"))
    t.append((1L to 10L).map(i => (i, s"a$i")).toDF("k", "v"))
    t.append((11L to 15L).map(i => (i, s"b$i")).toDF("k", "v"))
    val ids = t.readWithRowIds().select(col(LogTable.RowIdCol))
      .as[Long].collect().sorted.toSeq
    assert(ids == (1L to 15L), s"ids must be contiguous 1..15, got $ids")
    // commit boundaries respected: batch-2 rows sit strictly above batch-1
    val m = idMap(t)
    assert((1L to 10L).map(m).max < (11L to 15L).map(m).min)
  }

  test("rowTracking is LOGGED table metadata: a second handle opened " +
      "WITHOUT the flag still allocates bases and can serve row ids") {
    val root = tmp("rt-feature-")
    tracked(root).append((1L to 5L).map(i => (i, s"a$i")).toDF("k", "v"))
    // plain handle — the flag must come from the log, not the constructor
    val plain = new LogTable(spark, root, s2)
    plain.append((6L to 8L).map(i => (i, s"b$i")).toDF("k", "v"))
    val ids = plain.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(ids.values.toSeq.sorted == (1L to 8L),
      s"the untracked handle's files must get real bases, got $ids")
    assert((6L to 8L).forall(k => ids(k) > 5L),
      "second-handle rows allocate above the watermark")
  }

  test("DV delete keeps survivor ids; freed ids are never reused") {
    val t = tracked(tmp("rt-del-"))
    t.append((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))
    val before = idMap(t)
    assert(t.deleteWhere(col("k") % 2 === 0) == 5)
    val after = idMap(t)
    assert(after == before.filter { case (k, _) => k % 2 == 1 })
    t.append(Seq((100L, "new")).toDF("k", "v"))
    assert(idMap(t)(100L) == 11L, "allocation resumes at the watermark, not at a freed id")
  }

  test("OPTIMIZE materializes ids: per-key map unchanged across the rewrite, " +
      "including a clusterBy re-layout; post-compact append resumes at hwm") {
    val t = tracked(tmp("rt-opt-"))
    // key-random appends so the clustered rewrite genuinely reorders rows
    t.append(Seq((5L, "e"), (1L, "a"), (9L, "i")).toDF("k", "v"))
    t.append(Seq((2L, "b"), (8L, "h"), (4L, "d")).toDF("k", "v"))
    t.deleteWhere(col("k") === 8L)
    val before = idMap(t)
    assert(t.compact(targetFileBytes = 1L << 20, clusterBy = Seq("k")) > 0)
    assert(idMap(t) == before, "materialized ids must survive the re-layout")
    // a second compact reads ids back FROM the materialized column
    assert(t.compact(clusterBy = Seq("k")) > 0)
    assert(idMap(t) == before)
    t.append(Seq((50L, "z")).toDF("k", "v"))
    assert(idMap(t)(50L) == 7L, "hwm rides the log across materialized rewrites")
  }

  test("overwrite/merge rewrites allocate fresh ids above everything prior") {
    val t = tracked(tmp("rt-ow-"))
    t.append((1L to 4L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.overwrite((1L to 4L).map(i => (i, s"w$i")).toDF("k", "v"))
    val ids = t.readWithRowIds().select(col(LogTable.RowIdCol))
      .as[Long].collect().sorted.toSeq
    assert(ids == (5L to 8L), s"rewrite must re-id from the watermark, got $ids")
  }

  test("time travel composes: each version serves the ids it had") {
    val t = tracked(tmp("rt-tt-"))
    t.append((1L to 3L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") === 2L)
    t.append(Seq((4L, "x")).toDF("k", "v"))
    val v1 = t.readVersionWithRowIds(1L).select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(v1 == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), "pre-delete version resurrects id 2")
    assert(idMap(t) == Map(1L -> 1L, 3L -> 3L, 4L -> 4L))
  }

  test("bucketed tables: ids unique and commit-contiguous (set-level contract)") {
    val t = tracked(tmp("rt-bk-"), bucketBy = Some((Seq("k"), 4)))
    t.append((1L to 20L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.append((21L to 30L).map(i => (i, s"w$i")).toDF("k", "v"))
    val m = idMap(t)
    assert(m.values.toSeq.sorted == (1L to 30L))
    assert((1L to 20L).map(m).max < (21L to 30L).map(m).min)
    // partition-scoped merge rewrites only touched buckets; rewritten rows
    // re-id above the watermark (the documented full-rewrite rule), others keep
    val keep = m.filter { case (k, _) => k != 7L }
    t.merge(Seq((7L, "upd")).toDF("k", "v")) { (cur, b) =>
      cur.filter(col("k") =!= 7L).unionByName(b)
    }
    val m2 = idMap(t)
    val untouchedBuckets = keep.filter { case (k, _) => m2(k) == keep(k) }
    assert(untouchedBuckets.nonEmpty, "rows in untouched buckets keep their ids")
    assert(m2.values.toSeq.distinct.size == m2.size, "ids stay unique after merge")
  }

  test("shallow clone preserves ids and seeds the clone's watermark") {
    val root = Files.createTempDirectory("rt-clone-")
    val t = tracked(root.resolve("src").toString)
    t.append((1L to 6L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") === 3L)
    val c = t.cloneTo(root.resolve("dup").toString)
    assert(c.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap == idMap(t))
    c.append(Seq((50L, "c")).toDF("k", "v"))
    t.append(Seq((60L, "t")).toDF("k", "v"))
    val cm = c.readWithRowIds().select("k", LogTable.RowIdCol)
      .as[(Long, Long)].collect().toMap
    assert(cm(50L) == 7L, "clone allocation starts above the source watermark")
    assert(idMap(t)(60L) == 7L, "source allocation unaffected by the clone")
  }

  test("guards: readWithRowIds on an untracked table fails loudly; plain " +
      "reads of a tracked table never see id plumbing") {
    val u = new LogTable(spark, tmp("rt-untracked-"), s2)
    u.append(Seq((1L, "x")).toDF("k", "v"))
    intercept[IllegalArgumentException](u.readWithRowIds())
    val t = tracked(tmp("rt-plain-"))
    t.append(Seq((1L, "x"), (2L, "y")).toDF("k", "v"))
    t.compact(clusterBy = Seq("k")) // materializes the physical id column
    assert(t.read().columns.toSeq == Seq("k", "v"),
      "materialized id column must stay invisible to plain reads")
  }
}
