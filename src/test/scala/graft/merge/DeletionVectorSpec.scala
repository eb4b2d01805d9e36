package graft.merge

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Deletion vectors: merge-on-read DELETE (Delta DV analog).
  *
  * Contract under test:
  *  - a delete touches NO data file (byte-identity, not just file count);
  *  - every read path (read, readRange, bucketed merge/compact inputs)
  *    subtracts deleted positions;
  *  - deletes compose without double-counting (wave 2 sees the
  *    merge-on-read view);
  *  - materialization rewrites to the same content and clears the sidecar;
  *  - hardlink clones keep DVs valid (positions key on RELATIVE paths);
  *  - versioned tables reject DVs loudly (history would resurrect rows).
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String = {
    val d = Files.createTempDirectory(prefix)
    d.toFile.deleteOnExit()
    d.toString
  }

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def dataFiles(root: String): Seq[Path] = {
    import scala.jdk.CollectionConverters._
    Files.walk(Paths.get(root, "current")).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("/_dv/")).toSeq.sortBy(_.toString)
  }

  private def digest(p: Path): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  private def fingerprint(root: String): Map[String, String] =
    dataFiles(root).map(p => p.toString -> digest(p)).toMap

  test("deleteWhere is merge-on-read: data files byte-identical, reads filtered") {
    val root = tmp("dv-basic-")
    val t = new ParquetTable(spark, root, s2)
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"))
    val before = fingerprint(root)

    val n = t.deleteWhere(col("k") % 10 === 0)
    assert(n == 10L)
    assert(t.deletedPositions == 10L)
    assert(fingerprint(root) == before, "a DELETE rewrote data files")
    assert(t.read().count() == 90L)
    assert(t.read().filter(col("k") % 10 === 0).count() == 0L)

    // composing waves: wave 2 matches only still-live rows
    val n2 = t.deleteWhere(col("k") % 5 === 0) // k%10==0 already gone
    assert(n2 == 10L, s"wave 2 double-counted ($n2)")
    assert(t.read().count() == 80L)
    // re-deleting deleted rows is a no-op
    assert(t.deleteWhere(col("k") % 5 === 0) == 0L)
    assert(fingerprint(root) == before)
  }

  test("materializeDeletes: same content, sidecar cleared, files rewritten") {
    val root = tmp("dv-mat-")
    val t = new ParquetTable(spark, root, s2)
    t.overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") <= 20)
    val morKeys = t.read().select("k").as[Long].collect().sorted
    val before = fingerprint(root)

    t.materializeDeletes()
    assert(t.deletedPositions == 0L)
    assert(fingerprint(root).keySet.intersect(before.keySet).isEmpty,
      "materialize swapped nothing")
    val postKeys = t.read().select("k").as[Long].collect().sorted
    assert(postKeys.toSeq == morKeys.toSeq)
    assert(postKeys.forall(_ > 20))
    // no-op when no DVs
    val fp = fingerprint(root)
    t.materializeDeletes()
    assert(fingerprint(root) == fp)
  }

  test("deleteMatched: keyed erasure batch, distributed join") {
    val root = tmp("dv-keyed-")
    val t = new ParquetTable(spark, root, s2)
    t.overwrite((1L to 40L).map(i => (i, s"v$i")).toDF("k", "v"))
    val requests = Seq(3L, 7L, 7L, 11L, 999L).toDF("k") // dup + miss
    assert(t.deleteMatched(requests, Seq("k")) == 3L)
    assert(t.read().count() == 37L)
    assert(t.read().filter(col("k").isin(3L, 7L, 11L)).count() == 0L)
    // repeated request: already deleted, no double count
    assert(t.deleteMatched(requests, Seq("k")) == 0L)
  }

  test("hardlink clone keeps DVs valid (relative-path keying)") {
    val srcRoot = tmp("dv-clone-src-")
    val t = new ParquetTable(spark, srcRoot, s2)
    t.overwrite((1L to 30L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") > 25)
    val c = t.cloneTo(tmp("dv-clone-dst-") + "/t2")
    assert(c.read().count() == 25L, "clone resurrected DV-deleted rows")
    // divergence: source materializes; the clone's view must not change
    t.materializeDeletes()
    assert(c.read().count() == 25L)
    assert(c.deletedPositions == 5L) // the 5 cloned positions survive
  }

  test("bucketed table: merge and compact see the merge-on-read view") {
    val root = tmp("dv-bucket-")
    val t = new ParquetTable(spark, root, s2, bucketBy = Some((Seq("k"), 4)))
    t.overwrite((1L to 80L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") <= 40)
    assert(t.read().count() == 40L)

    // a keyed merge touching SOME buckets must not resurrect rows in either
    // the touched buckets (materialized by the rewrite) or the untouched
    // ones (still filtered by the surviving sidecar entries)
    val batch = Seq((100L, "new"), (41L, "upd")).toDF("k", "v")
    t.merge(batch)((cur, b) => graft.merge.Merge.scd1(cur, b, Seq("k")))
    val keys = t.read().select("k").as[Long].collect().toSet
    assert(!keys.exists(_ <= 40), "merge resurrected DV-deleted rows")
    assert(keys.contains(100L) && keys.contains(41L))
    assert(t.read().filter(col("k") === 41L).select("v").as[String].head() == "upd")

    // appends fragment buckets; compact materializes the touched buckets
    t.append(Seq((200L, "a")).toDF("k", "v"))
    t.append(Seq((201L, "b")).toDF("k", "v"))
    t.compact(maxFilesPerBucket = 1)
    val keys2 = t.read().select("k").as[Long].collect().toSet
    assert(!keys2.exists(_ <= 40), "compact resurrected DV-deleted rows")
    assert(keys2.contains(200L) && keys2.contains(201L))
  }

  test("readRange (stats manifest) applies DVs") {
    val root = tmp("dv-range-")
    val t = new ParquetTable(spark, root, s2, statsBy = Seq("k"))
    t.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("k", "v"))
    t.deleteWhere(col("k") === 10L || col("k") === 15L)
    val got = t.readRange("k", lit(5L), lit(20L)).select("k").as[Long].collect().sorted
    assert(got.toSeq == (5L to 20L).filterNot(k => k == 10L || k == 15L))
  }

  test("DV deletes compose with time travel: historical reads resurrect, " +
      "live stays deleted (deleteWhere's composition contract)") {
    val root = tmp("dv-tt-")
    val t = new ParquetTable(spark, root, s2, keepVersions = 3)
    def ks(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("k").as[Long].collect().sorted.toSeq
    t.overwrite((1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"))  // v1
    assert(t.deleteWhere(col("k") % 2 === 0) == 5L)                // sub-version commit
    // live read applies the sidecar; the live version's historical read is
    // pinned at CUT time — pre-delete rows resurrect
    assert(ks(t.read()) == Seq(1L, 3L, 5L, 7L, 9L))
    assert(ks(t.readVersion(1)) == (1L to 10L))
    // cut v2 from the live (DV-applied) view: v1 retires WITH its sidecar
    // inside, which the version read never sees
    t.overwrite(t.read())                                          // v2
    assert(t.deletedPositions == 0L, "fresh tree must carry no sidecar")
    assert(ks(t.readVersion(1)) == (1L to 10L))
    assert(ks(t.readVersion(2)) == Seq(1L, 3L, 5L, 7L, 9L))
    // keyed DV delete composes the same way
    assert(t.deleteMatched(Seq(3L).toDF("k"), Seq("k")) == 1L)
    assert(ks(t.read()) == Seq(1L, 5L, 7L, 9L))
    assert(ks(t.readVersion(2)) == Seq(1L, 3L, 5L, 7L, 9L),
      "post-cut DV delete leaked into the named version")
    // restore to a pre-delete version resurrects (the Delta behavior);
    // v3's cut retires v2 with its sidecar — its history stays pinned
    t.restore(1)                                                   // v3 ≡ v1
    assert(ks(t.read()) == (1L to 10L))
    assert(ks(t.readVersion(2)) == Seq(1L, 3L, 5L, 7L, 9L))
  }
}
