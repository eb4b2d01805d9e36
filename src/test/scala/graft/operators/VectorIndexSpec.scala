package graft.operators

import java.nio.file.{Files, Path}
import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Pins the persisted-index contract behind v13: build+query is
  * bit-identical to the in-plan [[Similarity.ivfPqTopK]] composition,
  * append with the frozen codebook surfaces new vectors without touching
  * other cells' files, and repeat queries are deterministic. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq

  test("build + query is bit-identical to the in-plan v12 composition") {
    VectorFunctions.register(spark)
    val idx = new VectorIndex(spark,
      Files.createTempDirectory("vidx-").toString)
    idx.build(emb)
    val q = emb.filter(col("vec_id") < 10)
    val indexed = rows(idx.query(q, emb, VectorFunctions.cosineSim,
      k = 5, nprobe = 4, shortlist = 50))
    val inPlan = rows(Similarity.ivfPqTopK(q, emb, VectorFunctions.cosineSim,
      k = 5, nlist = 16, nprobe = 4, shortlist = 50))
    assert(indexed == inPlan)
    // deterministic across repeat queries
    assert(indexed == rows(idx.query(q, emb, VectorFunctions.cosineSim,
      k = 5, nprobe = 4, shortlist = 50)))
  }

  test("append lands only in its own cells; appended vectors are findable") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-append-")
    val idx = new VectorIndex(spark, root.toString)
    val half1 = emb.filter(col("vec_id") % 2 === 0)
    val half2 = emb.filter(col("vec_id") % 2 === 1)
    idx.build(half1)
    // fingerprint every cell partition before the append
    def cellFiles(): Map[String, Seq[(String, Long)]] = {
      val index = idx.liveRoot.resolve("index")
      import scala.jdk.CollectionConverters._
      Files.list(index).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("cell="))
        .map { p =>
          p.getFileName.toString ->
            Files.list(p).iterator().asScala
              .map(f => (f.getFileName.toString, Files.size(f)))
              .toSeq.sortBy(_._1)
        }.toMap
    }
    val before = cellFiles()
    idx.append(half2)
    val after = cellFiles()
    // appended cells gained files; cells with no new vectors are untouched
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.nonEmpty, "append wrote nothing")
    before.foreach { case (cell, files) =>
      if (!changed(cell))
        assert(after(cell) == files, s"untouched $cell was rewritten")
    }
    // a query finds neighbors from BOTH halves (an exact duplicate pair
    // across halves would be strongest, but near-random testdata already
    // yields odd ids in every shortlist)
    val got = idx.query(emb.filter(col("vec_id") < 10), emb,
        VectorFunctions.cosineSim, k = 5, nprobe = 4, shortlist = 50)
      .select(col("vec_id")).as[Long].collect()
    assert(got.exists(_ % 2 == 0) && got.exists(_ % 2 == 1),
      s"results only cover one half: ${got.toSeq}")
  }

  test("delete masks candidates; vacuum folds in without changing results") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-del-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb)
    val q = emb.filter(col("vec_id") < 10)
    def run() = rows(idx.query(q, emb, VectorFunctions.cosineSim,
      k = 5, nprobe = 4, shortlist = 50))
    val before = run()
    // delete a few ids that ARE in the current results: guarantees the
    // masking is observable AND touches only a handful of cells (the
    // partition-scoped-vacuum assertion below needs untouched cells)
    val dead = before.map(_._2).distinct.take(3).toSet
    idx.delete(dead.toSeq.toDF("vec_id"))
    val masked = run()
    assert(masked != before, "delete changed nothing (degenerate fixture)")
    assert(masked.forall { case (_, vid, _, _) => !dead(vid) },
      "tombstoned id surfaced in results")
    // untouched cells must survive vacuum byte-identical
    def cellFiles(): Map[String, Seq[(String, Long)]] = {
      val index = idx.liveRoot.resolve("index")
      import scala.jdk.CollectionConverters._
      Files.list(index).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("cell="))
        .map { p =>
          p.getFileName.toString ->
            Files.list(p).iterator().asScala
              .map(f => (f.getFileName.toString, Files.size(f)))
              .toSeq.sortBy(_._1)
        }.toMap
    }
    val before2 = cellFiles()
    idx.vacuum()
    // tombstone dir is gone, results unchanged: vacuum moved the masking
    // cost from query time to storage, not the answer
    assert(!Files.exists(idx.liveRoot.resolve("tombstones")))
    assert(run() == masked)
    // cells that held no deleted ids kept their exact files
    val after2 = cellFiles()
    val leftover = spark.read.parquet(idx.liveRoot.resolve("index").toString)
      .filter(col("vec_id").isin(dead.toSeq: _*)).count()
    assert(leftover == 0, "vacuum left deleted codes behind")
    val unchanged = before2.keySet.intersect(after2.keySet)
      .filter(k => before2(k) == after2(k))
    assert(unchanged.nonEmpty, "every cell was rewritten — vacuum is not partition-scoped")
  }

  test("vacuum removes an all-deleted cell's partition directory") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-del-all-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb)
    // delete EVERY vector of one populated cell
    val assigned = spark.read.parquet(idx.liveRoot.resolve("index").toString)
    val someCell = assigned.groupBy(col("cell")).count()
      .orderBy(col("count"), col("cell")).select(col("cell"))
      .first().getInt(0)
    idx.delete(assigned.filter(col("cell") === someCell).select(col("vec_id")))
    idx.vacuum()
    assert(!Files.exists(idx.liveRoot.resolve("index").resolve(s"cell=$someCell")),
      "emptied cell partition dir not removed")
  }

  test("merge: shard indexes on one calibration == one-shot build; " +
      "file union, no re-encode; meta mismatch rejected") {
    VectorFunctions.register(spark)
    import scala.jdk.CollectionConverters._
    val a = new VectorIndex(spark, Files.createTempDirectory("vidx-ma-").toString)
    val b = new VectorIndex(spark, Files.createTempDirectory("vidx-mb-").toString)
    a.buildMeta(emb); b.buildMeta(emb)
    a.append(emb.filter(pmod(col("vec_id"), lit(2)) === 0))
    b.append(emb.filter(pmod(col("vec_id"), lit(2)) === 1))
    def files(ix: VectorIndex): Set[String] =
      Files.walk(ix.liveRoot.resolve("index")).iterator().asScala
        .map(_.getFileName.toString).filter(_.endsWith(".parquet")).toSet
    val shardFiles = files(a) ++ files(b)
    a.merge(b)
    assert(shardFiles.subsetOf(files(a)), "merge must be a file union")
    val oneShot = new VectorIndex(spark,
      Files.createTempDirectory("vidx-os-").toString)
    oneShot.build(emb)
    val q = emb.filter(col("vec_id") < 10)
    assert(rows(a.query(q, emb, VectorFunctions.cosineSim,
        k = 5, nprobe = 4, shortlist = 50)) ==
      rows(oneShot.query(q, emb, VectorFunctions.cosineSim,
        k = 5, nprobe = 4, shortlist = 50)),
      "merged index diverged from the one-shot build")
    // a differently-calibrated index must be rejected
    val alien = new VectorIndex(spark,
      Files.createTempDirectory("vidx-alien-").toString)
    alien.build(emb.filter(col("vec_id") % 3 === 0))
    intercept[IllegalArgumentException] { a.merge(alien) }
  }

  test("merge cuts a generation: pre-merge shard state stays readable " +
      "via version()") {
    VectorFunctions.register(spark)
    val a = new VectorIndex(spark, Files.createTempDirectory("vidx-mg-").toString)
    val b = new VectorIndex(spark, Files.createTempDirectory("vidx-mh-").toString)
    a.buildMeta(emb); b.buildMeta(emb)
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    a.append(evens); b.append(emb.filter(pmod(col("vec_id"), lit(2)) === 1))
    val preGen = a.versions ++ Seq.empty // none retired yet
    assert(preGen.isEmpty)
    a.merge(b)
    val retired = a.versions
    assert(retired.nonEmpty, "merge must retire the shard generation")
    val q = emb.filter(col("vec_id") < 6)
    val old = a.version(retired.max)
    // the retired generation still serves exactly the shard's content
    val oldIds = old.query(q, emb, VectorFunctions.cosineSim,
        k = 5, nprobe = 16, shortlist = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(oldIds.forall(_ % 2 == 0), "retired shard generation leaked merged rows")
  }

  test("merge unions tombstones: a pre-merge delete in either input " +
      "stays masked in the merged index") {
    VectorFunctions.register(spark)
    val a = new VectorIndex(spark, Files.createTempDirectory("vidx-ta-").toString)
    val b = new VectorIndex(spark, Files.createTempDirectory("vidx-tb-").toString)
    a.buildMeta(emb); b.buildMeta(emb)
    val evens = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val odds = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
    a.append(evens); b.append(odds)
    // tombstone one id on each side before the merge
    a.delete(evens.filter(col("vec_id") === 20L).select(col("vec_id")))
    b.delete(odds.filter(col("vec_id") === 21L).select(col("vec_id")))
    a.merge(b)
    val q = emb.filter(col("vec_id") < 10)
    val got = a.query(q, emb, VectorFunctions.cosineSim,
        k = 5, nprobe = 16, shortlist = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(!got.contains(20L) && !got.contains(21L),
      "a tombstoned id from a merge input resurfaced in the merged index")
    // and the mask matches a one-shot build over the live union
    val oneShot = new VectorIndex(spark,
      Files.createTempDirectory("vidx-tos-").toString)
    oneShot.build(emb.filter(col("vec_id") =!= 20L && col("vec_id") =!= 21L))
    val want = oneShot.query(q, emb, VectorFunctions.cosineSim,
        k = 5, nprobe = 16, shortlist = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(got == want, "merged+tombstoned diverged from the live-union build")
  }

  test("build over a legacy root with retired .v-N dirs clobbers nothing: " +
      "the retained version stays readable and its stale tombstones don't " +
      "leak into the new generation") {
    VectorFunctions.register(spark)
    def copyTree(from: Path, to: Path): Unit = {
      import scala.jdk.CollectionConverters._
      Files.walk(from).iterator().asScala.foreach { p =>
        val t = to.resolve(from.relativize(p))
        if (Files.isDirectory(p)) Files.createDirectories(t)
        else { Files.createDirectories(t.getParent); Files.copy(p, t) }
      }
    }
    def fingerprint(dir: Path): Seq[(String, Long)] = {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => (dir.relativize(p).toString, Files.size(p))).toSeq.sortBy(_._1)
    }
    // craft the legacy layout: meta/index directly under the root (no _gen
    // pointer) PLUS a retired .v-1 dir carrying stale tombstones — the
    // pre-generational on-disk shape an upgraded deployment inherits
    val src = Files.createTempDirectory("vidx-lsrc-")
    new VectorIndex(spark, src.toString).build(emb.filter(col("vec_id") % 2 === 0))
    val gen1 = src.resolve(".v-1")
    val legacy = Files.createTempDirectory("vidx-legacy-")
    copyTree(gen1, legacy)
    val retired = legacy.resolve(".v-1")
    copyTree(gen1, retired)
    Seq(0L, 2L).toDF("vec_id").coalesce(1)
      .write.parquet(retired.resolve("tombstones").toString)
    val before = fingerprint(retired)
    val idx = new VectorIndex(spark, legacy.toString)
    assert(idx.currentGen == 0L, "legacy root must read gen 0")
    idx.build(emb) // must cut .v-2 — NOT write into (and clobber) .v-1
    assert(idx.currentGen == 2L,
      s"build over a legacy root must skip past on-disk generations")
    assert(fingerprint(retired) == before,
      "the retired generation's files changed — legacy build clobbered it")
    assert(idx.versions == Seq(1L))
    // retained version still readable (with its own tombstone mask intact)
    val v1 = idx.version(1L).query(emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 16, shortlist = 500)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(v1.nonEmpty && !v1.contains(0L) && !v1.contains(2L))
    // the new live generation must NOT inherit .v-1's tombstones: the ids
    // masked there are served live
    assert(!Files.exists(legacy.resolve(".v-2").resolve("tombstones")),
      "stale tombstones leaked into the fresh generation")
    val liveIds = spark.read
      .parquet(legacy.resolve(".v-2").resolve("index").toString)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(liveIds.contains(0L) && liveIds.contains(2L),
      "a vector tombstoned only in the retired generation must be live here")
    // and the live generation serves queries (sanity on the fresh layout)
    assert(idx.query(emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 16, shortlist = 500)
      .count() > 0)
  }
}
