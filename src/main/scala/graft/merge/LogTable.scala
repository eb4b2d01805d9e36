package graft.merge

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** COMMIT-LOG TABLE — the transactional form of [[ParquetTable]], i.e. the
  * "commit log / Delta-Iceberg metadata design" every scoped-out composition
  * in that class points at, built from first principles:
  *
  *   - DATA FILES are immutable, uuid-named, written once under
  *     `root/files/` and SHARED across versions — a version never copies
  *     data, it references files.
  *   - The LOG (`root/_log/<version>.json`) is an append-only sequence of
  *     manifests; manifest N lists version N's data files (with their
  *     bucket tag and per-file min/max stats) and its deletion-vector
  *     files. The newest manifest IS the table.
  *   - A COMMIT is one atomic create of `_log/<N+1>.json` (temp write +
  *     rename WITHOUT replace — the filesystem's create-exclusive is the
  *     compare-and-swap). Losing the race throws FileAlreadyExists, the
  *     writer discards its orphan files and re-derives. This is the Delta
  *     protocol's putIfAbsent of version N+1, verbatim.
  *
  * What the log buys over the directory-swap table — every composition the
  * rename design had to reject now just works:
  *
  *   - **bucketed × time travel**: a partition-scoped merge commits a
  *     manifest = untouched files + the touched buckets' replacements, so
  *     any historical version is a plain file list — no per-bucket
  *     generation overlay to reconstruct.
  *   - **bucketed × OCC**: conflict detection is the manifest CAS,
  *     independent of layout.
  *   - **bucketed × file stats**: stats live per file IN the manifest
  *     (Delta's stats-in-log), so [[readRange]] prunes bucketed tables too.
  *   - **DV-aware history**: a [[deleteWhere]] is a NAMED commit whose
  *     manifest carries the new sidecar — `VERSION AS OF` reads the exact
  *     DV state of that version (the composition [[ParquetTable]] serves
  *     only at overwrite granularity).
  *   - **no vanished snapshots**: files are immutable until [[vacuum]], so
  *     a reader (or an OCC stager) holding version V keeps reading V while
  *     later commits land — the FAILED_READ_FILE conflict path of the
  *     rename design cannot occur here.
  *
  * At 100 TB the same protocol runs on any store with atomic
  * create-if-absent (HDFS rename, object-store conditional PUT); manifests
  * are O(#files) metadata and the log is pruned by [[vacuum]] retention.
  * Single JSON manifests are the simplest correct form — Delta's
  * checkpoint-parquet compaction of the log is a pure optimization layered
  * on the identical commit semantics. LogTableSpec pins every composition
  * above; q67 verifies the full lifecycle against a relational oracle.
  */
final class LogTable(spark: SparkSession, root: String, schema: StructType,
                     bucketBy: Option[(Seq[String], Int)] = None,
                     statsBy: Seq[String] = Nil) {
  private val rootPath: Path = Paths.get(root)
  private val filesDir: Path = rootPath.resolve("files")
  private val logDir: Path = rootPath.resolve("_log")
  Files.createDirectories(filesDir)
  Files.createDirectories(logDir)

  private val mapper = new ObjectMapper()
  private val BucketCol = "__bucket"
  private def bucketExpr: Column = {
    val (keys, n) = bucketBy.get
    pmod(xxhash64(keys.map(col).toIndexedSeq: _*), lit(n)).cast("int")
  }

  /** One data file: manifest-relative name, bucket (-1 = unbucketed), and
    * per-column (min, max) stats as strings (None = no stats / all null). */
  private[merge] case class FileEntry(name: String, bucket: Int,
                                      stats: Map[String, (String, String)])
  private[merge] case class Manifest(version: Long, files: Seq[FileEntry],
                                     dv: Seq[String])

  // ── log primitives ──────────────────────────────────────────────────────

  private def manifestPath(v: Long): Path = logDir.resolve(f"$v%020d.json")

  private val VName = """(\d{20})\.json""".r
  /** Version numbers present in the log, ascending (vacuum may have pruned
    * a prefix). Empty before the first commit. */
  def history(): Seq[Long] =
    Files.list(logDir).iterator().asScala.map(_.getFileName.toString)
      .collect { case VName(d) => d.toLong }.toSeq.sorted

  /** Newest committed version; 0 = never written. */
  def currentVersion: Long = history().lastOption.getOrElse(0L)

  private def readManifest(v: Long): Manifest = {
    val p = manifestPath(v)
    require(Files.exists(p),
      s"version $v not available; readable versions: ${history().mkString(", ")}")
    val n = mapper.readTree(Files.readAllBytes(p))
    val files = n.get("files").elements().asScala.map { f =>
      val stats = Option(f.get("stats")).map { s =>
        s.properties().asScala.map { e =>
          e.getKey -> (e.getValue.get(0).asText(), e.getValue.get(1).asText())
        }.toMap
      }.getOrElse(Map.empty[String, (String, String)])
      FileEntry(f.get("name").asText(), f.get("bucket").asInt(), stats)
    }.toSeq
    val dv = n.get("dv").elements().asScala.map(_.asText()).toSeq
    Manifest(n.get("version").asLong(), files, dv)
  }

  /** The CAS: atomically create `_log/<expected+1>.json`. False = another
    * commit landed first (caller discards orphan files and re-derives). */
  private def tryCommit(expected: Long, files: Seq[FileEntry],
                        dv: Seq[String]): Boolean = {
    val v = expected + 1
    val node: ObjectNode = mapper.createObjectNode()
    node.put("version", v)
    val fa: ArrayNode = node.putArray("files")
    files.foreach { f =>
      val fn = fa.addObject()
      fn.put("name", f.name); fn.put("bucket", f.bucket)
      if (f.stats.nonEmpty) {
        val sn = fn.putObject("stats")
        f.stats.foreach { case (c, (lo, hi)) =>
          val a = sn.putArray(c); a.add(lo); a.add(hi)
        }
      }
    }
    val da: ArrayNode = node.putArray("dv")
    dv.foreach(da.add)
    val tmp = Files.createTempFile(logDir, ".m-", ".tmp")
    Files.write(tmp, mapper.writeValueAsBytes(node))
    // createLink, NOT move: POSIX rename silently REPLACES an existing
    // target (ATOMIC_MOVE does not imply no-replace), which would let two
    // racing writers both "win". link(2) is atomic and fails with EEXIST —
    // the true create-exclusive — and the linked name appears with its
    // full content (the tmp file is already written).
    try { Files.createLink(manifestPath(v), tmp); Files.delete(tmp); true }
    catch { case _: FileAlreadyExistsException => Files.delete(tmp); false }
  }

  // ── data-file writes ────────────────────────────────────────────────────

  /** Materialize `df` into immutable uuid-named files under `files/`;
    * returns the new entries (bucket tag from the hive partition dir,
    * per-file stats from one grouped aggregate over the staged write). */
  private def writeFiles(df: DataFrame): Seq[FileEntry] = {
    val tmp = Files.createTempDirectory(rootPath, ".write-")
    bucketBy match {
      case None => df.write.mode("overwrite").parquet(tmp.toString)
      case Some((keys, _)) =>
        // one file per touched bucket, rows sorted on the keys for
        // row-group stats — the ParquetTable write discipline
        df.withColumn(BucketCol, bucketExpr)
          .repartition(col(BucketCol))
          .sortWithinPartitions((BucketCol +: keys).map(col).toIndexedSeq: _*)
          .write.mode("overwrite").partitionBy(BucketCol).parquet(tmp.toString)
    }
    val staged: Seq[(Path, Int)] = Files.walk(tmp).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).map { p =>
        val b = p.getParent.getFileName.toString match {
          case s if s.startsWith(s"$BucketCol=") =>
            s.substring(BucketCol.length + 1).toInt
          case _ => -1
        }
        (p, b)
      }.toSeq
    // per-file stats BEFORE the move (one aggregate grouped by file)
    val statsOf: Map[String, Map[String, (String, String)]] =
      if (statsBy.isEmpty || staged.isEmpty) Map.empty
      else {
        val aggs = statsBy.flatMap(c => Seq(
          min(col(c)).cast("string").as(s"__lo_$c"),
          max(col(c)).cast("string").as(s"__hi_$c")))
        spark.read.schema(schema).parquet(staged.map(_._1.toString): _*)
          .groupBy(input_file_name().as("__f"))
          .agg(aggs.head, aggs.tail: _*)
          .collect().map { r =>
            val f = r.getAs[String]("__f")
            val name = f.substring(f.lastIndexOf('/') + 1)
            name -> statsBy.flatMap { c =>
              val lo = r.getAs[String](s"__lo_$c"); val hi = r.getAs[String](s"__hi_$c")
              if (lo == null || hi == null) None else Some(c -> (lo, hi))
            }.toMap
          }.toMap
      }
    val entries = staged.map { case (p, b) =>
      val name = s"${java.util.UUID.randomUUID().toString.take(12)}-${p.getFileName}"
      Files.move(p, filesDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      FileEntry(name, b, statsOf.getOrElse(p.getFileName.toString, Map.empty))
    }
    deleteRec(tmp)
    entries
  }

  private def deleteRec(p: Path): Unit = if (Files.exists(p))
    Files.walk(p).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))

  private def dropFiles(entries: Seq[FileEntry]): Unit =
    entries.foreach(e => Files.deleteIfExists(filesDir.resolve(e.name)))

  // ── reads ───────────────────────────────────────────────────────────────

  private def emptyDf: DataFrame = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  private val DvName = "__dv_name"
  private val DvPos = "__dv_pos"

  private def readData(entries: Seq[FileEntry], dv: Seq[String]): DataFrame = {
    if (entries.isEmpty) return emptyDf
    val raw = spark.read.schema(schema)
      .parquet(entries.map(e => filesDir.resolve(e.name).toString): _*)
    val out = if (dv.isEmpty) raw
    else {
      val dvDf = spark.read.parquet(dv.map(d => filesDir.resolve(d).toString): _*)
      raw
        .withColumn(DvName,
          regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
        .withColumn(DvPos, col("_metadata.row_index"))
        .join(dvDf, Seq(DvName, DvPos), "left_anti")
        .drop(DvName, DvPos)
    }
    out.select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Live table (empty frame before the first commit). */
  def read(): DataFrame = {
    val v = currentVersion
    if (v == 0) emptyDf
    else { val m = readManifest(v); readData(m.files, m.dv) }
  }

  /** The table as of version `v` — INCLUDING that version's deletion
    * vectors (DV-aware history: every commit is a named version here). */
  def readVersion(v: Long): DataFrame = {
    val m = readManifest(v)
    readData(m.files, m.dv)
  }

  /** Manifest-stats file skipping: read only files whose [lo, hi] for `c`
    * intersects the bound (files without stats are kept — pruning is a
    * pure superset optimization); residual filter stays on the scan.
    * Works on BUCKETED tables — the composition the directory-swap
    * design's root-manifest could not serve. */
  def readRange(c: String, lo: Column, hi: Column): DataFrame = {
    require(statsBy.contains(c),
      s"no file stats for column '$c' (statsBy = ${statsBy.mkString(",")})")
    val v = currentVersion
    if (v == 0) return emptyDf.filter(col(c) >= lo && col(c) <= hi)
    val m = readManifest(v)
    val dt = schema(c).dataType
    // one overlap evaluation for ALL stats-carrying files (Spark's own
    // cast/ordering semantics); stat-less files are kept unconditionally
    val (withStats, noStats) = m.files.partition(_.stats.contains(c))
    val kept =
      if (withStats.isEmpty) m.files
      else {
        import spark.implicits._
        val statRows = withStats.map { e =>
          val (fLo, fHi) = e.stats(c); (e.name, fLo, fHi)
        }.toDF("__name", "__lo", "__hi")
        val surviving = statRows.filter(
            col("__hi").cast(dt) >= lo.cast(dt) && col("__lo").cast(dt) <= hi.cast(dt))
          .select("__name").collect().map(_.getString(0)).toSet
        noStats ++ withStats.filter(e => surviving.contains(e.name))
      }
    readData(kept, m.dv).filter(col(c) >= lo && col(c) <= hi)
  }

  /** Number of files the live version references (spec hook). */
  def liveFileNames(): Seq[String] = {
    val v = currentVersion
    if (v == 0) Seq.empty else readManifest(v).files.map(_.name).sorted
  }

  // ── commits ─────────────────────────────────────────────────────────────

  /** Generic optimistic commit loop: derive the new manifest from the
    * current snapshot, CAS it in; on a lost race discard the orphan files
    * and re-derive against the new snapshot. `derive` returning None means
    * "nothing to commit" (no version is cut). Returns attempts. */
  private def commitLoop(maxAttempts: Int)
                        (derive: Option[Manifest] => Option[(Seq[FileEntry], Seq[String], Seq[FileEntry])])
      : Int = {
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      val v = currentVersion
      val snap = if (v == 0) None else Some(readManifest(v))
      derive(snap) match {
        case None => return attempts
        case Some((files, dv, fresh)) =>
          if (tryCommit(v, files, dv)) return attempts
          dropFiles(fresh)
      }
    }
    throw new IllegalStateException(
      s"commit lost the race $maxAttempts times — writer storm; raise maxAttempts")
  }

  /** Replace the table content (cuts a new version). */
  def overwrite(df: DataFrame): Unit =
    commitLoop(5) { _ =>
      val fresh = writeFiles(df)
      Some((fresh, Seq.empty, fresh))
    }

  /** Append-only write: prior files + the new ones, DVs carried forward. */
  def append(df: DataFrame): Unit =
    commitLoop(5) { snap =>
      val fresh = writeFiles(df)
      Some((snap.map(_.files).getOrElse(Seq.empty) ++ fresh,
        snap.map(_.dv).getOrElse(Seq.empty), fresh))
    }

  /** MERGE: unbucketed = full rewrite of `f(live, batch)`; bucketed = the
    * partition-scoped form — only buckets whose keys appear in the batch
    * are re-derived and replaced in the manifest, untouched buckets keep
    * their files byte-identical AND every version stays readable (the
    * composition the rename design rejects). `f` must be keyed (rows never
    * migrate buckets — the [[ParquetTable.merge]] contract). DV entries
    * referencing replaced files simply stop matching (the rewrite
    * materialized them). */
  def merge(batch: DataFrame)(f: (DataFrame, DataFrame) => DataFrame): Unit =
    bucketBy match {
      case None => commitLoop(5) { snap =>
        val cur = snap.map(m => readData(m.files, m.dv)).getOrElse(emptyDf)
        val fresh = writeFiles(f(cur, batch))
        Some((fresh, Seq.empty, fresh))
      }
      case Some(_) => commitLoop(5) { snap =>
        val touched = batch.select(bucketExpr.as(BucketCol))
          .distinct().collect().map(_.getInt(0)).toSet
        val (hit, kept) = snap.map(_.files).getOrElse(Seq.empty)
          .partition(e => touched.contains(e.bucket))
        val dv = snap.map(_.dv).getOrElse(Seq.empty)
        val cur = if (hit.isEmpty) emptyDf else readData(hit, dv)
        val fresh = writeFiles(f(cur, batch))
        Some((kept ++ fresh, dv, fresh))
      }
    }

  /** Merge-on-read DELETE as a NAMED COMMIT: the new version's manifest
    * carries the same data files plus one more positions sidecar, so the
    * delete is time-travelable ("AS OF" the pre-delete version resurrects,
    * the delete's own version stays deleted). No data file is touched.
    * Returns rows newly deleted (0 ⇒ no commit cut). */
  def deleteWhere(cond: Column): Long = {
    var deleted = 0L
    commitLoop(5) { snap =>
      snap match {
        case None => deleted = 0L; None // empty table: nothing to commit
        case Some(m) =>
          val live = readDataWithPos(m).filter(cond)
            .select(col(DvName), col(DvPos)).localCheckpoint(true)
          deleted = live.count()
          if (deleted == 0) None // no matches: no version cut
          else {
            val tmp = Files.createTempDirectory(rootPath, ".write-")
            live.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
            val part = Files.walk(tmp).iterator().asScala
              .find(_.toString.endsWith(".parquet")).get
            val name = s"dv-${java.util.UUID.randomUUID().toString.take(12)}.parquet"
            Files.move(part, filesDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
            deleteRec(tmp)
            Some((m.files, m.dv :+ name, Seq.empty))
          }
      }
    }
    deleted
  }

  private def readDataWithPos(m: Manifest): DataFrame = {
    val raw = spark.read.schema(schema)
      .parquet(m.files.map(e => filesDir.resolve(e.name).toString): _*)
      .withColumn(DvName, regexp_extract(col("_metadata.file_path"), "([^/]+)$", 1))
      .withColumn(DvPos, col("_metadata.row_index"))
    if (m.dv.isEmpty) raw
    else raw.join(
      spark.read.parquet(m.dv.map(d => filesDir.resolve(d).toString): _*),
      Seq(DvName, DvPos), "left_anti")
  }

  /** OCC merge: the commit loop IS the protocol — staging runs lock-free
    * against an immutable snapshot (which cannot vanish mid-stage, unlike
    * the rename design), the manifest CAS serializes. Returns attempts. */
  def occMerge(batch: DataFrame, maxAttempts: Int = 5)
              (f: (DataFrame, DataFrame) => DataFrame): Int =
    commitLoop(maxAttempts) { snap =>
      val cur = snap.map(m => readData(m.files, m.dv)).getOrElse(emptyDf)
      val fresh = writeFiles(f(cur, batch))
      Some((fresh, Seq.empty, fresh))
    }

  /** Roll FORWARD to the content of version `v` (history preserved). */
  def restore(v: Long): Unit = overwrite(readVersion(v))

  /** Retention GC: keep the newest `retainLast` versions' manifests; drop
    * older manifests and every file no retained version references —
    * including orphans from crashed writes (staged files whose commit
    * never landed). Reads of vacuumed versions fail loudly. */
  def vacuum(retainLast: Int = 1): Seq[Long] = {
    require(retainLast >= 1, "must retain at least the live version")
    val hs = history()
    val (drop, keep) = hs.splitAt(math.max(0, hs.size - retainLast))
    val referenced: Set[String] = keep.flatMap { v =>
      val m = readManifest(v)
      m.files.map(_.name) ++ m.dv
    }.toSet
    drop.foreach(v => Files.deleteIfExists(manifestPath(v)))
    Files.list(filesDir).iterator().asScala.toSeq
      .filterNot(p => referenced.contains(p.getFileName.toString))
      .foreach(Files.deleteIfExists(_))
    // crashed-write leftovers (temp dirs that never committed)
    Files.list(rootPath).iterator().asScala.toSeq
      .filter(_.getFileName.toString.startsWith(".write-"))
      .foreach(deleteRec)
    drop
  }
}
