package graft.merge

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructType}

/** A managed table = a parquet directory, with atomic-enough rewrite-and-swap
  * for MERGE results (SURVEY.md §7.3 — Delta-less upsert persistence).
  *
  * Layout: `root/current/` holds the live data; a rewrite writes to
  * `root/.staging-<n>/` then swaps directories. Readers that grabbed the old
  * `current` keep reading their already-opened files (POSIX semantics) —
  * adequate for a single-writer pipeline, which is exactly the reference's
  * model (one streaming query owns each table,
  * `Silver/05-silver.py:486-503`).
  *
  * ==Bucketed layout — the 100 TB merge path==
  * With `bucketBy = Some((keys, n))`, data lives in hive-style partitions
  * `current/__bucket=K/` where K = pmod(xxhash64(keys), n). A [[merge]] then
  * rewrites ONLY the buckets whose keys appear in the batch — O(touched
  * partitions), not O(table) — which is the file-skipping property the
  * reference gets from Delta MERGE (`Silver/05-silver.py:11-13`). Safe
  * because every merge flavor in [[Merge]] is keyed: an output row's key
  * (hence bucket) comes from the target or batch row that produced it, so
  * rows never migrate across buckets, and untouched bucket directories are
  * left physically untouched (byte-identical files — see
  * MergePropertiesSpec).
  *
  * At cluster scale the same protocol works over any filesystem with atomic
  * rename (HDFS, most object-store committers); the swap cost is O(1) per
  * touched bucket because data files are never copied.
  *
  * ==Time travel (`keepVersions > 0`)==
  * The Delta `VERSION AS OF` analog: each [[overwrite]]/[[merge]] cuts a new
  * version, and the previous `current` is RETIRED INTO `root/.v-<gen>`
  * instead of deleted (rename only — no data copied). [[readVersion]] reads
  * a retained version, [[history]] lists what is readable, and retention
  * prunes to the newest `keepVersions` retained dirs. Each written tree
  * carries a `_gen` marker file (underscore-prefixed → invisible to Spark's
  * file index) so version identity survives process restarts.
  *
  * Unbucketed tables only: a bucketed merge swaps individual bucket
  * directories, so its historical state is an OVERLAY of per-bucket
  * generations — reconstructing "the table as of version v" needs a commit
  * log mapping versions to file sets, which is precisely the Delta/Iceberg
  * metadata design and out of scope for this directory-swap table. The
  * constructor rejects the combination loudly rather than serving wrong
  * history.
  */
object ParquetTable {
  // per-root commit locks for the OCC CAS (in-JVM multi-writer; a cluster
  // deployment replaces this with the commit log's atomic putIfAbsent)
  private val commitLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private[merge] def lockFor(root: Path): Object =
    commitLocks.computeIfAbsent(root.toAbsolutePath.normalize.toString,
      _ => new Object)
  // OCC staging names must be unique ACROSS writer instances (each instance
  // counts `gen` from the same directory listing, so two concurrent stagers
  // would otherwise collide on `.staging-N` and corrupt each other's tree)
  private val occSeq = new java.util.concurrent.atomic.AtomicLong()
}

final class ParquetTable(spark: SparkSession, root: String, schema: StructType,
                         bucketBy: Option[(Seq[String], Int)] = None,
                         keepVersions: Int = 0,
                         checks: Seq[(String, String)] = Nil,
                         statsBy: Seq[String] = Nil) {
  require(statsBy.isEmpty || bucketBy.isEmpty,
    "file-stats manifests (statsBy) require an unbucketed table: bucketed " +
      "merges swap per-bucket directories, so an atomic root manifest needs " +
      "per-bucket manifests (the same commit-log design the time-travel " +
      "restriction cites) — bucketed tables already prune by bucket key and " +
      "carry sorted row-group stats on the merge keys")
  require(keepVersions == 0 || bucketBy.isEmpty,
    "time travel (keepVersions > 0) requires an unbucketed table: bucketed " +
      "merges swap per-bucket, so version reconstruction needs a commit log " +
      "(the Delta design) — see the class scaladoc")
  private val rootPath: Path = Paths.get(root)
  private val current: Path = rootPath.resolve("current")

  Files.createDirectories(rootPath)

  // declared before `gen` — its initializer reads the marker
  private val GenMarker = "_gen"
  private def markerOf(dir: Path): Option[Long] = {
    val m = dir.resolve(GenMarker)
    if (Files.exists(m)) Some(new String(Files.readAllBytes(m), "UTF-8").trim.toLong)
    else None
  }

  // Resume generation numbering past any .staging-*/.retired-*/.v-* left by
  // a crashed or prior run: starting at 0 would make the next swap's
  // ATOMIC_MOVE hit FileAlreadyExistsException on the leftover directory and
  // wedge the table. Leftovers are kept (not auto-deleted) — a crash
  // mid-swapBuckets leaves a mixed-generation table whose recovery is an
  // operator decision; the bucketed swap is per-bucket atomic, not
  // all-or-nothing (see [[merge]]).
  @volatile private var gen: Long = {
    import scala.jdk.CollectionConverters._
    val GenDir = """\.(?:staging|retired|v)-(\d+)""".r
    Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case GenDir(n) => n.toLong }
      .foldLeft(0L)(math.max)
      .max(markerOf(current).getOrElse(0L))
  }

  private val BucketCol = "__bucket"
  private def bucketExpr: Column = {
    val (keys, n) = bucketBy.get
    pmod(xxhash64(keys.map(col).toIndexedSeq: _*), lit(n)).cast("int")
  }
  private def diskSchema: StructType =
    if (bucketBy.isEmpty) schema else schema.add(BucketCol, IntegerType)

  def exists: Boolean = Files.exists(current)

  /** Read the live table (empty frame with the right schema if never written).
    * Deleted positions ([[deleteWhere]]) are filtered out — merge-on-read. */
  def read(): DataFrame = applyDv(readRaw()).select(schema.fieldNames.map(col).toIndexedSeq: _*)

  /** Range scan through the file-stats manifest ([[graft.ops.DataSkipping]]):
    * reads ONLY files whose min/max interval for `c` intersects `[lo, hi]`
    * — requires `c` ∈ `statsBy`. Result ≡ `read().filter(c between lo hi)`;
    * only the files touched differ. */
  def readRange(c: String, lo: Column, hi: Column): DataFrame = {
    require(statsBy.contains(c),
      s"no file stats for column '$c' (statsBy = ${statsBy.mkString(",")})")
    if (!exists) read().filter(col(c) >= lo && col(c) <= hi)
    else applyDv(graft.ops.DataSkipping.readRange(spark, current.toString, c, lo, hi))
      .select(schema.fieldNames.map(col).toIndexedSeq: _*)
  }

  /** Live table including the bucket partition column (when bucketed) —
    * filters on [[BucketCol]] prune partition directories at the source. */
  private def readRaw(): DataFrame =
    if (exists) spark.read.schema(diskSchema).parquet(current.toString)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], diskSchema)

  // ==Deletion vectors — merge-on-read DELETE (the Delta deletion-vectors
  // analog)==
  // A DELETE writes only the POSITIONS of deleted rows into a tiny sidecar
  // (`current/_dv/`, underscore-prefixed → invisible to Spark's file index),
  // leaving every data file byte-identical — the write-amplification killer
  // for GDPR erasure / retention sweeps at 100 TB, where a copy-on-write
  // delete rewrites whole files to drop a few rows. Every read path then
  // subtracts the positions with a (file, row_index) anti-join; AQE
  // broadcasts the sidecar while it is small, which is the join-shaped
  // analog of Delta's scan-time roaring-bitmap filter. Deletes are
  // MATERIALIZED (files rewritten, sidecar cleared) only when the table
  // owner chooses — [[materializeDeletes]], or implicitly by any
  // rewrite-and-swap verb, exactly like OPTIMIZE on a DV-carrying Delta
  // table.
  //
  // Positions key on the file's path RELATIVE to the table dir (the part
  // after "current/"), so hardlink clones ([[cloneTo]]) and bucket swaps
  // keep DV entries valid without path rewriting; entries referencing
  // files retired by a later rewrite simply stop matching (the rewrite
  // already materialized them). Row indexes come from the parquet reader's
  // `_metadata.row_index` — stable per file, the same identity Delta DVs
  // bind to.
  private val DvDir = "_dv"
  private val DvFile = "__dv_file"
  private val DvPos = "__dv_pos"
  private def dvStore: Path = current.resolve(DvDir)

  /** Number of live deleted positions in the sidecar (0 = no DVs). */
  def deletedPositions: Long =
    if (!Files.exists(dvStore)) 0L
    else spark.read.parquet(dvStore.toString).count()

  private def withFilePos(df: DataFrame): DataFrame = df
    .withColumn(DvFile, regexp_extract(col("_metadata.file_path"), "^.*/current/(.*)$", 1))
    .withColumn(DvPos, col("_metadata.row_index"))

  private def dvFrame: Option[DataFrame] =
    if (Files.exists(dvStore)) Some(spark.read.parquet(dvStore.toString)) else None

  /** Subtract deleted positions from a file-source scan of `current`. */
  private def applyDv(raw: DataFrame): DataFrame = dvFrame match {
    case None => raw
    case Some(dv) =>
      withFilePos(raw).join(dv, Seq(DvFile, DvPos), "left_anti").drop(DvFile, DvPos)
  }

  /** Merge-on-read DELETE: record the positions of live rows matching `cond`
    * in the sidecar; no data file is touched. Returns the number of rows
    * newly deleted (rows already DV-deleted never re-match — `cond` is
    * evaluated against the merge-on-read view).
    *
    * ==Composition with time travel (`keepVersions > 0`)==
    * A DV delete is a SUB-VERSION commit: it bumps [[commitToken]] but cuts
    * no named version — named versions are overwrite boundaries, and every
    * version's tree is freshly written at cut time (sidecar-free), so a
    * version's content IS its raw tree. `VERSION AS OF v` therefore shows
    * v's content as of its cut: rows DV-deleted later correctly RESURRECT
    * in the historical read (in Delta the delete is a later version) while
    * the live read keeps them deleted. No extra mechanism is needed — the
    * retirement rename carries the `_dv` sidecar inside the `.v-*` tree,
    * where [[readVersion]]'s file scan never sees it (underscore-prefixed),
    * and [[readVersion]] of the LIVE version reads the raw tree for the
    * same reason. DV deletes surface in [[changeFeed]] only at the next
    * overwrite boundary (snapshot diffs compare named versions), and
    * [[restore]] to a pre-delete version resurrects — both the Delta
    * behaviors. DeletionVectorSpec pins the composition.
    *
    * Cost at scale: one partition-parallel scan evaluating `cond` (data
    * skipping still prunes it) + a positions-only write, O(matches). */
  def deleteWhere(cond: Column): Long = {
    if (!exists) 0L
    else {
      val live = applyDvKeepPos(withFilePos(readRaw()))
      val hits = live.filter(cond).select(col(DvFile), col(DvPos)).persist()
      val n = hits.count()
      if (n > 0) {
        // one sidecar file per delete wave (LogTable.deleteWhere's rule):
        // positions are two narrow columns, and inheriting the scan/join
        // partitioning fans the sidecar into per-wave slivers that every
        // subsequent read's anti-join must open (guide §6 small files)
        hits.coalesce(1).write.mode(SaveMode.Append).parquet(dvStore.toString)
        bumpCommits() // a DV delete IS a committed content change
      }
      hits.unpersist()
      n
    }
  }

  /** Keyed merge-on-read DELETE (the `MERGE ... WHEN MATCHED THEN DELETE`
    * arm in DV form): delete live rows whose `keys` appear in `batch`.
    * The batch joins the position scan directly — never collected — so
    * erasure-request batches of any size stay distributed. */
  def deleteMatched(batch: DataFrame, keys: Seq[String]): Long = {
    if (!exists) 0L
    else {
      val live = applyDvKeepPos(withFilePos(readRaw()))
      val hits = live.join(batch.select(keys.map(col).toIndexedSeq: _*).distinct(), keys)
        .select(col(DvFile), col(DvPos)).persist()
      val n = hits.count()
      if (n > 0) {
        // one sidecar file per erasure batch (see deleteWhere)
        hits.coalesce(1).write.mode(SaveMode.Append).parquet(dvStore.toString)
        bumpCommits() // a DV delete IS a committed content change
      }
      hits.unpersist()
      n
    }
  }

  private def applyDvKeepPos(withPos: DataFrame): DataFrame = dvFrame match {
    case None     => withPos
    case Some(dv) => withPos.join(dv, Seq(DvFile, DvPos), "left_anti")
  }

  /** Rewrite the table without its deleted rows and clear the sidecar (the
    * OPTIMIZE half of the DV lifecycle). One rewrite-and-swap; the staged
    * tree carries no `_dv`, so the swap retires data and sidecar together —
    * readers never see a cleared sidecar over un-rewritten files. */
  def materializeDeletes(): Unit = if (deletedPositions > 0) overwrite(read())

  /** CHECK-constraint enforcement (the Delta `ALTER TABLE ADD CONSTRAINT`
    * analog): every write path runs the row through `assert_true`, so a
    * violating row fails the WRITE JOB loudly — naming the constraint —
    * before any file lands in staging (the swap never happens, the table
    * is untouched). Single pass, fully distributed, rides the write scan;
    * no separate validation job. NULL results PASS, matching SQL CHECK
    * semantics (`NOT NULL` is spelled `"c IS NOT NULL"`). */
  private def enforced(df: DataFrame): DataFrame =
    checks.foldLeft(df) { case (d, (name, sql)) =>
      d.filter(assert_true(coalesce(expr(sql), lit(true)),
        lit(s"CHECK constraint '$name' violated: $sql")).isNull)
    }

  private def writeTo(df0: DataFrame, dest: Path, mode: SaveMode): Unit = {
   val df = enforced(df0)
   bucketBy match {
    case None => df.write.mode(mode).parquet(dest.toString)
    case Some((keys, _)) =>
      // one shuffle keyed by bucket → ~one file per touched bucket (without
      // it every task writes a sliver into every bucket directory).
      // Sort within each bucket on the merge keys: parquet then records
      // tight per-row-group min/max stats on the keys, so a keyed scan
      // (merge probes, point lookups) skips whole row groups — the
      // SCAN-side half of the Delta file-skipping story, on top of the
      // bucket-directory pruning (PlanAuditSpec pins both).
      df.withColumn(BucketCol, bucketExpr)
        .repartition(col(BucketCol))
        .sortWithinPartitions((BucketCol +: keys).map(col).toIndexedSeq: _*)
        .write.mode(mode).partitionBy(BucketCol).parquet(dest.toString)
   }
  }

  /** Schema evolution (the Delta `mergeSchema` analog): return a handle on
    * the SAME table directory with a widened schema. Enforces Delta's
    * additive rules — every existing column keeps its name and type; new
    * columns are appended — and fails loudly on drops, renames, or type
    * changes (those require a rewrite, which is [[overwrite]]'s job).
    *
    * No data moves: existing files are untouched (byte-identical — see
    * SchemaEvolutionSpec) and are read NULL-FILLED for the new columns,
    * because every read path pins the table schema explicitly
    * (`spark.read.schema(...)`), which is exactly how Delta serves
    * pre-evolution files. Subsequent writes carry the new columns. At
    * 100 TB this is the only affordable way to add a column — a backfill
    * rewrite of the table is a policy decision, not a schema operation. */
  def evolve(wider: StructType): ParquetTable = {
    schema.fields.foreach { f =>
      val nf = wider.fields.find(_.name == f.name).getOrElse(
        throw new IllegalArgumentException(
          s"schema evolution is additive-only: existing column '${f.name}' missing " +
            "from the evolved schema (drops/renames need a rewrite)"))
      require(nf.dataType == f.dataType,
        s"schema evolution cannot change types: '${f.name}' ${f.dataType.simpleString} " +
          s"-> ${nf.dataType.simpleString} (type changes need a rewrite)")
    }
    new ParquetTable(spark, root, wider, bucketBy, keepVersions, checks, statsBy)
  }

  /** All parquet basenames under `dir`, recursive (bucketed tables nest one
    * `__bucket=K/` level) — the snapshot file set for the OCC classifier's
    * bare-name FNF face. */
  private def parquetBasenames(dir: Path): Set[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(dir)) Set.empty
    else {
      val s = Files.walk(dir)
      try s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.endsWith(".parquet")).toSet
      finally s.close()
    }
  }

  private def listParquet(dir: Path): Set[String] = {
    import scala.jdk.CollectionConverters._
    if (!Files.exists(dir)) Set.empty
    else Files.list(dir).iterator().asScala.map(_.getFileName.toString)
      .filter(_.endsWith(".parquet")).toSet
  }

  /** Append-only write (bronze layer): plain parquet append, no swap. With
    * `statsBy`, the file-stats manifest is maintained INCREMENTALLY — stats
    * computed over the newly added files only (O(batch), never a table
    * rescan — the Delta write-path behavior). */
  def append(df: DataFrame): Unit = {
    Files.createDirectories(current)
    val before = if (statsBy.isEmpty) Set.empty[String] else listParquet(current)
    writeTo(df, current, SaveMode.Append)
    if (statsBy.nonEmpty) {
      val added = (listParquet(current) -- before).toSeq.sorted
      graft.ops.DataSkipping.appendStats(spark, current.toString, statsBy, added)
    }
    bumpCommits()
  }

  /** Replace table content with `df` via write-to-staging + directory swap.
    * `df` may read from the live `current` (merge results do): the staging
    * write materializes it fully before anything is moved. */
  def overwrite(df: DataFrame): Unit = {
    gen += 1
    val staging = rootPath.resolve(s".staging-$gen")
    writeTo(df, staging, SaveMode.Overwrite)
    // manifest built on STAGING so data + stats swap in together — readers
    // never see a manifest describing the other generation
    if (statsBy.nonEmpty)
      graft.ops.DataSkipping.collectStats(spark, staging.toString, statsBy)
    if (keepVersions > 0)
      Files.write(staging.resolve(GenMarker), gen.toString.getBytes("UTF-8"))
    swapIn(staging, gen.toString)
  }

  /** The commit point of every full rewrite: retire `current`, move the
    * staged tree in. All content-changing verbs funnel through here (or
    * [[swapBuckets]] / the DV sidecar writes), each of which bumps the
    * commit token [[commitToken]]. */
  private def swapIn(staging: Path, retireSuffix: String): Unit = {
    if (Files.exists(current)) {
      val prev = markerOf(current).getOrElse(0L)
      if (keepVersions > 0 && prev > 0)
        // retain: rename-only retirement into the version store
        Files.move(current, rootPath.resolve(s".v-$prev"),
          StandardCopyOption.ATOMIC_MOVE)
      else {
        val retired = rootPath.resolve(s".retired-$retireSuffix")
        Files.move(current, retired, StandardCopyOption.ATOMIC_MOVE)
        cleanup(retired)
      }
    }
    Files.move(staging, current, StandardCopyOption.ATOMIC_MOVE)
    pruneVersions()
    bumpCommits()
  }

  // ==Optimistic concurrency — the Delta multi-writer commit protocol==
  // Every committed change bumps a monotone token (`root/_commits`). An OCC
  // writer STAGES its merge optimistically against the snapshot it read,
  // then COMMITS with a compare-and-swap on the token: unchanged → swap in;
  // changed → discard the staged tree and re-derive against the new
  // snapshot (Delta's "logical conflict re-attempt"). Staging — the
  // expensive distributed work — runs with NO lock held; only the token
  // check + directory rename is serialized (per root, in-JVM here; on a
  // real deployment the same CAS is the commit log's putIfAbsent, e.g. an
  // atomic object-store PUT of version N+1).
  private val CommitsFile = "_commits"

  /** Monotone count of committed changes to this table (any writer). */
  def commitToken: Long = {
    val f = rootPath.resolve(CommitsFile)
    if (Files.exists(f)) new String(Files.readAllBytes(f), "UTF-8").trim.toLong
    else 0L
  }

  private def bumpCommits(): Unit =
    // read-modify-write under the root's commit lock (concurrent appends or
    // DV deletes from sibling writer handles must not lose bumps);
    // write-then-atomic-rename so a concurrent reader never sees a torn file
    ParquetTable.lockFor(rootPath).synchronized {
      val tmp = rootPath.resolve(s".$CommitsFile-tmp-${Thread.currentThread().getId}")
      Files.write(tmp, (commitToken + 1).toString.getBytes("UTF-8"))
      Files.move(tmp, rootPath.resolve(CommitsFile),
        StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
    }

  /** A staged-but-uncommitted merge: the materialized result tree plus the
    * commit token of the snapshot it was derived from. */
  final case class Staged private[merge] (stagingDir: Path, expectedToken: Long,
                                          retireSuffix: String)

  /** Stage a merge optimistically: materialize `f(snapshot, batch)` into a
    * staging tree WITHOUT committing. Unbucketed tables only (a bucketed
    * conflict check must compare touched-bucket sets — the commit-log
    * design, out of scope with the same argument as time travel). */
  def stageMerge(batch: DataFrame,
                 onSnapshot: Set[String] => Unit = _ => ())
                (f: (DataFrame, DataFrame) => DataFrame): Staged = {
    require(bucketBy.isEmpty,
      "OCC staging needs an unbucketed table: bucketed conflict detection " +
        "compares touched-bucket sets, which needs a commit log (see scaladoc)")
    require(keepVersions == 0,
      "OCC staging needs an unversioned table: multi-writer version " +
        "identity needs the commit log (same argument as time travel)")
    val expected = commitToken
    // basename capture sits right against read()'s file-index resolution
    // inside writeTo's plan (r14 ADVICE): a swap landing between occMerge's
    // loop prologue and here would otherwise leave the classifier holding a
    // basename set from a snapshot this attempt never read
    onSnapshot(
      try parquetBasenames(current) catch { case _: Throwable => Set.empty[String] })
    // occSeq (JVM-wide), not `gen`: sibling writer handles count gen from
    // the same directory listing and would collide on the staging name
    val suffix = s"occ${ParquetTable.occSeq.incrementAndGet()}"
    val staging = rootPath.resolve(s".staging-$suffix")
    writeTo(f(read(), batch), staging, SaveMode.Overwrite)
    if (statsBy.nonEmpty)
      graft.ops.DataSkipping.collectStats(spark, staging.toString, statsBy)
    Staged(staging, expected, suffix)
  }

  /** Compare-and-swap commit of a staged merge: if no other commit landed
    * since the stage's snapshot, swap it in and return true; otherwise
    * discard the staged tree and return false (caller re-stages against the
    * new snapshot). Only this token-check-plus-rename is serialized. */
  def commitStaged(s: Staged): Boolean = ParquetTable.lockFor(rootPath).synchronized {
    if (commitToken != s.expectedToken) { cleanup(s.stagingDir); false }
    else { swapIn(s.stagingDir, s.retireSuffix); true }
  }

  /** OCC merge loop: stage → CAS-commit → on conflict re-stage from the
    * fresh snapshot. Returns the number of attempts (1 = no contention).
    * Serializable by construction: the committed result is always
    * `f(latest-committed-snapshot, batch)`. */
  def occMerge(batch: DataFrame, maxAttempts: Int = 5)
              (f: (DataFrame, DataFrame) => DataFrame): Int = {
    var attempts = 0
    while (attempts < maxAttempts) {
      attempts += 1
      // A stale snapshot can VANISH mid-stage (the winner's commit retires
      // the files this stage is reading — rename-based swap, so paths die).
      // That is a conflict, not an error: retry against the new snapshot.
      // A log-backed deployment never hits this (data files are immutable
      // until VACUUM); it is the price of the directory-swap local form.
      // The basename set of the snapshot THIS attempt stages from lets the
      // classifier recognize an FNF face that carries only a bare filename
      // (r13 ADVICE) without ever matching a foreign file's name. stageMerge
      // captures the set at the moment its read() resolves (r14 ADVICE).
      val attemptFiles =
        new java.util.concurrent.atomic.AtomicReference(Set.empty[String])
      val staged =
        try Some(stageMerge(batch, attemptFiles.set)(f))
        catch { case e: Throwable if snapshotVanished(e, attemptFiles.get) => None }
      if (staged.exists(commitStaged)) return attempts
    }
    throw new IllegalStateException(
      s"OCC merge lost the commit race $maxAttempts times — livelock or a " +
        "writer storm; raise maxAttempts or serialize these writers")
  }

  // Conflict classification must cover every face the vanished-snapshot race
  // wears: FileNotFoundException (scan hits a retired file), Spark's
  // FAILED_READ_FILE.FILE_NOT_EXIST wrapper, AND analysis-time PATH_NOT_FOUND
  // — swapIn's two renames leave a window where `current` itself is absent,
  // so a concurrent stager's read() can fail BEFORE any file is opened.
  // (Observed: a racing-writers stream died un-retried on exactly that.)
  // The match is NARROW on both axes (ADVICE r12): the Spark faces are
  // recognized by ERROR CLASS (not a substring anywhere in any message —
  // a caller's own error text mentioning PATH_NOT_FOUND must not read as a
  // conflict), and every face must reference a path UNDER THIS TABLE'S
  // ROOT — a genuinely missing foreign path (mistyped source dir, a file
  // read inside the caller's merge function) is a real error, and retrying
  // it to exhaustion would surface as a misleading "writer storm".
  // `snapshotFiles` (r13 ADVICE): the parquet BASENAMES of the snapshot the
  // failed attempt staged from — an FNF whose message carries only a bare
  // filename (no path) still classifies when that name is one of the files
  // the attempt was reading, and ONLY then; a caller's foreign bare-name FNF
  // can't match because its name is not in this table's snapshot.
  private[merge] def snapshotVanished(e: Throwable,
      snapshotFiles: Set[String] = Set.empty): Boolean = {
    val rootStr = rootPath.toAbsolutePath.toString
    def underRoot(m: String): Boolean = m.contains(rootStr)
    // TOKEN-boundary mention (r14 ADVICE): a snapshot basename must appear
    // bounded by non-filename characters (or string edges) — a caller-side
    // error whose text merely embeds the basename inside a longer token
    // (`...part-0001.parquet.bak`, `prefix-part-0001.parquet`) is NOT a
    // mention of the snapshot file and must not classify as a conflict.
    def nameChar(ch: Char): Boolean =
      ch.isLetterOrDigit || ch == '.' || ch == '_' || ch == '-'
    def mentionsName(m: String, n: String): Boolean = {
      var idx = m.indexOf(n)
      while (idx >= 0) {
        val before = idx == 0 || !nameChar(m.charAt(idx - 1))
        val end = idx + n.length
        val after = end >= m.length || !nameChar(m.charAt(end))
        if (before && after) return true
        idx = m.indexOf(n, idx + 1)
      }
      false
    }
    var c = e
    while (c != null) {
      val m = Option(c.getMessage).getOrElse("")
      val vanished = c match {
        case _: java.io.FileNotFoundException =>
          underRoot(m) || snapshotFiles.exists(n => mentionsName(m, n))
        case st: org.apache.spark.SparkThrowable =>
          // by error class when carried; by the BRACKETED class marker in
          // the message otherwise (task-failure wrappers re-render the
          // class into the text without chaining it — the r12b s35 face)
          val ec = Option(st.getCondition).getOrElse("")
          (ec == "FAILED_READ_FILE.FILE_NOT_EXIST" || ec == "PATH_NOT_FOUND" ||
            m.contains("[FAILED_READ_FILE.FILE_NOT_EXIST]") ||
            m.contains("[PATH_NOT_FOUND]")) && underRoot(m)
        case _ => false
      }
      if (vanished) return true
      c = c.getCause
    }
    false
  }

  /** Generation number of the live table (0 = never overwritten or history
    * disabled before the first retained write). */
  def currentVersion: Long = markerOf(current).getOrElse(0L)

  /** Readable versions, ascending — retained `.v-*` dirs plus the live one. */
  def history(): Seq[Long] = {
    import scala.jdk.CollectionConverters._
    val VDir = """\.v-(\d+)""".r
    val retained = Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString).collect { case VDir(n) => n.toLong }.toSeq
    (retained ++ Some(currentVersion).filter(_ > 0)).sorted
  }

  /** Read the table as of version `v` (Delta `VERSION AS OF` analog). Fails
    * loudly for versions never cut or already pruned by retention.
    * Version content is pinned at CUT time: DV deletes made since are later
    * sub-version commits, so the live version too is served from the raw
    * tree WITHOUT the sidecar (see [[deleteWhere]]'s composition note). */
  def readVersion(v: Long): DataFrame = {
    if (v == currentVersion)
      readRaw().select(schema.fieldNames.map(col).toIndexedSeq: _*)
    else {
      val dir = rootPath.resolve(s".v-$v")
      require(Files.exists(dir),
        s"version $v not available; readable versions: ${history().mkString(", ")}")
      spark.read.schema(diskSchema).parquet(dir.toString)
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
    }
  }

  /** Restore the table to the content of version `v` (the Delta `RESTORE
    * TABLE ... TO VERSION AS OF` analog). Like Delta, restore is a ROLL
    * FORWARD: it cuts a NEW version whose content equals `v`, so history is
    * preserved (the bad versions remain readable for forensics until
    * retention prunes them) and a restore is itself undoable. Cost is one
    * rewrite of the restored content — Delta's metadata-only restore needs
    * the commit log this table's scaladoc scopes out. Requires
    * `keepVersions > 0` (restore without retained versions is overwrite). */
  def restore(v: Long): Unit = {
    require(keepVersions > 0, "restore needs a versioned table (keepVersions > 0)")
    require(history().contains(v),
      s"version $v not available; readable versions: ${history().mkString(", ")}")
    overwrite(readVersion(v))
  }

  /** Change data feed between two readable versions (Delta
    * `table_changes(from, to)` analog): for every adjacent version pair in
    * `(fromV, toV]` emit the row-level delta, tagged `_change_type` ∈
    * {insert, delete, update_preimage, update_postimage} and
    * `_commit_version` = the later version of the pair.
    *
    * This directory-swap table has no commit log recording row-level
    * changes, so the feed is computed as a keyed SNAPSHOT DIFF — the same
    * strategy Iceberg's `create_changelog_view` uses for copy-on-write
    * tables: per pair, one full-outer shuffle join of the two snapshots on
    * `keys`, unmatched-left → delete, unmatched-right → insert, matched
    * with any non-key difference → pre+post image pair. Cost is
    * O(|v| + |v+1|) per pair, fully partition-parallel, no driver state;
    * a log-backed CDF (Delta's) reads only changed files, which is exactly
    * the metadata this table's scaladoc scopes out. `keys` must be a
    * primary key of every version involved (all [[Merge]] flavors keep key
    * uniqueness); duplicate keys within a snapshot would fan the join out.
    *
    * The classification runs in ONE pass over the joined pair: each row
    * emits an array of 0–2 tagged images (unchanged matches are filtered by
    * null-safe struct equality before the explode), so no branch re-reads
    * the join. */
  def changes(fromV: Long, toV: Long, keys: Seq[String]): DataFrame = {
    val vs = history().filter(v => v >= fromV && v <= toV)
    require(vs.headOption.contains(fromV) && vs.lastOption.contains(toV) && fromV < toV,
      s"changes($fromV, $toV) needs both endpoints readable and fromV < toV; " +
        s"readable versions: ${history().mkString(", ")}")
    val dataCols = schema.fieldNames.toIndexedSeq
    vs.sliding(2).map { case Seq(a, b) =>
      val pre  = readVersion(a).select(keys.map(col) :+
        struct(dataCols.map(col): _*).as("_pre"): _*)
      val post = readVersion(b).select(keys.map(col) :+
        struct(dataCols.map(col): _*).as("_post"): _*)
      pre.join(post, keys, "full_outer")
        .filter(!(col("_pre") <=> col("_post"))) // drops unchanged matches; null <=> row is false
        .select(explode(
          when(col("_pre").isNull,
            array(struct(col("_post").as("img"), lit("insert").as("ct"))))
          .when(col("_post").isNull,
            array(struct(col("_pre").as("img"), lit("delete").as("ct"))))
          .otherwise(array(
            struct(col("_pre").as("img"), lit("update_preimage").as("ct")),
            struct(col("_post").as("img"), lit("update_postimage").as("ct"))))).as("e"))
        .select(col("e.img.*"), col("e.ct").as("_change_type"),
          lit(b).as("_commit_version"))
    }.reduce(_.union(_))
  }

  /** Shallow clone (the Delta `SHALLOW CLONE` analog): a new independent
    * table at `destRoot` whose `current/` holds HARDLINKS to this table's
    * live data files — zero bytes copied, O(#files) metadata, instant at
    * any size. Copy-on-write falls out of the existing write protocol:
    * every mutation path on either table writes NEW generation files and
    * swaps directories (append adds fresh part files; overwrite/merge
    * stage-then-swap; retirement unlinks, which never touches the shared
    * inode), so neither table can observe the other's changes.
    *
    * The clone starts its OWN history: the `_gen` marker is deliberately
    * not carried over (matching Delta, where a clone's version counter
    * restarts), and retained `.v-*` dirs are not cloned. Non-parquet
    * metadata (`_SUCCESS`) is copied, not linked — Hadoop committers
    * recreate such files in place on append.
    *
    * On a real deployment this maps to the same trick at the metadata
    * layer (object stores have no hardlinks, but a cloned manifest
    * pointing at shared immutable objects is exactly the Delta/Iceberg
    * design); the local form is the single-box equivalent. */
  def cloneTo(destRoot: String): ParquetTable = {
    require(exists, "cannot clone a never-written table")
    val destRootPath = Paths.get(destRoot)
    val dest = destRootPath.resolve("current")
    require(!Files.exists(dest), s"clone destination already holds a table: $dest")
    import scala.jdk.CollectionConverters._
    Files.createDirectories(destRootPath)
    Files.walk(current).iterator().asScala.foreach { p =>
      val rel = current.relativize(p)
      val q = dest.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(q)
      else if (p.getFileName.toString == GenMarker) () // fresh history
      else if (p.getFileName.toString.endsWith(".parquet")) Files.createLink(q, p)
      else Files.copy(p, q)
    }
    new ParquetTable(spark, destRoot, schema, bucketBy, keepVersions, checks, statsBy)
  }

  /** VACUUM (the Delta `VACUUM` analog): physically delete data no longer
    * referenced by any readable version inside the retention horizon —
    * retained `.v-*` trees older than the newest `retainLast` of them, plus
    * any `.staging-*`/`.retired-*` leftovers from crashed writes (those are
    * referenced by no version at all, the uncommitted-file class Delta's
    * VACUUM also collects). Returns the vacuumed version numbers, ascending.
    *
    * Contract after `vacuum(k)`:
    *  - live content is untouched (`current/` is never a candidate);
    *  - the newest `k` retained versions remain readable via [[readVersion]];
    *  - a read of a vacuumed version fails loudly ([[readVersion]]'s
    *    `require` — the version dir is gone, and [[history]] no longer
    *    lists it);
    *  - [[cloneTo]] trees are unaffected: clones hardlink data files, so
    *    deleting this table's link only drops the inode's link count — the
    *    clone keeps reading the same bytes (VacuumSpec pins this).
    *
    * Like every mutating verb on this table, VACUUM belongs to the single
    * writer; it renames/deletes only dirs the write protocol has already
    * retired, so concurrent READERS holding open files keep their POSIX
    * view. On a real deployment the same verb runs against the commit-log
    * manifest (delete objects unreferenced by manifests newer than the
    * horizon) — the local form deletes whole rename-retired version trees,
    * O(#files expired), no data scanned. */
  def vacuum(retainLast: Int = keepVersions): Seq[Long] = {
    require(retainLast >= 0, s"vacuum retention must be >= 0, got $retainLast")
    import scala.jdk.CollectionConverters._
    val VDir = """\.v-(\d+)""".r
    val Leftover = """\.(?:staging|retired)-\S+""".r
    val names = Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString).toSeq
    names.collect { case n @ Leftover() => n }
      .foreach(n => cleanup(rootPath.resolve(n)))
    val expired = names.collect { case VDir(n) => n.toLong }
      .sorted.dropRight(retainLast)
    expired.foreach(v => cleanup(rootPath.resolve(s".v-$v")))
    expired
  }

  /** Retention: keep only the newest `keepVersions` retained dirs. */
  private def pruneVersions(): Unit = if (keepVersions > 0) {
    import scala.jdk.CollectionConverters._
    val VDir = """\.v-(\d+)""".r
    Files.list(rootPath).iterator().asScala
      .map(_.getFileName.toString).collect { case VDir(n) => n.toLong }
      .toSeq.sorted.dropRight(keepVersions)
      .foreach(v => cleanup(rootPath.resolve(s".v-$v")))
  }

  /** Swap only the bucket subdirectories in `buckets`; other live bucket
    * directories are not touched (not even re-listed). */
  private def swapBuckets(staging: Path, retired: Path, buckets: Seq[Int]): Unit = {
    Files.createDirectories(current)
    Files.createDirectories(retired)
    // a merge function that is not keyed on the bucket keys would emit rows
    // into un-swapped buckets and silently lose them — fail loudly instead
    locally {
      import scala.jdk.CollectionConverters._
      val stray = Files.list(staging).iterator().asScala
        .map(_.getFileName.toString).filter(_.startsWith(s"$BucketCol="))
        .map(_.stripPrefix(s"$BucketCol=").toInt).toSet -- buckets.toSet
      require(stray.isEmpty,
        s"merge emitted rows outside the batch's buckets ($stray) — " +
          "the merge function must be keyed on the table's bucket keys")
    }
    buckets.foreach { k =>
      val name = s"$BucketCol=$k"
      val live = current.resolve(name)
      val next = staging.resolve(name)
      if (Files.exists(live))
        Files.move(live, retired.resolve(name), StandardCopyOption.ATOMIC_MOVE)
      if (Files.exists(next))
        Files.move(next, live, StandardCopyOption.ATOMIC_MOVE)
    }
    cleanup(staging)
    cleanup(retired)
    bumpCommits()
  }

  private def cleanup(dir: Path): Unit =
    if (Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    }

  /** Compact the table's files (the OPTIMIZE analog — streaming appends
    * leave one file per micro-batch, and the small-file count is what kills
    * scan throughput at scale). Content-preserving rewrite-and-swap; for a
    * bucketed table only buckets holding more than `maxFilesPerBucket`
    * files are rewritten (untouched buckets keep their files byte-identical,
    * same guarantee as [[merge]]). */
  def compact(maxFilesPerBucket: Int = 1): Unit = bucketBy match {
    case None => if (exists) overwrite(read())
    case Some(_) if !exists => ()
    case Some(_) =>
      import scala.jdk.CollectionConverters._
      val oversized = Files.list(current).iterator().asScala
        .filter(p => Files.isDirectory(p) &&
          p.getFileName.toString.startsWith(s"$BucketCol="))
        .filter(p => Files.list(p).iterator().asScala.count(f =>
          f.getFileName.toString.endsWith(".parquet")) > maxFilesPerBucket)
        .map(_.getFileName.toString.stripPrefix(s"$BucketCol=").toInt)
        .toSeq.sorted
      if (oversized.nonEmpty) {
        // DV-applied: a compaction rewrite MATERIALIZES the touched buckets'
        // deletes (their sidecar entries go stale-harmless — new file names)
        val cur = applyDv(readRaw().filter(col(BucketCol).isin(oversized: _*)))
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        gen += 1
        val staging = rootPath.resolve(s".staging-$gen")
        writeTo(cur, staging, SaveMode.Overwrite)
        swapBuckets(staging, rootPath.resolve(s".retired-$gen"), oversized)
      }
  }

  /** Apply a merge function to (currentContent, batch) and persist.
    *
    * Unbucketed: full rewrite-and-swap. Bucketed: partition-scoped — the
    * merge function sees only the current rows of buckets present in the
    * batch (partition-pruned scan), and only those bucket directories are
    * rewritten and swapped. `f` must be keyed on the bucket keys (all
    * [[Merge]] flavors are), so its output stays within the touched buckets.
    */
  def merge(batch: DataFrame)(f: (DataFrame, DataFrame) => DataFrame): Unit = bucketBy match {
    case None => overwrite(f(read(), batch))
    case Some((_, n)) =>
      // touched buckets: ≤ n scalars — a bounded driver-side list, same
      // class as Delta's touched-file pruning
      val touched = batch.select(bucketExpr.as(BucketCol))
        .distinct().collect().map(_.getInt(0)).toSeq.sorted
      if (touched.nonEmpty) {
        // DV-applied, same as compact: the merge sees the merge-on-read view
        val cur = applyDv(readRaw().filter(col(BucketCol).isin(touched: _*)))
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        gen += 1
        val staging = rootPath.resolve(s".staging-$gen")
        writeTo(f(cur, batch), staging, SaveMode.Overwrite)
        swapBuckets(staging, rootPath.resolve(s".retired-$gen"), touched)
      }
  }
}
