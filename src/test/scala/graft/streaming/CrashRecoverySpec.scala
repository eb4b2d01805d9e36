package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Restart-from-checkpoint proofs — the exactly-once story the reference
  * gets from checkpoint + idempotent MERGE (SURVEY §2.8,
  * `Silver/05-silver.py:88`), exercised on the repo's two stateful sink
  * shapes:
  *
  *  1. the foreachBatch + rewrite-and-swap pipeline ([[IncrementalClustering]],
  *     the s10 path): a drain is stopped mid-source, a NEW query re-attaches
  *     on the same checkpoint and pipeline root, drains the rest, and every
  *     table (labels, index, sizes) equals the single-run result; plus the
  *     re-delivery guard — re-running an already-applied batch (the
  *     offset-log-ahead-of-commit-log window) is a no-op;
  *  2. a plain watermarked-dedup drain (s02's shape) into a FILE sink
  *     (memory sinks refuse recovery — CLAUDE.md): a duplicate arriving
  *     AFTER the restart is dropped, which can only happen if the dedup
  *     state store was restored from the checkpoint.
  */
class CrashRecoverySpec extends SparkSpec {
  import spark.implicits._

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def tableRows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.toVector).toVector.sortBy(_.mkString("|"))

  /** Write each (doc_id, text) group as one parquet file `batchN.parquet`
    * under `dir` — a deterministic file-stream source. */
  private def writeDocFiles(dir: java.nio.file.Path,
                            parts: Seq[Seq[(Long, String)]], offset: Int = 0): Unit =
    parts.zipWithIndex.foreach { case (rows, i) =>
      val tmp = Files.createTempDirectory("crash-part-")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val f = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(f, dir.resolve(s"batch${offset + i}.parquet"))
    }

  private def docsStream(dir: java.nio.file.Path): DataFrame =
    spark.readStream.schema("doc_id bigint, text string")
      .option("maxFilesPerTrigger", "1").parquet(dir.toString)

  // 12 docs, 6 single-file batches; dup pairs (1,2) within phase 1,
  // (3,9) ACROSS the restart boundary, (10,11) within phase 2
  private val texts = Map(
    1L -> "alpha beta gamma delta epsilon zeta",
    2L -> "alpha beta gamma delta epsilon zeta",
    3L -> "one two three four five six seven",
    4L -> "completely unrelated content lives here now",
    5L -> "another singleton document with its own words",
    6L -> "yet more unique text that matches nothing",
    9L -> "one two three four five six seven",
    10L -> "final pair of matching documents here tonight",
    11L -> "final pair of matching documents here tonight",
    12L -> "last unmatched document closes the corpus")
  private val phase1 = Seq(Seq(1L, 2L), Seq(3L), Seq(4L)).map(_.map(i => (i, texts(i))))
  private val phase2 = Seq(Seq(5L, 9L), Seq(6L, 10L), Seq(11L, 12L)).map(_.map(i => (i, texts(i))))

  private def runPipeline(src: java.nio.file.Path, root: String,
                          ckpt: String): Unit = {
    val pipe = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5)
    val q = pipe.attach(docsStream(src), ckpt, Trigger.AvailableNow())
    q.awaitTermination()
  }

  test("foreachBatch pipeline: stop mid-source, re-attach same checkpoint, tables == single run") {
    val src = Files.createTempDirectory("crash-src-")
    val root = Files.createTempDirectory("crash-tables-").toString
    val ckpt = Files.createTempDirectory("crash-ckpt-").toString

    // phase 1: only half the source exists; availableNow drains 3 batches
    // and terminates — the stop point is deterministic (end of known files)
    writeDocFiles(src, phase1)
    runPipeline(src, root, ckpt)
    val pipe = new IncrementalClustering(spark, root)
    assert(pipe.lastAppliedBatch == 2L)
    val midLabels = labelMap(pipe.labelsTable.read())
    assert(midLabels.keySet == Set(1L, 2L, 3L, 4L) && midLabels(2L) == 1L)

    // phase 2: rest of the files appear; a NEW query on the SAME checkpoint
    // resumes at batch 3 (phase-1 files are not re-read: doc counts stay 1:1)
    writeDocFiles(src, phase2, offset = 3)
    runPipeline(src, root, ckpt)
    assert(pipe.lastAppliedBatch == 5L)

    // reference: same files, fresh root + checkpoint, one uninterrupted run
    val refRoot = Files.createTempDirectory("crash-ref-tables-").toString
    runPipeline(src, refRoot, Files.createTempDirectory("crash-ref-ckpt-").toString)
    val ref = new IncrementalClustering(spark, refRoot)

    assert(labelMap(pipe.labelsTable.read()) == labelMap(ref.labelsTable.read()))
    assert(tableRows(pipe.indexTable.read()) == tableRows(ref.indexTable.read()))
    assert(tableRows(pipe.sizesTable.read()) == tableRows(ref.sizesTable.read()))
    // the cross-restart dup pair actually merged (teeth)
    val finalLabels = labelMap(pipe.labelsTable.read())
    assert(finalLabels(9L) == finalLabels(3L))
    assert(finalLabels(11L) == finalLabels(10L))
  }

  test("re-delivered batch (offset log ahead of commit log) is a no-op") {
    val root = Files.createTempDirectory("crash-redeliver-").toString
    val pipe = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5)
    val b0 = phase1.head.toDF("doc_id", "text")
    val b1 = phase1(1).toDF("doc_id", "text")
    pipe.processBatch(b0, 0L)
    pipe.processBatch(b1, 1L)
    val labels = labelMap(pipe.labelsTable.read())
    val index = tableRows(pipe.indexTable.read())
    val sizes = tableRows(pipe.sizesTable.read())
    // crash window: batch 1 committed its writes but not the stream's commit
    // log — on restart foreachBatch runs (b1, 1L) again. Must change nothing
    // (a blind re-run would double every index row and inflate n_inter).
    pipe.processBatch(b1, 1L)
    pipe.processBatch(b0, 0L) // ancient re-delivery: also a no-op
    assert(labelMap(pipe.labelsTable.read()) == labels)
    assert(tableRows(pipe.indexTable.read()) == index)
    assert(tableRows(pipe.sizesTable.read()) == sizes)
  }

  test("partial batch (crash BETWEEN appends) is scrubbed before reprocessing") {
    // capped pipeline so every state table is live; dup pairs (1,2) within
    // batch 0 and (5,25) ACROSS the crash boundary
    val boiler = (1 to 40).map(i => s"bp$i").mkString(" ")
    def text(g: Long) = (1 to 10).map(j => s"u${g}w$j").mkString(" ") + " " + boiler
    val b0 = (1L to 20L).map(i => (i, text(if (i == 2) 1 else i))).toDF("doc_id", "text")
    val b1 = (21L to 40L).map(i => (i, text(if (i == 25) 5 else i))).toDF("doc_id", "text")
    def run(root: String, poison: IncrementalClustering => Unit): IncrementalClustering = {
      val p0 = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5, maxDf = 10)
      p0.processBatch(b0, 0L)
      poison(p0)
      // the RESTART is a fresh instance — its first batch must scrub
      val p1 = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5, maxDf = 10)
      p1.processBatch(b1, 1L)
      p1
    }
    // simulate a crash mid-batch-1: some appends landed (stamped batch 1),
    // the marker did not move. The poison rows are chosen to CORRUPT the
    // cross-boundary pair if not scrubbed: a fake df delta drives one of
    // doc 25's distinctive shingles over the cap, the fake hot entry caps
    // another away, and ghost index/sizes/hotCounts rows shift Jaccard.
    val s25 = "u5w1 u5w2 u5w3" // a real shingle of doc 25's (= doc 5's) text
    val crashed = run(Files.createTempDirectory("crash-scrub-").toString, p => {
      p.indexTable.append(Seq((999L, s25, 1L)).toDF("doc_id", "shingle", "batch_id"))
      p.sizesTable.append(Seq((999L, 42L, 1L)).toDF("doc_id", "set_size", "batch_id"))
      p.dfTable.append(Seq((s25, 999L, 1L)).toDF("shingle", "delta", "batch_id"))
      p.hotTable.append(Seq(("u5w4 u5w5 u5w6", 1L)).toDF("shingle", "batch_id"))
      p.hotCountsTable.append(Seq((5L, 9L, 1L)).toDF("doc_id", "hot_n", "batch_id"))
    })
    val ref = run(Files.createTempDirectory("crash-scrub-ref-").toString, _ => ())
    val got = labelMap(crashed.labelsTable.read())
    assert(got == labelMap(ref.labelsTable.read()),
      "scrub failed: partial-batch rows leaked into the replay")
    assert(got(25L) == got(5L), "cross-boundary dup pair lost")
    // the scrubbed state tables equal the clean run's (merge-on-read view)
    assert(tableRows(crashed.indexTable.read()) == tableRows(ref.indexTable.read()))
    assert(tableRows(crashed.sizesTable.read()) == tableRows(ref.sizesTable.read()))
    assert(tableRows(crashed.dfTable.read()) == tableRows(ref.dfTable.read()))
    assert(tableRows(crashed.hotTable.read()) == tableRows(ref.hotTable.read()))
    assert(tableRows(crashed.hotCountsTable.read()) == tableRows(ref.hotCountsTable.read()))
  }

  test("watermarked dedup drain: state store survives restart (file sink)") {
    val src = Files.createTempDirectory("crash-dedup-src-")
    val ckpt = Files.createTempDirectory("crash-dedup-ckpt-").toString
    val sink = Files.createTempDirectory("crash-dedup-sink-").toString

    def eventFile(name: String, rows: Seq[(Long, String, Double, Long)]): Unit = {
      val tmp = Files.createTempDirectory("crash-dedup-part-")
      rows.toDF("user_id", "event_type", "value", "ts_us")
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val f = Files.list(tmp).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(f, src.resolve(name))
    }
    def drainOnce(): Unit = {
      val q = spark.readStream
        .schema("user_id bigint, event_type string, value double, ts_us bigint")
        .option("maxFilesPerTrigger", "1").parquet(src.toString)
        .withColumn("ts_utc", timestamp_micros(col("ts_us")))
        .withWatermark("ts_utc", "365 days")
        .dropDuplicates(Seq("user_id", "event_type", "value", "ts_us"))
        .select(col("user_id"), col("event_type"), col("value"), col("ts_us"))
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    val r1 = (1L, "view", 1.0, 1000000L)
    val r2 = (2L, "view", 2.0, 2000000L)
    val r3 = (3L, "purchase", 3.0, 3000000L)
    eventFile("f0.parquet", Seq(r1, r2))
    drainOnce()
    // phase 2 re-delivers r1 verbatim: it is dropped ONLY if the dedup
    // state store restored from the checkpoint across the restart
    eventFile("f1.parquet", Seq(r1, r3))
    drainOnce()

    val out = spark.read.schema("user_id bigint, event_type string, value double, ts_us bigint")
      .parquet(sink).as[(Long, String, Double, Long)].collect().sorted.toSeq
    assert(out == Seq(r1, r2, r3).sorted)
  }
}
