package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.merge.{LogTable, Merge}

/** [[LogTableSource]] — the commit log as an exactly-once streaming source:
  * version offsets checkpoint with the batch, compaction commits are
  * invisible, update commits fail loudly unless ignoreChanges, a re-drain
  * from the same checkpoint is a no-op, and maxVersionsPerTrigger admits
  * one bounded span per micro-batch. (Sinks here are foreachBatch — the
  * memory sink refuses checkpoint recovery.) */
class LogTableSourceSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** AvailableNow drain into a foreachBatch collector; returns the rows this
    * drain emitted plus the number of non-empty micro-batches it ran. */
  private def drainOnce(path: String, ckpt: String,
                        ignoreChanges: Boolean = false,
                        maxVersions: Option[Int] = None)
      : (Seq[(Long, String)], Int) = {
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    var rdr = spark.readStream.format("graft-logtable").schema(s2)
      .option("ignoreChanges", ignoreChanges.toString)
    maxVersions.foreach(m => rdr = rdr.option("maxVersionsPerTrigger", m.toString))
    val q = rdr.load(path).writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.orderBy("k").as[(Long, String)].collect()
        if (rows.nonEmpty) batches.incrementAndGet()
        rows.foreach(buf.add)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    (buf.iterator().asScala.toSeq.sortBy(_._1), batches.get())
  }

  test("version offsets: first drain reads everything, second drain from the " +
      "same checkpoint reads ONLY new commits, third drain is a no-op; " +
      "compaction commits are invisible") {
    val root = tmp("lts-basic-")
    val t = new LogTable(spark, root, s2)
    t.append(Seq((1L, "a"), (2L, "a")).toDF("k", "v"))                  // v1
    t.append(Seq((3L, "a")).toDF("k", "v"))                             // v2
    val ckpt = tmp("lts-ckpt-")
    val (d1, _) = drainOnce(root, ckpt)
    assert(d1 == Seq((1L, "a"), (2L, "a"), (3L, "a")))
    // new append + an OPTIMIZE between polls
    t.append(Seq((4L, "b")).toDF("k", "v"))                             // v3
    assert(t.compact() > 0)                                             // v4, dataChange=false
    val (d2, _) = drainOnce(root, ckpt)
    assert(d2 == Seq((4L, "b")), s"compaction rewrite leaked into the feed: $d2")
    // nothing new: the drain emits zero rows
    assert(drainOnce(root, ckpt)._1.isEmpty)
  }

  test("maxVersionsPerTrigger: an availableNow drain admits one bounded " +
      "commit span per micro-batch instead of one giant batch") {
    val root = tmp("lts-rate-")
    val t = new LogTable(spark, root, s2)
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    val (rows, batches) = drainOnce(root, tmp("lts-ckpt-rate-"), maxVersions = Some(1))
    assert(rows == (1L to 4L).map(i => (i, s"v$i")))
    assert(batches == 4, s"expected 4 single-version micro-batches, got $batches")
  }

  test("update commit fails the stream loudly; ignoreChanges re-emits in " +
      "full and a keyed-idempotent sink converges") {
    val root = tmp("lts-upd-")
    val t = new LogTable(spark, root, s2)
    t.append(Seq((1L, "a"), (2L, "a")).toDF("k", "v"))                  // v1
    val ckpt = tmp("lts-ckpt2-")
    assert(drainOnce(root, ckpt)._1.size == 2)
    t.merge(Seq((1L, "UPD")).toDF("k", "v"))(                           // v2: rewrite
      (cur, b) => Merge.scd1(cur, b, Seq("k")))
    val ex = intercept[StreamingQueryException](drainOnce(root, ckpt))
    def mentions(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("ignoreChanges")) || mentions(t.getCause))
    assert(mentions(ex), s"unexpected failure: ${ex.getMessage}")
    // opt in: the rewrite re-emits IN FULL — one batch carries BOTH copies
    // of k=1, so the consumer needs _commit_version (withCommitVersion) and
    // a keyed-recency merge to converge deterministically
    val vcol = graft.merge.LogTable.CommitVersionCol
    val sink = new LogTable(spark, tmp("lts-silver-") + "/t",
      s2.add(vcol, LongType))
    val q = spark.readStream.format("graft-logtable").schema(s2)
      .option("ignoreChanges", "true").option("withCommitVersion", "true")
      .load(root)
      .writeStream.option("checkpointLocation", tmp("lts-ckpt3-"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // latest emission per key within the batch, then recency-upsert —
        // the standard idempotent-consumer pair for at-least-once feeds
        val latest = graft.ops.Relational.dedupKeyed(
          batch, Seq("k"), Seq(col(vcol).desc))
        sink.merge(latest)((cur, b) => Merge.cdcUpsert(cur, b, Seq("k"), vcol))
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(sink.read().orderBy("k").select("k", "v").as[(Long, String)]
      .collect().toSeq == Seq((1L, "UPD"), (2L, "a")))
  }

  test("format sink: stream-to-stream log pipeline (readStream -> " +
      "writeStream.format) with txn exactly-once; update mode refused") {
    val base = tmp("lts-sink-")
    val bronzeRoot = base + "/bronze"; val silverRoot = base + "/silver"
    val bronze = new LogTable(spark, bronzeRoot, s2)
    bronze.append(Seq((1L, "keep"), (2L, "drop")).toDF("k", "v"))       // v1
    bronze.append(Seq((3L, "keep")).toDF("k", "v"))                     // v2
    val ckpt = tmp("lts-sink-ckpt-")
    def drain(): Unit = {
      val q = spark.readStream.format("graft-logtable").schema(s2)
        .option("maxVersionsPerTrigger", "1").load(bronzeRoot)
        .filter(col("v") === "keep")
        .writeStream.format("graft-logtable")
        .option("path", silverRoot).option("appId", "sink-spec")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    drain()
    val silver = new LogTable(spark, silverRoot, s2)
    assert(silver.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep"), (3L, "keep")))
    assert(silver.lastTxn("sink-spec") >= 0L, "sink must record txn watermarks")
    // a replayed micro-batch (same appId+batchId) is a no-op
    val before = silver.currentVersion
    assert(!silver.appendOnce(Seq((99L, "dup")).toDF("k", "v"), "sink-spec", 0L))
    assert(silver.currentVersion == before)
    // new bronze commit: the next drain appends exactly it
    bronze.append(Seq((4L, "keep")).toDF("k", "v"))                     // v3
    drain()
    assert(silver.read().count() == 3L)
    // append-only: update mode is refused at sink construction
    intercept[Exception] {
      spark.readStream.format("graft-logtable").schema(s2).load(bronzeRoot)
        .writeStream.format("graft-logtable").option("path", tmp("lts-x-"))
        .option("checkpointLocation", tmp("lts-x-ckpt-"))
        .outputMode("update").trigger(Trigger.AvailableNow()).start()
    }
  }

  test("changeFeed mode streams typed deletes (no ignoreChanges needed); " +
      "withRowIds carries the stable id; checkpoint resume slices spans") {
    val root = tmp("lts-cdf-")
    val t = new LogTable(spark, root, s2, rowTracking = true)
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v").coalesce(1)) // v1: ids 1,2
    t.deleteWhere(col("k") === 1L)                                 // v2
    val buf = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Long, Long)]()
    def drain(ckpt: String): Unit = {
      val q = spark.readStream.format("graft-logtable").schema(s2)
        .option("changeFeed", "true").option("withRowIds", "true")
        .load(root).writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          b.select(col(LogTable.ChangeTypeCol), col(LogTable.CommitVersionCol),
              col("k"), col(LogTable.RowIdCol))
            .as[(String, Long, Long, Long)].collect().foreach(buf.add)
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val ckpt = tmp("lts-cdf-ckpt-")
    drain(ckpt)
    import scala.jdk.CollectionConverters._
    val first = buf.iterator().asScala.toSet
    assert(first == Set(("insert", 1L, 1L, 1L), ("insert", 1L, 2L, 2L),
      ("delete", 2L, 1L, 1L)))
    // resume: only the new overwrite's delete+insert arrive
    buf.clear()
    t.overwrite(Seq((9L, "z")).toDF("k", "v"))                      // v3
    drain(ckpt)
    val second = buf.iterator().asScala.toSet
    assert(second == Set(("delete", 3L, 2L, 2L), ("insert", 3L, 9L, 3L)))
    // withRowIds without changeFeed is rejected at construction
    intercept[Exception] {
      spark.readStream.format("graft-logtable").schema(s2)
        .option("withRowIds", "true").load(root).writeStream
        .option("checkpointLocation", tmp("lts-cdf-bad-"))
        .foreachBatch((_: org.apache.spark.sql.DataFrame, _: Long) => ())
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
  }

  test("missing schema fails fast at stream construction") {
    intercept[IllegalArgumentException](
      spark.readStream.format("graft-logtable").load(tmp("lts-noschema-"))
        .writeStream.format("noop").start())
  }
}
