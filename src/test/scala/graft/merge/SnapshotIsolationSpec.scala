package graft.merge

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, TimeUnit}
import java.util.concurrent.atomic.AtomicBoolean
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** SNAPSHOT ISOLATION under a commit forced MID-SCAN (the q66b
  * forced-interleave discipline applied to the READ side): a LogTable
  * reader resolves its manifest once, and because data files are immutable
  * and never deleted by commits, a writer landing strictly between the
  * scan's first and last row changes NOTHING the reader sees — the result
  * is exactly the pre-commit version, never a mix. The interleaving is
  * REAL, not simulated: a gate UDF blocks the scan's first task until the
  * main thread has committed (latches, no sleeps, no flakes). */
object ScanGate {
  @volatile var started: CountDownLatch = _
  @volatile var resume: CountDownLatch = _
  @volatile var fired: AtomicBoolean = _
  def reset(): Unit = {
    started = new CountDownLatch(1)
    resume = new CountDownLatch(1)
    fired = new AtomicBoolean(false)
  }
  /** First invocation signals the main thread and blocks until released. */
  def pass(k: Long): Boolean = {
    if (!fired.getAndSet(true)) {
      started.countDown()
      require(resume.await(60, TimeUnit.SECONDS), "gate timed out")
    }
    true
  }
}

class SnapshotIsolationSpec extends SparkSpec {
  import spark.implicits._
  import scala.concurrent.{Await, Future}
  import scala.concurrent.duration._
  import scala.concurrent.ExecutionContext.Implicits.global

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def gated(df: org.apache.spark.sql.DataFrame) = {
    val gate = udf((k: Long) => ScanGate.pass(k))
    df.filter(gate(col("k")))
  }

  test("DV-delete commit lands MID-SCAN: the reader sees the full " +
      "pre-commit version, a fresh reader sees the post-commit one") {
    ScanGate.reset()
    val t = new LogTable(spark, tmp("si-dv-"), s2)
    t.append((1L to 200L).map(i => (i, s"v$i")).toDF("k", "v").coalesce(2))
    val reader = gated(t.read()) // manifest resolved HERE (v1)
    val fut = Future(reader.select(col("k")).as[Long].collect().toSet)
    ScanGate.started.await(60, TimeUnit.SECONDS)
    assert(t.deleteWhere(col("k") <= 100) == 100) // v2, while the scan hangs
    ScanGate.resume.countDown()
    val seen = Await.result(fut, 120.seconds)
    assert(seen == (1L to 200L).toSet,
      "mid-scan delete leaked into the pinned reader")
    assert(t.read().select(col("k")).as[Long].collect().toSet ==
      (101L to 200L).toSet)
  }

  test("REWRITE-class commit (occMerge upsert) lands MID-SCAN: the pinned " +
      "reader sees all-old values — never a mix of old and new") {
    ScanGate.reset()
    val t = new LogTable(spark, tmp("si-mrg-"), s2)
    t.append((1L to 100L).map(i => (i, "old")).toDF("k", "v").coalesce(2))
    val reader = gated(t.read())
    val fut = Future(reader.as[(Long, String)].collect().toSet)
    ScanGate.started.await(60, TimeUnit.SECONDS)
    // rewrites every file (manifest swaps them out; the old FILES remain)
    t.occMerge((1L to 100L).map(i => (i, "new")).toDF("k", "v")) {
      (cur, b) => Merge.scd1(cur, b, Seq("k"))
    }
    ScanGate.resume.countDown()
    val seen = Await.result(fut, 120.seconds)
    assert(seen == (1L to 100L).map(i => (i, "old")).toSet,
      s"mid-scan rewrite leaked: ${seen.count(_._2 == "new")} new-value rows")
    assert(t.read().as[(Long, String)].collect().toSet ==
      (1L to 100L).map(i => (i, "new")).toSet)
  }
}
