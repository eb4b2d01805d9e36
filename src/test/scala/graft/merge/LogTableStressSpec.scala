package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkSpec

/** REAL concurrency on the commit log — not the deterministic forced
  * interleaves of LogTableSpec/OccSpec, but N threads racing unsynchronized
  * through the create-exclusive CAS. The schedule is nondeterministic; the
  * INVARIANTS are not: versions come out contiguous (every CAS winner is
  * exactly one version), every writer's every batch lands exactly once
  * (txn watermarks hold under contention), and the final content is the
  * exact union — nothing lost, nothing duplicated, no torn manifest. */
class LogTableStressSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("4 unsynchronized writers x 4 txn appends each: contiguous versions, " +
      "exactly-once per (appId, batchId), union content") {
    val root = Files.createTempDirectory("log-stress-").toString
    val writers = 4; val batches = 4
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        try {
          // each thread gets its own LogTable handle (no shared state —
          // the LOG is the only coordination point, as across processes)
          val t = new LogTable(spark, root, s2)
          (0 until batches).foreach { b =>
            val rows = Seq((w * 100L + b, s"w$w-b$b")).toDF("k", "v")
            assert(t.appendOnce(rows, s"writer-$w", b, maxAttempts = 100))
            // a duplicate delivery of the batch we just committed no-ops
            // even while the other writers keep racing
            assert(!t.appendOnce(rows, s"writer-$w", b, maxAttempts = 100))
          }
        } catch { case e: Throwable => failures.add(e) }
      }, s"stress-writer-$w")
    }
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(failures.isEmpty, s"writer failed: ${failures.peek()}")
    val t = new LogTable(spark, root, s2)
    val total = writers * batches
    assert(t.history() == (1L to total.toLong),
      s"versions not contiguous: ${t.history().mkString(",")}")
    (0 until writers).foreach(w =>
      assert(t.lastTxn(s"writer-$w") == batches - 1L, s"writer $w watermark"))
    val got = t.read().as[(Long, String)].collect().sortBy(_._1).toSeq
    val want = (for (w <- 0 until writers; b <- 0 until batches)
      yield (w * 100L + b, s"w$w-b$b")).sortBy(_._1)
    assert(got == want, "content is not the exact union of all batches")
  }
}
