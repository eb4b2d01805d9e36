package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.types._
import graft.SparkSpec

/** The manifest caches are a LEAK surface, not just a speedup: a long-lived
  * handle on a table with thousands of commits reads (and under the r13
  * memoization, retains) one Delta per version — a full-rewrite Delta holds
  * the whole file-entry list, so an unbounded cache is driver heap growth
  * for the life of the handle (r13 ADVICE). This pins the clear-past-N
  * discipline on BOTH caches' feeding paths: >256 distinct manifest reads on
  * one handle must leave at most 256 entries cached, with semantics (fold
  * results, history, time travel) unchanged. */
class LogCacheBoundSpec extends SparkSpec {

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  test("deltaCache stays bounded across >256 commits and a full-log " +
      "manifest walk on one handle") {
    val root = Files.createTempDirectory("log-cachebound-").toString
    val t = new LogTable(spark, root, s2)
    // 280 metadata-only commits (no Spark job on the add path while the
    // table has never held data): add/drop one constraint alternately
    val commits = 280
    (1 to commits / 2).foreach { i =>
      t.addConstraint(s"c$i", "k >= 0")
      t.dropConstraint(s"c$i")
    }
    assert(t.currentVersion == commits.toLong)
    assert(t.cachedDeltas <= 256,
      s"deltaCache leaked during commits: ${t.cachedDeltas} entries")
    // a fresh handle walking EVERY manifest (TIMESTAMP AS OF resolution
    // reads all tsMs) must also stay bounded — this is the long-lived-reader
    // shape the leak report named
    val r = new LogTable(spark, root, s2)
    val latest = r.versionAtTimestamp(System.currentTimeMillis() + 3600000L)
    assert(latest == commits.toLong)
    assert(r.cachedDeltas <= 256,
      s"deltaCache leaked on the manifest walk: ${r.cachedDeltas} entries")
    // LRU, not clear-all (r14 ADVICE): after walking every manifest the
    // cache holds exactly the bound — the newest 256 survive; the earlier
    // wholesale clear left only the post-clear remnant (280-256 = 24 here)
    assert(r.cachedDeltas == 256,
      s"expected the LRU to retain the full bound, got ${r.cachedDeltas}")
    // and the bounded cache did not change semantics
    assert(r.history().size == commits)
    assert(r.read().count() == 0L)
  }
}
