package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** IDENTITY COLUMNS on the log table (Delta `identityColumns`): generated
  * values are the affine map of the row-tracking id, so allocation is
  * shuffle-free at write and the Delta contract (unique, monotone per
  * commit, gaps allowed, never reused, stable across delete/OPTIMIZE)
  * is inherited from the row-id machinery q80 already proves. */
class IdentityTableSpec extends SparkSpec {
  import spark.implicits._

  private val ds = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // single-partition key-sorted writes: within-commit id order = key order,
  // so per-key identity values are deterministic (the q80 shaped-write form)
  private def shaped(rows: Seq[(Long, String)]) =
    rows.toDF("k", "v").repartition(1).sortWithinPartitions("k")

  private def values(t: IdentityTable): Map[Long, Long] =
    t.read().select("k", "sid").as[(Long, Long)].collect().toMap

  test("ALWAYS: start/step arithmetic, commit continuation, supplied column rejected") {
    val t = new IdentityTable(spark, tmp("idc-always-"), ds, "sid",
      start = 1000L, step = 5L)
    t.append(shaped(Seq((1L, "a"), (2L, "b"), (3L, "c"))))
    t.append(shaped(Seq((4L, "d"), (5L, "e"))))
    assert(values(t) == Map(1L -> 1000L, 2L -> 1005L, 3L -> 1010L,
      4L -> 1015L, 5L -> 1020L))
    assert(t.nextGenerated == 1025L)
    val e = intercept[IllegalArgumentException] {
      t.append(Seq((9L, "x", 1L)).toDF("k", "v", "sid"))
    }
    assert(e.getMessage.contains("GENERATED ALWAYS"))
  }

  test("negative step decreases; values unique and never reused after delete") {
    val t = new IdentityTable(spark, tmp("idc-neg-"), ds, "sid",
      start = 0L, step = -3L)
    t.append(shaped(Seq((1L, "a"), (2L, "b"), (3L, "c"))))
    assert(values(t) == Map(1L -> 0L, 2L -> -3L, 3L -> -6L))
    assert(t.deleteWhere(col("k") === 2L) == 1L)
    t.append(shaped(Seq((4L, "d"))))
    // the freed value -3 is NOT reused: allocation continues from the hwm
    assert(values(t) == Map(1L -> 0L, 3L -> -6L, 4L -> -9L))
  }

  test("OPTIMIZE preserves identity values (materialized row ids)") {
    val t = new IdentityTable(spark, tmp("idc-opt-"), ds, "sid",
      start = 7L, step = 2L)
    t.append(shaped((1L to 6L).map(i => (i, s"a$i"))))
    t.append(shaped((7L to 9L).map(i => (i, s"b$i"))))
    val before = values(t)
    assert(t.deleteWhere(col("k") % 3 === 0) > 0)
    assert(t.compact(targetFileBytes = 1L << 20) > 0,
      "compaction must rewrite (materializing ids)")
    assert(values(t) == before.filter { case (k, _) => k % 3 != 0 })
  }

  test("BY DEFAULT stores explicit values verbatim; omitted rows generate") {
    val t = new IdentityTable(spark, tmp("idc-bydef-"), ds, "sid",
      start = 100L, step = 1L, generatedAlways = false)
    t.append(shaped(Seq((1L, "gen"), (2L, "gen"))))           // 100, 101
    t.append(Seq((3L, "explicit", 555L)).toDF("k", "v", "sid")
      .repartition(1).sortWithinPartitions("k"))
    t.append(shaped(Seq((4L, "gen"))))                        // row id 4 -> 103
    assert(values(t) == Map(1L -> 100L, 2L -> 101L, 3L -> 555L, 4L -> 103L))
  }

  test("BY DEFAULT rejects an explicit NULL — it could never read back as " +
      "NULL (the storage marker means 'generate'), so storing it would " +
      "break the verbatim contract") {
    val t = new IdentityTable(spark, tmp("idc-null-"), ds, "sid",
      start = 1L, step = 1L, generatedAlways = false)
    t.append(shaped(Seq((1L, "a"))))
    val e = intercept[Exception](t.append(
      Seq((2L, "b", Option.empty[Long])).toDF("k", "v", "sid")))
    assert(e.getMessage.contains("explicit NULL") ||
      Option(e.getCause).exists(_.getMessage.contains("explicit NULL")),
      s"expected the NULL-rejection error, got: $e")
    assert(values(t) == Map(1L -> 1L), "the rejected batch must not commit")
  }

  test("materializeIdentity stamps values into storage; full-rewrite verbs " +
      "become identity-safe and generation continues above the watermark") {
    val t = new IdentityTable(spark, tmp("idc-mat-"), ds, "sid",
      start = 10L, step = 10L)
    t.append(shaped(Seq((1L, "a"), (2L, "b"), (3L, "c"))))    // 10, 20, 30
    val before = values(t)
    t.materializeIdentity()
    assert(values(t) == before, "materialization must not move any value")
    // a full-rewrite verb on the underlying table now preserves values
    t.table.occMerge(Seq((2L, "B2", before(2L))).toDF("k", "v", "sid"))(
      (cur, b) => Merge.scd1(cur, b, Seq("k")))
    assert(values(t) == before + (2L -> before(2L)))
    // post-materialization appends still generate, above every prior value
    t.append(shaped(Seq((9L, "z"))))
    val after = values(t)
    assert(after(9L) > before.values.max, s"expected continuation, got $after")
  }

  test("racing concurrent appends allocate disjoint identity ranges") {
    val t = new IdentityTable(spark, tmp("idc-race-"), ds, "sid",
      start = 1L, step = 1L)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    val fa = Future(t.append(shaped((1L to 40L).map(i => (i, s"a$i")))))
    val fb = Future(t.append(shaped((41L to 70L).map(i => (i, s"b$i")))))
    Await.result(fa, 2.minutes); Await.result(fb, 2.minutes)
    pool.shutdown()
    val vs = values(t).values.toSeq.sorted
    // the hwm CAS inside the commit loop makes the two allocations
    // disjoint and jointly contiguous regardless of interleaving
    assert(vs == (1L to 70L), s"expected 1..70 with no duplicates, got $vs")
    assert(t.nextGenerated == 71L)
  }

  test("time travel serves each version's identity values") {
    val t = new IdentityTable(spark, tmp("idc-tt-"), ds, "sid",
      start = 1L, step = 1L)
    t.append(shaped(Seq((1L, "a"))))
    t.append(shaped(Seq((2L, "b"))))
    val v1 = t.readVersion(1L).select("k", "sid").as[(Long, Long)].collect().toMap
    assert(v1 == Map(1L -> 1L))
    assert(values(t) == Map(1L -> 1L, 2L -> 2L))
  }
}
