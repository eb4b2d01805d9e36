package graft.merge

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.SparkSpec

/** VACUUM (retention GC) on the rename-swap [[ParquetTable]] — the Delta
  * `VACUUM` analog. Pins the whole contract: expired version trees are
  * PHYSICALLY gone, reads of them fail loudly, retained versions and the
  * live table are untouched, crash leftovers (`.staging-*`/`.retired-*`)
  * are collected, and shallow-clone trees survive (hardlinked inodes keep
  * their bytes via link count). */
class VacuumSpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType().add("k", LongType).add("v", StringType)

  private def versioned(keep: Int): (ParquetTable, String) = {
    val dir = Files.createTempDirectory("graft-vac-").toString
    (new ParquetTable(spark, dir, schema, keepVersions = keep), dir)
  }

  test("vacuum deletes expired version trees physically; newer history intact") {
    val (t, dir) = versioned(keep = 4)
    (1 to 4).foreach(i => t.overwrite(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(t.history() == Seq(1L, 2L, 3L, 4L))
    val vacuumed = t.vacuum(retainLast = 1) // keep newest retained (.v-3) only
    assert(vacuumed == Seq(1L, 2L))
    // expired trees are gone from disk, not just hidden
    assert(!Files.exists(Paths.get(dir, ".v-1")))
    assert(!Files.exists(Paths.get(dir, ".v-2")))
    assert(Files.exists(Paths.get(dir, ".v-3")))
    // reads of vacuumed versions fail loudly; newer time travel unaffected
    assert(t.history() == Seq(3L, 4L))
    val e = intercept[IllegalArgumentException](t.readVersion(1))
    assert(e.getMessage.contains("readable versions"))
    assert(t.readVersion(3).as[(Long, String)].collect().toSeq == Seq((3L, "v3")))
    // live content untouched
    assert(t.read().as[(Long, String)].collect().toSeq == Seq((4L, "v4")))
  }

  test("vacuum(0) empties the version store; current survives") {
    val (t, dir) = versioned(keep = 3)
    (1 to 3).foreach(i => t.overwrite(Seq((i.toLong, s"v$i")).toDF("k", "v")))
    assert(t.vacuum(retainLast = 0) == Seq(1L, 2L))
    assert(t.history() == Seq(3L))
    assert(t.read().count() == 1L)
    assert(Files.exists(Paths.get(dir, "current")))
  }

  test("vacuum collects crashed-write leftovers (.staging-*/.retired-*)") {
    val (t, dir) = versioned(keep = 2)
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    // simulate a crashed writer: orphan staging + retired trees with files
    val orphanS = Files.createDirectories(Paths.get(dir, ".staging-7"))
    val orphanR = Files.createDirectories(Paths.get(dir, ".retired-8"))
    Files.write(orphanS.resolve("part-0.parquet"), Array[Byte](1, 2))
    Files.write(orphanR.resolve("part-0.parquet"), Array[Byte](3, 4))
    t.vacuum()
    assert(!Files.exists(orphanS) && !Files.exists(orphanR))
    assert(t.read().count() == 1L)
  }

  test("vacuum on the source leaves shallow-clone trees readable (hardlinks)") {
    val (t, dir) = versioned(keep = 2)
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("k", "v")) // v1
    val cloneRoot = Files.createTempDirectory("graft-vac-clone-").toString
    val c = t.cloneTo(cloneRoot)
    // source moves on and vacuums everything it can
    t.overwrite(Seq((3L, "c")).toDF("k", "v"))            // v2; v1 retired
    t.vacuum(retainLast = 0)                              // drops .v-1 (the clone's source bytes)
    assert(t.history() == Seq(2L))
    // the clone still reads the v1 content byte-for-byte: its hardlinks kept
    // the inodes alive when the source's links were unlinked
    assert(c.read().orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("unversioned table: vacuum is leftovers-only and returns no versions") {
    val dir = Files.createTempDirectory("graft-vac-u-").toString
    val t = new ParquetTable(spark, dir, schema)
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    assert(t.vacuum() == Seq.empty)
    assert(t.read().count() == 1L)
    intercept[IllegalArgumentException](t.vacuum(retainLast = -1))
  }
}
