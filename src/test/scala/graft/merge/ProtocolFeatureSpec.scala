package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** PROTOCOL FEATURE GATING (Delta reader/writer features): a table whose
  * log requires a feature outside [[LogTable.SupportedFeatures]] is refused
  * loudly — on EVERY snapshot resolution (read, write, time travel) —
  * because serving it would silently break the feature's contract. */
class ProtocolFeatureSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("addFeature records a requirement; supported features keep serving; " +
      "the set survives a checkpoint round-trip") {
    val root = tmp("feat-ok-")
    val t = new LogTable(spark, root, s2, checkpointInterval = 2)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.addFeature("deletionVectors")
    t.addFeature("deletionVectors") // idempotent: no extra version
    assert(t.features == Set("deletionVectors"))
    assert(t.currentVersion == 2L)
    // enough commits to force checkpoint-backed resolution
    (2L to 6L).foreach(i => t.append(Seq((i, s"b$i")).toDF("k", "v")))
    val fresh = new LogTable(spark, root, s2, checkpointInterval = 2)
    assert(fresh.features == Set("deletionVectors"))
    assert(fresh.read().count() == 6L)
  }

  test("an unknown feature in the log is refused on read, write, and time " +
      "travel — table-wide, not per version") {
    val root = tmp("feat-bad-")
    val t = new LogTable(spark, root, s2)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    // a future engine's commit: hand-written manifest requiring a feature
    // this engine has never heard of
    val m = s"""{"version":2,"dataChange":false,"ts":${Long.MaxValue / 2},
                |"featureAdd":"quantum-compression",
                |"add":[],"remove":[],"dvAdd":[],"dvRemove":[]}"""
      .stripMargin.replace("\n", "")
    Files.write(java.nio.file.Paths.get(root, "_log", f"${2L}%020d.json"),
      m.getBytes("UTF-8"))
    val fresh = new LogTable(spark, root, s2)
    val e1 = intercept[IllegalArgumentException](fresh.read())
    assert(e1.getMessage.contains("quantum-compression"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      fresh.append(Seq((2L, "b")).toDF("k", "v")))
    assert(e2.getMessage.contains("quantum-compression"))
    // Delta protocol semantics: version 1 predates the feature commit but
    // is still a version OF a feature-gated table — refused too
    val e3 = intercept[IllegalArgumentException](fresh.readVersion(1L))
    assert(e3.getMessage.contains("quantum-compression"))
  }

  test("features survive VACUUM (the vacuum-cut checkpoint carries the set)") {
    val root = tmp("feat-vac-")
    val t = new LogTable(spark, root, s2)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.addFeature("rowTracking")
    (2L to 4L).foreach(i => t.append(Seq((i, s"b$i")).toDF("k", "v")))
    assert(t.vacuum(retainLast = 1).nonEmpty, "vacuum must prune versions")
    val fresh = new LogTable(spark, root, s2)
    assert(fresh.features == Set("rowTracking"),
      "the checkpoint vacuum cuts must carry the feature set")
    assert(fresh.read().count() == 4L)
  }

  test("adding a feature this engine does not support is rejected up front") {
    val t = new LogTable(spark, tmp("feat-self-"), s2)
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](t.addFeature("time-crystals"))
    assert(e.getMessage.contains("unknown protocol feature"))
    assert(t.features.isEmpty, "the rejected feature must not be recorded")
  }
}
