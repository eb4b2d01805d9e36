package graft.merge

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** COLUMN DEFAULTS on the log table (Delta `allowColumnDefaults`): the
  * default fills OMITTED columns in the write pass, supplied values —
  * explicit NULL included — win verbatim, history is never backfilled,
  * and the default itself is versioned schema metadata. */
class ColumnDefaultSpec extends SparkSpec {
  import spark.implicits._

  private val base = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def seg(t: LogTable): Map[Long, Option[String]] =
    t.read().select("k", "segment").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap

  test("omitted column gets the default; supplied values (incl. NULL) win; " +
      "history is not backfilled") {
    val t = new LogTable(spark, tmp("cd-basic-"), base)
    t.append(Seq((1L, "old")).toDF("k", "v"))           // before the default era
    t.evolve(StructType(base.fields :+
      LogTable.defaulted("segment", StringType, "'unassigned'")))
    t.append(Seq((2L, "gen")).toDF("k", "v"))           // omits -> default
    t.append(Seq((3L, "sup", "vip"), (4L, "supnull", null))
      .toDF("k", "v", "segment"))                       // supplied wins, NULL too
    assert(seg(t) == Map(1L -> None, 2L -> Some("unassigned"),
      3L -> Some("vip"), 4L -> None))
  }

  test("defaults may be expressions over other columns, and compose with " +
      "CHECK constraints in one write pass") {
    val t = new LogTable(spark, tmp("cd-expr-"),
      StructType(base.fields :+
        LogTable.defaulted("segment", StringType,
          "CASE WHEN k % 2 = 0 THEN 'even' ELSE 'odd' END")))
    t.addConstraint("seg_set", "segment IS NOT NULL")
    t.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    assert(seg(t) == Map(1L -> Some("odd"), 2L -> Some("even")))
    // the constraint sees the POST-default row: an explicit NULL violates
    val e = intercept[Exception](
      t.append(Seq((5L, "bad", null)).toDF("k", "v", "segment")))
    assert(e.getMessage.contains("seg_set"))
  }

  test("SET DEFAULT / DROP DEFAULT are versioned metadata commits") {
    val t = new LogTable(spark, tmp("cd-alter-"),
      StructType(base.fields :+
        LogTable.defaulted("segment", StringType, "'first'")))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val v1 = t.currentVersion
    t.setDefault("segment", Some("'second'"))           // metadata commit
    assert(t.currentVersion == v1 + 1)
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.setDefault("segment", None)                       // DROP DEFAULT
    t.append(Seq((3L, "c")).toDF("k", "v"))
    assert(seg(t) == Map(1L -> Some("first"), 2L -> Some("second"), 3L -> None))
    // each era reads back unchanged (no backfill on ALTER)
    assert(t.readVersion(v1).select("segment").as[String].collect().toSeq
      == Seq("first"))
  }

  test("defaults compose with column mapping: a renamed defaulted column " +
      "keeps filling under its new logical name") {
    val t = new LogTable(spark, tmp("cd-map-"),
      StructType(base.fields :+
        LogTable.defaulted("segment", StringType, "'unassigned'")))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    t.renameColumn("segment", "tier") // activates mapping; metadata rides along
    t.append(Seq((2L, "b")).toDF("k", "v"))
    val got = t.read().select("k", "tier").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("unassigned"), 2L -> Some("unassigned")))
  }

  test("a generated column cannot also carry a default") {
    val t = new LogTable(spark, tmp("cd-gen-"),
      StructType(base.fields :+
        LogTable.generated("kk", LongType, "k * 2")))
    t.append(Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[IllegalArgumentException](
      t.setDefault("kk", Some("0")))
    assert(e.getMessage.contains("generated"))
  }
}
