package graft.sql

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.merge.LogTable

/** The SQL DML statement surface (VERDICT r11 ask 5): `MERGE INTO` /
  * `UPDATE` / `DELETE FROM` over graft-logtable catalog tables, lowered by
  * [[GraftSqlParser]] onto the LogTable verbs. The MERGE test is the
  * reference's M3 statement shape verbatim (recency-guarded upsert —
  * `Silver/05-silver.py:11-13`). */
class SqlDmlSpec extends SparkSpec {

  private lazy val sqlSpark = SqlDml.session(spark)
  import sqlSpark.implicits._

  private val schema = StructType(Seq(StructField("k", LongType),
    StructField("v", StringType), StructField("ts", LongType)))

  private def freshTable(name: String,
                         rows: Seq[(Long, String, Long)]): (LogTable, String) = {
    val root = java.nio.file.Files.createTempDirectory(s"sqldml-$name-")
      .resolve("t").toString
    val t = new LogTable(sqlSpark, root, schema)
    t.append(rows.toDF("k", "v", "ts"))
    sqlSpark.sql(s"DROP TABLE IF EXISTS $name")
    sqlSpark.sql(
      s"CREATE TABLE $name USING `graft-logtable` OPTIONS (path '$root')")
    (t, name)
  }

  private def rows(t: LogTable): Set[(Long, String, Long)] =
    t.read().collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  test("MERGE INTO: the reference M3 statement (recency-guarded upsert, " +
      "UPDATE SET * / INSERT *) lowers onto one OCC commit") {
    val (t, tbl) = freshTable("dml_m3",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L)))
    Seq((2L, "B2", 25L),  // newer: updates
        (3L, "C0", 5L),   // older: recency guard holds the target row
        (4L, "d", 40L))   // new key: inserts
      .toDF("k", "v", "ts").createOrReplaceTempView("m3_batch")
    val v0 = t.currentVersion
    sqlSpark.sql(
      s"""MERGE INTO $tbl t USING m3_batch s ON t.k = s.k
         |WHEN MATCHED AND s.ts > t.ts THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(rows(t) == Set((1L, "a", 10L), (2L, "B2", 25L),
      (3L, "c", 30L), (4L, "d", 40L)))
    assert(t.currentVersion == v0 + 1, "MERGE must cut exactly one version")
    sqlSpark.sql(s"DROP TABLE $tbl")
  }

  test("MERGE INTO: explicit assignments, DELETE clause, and " +
      "NOT MATCHED BY SOURCE — clause order and conditions honored") {
    val (t, tbl) = freshTable("dml_full",
      Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L)))
    Seq((1L, "gone", 99L), (2L, "upd", 99L), (5L, "new", 50L))
      .toDF("k", "v", "ts").createOrReplaceTempView("full_batch")
    sqlSpark.sql(
      s"""MERGE INTO $tbl t USING full_batch s ON t.k = s.k
         |WHEN MATCHED AND s.v = 'gone' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = concat(s.v, '!'), ts = s.ts
         |WHEN NOT MATCHED AND s.ts >= 50 THEN INSERT (k, v, ts) VALUES (s.k, s.v, s.ts)
         |WHEN NOT MATCHED BY SOURCE AND t.k = 4 THEN DELETE""".stripMargin)
    assert(rows(t) == Set(
      (2L, "upd!", 99L),   // second matched clause (first's condition false)
      (3L, "c", 30L),      // untouched by source, no NMBS clause applies
      (5L, "new", 50L)))   // conditional insert
    sqlSpark.sql(s"DROP TABLE $tbl")
  }

  test("UPDATE is file-scoped (untouched files shared across versions); " +
      "DELETE is a DV commit (no data file touched)") {
    val root = java.nio.file.Files.createTempDirectory("sqldml-upd-")
      .resolve("t").toString
    val t = new LogTable(sqlSpark, root, schema)
    // several files (one per append) so scoping is observable
    (0 until 4).foreach(i => t.append(
      (10L * i until 10L * (i + 1)).map(k => (k, s"v$k", k))
        .toDF("k", "v", "ts").coalesce(1)))
    sqlSpark.sql("DROP TABLE IF EXISTS dml_upd")
    sqlSpark.sql(s"CREATE TABLE dml_upd USING `graft-logtable` OPTIONS (path '$root')")
    val before = t.liveFileNames().toSet

    sqlSpark.sql("UPDATE dml_upd SET v = upper(v) WHERE k >= 35")
    val after = t.liveFileNames().toSet
    assert(before.intersect(after).size == 3,
      s"UPDATE must rewrite only the matching file (shared ${before.intersect(after).size})")
    assert(t.read().filter(col("k") >= 35).select(col("v")).collect()
      .forall(_.getString(0).startsWith("V")))
    assert(t.read().filter(col("k") < 35 && !col("v").startsWith("v")).count() == 0)

    val preDelete = t.liveFileNames().toSet
    sqlSpark.sql("DELETE FROM dml_upd WHERE k % 10 = 0")
    assert(t.liveFileNames().toSet == preDelete, "DELETE touched data files")
    assert(t.read().count() == 36)
    assert(t.read().filter(col("k") % 10 === 0).count() == 0)
    sqlSpark.sql("DROP TABLE dml_upd")
  }

  test("DML on a non-logtable target fails with a clear error") {
    sqlSpark.sql("DROP TABLE IF EXISTS dml_parquet")
    val dir = java.nio.file.Files.createTempDirectory("sqldml-pq-").toString
    Seq((1L, "a", 1L)).toDF("k", "v", "ts")
      .write.mode("overwrite").parquet(s"$dir/p")
    sqlSpark.sql(
      s"CREATE TABLE dml_parquet USING parquet OPTIONS (path '$dir/p')")
    val e = intercept[Exception](
      sqlSpark.sql("DELETE FROM dml_parquet WHERE k = 1"))
    assert(e.getMessage.contains("graft-logtable"),
      s"expected the writable-provider error, got: ${e.getMessage}")
    sqlSpark.sql("DROP TABLE dml_parquet")
  }

  test("OPTIMIZE / DESCRIBE HISTORY / VACUUM statements lower onto the log verbs") {
    val (t, tbl) = freshTable("dml_maint", Seq((1L, "a", 10L), (2L, "b", 20L)))
    t.append(Seq((3L, "c", 30L)).toDF("k", "v", "ts"))          // v2 WRITE
    sqlSpark.sql(s"DELETE FROM $tbl WHERE k = 1")               // v3 DELETE (DV)
    val rewritten = sqlSpark.sql(s"OPTIMIZE $tbl")              // v4 OPTIMIZE
      .collect().head.getLong(0)
    assert(rewritten > 0, "OPTIMIZE must rewrite files")

    val hist = sqlSpark.sql(s"DESCRIBE HISTORY $tbl").collect()
    val byVersion = hist.map(r =>
      (r.getLong(0), r.getString(2), r.getBoolean(3))).toSeq
    assert(byVersion.map(_._1) == Seq(4L, 3L, 2L, 1L),
      s"newest-first version order, got $byVersion")
    assert(byVersion.map(_._2) == Seq("OPTIMIZE", "DELETE", "WRITE", "WRITE"),
      s"operations inferred from action shapes, got $byVersion")
    assert(!byVersion.head._3, "OPTIMIZE is a dataChange = false commit")
    val ts = hist.sortBy(_.getLong(0)).map(_.getLong(1)).toSeq
    assert(ts == ts.sorted, "in-commit timestamps must ascend with versions")

    val removed = sqlSpark.sql(s"VACUUM $tbl RETAIN 1 VERSIONS")
      .collect().head.getLong(0)
    assert(removed == 3L, s"expected 3 versions pruned, got $removed")
    assert(rows(t) == Set((2L, "b", 20L), (3L, "c", 30L)),
      "live content must survive VACUUM")
    assert(sqlSpark.sql(s"DESCRIBE HISTORY $tbl").count() == 1L)
    sqlSpark.sql(s"DROP TABLE $tbl")
  }

  test("bare VACUUM is rejected — retention must be explicit (a default " +
      "RETAIN 1 would drop all history in one statement)") {
    val (t, tbl) = freshTable("dml_vacbare", Seq((1L, "a", 10L)))
    t.append(Seq((2L, "b", 20L)).toDF("k", "v", "ts"))
    val e = intercept[Exception](sqlSpark.sql(s"VACUUM $tbl"))
    assert(e.getMessage.contains("RETAIN"),
      s"expected the explicit-retention error, got: ${e.getMessage}")
    // nothing was pruned: both versions still readable
    assert(sqlSpark.sql(s"DESCRIBE HISTORY $tbl").count() == 2L)
    sqlSpark.sql(s"DROP TABLE $tbl")
  }

  test("DESCRIBE history <col> on a table actually NAMED history keeps " +
      "Spark's own meaning (text match disambiguated through the catalog)") {
    sqlSpark.sql("DROP TABLE IF EXISTS history")
    val dir = java.nio.file.Files.createTempDirectory("sqldml-hist-").toString
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(s"$dir/p")
    sqlSpark.sql(s"CREATE TABLE history USING parquet OPTIONS (path '$dir/p')")
    // DESCRIBE <table> <column>: must hit Spark's DESCRIBE, not the
    // maintenance command (which would error on the non-logtable provider)
    val d = sqlSpark.sql("DESCRIBE history k").collect()
    assert(d.exists(r => r.getString(0) == "col_name" && r.getString(1) == "k"),
      s"expected Spark's column DESCRIBE output, got: ${d.mkString(", ")}")
    sqlSpark.sql("DROP TABLE history")
  }
}
