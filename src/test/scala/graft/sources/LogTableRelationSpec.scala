package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.merge.LogTable

/** The batch/SQL face of the log table ([[LogTableRelation]]): self-
  * describing reads (no .schema), df.write save modes, SQL DDL + INSERT
  * INTO through the CAS protocol, versionAsOf time travel, and filter
  * pushdown reaching buildScan. */
class LogTableRelationSpec extends SparkSpec {
  import spark.implicits._

  private val s2 = StructType(Seq(
    StructField("k", LongType), StructField("v", StringType)))

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("self-describing batch read: the first commit embeds the schema, " +
      "spark.read needs no .schema(); versionAsOf serves time travel " +
      "with each version's DVs") {
    val root = tmp("ltr-read-")
    val t = new LogTable(spark, root, s2)
    t.overwrite((1L to 6L).map(i => (i, s"v$i")).toDF("k", "v"))        // v1
    assert(t.deleteWhere(col("k") % 2 === 0) == 3L)                     // v2 (DV)
    val live = spark.read.format("graft-logtable").load(root)
    assert(live.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(live.orderBy("k").as[(Long, String)].collect().map(_._1).toSeq ==
      Seq(1L, 3L, 5L))
    val asOf1 = spark.read.format("graft-logtable")
      .option("versionAsOf", "1").load(root)
    assert(asOf1.count() == 6L, "versionAsOf must resurrect the DV delete")
  }

  test("df.write save modes commit through the log; append accumulates, " +
      "overwrite replaces, errorIfExists refuses a non-empty table") {
    val root = tmp("ltr-write-") + "/t"
    Seq((1L, "a")).toDF("k", "v").write.format("graft-logtable").save(root)
    Seq((2L, "b")).toDF("k", "v").write.format("graft-logtable")
      .mode("append").save(root)
    assert(spark.read.format("graft-logtable").load(root).count() == 2L)
    intercept[Exception](Seq((3L, "c")).toDF("k", "v")
      .write.format("graft-logtable").save(root)) // default = errorIfExists
    Seq((9L, "z")).toDF("k", "v").write.format("graft-logtable")
      .mode("overwrite").save(root)
    assert(spark.read.format("graft-logtable").load(root)
      .as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    // both writes are log commits: full history is intact
    assert(new LogTable(spark, root, s2).history() == Seq(1L, 2L, 3L))
  }

  test("SQL end-to-end: CREATE TABLE USING, INSERT INTO (append + " +
      "overwrite), SELECT with a pushed filter") {
    val root = tmp("ltr-sql-") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format("graft-logtable").option("statsBy", "k").save(root)
    spark.sql(s"CREATE TABLE ltr_sql USING `graft-logtable` OPTIONS (path '$root')")
    try {
      spark.sql("INSERT INTO ltr_sql VALUES (3, 'c')")
      assert(spark.sql("SELECT k, v FROM ltr_sql ORDER BY k")
        .as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")))
      // filters reach buildScan (PushedFilters in the DSv1 scan node) and
      // Spark still re-evaluates them (pruning is a superset move)
      val q = spark.sql("SELECT v FROM ltr_sql WHERE k >= 2 AND k <= 2")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThanOrEqual"),
        s"filters did not reach the relation scan:\n$plan")
      assert(q.as[String].collect().toSeq == Seq("b"))
      spark.sql("INSERT OVERWRITE TABLE ltr_sql VALUES (7, 'x')")
      assert(spark.sql("SELECT count(*) FROM ltr_sql").head().getLong(0) == 1L)
    } finally spark.sql("DROP TABLE IF EXISTS ltr_sql")
  }
}
