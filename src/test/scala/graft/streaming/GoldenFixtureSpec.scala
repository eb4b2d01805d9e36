package graft.streaming

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-FILE validation of the gold layer — the reference's `assert_rows`
  * (`Gold/06-gold.py:132-137`: collect the live table, collect a STORED
  * parquet fixture, assert row equality). The two-set replay runs end to
  * end through the real streaming waves, then `workout_bpm_summary` (the
  * exact 13-column projection) and the `gym_summary` view are diffed
  * full-row against parquet fixtures committed under
  * `src/test/resources/golden/` — so any drift in types, column set, or
  * values anywhere in the bronze→gold lineage fails here even if the count
  * matrix still passes.
  *
  * Regenerate after an INTENDED semantic change with
  * `GRAFT_GOLDEN_REGEN=true sbt "testOnly graft.streaming.GoldenFixtureSpec"`
  * (env var — sbt forks the test JVM) and commit the rewritten fixtures.
  */
class GoldenFixtureSpec extends SparkSpec {
  import MedallionFixtures.{set1, set2}

  private val goldenDir = Paths.get("src/test/resources/golden")

  /** 13-column projection + total order — the reference's gold select list
    * (`Gold/06-gold.py:97`) verbatim. */
  private def summary13(m: Medallion): DataFrame =
    m.summaryTable.read().select(
        col("workout_id"), col("session_id"), col("user_id"),
        col("start_time"), col("end_time"), col("age"), col("gender"),
        col("city"), col("state"), col("min_bpm"), col("avg_bpm"),
        col("max_bpm"), col("num_recordings"))
      .orderBy(col("user_id"), col("workout_id"), col("session_id"),
        col("start_time"))

  private def diffAgainstGolden(actual: DataFrame, name: String): Unit = {
    val fixture = goldenDir.resolve(s"$name.parquet")
    if (sys.env.get("GRAFT_GOLDEN_REGEN").contains("true")) {
      Files.createDirectories(goldenDir)
      val tmp = Files.createTempDirectory(s"golden-$name-")
      actual.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      import scala.jdk.CollectionConverters._
      val part = Files.list(tmp).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      Files.deleteIfExists(fixture)
      Files.move(part, fixture)
    } else {
      assert(Files.exists(fixture),
        s"missing golden fixture $fixture — regenerate with GRAFT_GOLDEN_REGEN=true")
      val expected = spark.read.parquet(fixture.toString)
      assert(actual.schema == expected.schema,
        s"$name schema drift:\n actual  ${actual.schema.treeString}\n expected ${expected.schema.treeString}")
      val a = actual.collect().toSeq
      val e = expected.collect().toSeq
      assert(a == e, s"$name golden-row mismatch:\n actual:   $a\n expected: $e")
    }
  }

  test("gold tables match the committed golden fixtures row-for-row") {
    val root = Files.createTempDirectory("golden-medallion-")
    val landing = root.resolve("landing")
    val m = new Medallion(spark, landing.toString, s"$root/tables", s"$root/ckpt",
      lit("2024-01-15").cast("date"))
    set1(landing)
    m.runAll(MedallionFixtures.dateLookup(spark))
    set2(landing)
    m.runAll(MedallionFixtures.dateLookup(spark))
    diffAgainstGolden(summary13(m), "workout_bpm_summary")
    // gymSummary already carries the reference view's ORDER BY
    diffAgainstGolden(m.gymSummary(), "gym_summary")
  }
}
