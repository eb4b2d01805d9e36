package graft.operators

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.queries.TextQueries

/** Golden-fixture pin for m09 (JPEG decode + quality gate) — the
  * GoldenFixtureSpec pattern applied to the one multimodal verb whose
  * decode is deterministic but not analytically SQL-reproducible (lossy
  * IDCT rounding; JpegCodec scaladoc). The m09 oracle row reads THIS
  * committed fixture from DuckDB, so this spec is also the fixture's
  * generator and its drift alarm: if the JDK decoder, the codec plumbing,
  * or the stats math changes, both this spec and the m09 CORRECTNESS row
  * go red together.
  *
  * Regenerate after an INTENDED change with
  * `GRAFT_GOLDEN_REGEN=true sbt "testOnly graft.operators.JpegGoldenSpec"`
  * (env var — sbt forks the test JVM) and commit the rewritten fixture.
  * The fixture is cut at sf0.01, the driver's correctness scale factor.
  */
class JpegGoldenSpec extends SparkSpec {

  private val fixture =
    Paths.get("src/test/resources/golden/m09_jpeg_quality_gate.parquet")

  test("m09 decoded JPEG stats match the committed golden fixture") {
    val actual = TextQueries.m09.spark(spark, "/root/testdata/sf0.01")
    if (sys.env.get("GRAFT_GOLDEN_REGEN").contains("true")) {
      Files.createDirectories(fixture.getParent)
      val tmp = Files.createTempDirectory("golden-m09-")
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
      // names + types; a parquet read is always nullable, the in-plan
      // Dataset is not — the driver's compare has the same normalization
      def shape(df: org.apache.spark.sql.DataFrame) =
        df.schema.fields.map(f => (f.name, f.dataType)).toSeq
      assert(shape(actual) == shape(expected),
        s"m09 schema drift:\n actual  ${actual.schema.treeString}\n expected ${expected.schema.treeString}")
      val a = actual.collect().toSeq
      val e = expected.collect().toSeq
      assert(a == e, s"m09 golden-row mismatch (${a.size} vs ${e.size} rows)")
    }
  }

  test("both gate verdicts occur in the fixture corpus") {
    // a fixture where every image passes (or fails) would pin nothing about
    // the gate — the solid-color third must fail on contrast, textured
    // images of >= 16 px must pass
    val actual = TextQueries.m09.spark(spark, "/root/testdata/sf0.01")
    val byKeep = actual.groupBy("keep").count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(byKeep.getOrElse(true, 0L) > 0 && byKeep.getOrElse(false, 0L) > 0,
      s"degenerate gate fixture: $byKeep")
  }
}
