package graft.operators

import java.nio.file.Files
import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** SERVE-WHILE-RETRAINING isolation on the persisted [[VectorIndex]]: a
  * reader that opened the index before a [[VectorIndex.retrain]] finishes
  * on the generation it opened — exactly one committed version, never a
  * mix — because a retrain writes the ENTIRE next generation beside the
  * live one and only then flips the `_gen` pointer (the old generation's
  * files are never moved or touched). Before the generational layout this
  * failed hard: the rename cutover made the pinned reader's files vanish
  * mid-flight. */
class ServeDuringRetrainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq

  private def queryDf(idx: VectorIndex) =
    idx.query(emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 4, shortlist = 50)

  test("a query opened before retrain executes on its own generation; a " +
      "query opened after sees the new one — never a mix") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-serve-")
    val idx = new VectorIndex(spark, root.toString)
    // half-corpus build: the retrain genuinely changes the geometry
    idx.build(emb.filter(col("vec_id") % 2 === 0))
    val expected = rows(queryDf(idx)) // pre-retrain truth
    val pinned = queryDf(idx)         // OPENED pre-retrain, not yet executed
    idx.retrain(emb)                  // full-corpus generation, pointer flip
    assert(rows(pinned) == expected,
      "the pre-retrain reader must finish on its own snapshot")
    val after = rows(queryDf(idx))
    assert(after != expected,
      "post-retrain reader must see the new generation (fixture too weak " +
        "if geometries coincide)")
    // and the retired generation stays explicitly addressable
    assert(rows(idx.version(idx.versions.last).query(
      emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 4, shortlist = 50)) == expected)
  }

  test("reader pinned across TWO retrains still serves its snapshot " +
      "(generations accumulate; nothing vanishes)") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-serve2-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb.filter(col("vec_id") % 3 === 0))
    val expected = rows(queryDf(idx))
    val pinned = queryDf(idx)
    idx.retrain(emb.filter(col("vec_id") % 2 === 0))
    idx.retrain(emb)
    assert(rows(pinned) == expected)
    assert(idx.versions == Seq(1L, 2L))
  }

  test("vacuumVersions drops old generations, keeps the newest `keep` " +
      "retired ones, never touches the live one") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-gc-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb.filter(col("vec_id") % 3 === 0))
    idx.retrain(emb.filter(col("vec_id") % 2 === 0))
    idx.retrain(emb)
    val liveBefore = rows(queryDf(idx))
    assert(idx.vacuumVersions(keep = 1) == Seq(1L))
    assert(idx.versions == Seq(2L), "newest retired generation must survive")
    assert(rows(queryDf(idx)) == liveBefore, "live generation untouched")
    assert(rows(idx.version(2).query(emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 4, shortlist = 50)).nonEmpty)
    intercept[IllegalArgumentException](idx.version(1)) // dropped
    assert(idx.vacuumVersions(keep = 0) == Seq(2L) && idx.versions.isEmpty)
  }

  test("reader pinned pre-buildMeta never sees path-not-found through a " +
      "buildMeta -> append sequence (staged generation flips on first append)") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-stage-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb.filter(col("vec_id") % 2 === 0))
    val expected = rows(queryDf(idx))
    val pinned = queryDf(idx) // opened pre-buildMeta, not yet executed
    // stage the next generation's meta only: the pointer must NOT move —
    // a moved pointer made this very read die path-not-found (ADVICE r11)
    idx.buildMeta(emb)
    assert(rows(pinned) == expected,
      "pinned reader must keep serving the live generation across buildMeta")
    assert(rows(queryDf(idx)) == expected,
      "a FRESH reader between buildMeta and the first append must also " +
        "serve the previous live generation (no index exists for the staged one)")
    idx.append(emb) // first codes for the staged generation -> pointer flip
    val after = rows(queryDf(idx))
    assert(after.nonEmpty && after != expected,
      "post-append reader must see the staged generation gone live")
  }
}
