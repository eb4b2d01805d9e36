package graft.operators

import java.nio.file.{Files, Paths}
import graft.SparkSpec
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** [[VectorIndex.retrain]] (v19): re-train + re-encode from the current
  * corpus, cut a new generation, old generation stays queryable. Pins:
  * post-retrain query ≡ fresh build on the same corpus bit-for-bit, the
  * cutover retires the previous meta/index/tombstones intact (version
  * readback reproduces pre-retrain results exactly), and tombstones fold
  * into the rebuild (retrain is also a vacuum). */
class RetrainSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Double, Int)].collect().toSeq

  private def query(idx: VectorIndex) =
    rows(idx.query(emb.filter(col("vec_id") < 10), emb,
      VectorFunctions.cosineSim, k = 5, nprobe = 4, shortlist = 50))

  test("retrain after drift ≡ fresh build on the same corpus, bit-for-bit") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-retrain-")
    val idx = new VectorIndex(spark, root.toString)
    // drifted construction: train on half, append the rest with frozen meta
    idx.build(emb.filter(col("vec_id") % 2 === 0))
    idx.append(emb.filter(col("vec_id") % 2 === 1))
    val drifted = query(idx)
    idx.retrain(emb)
    val retrained = query(idx)
    val fresh = new VectorIndex(spark,
      Files.createTempDirectory("vidx-fresh-").toString)
    fresh.build(emb)
    assert(retrained == query(fresh),
      "retrained index must equal a fresh build on the same corpus")
    // the retrain actually changed the geometry (the drifted meta was a
    // half-corpus stride) — otherwise this spec proves nothing
    assert(drifted != retrained, "drifted and retrained queries coincide; " +
      "the drift construction no longer exercises retrain")
  }

  test("cutover retires the old generation readable; new gen starts clean") {
    VectorFunctions.register(spark)
    val root = Files.createTempDirectory("vidx-cut-")
    val idx = new VectorIndex(spark, root.toString)
    idx.build(emb.filter(col("vec_id") % 2 === 0))
    idx.append(emb.filter(col("vec_id") % 2 === 1))
    idx.delete(emb.filter(col("vec_id") % 11 === 0).select(col("vec_id")))
    val before = query(idx)
    idx.retrain(emb)
    // old generation: readable via version(), reproduces pre-retrain results
    // exactly — including its own tombstone mask
    assert(idx.versions == Seq(1L))
    assert(query(idx.version(1)) == before)
    assert(Files.exists(root.resolve(".v-1/meta")) &&
      Files.exists(root.resolve(".v-1/index")) &&
      Files.exists(root.resolve(".v-1/tombstones")))
    // new generation folded the tombstones in: no tombstone dir, and the
    // deleted ids are PHYSICALLY absent from the re-encoded index
    assert(!Files.exists(idx.liveRoot.resolve("tombstones")))
    val reencoded = spark.read.parquet(idx.liveRoot.resolve("index").toString)
    assert(reencoded.filter(col("vec_id") % 11 === 0).count() == 0)
    // the live generation is a fresh dir, not the old one mutated
    assert(idx.liveRoot == root.resolve(".v-2"))
    intercept[IllegalArgumentException](idx.version(99))
    intercept[IllegalArgumentException](idx.version(2)) // live, not retired
  }

  test("occupancy-skew trigger fires exactly once on s32's append sequence") {
    // replays the s32 maintenance loop batch-by-batch and pins the SIGNAL
    // trajectory that makes the trigger exactly-once: the organic appends
    // (batches 0-1) keep occupancySkew strictly under the 2.4x-uniform
    // threshold — so an early firing is impossible — and the clone burst
    // (batch 2) crosses it. (Retrain does NOT drive the signal back down
    // here: identical clone vectors stay co-located under ANY geometry,
    // which is exactly why the production loop also keeps a fired-guard /
    // cooldown instead of trusting the signal to self-reset.)
    VectorFunctions.register(spark)
    val skewSrc = emb.filter(col("vec_id") < 2)
      .select(col("vec_id").as("sid"), col("embedding").as("semb"))
    val corpus = emb.join(broadcast(skewSrc), col("vec_id") % 2 === col("sid"))
      .select(col("vec_id"),
        when(col("vec_id") % 3 === 2, col("semb"))
          .otherwise(col("embedding")).as("embedding"))
    val idx = new VectorIndex(spark,
      Files.createTempDirectory("vidx-trigger-").toString)
    idx.buildMeta(corpus.filter(col("vec_id") % 3 === 0))
    val threshold = 2.4
    val skews = (0 until 3).map { i =>
      idx.append(corpus.filter(col("vec_id") % 3 === i))
      idx.occupancySkew()
    }
    assert(skews.take(2).forall(_ < threshold),
      s"organic batches must stay under the threshold; skew trajectory $skews")
    assert(skews(2) >= threshold,
      s"the burst batch must cross the threshold; skew trajectory $skews")
    // firing on that crossing = retrain on everything ingested; the cutover
    // retires generation 1 (old index queryable — the other test's pins)
    idx.retrain(corpus)
    assert(idx.versions == Seq(1L))
  }
}
