package graft.queries

import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions
import graft.operators.{Dedup, Similarity}
import graft.sources.Tables

/** Embedding similarity operators over the `embeddings` table. Cosine is
  * computed by the native codegen'd [[graft.functions.CosineSimilarity]]
  * expression (sequential fold — bit-compatible with the DuckDB oracle's
  * sequential list_sum), rounded to 6 decimals before any threshold/rank so
  * both engines see the same ordering.
  */
object VectorQueries {

  /** DuckDB cosine over double lists, same sequential fold. */
  private val cosSql = (a: String, b: String) =>
    s"""(CASE WHEN list_sum(list_transform($a, x -> x*x)) = 0
       |      OR list_sum(list_transform($b, x -> x*x)) = 0 THEN 0.0
       | ELSE list_sum([$a[i] * $b[i] for i in generate_series(1, length($a))])
       |      / (sqrt(list_sum(list_transform($a, x -> x*x)))
       |         * sqrt(list_sum(list_transform($b, x -> x*x)))) END)""".stripMargin
      .replace("\n", " ")

  /** Embedding near-dup: same-label blocking + exact cosine ≥ 0.8. */
  val v01 = QueryDef(
    "v01_embedding_neardup",
    (spark, dir) => {
      VectorFunctions.register(spark)
      Dedup.embeddingNearDup(Tables.embeddings(spark, dir), "vec_id", "embedding",
          "label", VectorFunctions.cosineSim, minCos = 0.8)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some {
      val cos = cosSql("a.emb", "b.emb")
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, round($cos, 6) AS cos
         |FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
         |WHERE round($cos, 6) >= 0.8
         |ORDER BY id_a, id_b""".stripMargin
    },
    "embedding cosine near-dup with label blocking (LLM-pipeline op)")

  /** Brute-force cosine top-5 for the first 10 vectors as queries. */
  val v02 = QueryDef(
    "v02_ann_bruteforce",
    (spark, dir) => {
      VectorFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      Similarity.bruteForceTopK(
          emb.filter(col("vec_id") < 10), emb,
          VectorFunctions.cosineSim, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    Some {
      val cos = cosSql("q.emb", "c.emb")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
         |scored AS (
         |  SELECT q.vec_id AS query_id, c.vec_id, round($cos, 6) AS cos
         |  FROM e q JOIN e c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, vec_id, cos, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scored) WHERE rank <= 5
         |ORDER BY query_id, rank""".stripMargin
    },
    "ANN baseline: brute-force cosine top-k (LLM-pipeline op)")

  /** Sign-LSH bucketed ANN — the scale path. No SQL oracle (the bucket
    * function is engine-specific); the driver records a rows-only check, and
    * the ScalaTest spec asserts recall ≥ 0.6 against the brute-force result. */
  val v03 = QueryDef(
    "v03_ann_lsh",
    (spark, dir) => {
      VectorFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      Similarity.lshTopK(
          emb.filter(col("vec_id") < 10), emb,
          VectorFunctions.cosineSim, k = 5)
        .orderBy(col("query_id"), col("rank"))
    },
    None,
    "ANN scale path: sign-LSH bucket pruning + exact re-rank (LLM-pipeline op)")

  /** IVF-partitioned ANN — centroid cells + nprobe search + exact re-rank.
    * Rows-only check (centroid assignment is engine-specific); the spec
    * asserts recall ≥ 0.5 vs brute force. */
  val v04 = QueryDef(
    "v04_ann_ivf",
    (spark, dir) => {
      VectorFunctions.register(spark)
      val emb = Tables.embeddings(spark, dir)
      Similarity.ivfTopK(
          emb.filter(col("vec_id") < 10), emb,
          VectorFunctions.cosineSim, k = 5, nlist = 16, nprobe = 4)
        .orderBy(col("query_id"), col("rank"))
    },
    None,
    "ANN scale path 2: IVF centroid cells + nprobe + exact re-rank (LLM-pipeline op)")

  def defs: Seq[QueryDef] = Seq(v01, v02, v03, v04)
}
