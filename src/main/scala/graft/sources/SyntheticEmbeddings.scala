package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic CLUSTERABLE embedding corpus — the fixture for the
  * graph-ANN build-scaling evidence (COVERAGE "Scaling evidence (r14)").
  *
  * The driver testdata's embeddings are deliberately near-uniform on the
  * sphere (pairwise cos ~0±0.1, p99 0.29), which is the WORST case for IVF:
  * at fixed recall nprobe must scale ∝ nlist, so the kNN-graph build is
  * O(n²/50) — the documented super-linear class (r12/r13). Real embedding
  * corpora (sentence/image encoders over natural data) have cluster
  * structure; this generator plants it deterministically, no RNG:
  *
  *  - `n / perCell` clusters; center c_g = the normalized hash-derived
  *    point (MurmurHash3 of (cluster, dim) mapped to [-1, 1]);
  *  - vector v = normalize(c_g + σ·u) with u_i = hash-derived uniform
  *    [-1, 1] per (vec_id, dim): within-cluster cosine ≈ 0.55–0.74 at
  *    σ = 0.16, D = 64, vs cross-cluster ~0 (probe-verified; max ≈ 0.54) —
  *    the separation regime of real encoder output;
  *  - cluster assignment is hash(vec_id), so any id-stride sample (the
  *    centroid seeding) is a ~uniform cluster sample.
  *
  * Schema matches the driver's `embeddings.parquet`: (vec_id long,
  * embedding array<float>, label int = cluster id). Everything is a pure
  * function of (n, dims, perCell, sigma) — two calls at any scale agree
  * bit-for-bit, so measurements and specs share one world. */
object SyntheticEmbeddings {

  def clusterCount(n: Long, perCell: Int): Int =
    math.max(16L, n / perCell).toInt

  def generate(spark: SparkSession, n: Long, dims: Int = 64,
               perCell: Int = 50, sigma: Double = 0.16): DataFrame = {
    val g = clusterCount(n, perCell)
    val centers = (0 until g).map { c =>
      val raw = Array.tabulate(dims)(i =>
        scala.util.hashing.MurmurHash3.productHash((c, i, 1031)).toDouble /
          Int.MaxValue)
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      (c, raw.map(_ / nrm).toSeq)
    }
    val centDf = spark.createDataFrame(centers).toDF("cluster", "center")
    val base = spark.range(n).select(col("id").as("vec_id"),
      pmod(hash(col("id"), lit(7)), lit(g)).as("cluster"))
    base.join(broadcast(centDf), "cluster")
      .withColumn("raw", expr(
        s"""transform(sequence(0, ${dims - 1}), i ->
           |  element_at(center, i + 1) +
           |  $sigma * (pmod(hash(vec_id, i, 13), 1000001) / 500000.0d - 1.0d))
           |""".stripMargin))
      .withColumn("nrm", expr(
        "sqrt(aggregate(raw, 0.0d, (acc, x) -> acc + x * x))"))
      .select(col("vec_id"),
        expr("transform(raw, x -> cast(x / nrm as float))").as("embedding"),
        col("cluster").cast("int").as("label"))
  }
}
