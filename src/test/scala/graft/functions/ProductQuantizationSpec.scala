package graft.functions

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.functions.col

/** Pins the PQ contract behind v09/v10: nibble-packed codes stay in range,
  * ADC of a vector against its own code equals the sum of its per-subspace
  * minima (encode IS the per-subspace argmin), codebook sample vectors
  * reconstruct at distance zero, and recall floors vs brute force on the
  * near-random testdata embeddings (the worst case for any quantizer —
  * documented in COVERAGE.md's recall curve). */
class ProductQuantizationSpec extends SparkSpec {
  import spark.implicits._

  private val M = 8; private val Ksub = 16; private val Dsub = 8

  private lazy val emb = spark.read.parquet(s"$sf001/embeddings.parquet")

  private lazy val cb: Array[Double] = {
    val samples = emb.filter($"vec_id" % 31 === 0).orderBy($"vec_id").limit(Ksub)
      .select(col("embedding").cast("array<double>"))
      .collect().map(_.getSeq[Double](0))
    (0 until M).flatMap { sub =>
      samples.flatMap(row => (0 until Dsub).map(d => row(sub * Dsub + d)))
    }.toArray
  }

  test("codes are nibble-packed: every nibble < ksub, value < 2^32") {
    VectorFunctions.register(spark)
    val codes = emb.select(
        VectorFunctions.pqEncode(col("embedding"), cb.toIndexedSeq, M, Ksub, Dsub))
      .as[Long].collect()
    assert(codes.length == 500)
    codes.foreach { c =>
      assert(c >= 0L && (c >>> (4 * M)) == 0L, s"code $c out of envelope")
      (0 until M).foreach(s => assert(((c >> (4 * s)) & 0xf) < Ksub))
    }
  }

  test("ADC of own code = sum of per-subspace minima; sample vectors at 0") {
    VectorFunctions.register(spark)
    val both = emb.select(col("vec_id"),
        VectorFunctions.pqAdc(
          VectorFunctions.pqDistTable(col("embedding"), cb.toIndexedSeq, M, Ksub, Dsub),
          VectorFunctions.pqEncode(col("embedding"), cb.toIndexedSeq, M, Ksub, Dsub),
          M, Ksub).as("self"),
        VectorFunctions.pqDistTable(col("embedding"), cb.toIndexedSeq, M, Ksub, Dsub).as("t"))
      .as[(Long, Double, Seq[Double])].collect()
    both.foreach { case (id, self, t) =>
      val minSum = (0 until M).map(s => t.slice(s * Ksub, (s + 1) * Ksub).min).sum
      assert(math.abs(self - minSum) < 1e-12, s"vec $id: $self != $minSum")
      if (id % 31 == 0 && id / 31 < Ksub) // a codebook sample: exact reconstruction
        assert(self == 0.0, s"sample vec $id should self-reconstruct, got $self")
    }
  }

  test("recall floors vs brute force (worst-case random vectors)") {
    VectorFunctions.register(spark)
    val q = emb.filter($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(q, emb, VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // pure ADC: deterministic 0.04 on sf0.001 (0.12 on sf0.01) — random
    // 64-d vectors are the incompressible worst case for a 16-entry sampled
    // codebook; the rerank bound below is the deployed shape's number
    val adc = Similarity.pqTopK(q, emb, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & adc).size.toDouble / bf.size >= 0.04)
    assert(adc.groupBy(_._1).forall(_._2.size == 5))
    // deployed shape: ADC shortlist 100 of 500 + exact re-rank — 0.72 here
    val rr = Similarity.pqTopKRerank(q, emb, VectorFunctions.cosineSim, 5,
        shortlist = 100)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & rr).size.toDouble / bf.size >= 0.6,
      s"rerank recall ${(bf & rr).size.toDouble / bf.size}")
  }

  test("residualVec: centroid's own vector has zero residual; residual " +
      "IVF-PQ holds the recall floor and returns full top-k") {
    VectorFunctions.register(spark)
    // vec 0 IS cell 0's centroid (stride sample starts at id 0), so its
    // residual against cell 0 must be EXACTLY the zero vector
    val cents = Similarity.strideCentroids(emb, 16)
    val flat = cents.flatMap(_._2).toIndexedSeq
    val own = emb.filter($"vec_id" === 0)
      .select(VectorFunctions.residualVec(col("embedding"),
        org.apache.spark.sql.functions.lit(0), flat, 64))
      .collect().head.getSeq[Double](0)
    assert(own.length == 64 && own.forall(_ == 0.0),
      "centroid self-residual must be exactly 0")

    val q = emb.filter($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(q, emb, VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val res = Similarity.ivfPqResidualTopK(q, emb, VectorFunctions.cosineSim,
        k = 5, shortlist = 100) // v10's R=100 precedent on worst-case data
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(res.groupBy(_._1).size == 10 &&
      res.groupBy(_._1).values.forall(_.size == 5), "full top-k per query")
    assert((bf & res).size.toDouble / bf.size >= 0.5,
      s"residual IVF-PQ recall ${(bf & res).size.toDouble / bf.size}")
  }

  test("all three expressions reject inconsistent geometry at plan time") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    val one = Literal(1)
    val oneL = Literal(1L)
    val cbBig = new Array[Double](8 * 32 * 8) // ksub=32: codes overflow a nibble
    assertThrows[IllegalArgumentException](PqEncodeExpr(one, cbBig, 8, 32, 8))
    assertThrows[IllegalArgumentException](PqDistTableExpr(one, cbBig, 8, 32, 8))
    assertThrows[IllegalArgumentException](PqAdcExpr(one, oneL, 8, 32))
    val cbWide = new Array[Double](16 * 16 * 4) // m=16: 64 bits > int64 envelope
    assertThrows[IllegalArgumentException](PqDistTableExpr(one, cbWide, 16, 16, 4))
    assertThrows[IllegalArgumentException](PqAdcExpr(one, oneL, 16, 16))
  }
}
