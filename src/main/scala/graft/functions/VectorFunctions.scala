package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions. Two implementations of cosine:
  *   - [[cosineSim]]: the native codegen'd [[CosineSimilarity]] expression
  *     (registered once per session, used via `call_function`) — the hot path;
  *   - [[cosineFold]]: pure built-in `zip_with`+`aggregate` composition —
  *     the no-extension fallback, same sequential fold semantics.
  */
object VectorFunctions {

  private val FuncName = "cosine_sim"

  /** Idempotently register the native expression in the session's function
    * registry (temp function — survives for the session lifetime). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")

  /** Cosine similarity via the native expression; call [[register]] first. */
  def cosineSim(a: Column, b: Column): Column =
    call_function(FuncName, a.cast("array<double>"), b.cast("array<double>"))

  /** Cosine similarity from built-ins only (sequential fold — bit-identical
    * to the native expression and to a sequential oracle). */
  def cosineFold(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = aggregate(ad, lit(0.0), (acc, v) => acc + v * v)
    val nb = aggregate(bd, lit(0.0), (acc, v) => acc + v * v)
    when(na === 0.0 || nb === 0.0, lit(0.0))
      .otherwise(dot / (sqrt(na) * sqrt(nb)))
  }

  /** Deterministic random-hyperplane sign-LSH bucket (16-bit) for an
    * embedding column — the 100 TB path for similarity search: bucket by
    * LSH, join within buckets, exact-rank survivors. Hyperplane components
    * are derived from a splitmix-style integer hash of (plane, dim) — no RNG
    * state, identical on every executor.
    */
  def signLshBucket(v: Column, planes: Int = 16, dims: Int = 64): Column = {
    def mix(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    val vd = v.cast("array<double>")
    val bits = (0 until planes).map { p =>
      // plane component for dim d in [-0.5, 0.5): deterministic from (p,d)
      val comps = (0 until dims).map { d =>
        lit(mix(p.toLong * 1000003L + d).toDouble / 9.223372036854776e18 / 2.0)
      }
      val plane = array(comps: _*)
      val dot = aggregate(zip_with(vd, plane, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
      when(dot > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }
}
