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
  private val LshName = "sign_lsh"
  private val QuantName = "quantize_int8"
  private val QuantVecName = "quantize_int8_vec"
  private val CellsName = "nearest_cells"
  private val CellL2Name = "nearest_cell_l2"
  private val HierName = "hierarchical_cells"
  private val PqEncName = "pq_encode"
  private val PqTabName = "pq_dist_table"
  private val PqAdcName = "pq_adc"
  private val ResName = "residual_vec"

  /** Idempotently register the native expressions in the session's function
    * registry (temp functions — survive for the session lifetime). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName, exprs => CosineSimilarity(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      LshName, exprs => SignLsh(exprs(0),
        exprs(1).eval().asInstanceOf[Int], exprs(2).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      QuantName, exprs => QuantizeInt8(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      QuantVecName, exprs => QuantizeInt8Vec(exprs(0)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CellsName, exprs => NearestCellsExpr(exprs(0),
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        exprs(2).eval().asInstanceOf[Int], exprs(3).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      HierName, exprs => {
        def dArr(i: Int) = exprs(i).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toDoubleArray()
        def iArr(i: Int) = exprs(i).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toIntArray()
        def int(i: Int) = exprs(i).eval().asInstanceOf[Int]
        HierarchicalCellsExpr(exprs.head, dArr(1), dArr(2), iArr(3), iArr(4),
          int(5), int(6), int(7))
      }, "built-in")
    def pqArgs(exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) = (
      exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray(),
      exprs(2).eval().asInstanceOf[Int], exprs(3).eval().asInstanceOf[Int],
      exprs(4).eval().asInstanceOf[Int])
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PqEncName, exprs => {
        val (cb, m, k, d) = pqArgs(exprs); PqEncodeExpr(exprs(0), cb, m, k, d)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PqTabName, exprs => {
        val (cb, m, k, d) = pqArgs(exprs); PqDistTableExpr(exprs(0), cb, m, k, d)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      PqAdcName, exprs => PqAdcExpr(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[Int], exprs(3).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      ResName, exprs => ResidualExpr(exprs(0), exprs(1),
        exprs(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toDoubleArray(),
        exprs(3).eval().asInstanceOf[Int]),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      CellL2Name, exprs => NearestCellL2Expr(exprs(0),
        exprs(1).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
          .toLongArray(),
        exprs(2).eval().asInstanceOf[Int]),
      "built-in")
  }

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

  /** Native int8 symmetric quantization → struct(scale, q_csv); call
    * [[register]] first. The codegen'd hot path for bulk embedding
    * compression — see [[QuantizeInt8]]. */
  def quantizeInt8(v: Column): Column =
    call_function(QuantName, v.cast("array<double>"))

  /** Quantized components as exact integer-valued doubles
    * ([[QuantizeInt8Vec]]) — the SQ8 scoring domain; call [[register]]
    * first. */
  def quantizeInt8Vec(v: Column): Column =
    call_function(QuantVecName, v.cast("array<double>"))

  /** Int8 quantization from built-ins only (`aggregate` max-abs +
    * `transform` floor) — the no-extension fallback; identical semantics to
    * [[quantizeInt8]] but evaluates interpreted per row. */
  def quantizeInt8Fold(v: Column): Column = {
    val ad = v.cast("array<double>")
    val maxabs = aggregate(ad, lit(0.0), (acc, x) => greatest(acc, abs(x)))
    struct(
      when(maxabs === 0.0, lit(0.0)).otherwise(maxabs / 127).as("scale"),
      when(maxabs === 0.0, array_join(transform(ad, _ => lit("0")), ","))
        .otherwise(array_join(
          transform(ad, x => floor(x / (maxabs / 127) + lit(0.5)).cast("string")), ","))
        .as("q_csv"))
  }

  /** Top-`take` centroid cells of `v` as array<struct<a, cell>> sorted by
    * (cos desc, cell desc) — native fused assignment loop over the whole
    * centroid matrix ([[NearestCellsExpr]]); call [[register]] first. */
  def nearestCells(v: Column, flatCents: Seq[Double], dims: Int,
                   take: Int): Column =
    call_function(CellsName, v.cast("array<double>"),
      typedlit(flatCents), lit(dims), lit(take))

  /** Nearest cell by exact integer squared-L2 on the int8-quantized domain
    * ([[NearestCellL2Expr]] — map-only Lloyd assignment, no join/shuffle);
    * call [[register]] first. */
  def nearestCellL2(v: Column, flatCents: Seq[Long], dims: Int): Column =
    call_function(CellL2Name, v.cast("array<bigint>"),
      typedlit(flatCents), lit(dims))

  /** Two-level centroid assignment ([[HierarchicalCellsExpr]]); call
    * [[register]] first. Layout contract documented on the expression. */
  def hierarchicalCells(v: Column, superCents: Seq[Double],
                        memberCents: Seq[Double], memberCellIds: Seq[Int],
                        groupOffsets: Seq[Int], dims: Int, probeSupers: Int,
                        take: Int): Column =
    call_function(HierName, v.cast("array<double>"), typedlit(superCents),
      typedlit(memberCents), typedlit(memberCellIds), typedlit(groupOffsets),
      lit(dims), lit(probeSupers), lit(take))

  /** PQ code of an embedding (nibble-packed long); call [[register]] first.
    * Codebook layout per [[PqEncodeExpr]]. */
  def pqEncode(v: Column, cb: Seq[Double], m: Int, ksub: Int, dsub: Int): Column =
    call_function(PqEncName, v.cast("array<double>"), typedlit(cb),
      lit(m), lit(ksub), lit(dsub))

  /** Per-query ADC distance table ([[PqDistTableExpr]]); call [[register]]
    * first. */
  def pqDistTable(v: Column, cb: Seq[Double], m: Int, ksub: Int, dsub: Int): Column =
    call_function(PqTabName, v.cast("array<double>"), typedlit(cb),
      lit(m), lit(ksub), lit(dsub))

  /** ADC score of a code against a distance table ([[PqAdcExpr]]); call
    * [[register]] first. */
  def pqAdc(table: Column, code: Column, m: Int, ksub: Int): Column =
    call_function(PqAdcName, table, code, lit(m), lit(ksub))

  /** Residual against the assigned centroid ([[ResidualExpr]], matrix as a
    * reference object, fused loop); call [[register]] first. */
  def residualVec(v: Column, cell: Column, flatCents: Seq[Double],
                  dims: Int): Column =
    call_function(ResName, v.cast("array<double>"), cell.cast("int"),
      typedlit(flatCents), lit(dims))

  /** Deterministic random-hyperplane sign-LSH bucket for an embedding
    * column — the 100 TB path for similarity search: bucket by LSH, join
    * within buckets, exact-rank survivors. Backed by the native codegen'd
    * [[SignLsh]] expression (plane matrix is a codegen reference object, one
    * tight loop per row); call [[register]] first. */
  def signLshBucket(v: Column, planes: Int = 16, dims: Int = 64): Column =
    call_function(LshName, v.cast("array<double>"), lit(planes), lit(dims))
}
