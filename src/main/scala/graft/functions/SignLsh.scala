package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native random-hyperplane sign-LSH bucketing: bit p of the result is the
  * sign of ⟨vec, plane_p⟩. The plane matrix is derived deterministically from
  * a splitmix64-style hash of (seed, p, d) — no RNG state, identical on every
  * executor — and is attached to the generated code as a reference object, so
  * the per-row work is one tight double loop inside whole-stage codegen
  * (the `array(lit...)`+HOF formulation costs ~2000 interpreted expression
  * nodes per row; this is the scale-path replacement).
  */
case class SignLsh(child: Expression, planes: Int, dims: Int, seed: Long = 42L)
    extends UnaryExpression {

  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.simpleString}")
  }

  @transient lazy val planeMatrix: Array[Double] = SignLsh.matrix(planes, dims, seed)

  override def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val n = math.min(dims, x.numElements())
    var bits = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      var d = 0
      val off = p * dims
      while (d < n) { dot += x.getDouble(d) * planeMatrix(off + d); d += 1 }
      if (dot > 0) bits |= (1L << p)
      p += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("planeMatrix", planeMatrix, "double[]")
      val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val off = ctx.freshName("off")
      s"""
         |long $bits = 0L;
         |int $n = java.lang.Math.min($dims, $v.numElements());
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  int $off = $p * $dims;
         |  for (int $d = 0; $d < $n; $d++) {
         |    $dot += $v.getDouble($d) * $m[$off + $d];
         |  }
         |  if ($dot > 0) $bits |= (1L << $p);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignLsh {
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Plane component for (p,d) in [-0.5, 0.5), deterministic from the seed. */
  def matrix(planes: Int, dims: Int, seed: Long): Array[Double] = {
    val m = new Array[Double](planes * dims)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dims) {
        m(p * dims + d) = mix(seed * 7919L + p.toLong * 1000003L + d).toDouble /
          9.223372036854776e18 / 2.0
        d += 1
      }
      p += 1
    }
    m
  }
}
