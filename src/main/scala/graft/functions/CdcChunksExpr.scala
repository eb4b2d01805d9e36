package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (the rsync/LBFS technique behind exact-substring
  * training-data dedup, Lee et al. 2021): normalize → cut the text wherever
  * the hash of the `w`-char gram ending the cut satisfies an anchor
  * predicate → emit (start, len, md5-of-chunk) spans. Because boundaries
  * are functions of CONTENT, not position, a substring shared between two
  * documents produces identical chunks in both once it spans an anchor —
  * equi-joining on the chunk hash finds exact duplicated passages across a
  * corpus with one shuffle, no all-pairs scan, and the spans point at the
  * text to cut.
  *
  * The anchor predicate is `md5(gram)` starting with hex '0' (p = 1/16 →
  * mean chunk ≈ 16 chars) — md5 rather than a Rabin/gear rolling hash so a
  * SQL oracle can mirror every byte (CLAUDE.md rule 4); cut semantics are
  * identical. Normalization matches [[WinnowingExpr]]: lower + collapse
  * `[ \t\n\f\r]+` to one space + trim, i.e. DuckDB's
  * `trim(regexp_replace(lower(text), '\s+', ' ', 'g'))`. Spans are 0-based
  * offsets into that NORMALIZED text. Texts shorter than `w` form a single
  * chunk; empty text yields no chunks. No min/max-length clamping here —
  * boundary selection stays stateless and exactly mirrorable; callers
  * filter short chunks downstream (the d23 shape).
  */
case class CdcChunksExpr(child: Expression, w: Int) extends UnaryExpression {

  require(w >= 2, "need gram width w >= 2")

  override def dataType: DataType = ArrayType(CdcChunksExpr.ChunkType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    CdcChunksExpr.compute(v.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.CdcChunksExpr.compute($v, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunksExpr {

  val ChunkType: StructType = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false),
    StructField("hash", StringType, nullable = false)))

  /** Static helper invoked from generated code: normalize → anchor cuts →
    * (start, len, md5(chunk)) spans over the normalized text. */
  def compute(text: UTF8String, w: Int): ArrayData = {
    // normalization identical to WinnowingExpr.compute (and its oracle SQL)
    val norm0 = text.toString.toLowerCase(java.util.Locale.ROOT)
      .replaceAll("[ \\t\\n\\f\\r]+", " ")
    var s = 0
    var e = norm0.length
    while (s < e && norm0.charAt(s) == ' ') s += 1
    while (e > s && norm0.charAt(e - 1) == ' ') e -= 1
    val norm = norm0.substring(s, e)
    val n = norm.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    // cut positions: i + w for every gram start i whose md5 opens with '0',
    // then the end of text — strictly increasing except a possible repeat
    // of n, dropped below
    val cuts = new java.util.ArrayList[Int]()
    var i = 0
    val lastGram = n - w
    while (i <= lastGram) {
      if (Md5.hex(norm.substring(i, i + w)).charAt(0) == '0') cuts.add(i + w)
      i += 1
    }
    if (cuts.isEmpty || cuts.get(cuts.size - 1) != n) cuts.add(n)
    val out = new Array[Any](cuts.size)
    var prev = 0
    var j = 0
    while (j < cuts.size) {
      val end = cuts.get(j)
      out(j) = InternalRow(prev, end - prev,
        UTF8String.fromString(Md5.hex(norm.substring(prev, end))))
      prev = end
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Column-level entry point for content-defined chunking. */
object CdcChunks {
  private val Name = "cdc_chunks"

  /** Idempotently register [[CdcChunksExpr]] (same pattern as
    * [[TextFunctions.registerNative]]); gram width is fixed at
    * registration. */
  def registerNative(spark: org.apache.spark.sql.SparkSession, w: Int = 8): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      Name, exprs => CdcChunksExpr(exprs(0), w), "built-in")

  /** Native codegen'd chunker — call [[registerNative]] first. */
  def chunks(text: Column): Column = call_function(Name, text)
}
