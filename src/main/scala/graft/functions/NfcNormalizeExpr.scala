package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the
  * canonical-composition pass every serious pretraining pipeline runs
  * BEFORE dedup/fingerprinting: the same text arrives from the web in
  * composed ("é" U+00E9) and decomposed ("e"+U+0301) forms, which are
  * byte-distinct (different md5, different shingles, different sort order)
  * but canonically equivalent. Normalizing first is what makes hash-based
  * dedup see them as the duplicates they are. Spark has no built-in for
  * this (`lower`/`trim` are code-point-wise); a Scala UDF would leave the
  * codegen'd stage — this expression calls `java.text.Normalizer` (the
  * JDK's ICU-derived implementation of UAX #15) through one static helper,
  * staying inside whole-stage codegen.
  *
  * Fast path: NFC is the identity on pure-ASCII text (the overwhelming
  * majority of a web corpus), and `Normalizer.isNormalized` is a cheap
  * scan — the common case allocates nothing and returns the input slice
  * as-is.
  */
case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    NfcNormalizeExpr.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.NfcNormalizeExpr.compute($v);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalizeExpr {
  import java.text.Normalizer

  /** Static helper invoked from generated code. */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toString
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) text
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }
}
