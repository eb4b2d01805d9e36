package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Native predicate: probe an integral join key against a pre-built
  * [[org.apache.spark.util.sketch.BloomFilter]].
  *
  * The explicit-operator twin of Spark's internal runtime-filter
  * `BloomFilterMightContain` (which only AQE can inject): callers build the
  * filter from the dimension side ([[graft.ops.BloomPrune]]) and use this
  * expression to drop non-matching fact rows BEFORE the join shuffle — the
  * classic semi-join reduction. At 100 TB the difference is shuffling only
  * the ~matching fraction of the fact table instead of all of it, for the
  * price of shipping a megabyte-scale bitset.
  *
  * The serialized filter travels in the plan; each task deserializes it once
  * (lazy) and the codegen'd probe is a single `mightContainLong` call inside
  * whole-stage codegen. No false negatives, so downstream equi-joins see
  * exactly the true matches plus an fpp-bounded trickle of false positives
  * that the join itself removes — result equality is proved by the q38
  * oracle hash and BloomPruneSpec.
  */
case class BloomMightContain(child: Expression, bloomBytes: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bloomBytes))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an integral key, got ${other.simpleString}")
  }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def nullSafeEval(v: Any): Any = v match {
    case l: java.lang.Long    => bloom.mightContainLong(l)
    case i: java.lang.Integer => bloom.mightContainLong(i.toLong)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.mightContainLong((long) $c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
