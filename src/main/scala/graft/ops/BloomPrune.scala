package graft.ops

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomMightContain

/** Bloom-filter semi-join reduction.
  *
  * Broadcast hash join already solves "small dim × huge fact" — this operator
  * is for the band where the dimension's KEYS are too many to broadcast as
  * rows but fit a bloom filter (e.g. 10M keys ≈ 12 MB at 1% fpp vs GBs of
  * rows). `dim.stat.bloomFilter` builds the filter distributed (treeAggregate
  * — the driver only ever holds the final bitset), the native
  * [[BloomMightContain]] predicate drops non-matching fact rows before the
  * shuffle, and the ordinary equi-join afterwards removes the fpp-bounded
  * false positives. Net effect at 100 TB: the fact shuffle carries ~the
  * selectivity fraction instead of the whole table.
  */
object BloomPrune {

  private val FuncName = "bloom_might_contain"

  /** Idempotently register the native probe (temp function, session-wide).
    * Arg 1 is the key column, arg 2 the serialized filter as a binary
    * literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FuncName,
      exprs => BloomMightContain(exprs.head,
        exprs(1).eval().asInstanceOf[Array[Byte]]),
      "built-in")

  def serialize(bloom: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** Inner equi-join with the fact side pre-pruned by a bloom filter of the
    * dimension keys. Result-identical to `fact.join(dim, fact(factKey) ===
    * dim(dimKey))` (no false negatives; join removes false positives).
    * Builds the filter eagerly (one distributed pass over `dim`).
    */
  def prunedEquiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val spark = fact.sparkSession
    register(spark)
    val bloom = dim.stat.bloomFilter(dimKey, expectedItems, fpp)
    val pruned = fact.filter(
      call_function(FuncName, col(factKey), lit(serialize(bloom))))
    pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
