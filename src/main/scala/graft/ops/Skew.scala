package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key joins — the manual fallback when AQE's
  * skew-join splitting isn't available (streaming state, non-shuffle joins)
  * or when a key's fan-out is known up front (hot shingles in near-dup,
  * celebrity users in sessionization).
  *
  * Pattern: the skewed (large) side gets a deterministic salt in [0, k) —
  * derived from a hash of the whole row, NOT rand(), so retries/speculative
  * tasks stay consistent — while the small side is replicated k times. The
  * join key becomes (key, salt): one hot key fans out over k reducers.
  */
object Skew {

  /** Large side: add deterministic salt column from row hash. */
  def salted(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))

  /** Small side: replicate each row under every salt value. */
  def replicated(df: DataFrame, saltFactor: Int, saltCol: String = "__salt"): DataFrame =
    df.withColumn(saltCol, explode(sequence(lit(0), lit(saltFactor - 1))))

  /** Salted inner equi-join on `keys`: result is identical to the unsalted
    * join, but each hot key spreads over `saltFactor` reducers. */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val l = salted(large, saltFactor)
    val s = replicated(small, saltFactor)
    l.join(s, keys :+ "__salt").drop("__salt")
  }
}
