package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines.
  *
  * `df.sample`/`sampleBy` draw from a per-partition seeded RNG: results
  * change under repartitioning, task retries, and engine versions — useless
  * for reproducible corpus construction or cross-engine verification. These
  * operators derive the keep/drop decision from a salted md5 of a row's ID
  * (the d17-split idiom): content-independent, partition-independent, stable
  * across replays, and mirrorable by any engine with md5.
  */
object Sampling {

  /** Uniform byte in [0, 256) from the salted md5 of `id` — the shared
    * primitive ([[stratifiedSample]], the d17 split, d10 min-k). */
  def hashByte(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 2), 16, 10)
      .cast("int")

  /** Stratified Bernoulli sample: keep a row iff its salted hash byte <
    * 256·rate(stratum). Rates quantize to 1/256 steps (document the grain to
    * users); unlisted strata use `defaultRate`. One narrow filter — no
    * shuffle, no state; at 100 TB this is a scan-side predicate that
    * composes with pushdown and never skews. Different `salt`s give
    * independent samples (e.g. decorrelated from the train/val/test split).
    */
  def stratifiedSample(df: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double], defaultRate: Double,
                       salt: String): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "rates must be within [0, 1]")
    val b = hashByte(col(idCol), salt)
    val thr = rates.foldLeft(lit(math.round(defaultRate * 256).toInt)) {
      case (acc, (s, r)) =>
        when(col(stratumCol) === s, lit(math.round(r * 256).toInt)).otherwise(acc)
    }
    df.filter(b < thr)
  }
}
