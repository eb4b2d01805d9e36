package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Batch table access over the driver-generated parquet testdata.
  *
  * Mirrors the reference's static table scans (S5/S7,
  * `Silver/05-silver.py:325,431`, `Gold/06-gold.py:84,134`) — in our runtime a
  * "table" is a parquet path under the scale-factor directory. Filters and
  * projections applied by callers reach the parquet scan via Catalyst pushdown,
  * so readers should NOT cache or materialize here.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events")
      // events.ts is parquet TIMESTAMP(NANOS) which Spark has no native type
      // for ([PARQUET_TYPE_ILLEGAL]); read it as epoch-nanos LongType. All
      // event-time math then happens in exact int64 microseconds (`ts_us`,
      // see eventsUs) — matching DuckDB, whose reader floors ns→µs.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** `events` with `ts` (epoch nanos, long) replaced by exact epoch
    * microseconds `ts_us` (long) and a µs-precision timestamp `ts_utc`.
    * Integer `div` (not `/`) — nanos ≈ 1.7e18 exceeds double's 2^53 exact
    * range, so floating-point division would corrupt low bits.
    */
  def eventsUs(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    events(spark, d)
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts_utc", timestamp_micros(expr("ts div 1000")))
      .drop("ts")
  }

  def region(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame       = apply(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame   = apply(spark, d, "lineitem")
  def events(spark: SparkSession, d: String): DataFrame     = apply(spark, d, "events")
  def documents(spark: SparkSession, d: String): DataFrame  = apply(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = apply(spark, d, "embeddings")
}
