package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** date_lookup dimension seeding (ref `Setup/03-history-loader.py:16-18,38`):
  * a JSON path-table batch read (S6) + full `INSERT OVERWRITE` refresh (K4).
  * The reference seeds 365 rows from a fixture; [[generate]] builds the same
  * shape deterministically for any range when no fixture is present.
  */
object HistoryLoader {

  /** S6 — batch JSON read of the fixture directory. */
  def readFixture(spark: SparkSession, jsonDir: String): DataFrame =
    spark.read.schema(Schemas.dateLookup).json(jsonDir)

  /** K4 — full-refresh overwrite of the dimension table. */
  def overwrite(df: DataFrame, tableDir: String): Long = {
    df.write.mode(SaveMode.Overwrite).parquet(tableDir)
    df.count()
  }

  /** Deterministic calendar generation (sequence + explode — no driver-side
    * loop, so a century of dates is still a one-stage distributed job). */
  def generate(spark: SparkSession, start: String, days: Int): DataFrame =
    spark.range(1)
      .select(explode(sequence(
        lit(start).cast("date"),
        date_add(lit(start).cast("date"), days - 1))).as("date"))
      .select(
        col("date"),
        weekofyear(col("date")).as("week"),
        year(col("date")).as("year"),
        month(col("date")).as("month"),
        dayofweek(col("date")).as("dayofweek"),
        dayofmonth(col("date")).as("dayofmonth"),
        dayofyear(col("date")).as("dayofyear"),
        when(dayofweek(col("date")).isin(1, 7), "weekend")
          .otherwise("weekday").as("week_part"))
}
