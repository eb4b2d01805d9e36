package graft.streaming

import graft.SparkSpec

class HistoryLoaderSpec extends SparkSpec {
  import spark.implicits._

  test("generate builds a correct 365-day calendar; overwrite refreshes fully") {
    val cal = HistoryLoader.generate(spark, "2024-01-01", 365)
    assert(cal.count() == 365)
    val jan1 = cal.filter($"date" === java.sql.Date.valueOf("2024-01-01")).collect()(0)
    assert(jan1.getAs[Int]("year") == 2024 && jan1.getAs[Int]("dayofyear") == 1)
    val parts = cal.groupBy("week_part").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(parts("weekend") == 104 && parts("weekday") == 261) // 2024: 52 weekends + leap-year weekdays

    val dir = java.nio.file.Files.createTempDirectory("dl-").toString + "/date_lookup"
    assert(HistoryLoader.overwrite(cal, dir) == 365)
    assert(HistoryLoader.overwrite(HistoryLoader.generate(spark, "2024-01-01", 30), dir) == 30)
    assert(spark.read.parquet(dir).count() == 30) // K4 full refresh, not append
  }

  test("readFixture round-trips the schema through JSON (S6)") {
    val dir = java.nio.file.Files.createTempDirectory("dlj-").toString
    HistoryLoader.generate(spark, "2024-01-01", 10)
      .write.mode("overwrite").json(dir + "/json")
    val back = HistoryLoader.readFixture(spark, dir + "/json")
    assert(back.count() == 10)
    assert(back.schema.fieldNames.toSet == Schemas.dateLookup.fieldNames.toSet)
  }
}
