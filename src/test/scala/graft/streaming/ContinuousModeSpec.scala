package graft.streaming

import java.nio.file.{Files, Path}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Continuous-trigger flavor of the bronze layer (the reference's stream
  * test, `Test Scripts/09-stream-test.py`): ProcessingTime trigger, live
  * file drops, processAllAvailable() instead of availableNow drain —
  * plus a partition-pruning check on a topic-partitioned multiplex table
  * (the full pipeline partitions by (topic, week_part); topic alone is
  * enough to exercise pruning here).
  */
class ContinuousModeSpec extends SparkSpec {

  test("bronze ingests live file drops under a ProcessingTime trigger") {
    val root = Files.createTempDirectory("cont-")
    val landing = root.resolve("multiplex")
    Files.createDirectories(landing)
    def envelope(topic: String, off: Long) =
      s"""{"key":"k$off","value":"{}","topic":"$topic","partition":0,"offset":$off,"timestamp":${1704100000000L + off}}"""
    Files.write(landing.resolve("a.json"),
      (1L to 5L).map(envelope("bpm", _)).mkString("\n").getBytes)

    val stream = Bronze.jsonStream(spark, landing.toString, Schemas.kafkaMultiplexJson)
    val q = Bronze.appendSink(stream, s"$root/bronze", s"$root/ckpt",
        "cont_bronze", availableNow = false, partitionBy = Seq("topic"))
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$root/bronze").count() == 5)
      // live drop of a second file while the query keeps running: write
      // outside the source glob, then atomic-move in — a concurrent trigger
      // must never list a half-written file (it would be latched as
      // processed with partial rows)
      val tmp = root.resolve("b.json.tmp")
      Files.write(tmp, (6L to 9L).map(envelope("workout", _)).mkString("\n").getBytes)
      Files.move(tmp, landing.resolve("b.json"),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      q.processAllAvailable()
      val bronze = spark.read.parquet(s"$root/bronze")
      assert(bronze.count() == 9)

      // physical layout partitioned by topic → the filter must appear INSIDE
      // the PartitionFilters list (an empty "PartitionFilters: []" still
      // prints the label, and a data-column filter would land in
      // PushedFilters instead — both would be a pruning regression)
      val plan = bronze.filter(col("topic") === "bpm")
        .queryExecution.executedPlan.toString
      assert("PartitionFilters: \\[[^\\]]*topic[^\\]]*\\]".r.findFirstIn(plan).isDefined,
        s"expected a topic partition filter in:\n$plan")
      assert(bronze.filter(col("topic") === "bpm").count() == 5)
    } finally q.stop()
  }
}
