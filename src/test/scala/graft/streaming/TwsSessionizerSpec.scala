package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{TimeMode, Trigger}
import graft.SparkSpec
import StatefulSessionizer.{Event, Session}

class TwsSessionizerSpec extends SparkSpec {
  import spark.implicits._

  test("batch transformWithState equals flatMapGroupsWithState") {
    val gap = 3600000000L
    val events = graft.sources.Tables.eventsUs(spark, sf001)
      .selectExpr("user_id", "ts_us").as[Event]
    val tws = TwsSessionizer.sessionize(events, gap).collect().toSet
    val fmg = StatefulSessionizer.sessionize(events, gap).collect().toSet
    assert(tws == fmg)
    assert(tws.nonEmpty)
  }

  test("event-time timers flush idle sessions when the watermark passes (RocksDB)") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[Event]
      val watermarked = in.toDF()
        .withColumn("ts", timestamp_micros($"ts_us"))
        .withWatermark("ts", "0 seconds")
        .select($"user_id", $"ts_us").as[Event]
      // emitOpen=false: a session row appears ONLY via gap-close or timer
      // flush, so observing user 1's session proves the timer fired.
      // Two AvailableNow runs over ONE checkpoint: state and timers persist
      // across restarts; run 2's events advance the watermark past user 1's
      // end+gap deadline, firing the event-time timer. Deterministic — no
      // wall-clock sleeps. (ProcessingTime timers keep every trigger live:
      // measured as an unbounded batch loop under AvailableNow.)
      val sessions = TwsSessionizer.sessionize(watermarked, gapUs = 1000000L,
        emitOpen = false, timeMode = TimeMode.EventTime())
      val ckpt = java.nio.file.Files.createTempDirectory("tws-ckpt-")
      // parquet sink, not memory: the memory sink refuses checkpoint
      // recovery, and run 2 must resume run 1's state and timers
      val outDir = java.nio.file.Files.createTempDirectory("tws-out-").toString
      def drain(): Unit = {
        val q = sessions.writeStream
          .format("parquet")
          .option("path", outDir)
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      def written(): Set[Session] =
        spark.read.schema(sessions.schema).parquet(outDir)
          .as[Session].collect().toSet
      // one open session for user 1 (events 0.5 s apart, gap 1 s);
      // deadline = 100.5 s + 1 s = 101.5 s event time
      in.addData(Event(1L, 100000000L), Event(1L, 100500000L))
      drain()
      assert(written().isEmpty) // watermark 100.5 s < deadline
      in.addData(Event(2L, 300000000L)) // watermark -> 300 s ≥ deadline
      drain()
      assert(written() == Set(Session(1L, 100000000L, 100500000L, 2)),
        s"expected user 1's idle session flushed by its event-time timer: ${written()}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
