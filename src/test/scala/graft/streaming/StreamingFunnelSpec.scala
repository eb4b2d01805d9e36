package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, TimeMode, Trigger}
import graft.SparkSpec
import StreamingFunnel.{FunnelEvent, FunnelReach}

/** Pins the streaming-funnel contract behind s11: the horizon rule (a
  * user's funnel is final — and emitted — once the watermark passes
  * `t1 + (nStages−1)·window`), single-run availableNow flush of expired
  * timers, cross-run state/timer persistence, order-insensitivity of the
  * fold, and silent GC of stage-0-less users. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._
  import StreamingFunnel.{Hit, reachedOf}

  test("reachedOf: window edges, strict order, order-insensitive input") {
    val w = 1000000L
    // inclusive right edge: click exactly at t1+w counts
    assert(reachedOf(Seq(Hit(0, 1000000L), Hit(1, 2000000L)), 3, w) == 2)
    // strictly-after: click exactly at t1 does not
    assert(reachedOf(Seq(Hit(0, 1000000L), Hit(1, 1000000L)), 3, w) == 1)
    // full chain anchored on per-stage minima
    val hits = Seq(Hit(2, 2200000L), Hit(0, 1000000L), Hit(1, 1500000L),
      Hit(1, 1800000L), Hit(0, 3000000L))
    assert(reachedOf(hits, 3, w) == 3)
    assert(reachedOf(hits.reverse, 3, w) == 3) // fold ignores arrival order
    // no stage-0 → 0
    assert(reachedOf(Seq(Hit(1, 5L), Hit(2, 9L)), 3, w) == 0)
  }

  test("event-time horizon emission on RocksDB: single-run flush, GC, persistence") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "2")
    try {
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val in = MemoryStream[FunnelEvent]
      val out = in.toDF()
        .withColumn("ts", timestamp_micros($"ts_us"))
        .withWatermark("ts", "0 seconds")
        .select($"user_id", $"type_idx", $"ts_us").as[FunnelEvent]
        .groupByKey(_.user_id)(org.apache.spark.sql.Encoders.scalaLong)
        .transformWithState(new FunnelProcessor(3, winUs = 1000000L),
          TimeMode.EventTime(), OutputMode.Append())
      val ckpt = java.nio.file.Files.createTempDirectory("funnel-ckpt-")
      val outDir = java.nio.file.Files.createTempDirectory("funnel-out-").toString
      def drain(): Unit = {
        val q = out.writeStream.format("parquet").option("path", outDir)
          .outputMode("append").option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      def written(): Set[FunnelReach] =
        spark.read.schema(out.schema).parquet(outDir).as[FunnelReach].collect().toSet
      in.addData(
        // user 1: full chain (click in (1s, 2s], purchase in (1.5s, 2.5s])
        FunnelEvent(1L, 0, 1000000L), FunnelEvent(1L, 1, 1500000L),
        FunnelEvent(1L, 2, 2200000L),
        // user 2: click outside the window → stalls at stage 1
        FunnelEvent(2L, 0, 1000000L), FunnelEvent(2L, 1, 2500000L),
        // user 3: no view, ever → GC, no emission
        FunnelEvent(3L, 1, 1200000L),
        // user 9: watermark driver; own horizon (12.001s) stays unexpired
        FunnelEvent(9L, 0, 10000000L))
      drain()
      // ONE availableNow run must flush users 1 and 2 (horizon 3.001s <
      // watermark 10s) in its final no-data batch; 9 held, 3 silent
      assert(written() == Set(FunnelReach(1L, 3), FunnelReach(2L, 1)),
        s"single-run flush wrong: ${written()}")
      in.addData(FunnelEvent(9L, 2, 20000000L)) // watermark → 20s
      drain()
      assert(written() == Set(FunnelReach(1L, 3), FunnelReach(2L, 1), FunnelReach(9L, 1)),
        s"run-2 emission wrong: ${written()}")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    }
  }
}
