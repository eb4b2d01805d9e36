package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** Pins the two design claims of the s19 streaming as-of enrichment
  * (`StreamingQueries.s19`):
  *
  *  1. STATELESSNESS — the stream-static interval join runs with zero
  *     stateful operators (`lastProgress.stateOperators` empty): the as-of
  *     lookup is resolved per micro-batch against the lead-bucketed static
  *     dim, so no watermark, no state store, no growth with stream history.
  *     This is the property that makes the shape 100 TB-safe where a
  *     stream-stream as-of (ordered state per key) is not.
  *
  *  2. TIE DETERMINISM — when the dim has several rows at the same
  *     (key, ts), the lead window ordered by (ts, id) gives every tie
  *     member but the last an EMPTY validity interval `[t, t)`, so the
  *     max-id member wins deterministically (the documented contract;
  *     DuckDB ASOF would pick an arbitrary tie member, which is why the
  *     oracle row relies on the tie-free testdata while THIS spec pins the
  *     engine's own behavior on the hard case).
  */
class StreamStaticAsofSpec extends SparkSpec {
  import spark.implicits._

  // dim: user 1 has clicks at ts 10 (ids 100, 101 — a tie) and 30 (id 102);
  // user 2 has none
  private val clicks = Seq(
    (1L, 100L, 10L), (1L, 101L, 10L), (1L, 102L, 30L))
    .toDF("cu", "click_id", "click_ts")

  // stream: purchases at ts 5 (before any click), 10 (on the tie), 20
  // (between), 40 (after the last), and user 2 at 25 (no clicks at all)
  private val purchases = Seq(
    (1000L, 1L, 5L), (1001L, 1L, 10L), (1002L, 1L, 20L),
    (1003L, 1L, 40L), (1004L, 2L, 25L))

  test("stream-static as-of: zero stateful operators; tie resolved to max id; " +
      "no-prior rows emit null") {
    val srcDir = Files.createTempDirectory("asof-src-")
    purchases.toDF("event_id", "user_id", "ts_us")
      .coalesce(1).write.mode("overwrite").parquet(srcDir.toString)

    val iv = clicks.withColumn("next_ts",
      lead(col("click_ts"), 1).over(
        Window.partitionBy(col("cu")).orderBy(col("click_ts"), col("click_id"))))

    val stream = spark.readStream
      .schema("event_id bigint, user_id bigint, ts_us bigint")
      .parquet(srcDir.toString)
    val joined = stream.join(iv,
        col("user_id") === col("cu") && col("ts_us") >= col("click_ts") &&
          (col("next_ts").isNull || col("ts_us") < col("next_ts")),
        "left_outer")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("click_id"), col("click_ts"))

    val ckpt = Files.createTempDirectory("asof-ckpt-").toString
    val q = joined.writeStream.format("memory").queryName("asof_pin")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateOps = Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
    assert(stateOps.isEmpty,
      s"stream-static as-of must be stateless, found state operators: $stateOps")

    val got = spark.table("asof_pin").orderBy("event_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    // 1000@5: no prior click -> null; 1001@10: tie resolved to id 101 (the
    // max-id tie member owns [10, 30)); 1002@20: still 101; 1003@40: 102
    // (open-ended last interval); 1004 user 2: null
    assert(got == Seq(1000L -> -1L, 1001L -> 101L, 1002L -> 101L,
      1003L -> 102L, 1004L -> -1L))

    // exactly-once emission: one output row per streamed purchase
    assert(spark.table("asof_pin").count() == purchases.size)
  }
}
