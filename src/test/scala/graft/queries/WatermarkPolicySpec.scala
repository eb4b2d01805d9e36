package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** s47's claim — a union advances the GLOBAL watermark at the pace of the
  * slowest branch (`multipleWatermarkPolicy = min`) — pinned directly:
  * windows the fast branch's OWN watermark would have flushed must be
  * withheld when their end lies past the slow branch's max event time. */
class WatermarkPolicySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val W = 60000000L // 1-minute windows, µs

  test("s47: the fast branch's trailing windows are withheld by the slow branch") {
    val out = StreamingQueries.defs.find(_.name.startsWith("s47")).get
      .spark(spark, sf).localCheckpoint(true)
    val ev = graft.sources.Tables.eventsUs(spark, sf)
    val maxLate = ev.filter(col("event_type") === "signup")
      .agg(max(col("ts_us"))).head().getLong(0)
    val maxMain = ev.filter(col("event_type") =!= "signup")
      .agg(max(col("ts_us"))).head().getLong(0)
    val cutoff = math.min(maxMain, maxLate)
    assert(maxLate < maxMain, "fixture: the signup branch must lag")

    // nothing emitted past the MIN cutoff, on either branch
    val lateEnd = out.agg(max(col("win_start_us"))).head().getLong(0) + W
    assert(lateEnd <= cutoff, s"emitted window end $lateEnd past cutoff $cutoff")

    // and the holdback is REAL: main-branch windows the branch's own
    // watermark (maxMain) would have flushed exist past the cutoff...
    val withheld = ev.filter(col("event_type") =!= "signup")
      .select((col("ts_us") / W).cast("long").as("m")).distinct()
      .filter((col("m") + 1) * W > cutoff && (col("m") + 1) * W <= maxMain)
      .count()
    assert(withheld > 0, "fixture degenerate: no main window straddles the gap")
    // ...and none of them made it into the drain's output
    assert(out.filter(col("branch") === "main" &&
      col("win_start_us") + W > cutoff).isEmpty)
  }
}
