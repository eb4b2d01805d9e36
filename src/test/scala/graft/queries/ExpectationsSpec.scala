package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Round-9 wave: the new rows' NON-VACUOUSNESS guards (the d49 lesson — an
  * oracle can be green while a gate silently selects nothing) plus the
  * determinism contract of the concurrent-OCC stream.
  */
class ExpectationsSpec extends SparkSpec {

  test("q65: every expectation has real violations and the split reconciles") {
    val out = RelationalQueries.q65.spark(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    Seq("exp_custkey_exists", "exp_orderdate_not_null",
        "exp_price_positive", "exp_priority_known").foreach { e =>
      assert(out(e) > 0, s"$e is vacuous — injected dirt never fires it")
    }
    assert(out("zz_rows_kept") + out("zz_rows_quarantined") == out("zz_rows_in"))
    // WARN expectations must NOT quarantine: drops alone explain the split
    assert(out("zz_rows_quarantined") <= out("exp_custkey_exists") +
      out("exp_orderdate_not_null"))
  }

  test("s34: quarantine reasons include the multi-violation bucket; kept matches q65") {
    val out = StreamingQueries.s34.spark(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.contains("exp_custkey_exists+exp_orderdate_not_null"),
      "no row violates both DROP expectations — the reason concat is untested")
    val q65 = RelationalQueries.q65.spark(spark, sf001).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(out("zz_kept") == q65("zz_rows_kept"),
      "streaming kept-count must equal the batch gate's")
  }

  test("v32: adaptive probe widths genuinely vary and stay within [1, maxProbe]") {
    val probed = VectorQueries.v32.spark(spark, sf001)
      .select(col("query_id"), col("n_probed")).distinct().collect()
      .map(r => r.getInt(1))
    assert(probed.min >= 1 && probed.max <= 6)
    assert(probed.distinct.length > 1,
      "every query chose the same width — delta is mis-calibrated for this corpus")
  }

  test("d57: the audit finds both live and dead vocabulary entries") {
    val used = TextQueries.d57.spark(spark, sf001)
      .groupBy(col("used")).count().collect()
      .map(r => r.getBoolean(0) -> r.getLong(1)).toMap
    assert(used.getOrElse(true, 0L) > 0, "no merge product survives to the stream")
    assert(used.getOrElse(false, 0L) > 0,
      "no dead entries — the audit can't demonstrate its purpose on this corpus")
    val total = used.values.sum
    assert(total == graft.functions.BpeMerges.pairs.length,
      s"audit must cover every trained merge ($total vs ${graft.functions.BpeMerges.pairs.length})")
  }

  test("s35: racing writers converge to the recency-guard fixed point, twice") {
    // two full runs (fresh fixture tables each run via FixtureDirs.create)
    // must agree row-for-row even though the commit interleaving differs
    val a = StreamingQueries.s35.spark(spark, sf001).collect().map(_.toString)
    val b = StreamingQueries.s35.spark(spark, sf001).collect().map(_.toString)
    assert(a.sameElements(b), "concurrent OCC result is interleaving-dependent")
  }
}
