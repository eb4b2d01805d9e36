package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey keeps ties (rank semantics)") {
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 5, "c"), (2, 7, "d"))
      .toDF("k", "ord", "v")
    val got = Relational.latestPerKey(df, Seq("k"), "ord")
      .select("v").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b", "d")) // both ord=10 rows survive
  }

  test("dedupKeyed keeps exactly one deterministic row") {
    val df = Seq((1, 10, "a"), (1, 10, "b"), (1, 5, "c")).toDF("k", "ord", "v")
    val got = Relational.dedupKeyed(df, Seq("k"), Seq($"ord", $"v"))
      .select("v").as[String].collect()
    assert(got.toSeq == Seq("c"))
  }

  test("intervalPairJoin uses open interval (start, start+gap)") {
    val starts = Seq((1L, 100L)).toDF("u", "s")
    val stops = Seq((1L, 100L), (1L, 101L), (1L, 199L), (1L, 200L), (1L, 201L))
      .toDF("u", "e")
    val got = Relational.intervalPairJoin(starts, stops, Seq("u"), "s", "e", lit(100L))
      .select("e").as[Long].collect().sorted
    // e > 100 and e < 200: both bounds strict
    assert(got.toSeq == Seq(101L, 199L))
  }

  test("pointInInterval is half-open (lo, hi]") {
    val pts = Seq((1L, 100L), (1L, 101L), (1L, 200L), (1L, 201L)).toDF("u", "p")
    val ivs = Seq((1L, 100L, 200L)).toDF("u", "lo", "hi")
    val got = Relational.pointInInterval(pts, ivs, Seq("u"), "p", "lo", "hi")
      .select("p").as[Long].collect().sorted
    assert(got.toSeq == Seq(101L, 200L))
  }

  test("binned handles edges, out-of-range and null") {
    val df = Seq(Some(-1.0), Some(0.0), Some(999.99), Some(1000.0), Some(5000.0), None)
      .toDF("x")
    val got = df.select(Relational.binned($"x", Seq(0, 1000), Seq("neg", "low", "high"),
      "invalid").as("b")).as[String].collect()
    assert(got.toSeq == Seq("neg", "low", "low", "high", "high", "invalid"))
  }

  test("ageBins matches reference bin labels") {
    val df = Seq(("2010-06-01", "2024-01-01"), ("1940-01-01", "2024-01-01"))
      .toDF("dob", "asof")
      .select(to_date($"dob").as("dob"), to_date($"asof").as("asof"))
    val got = df.select(Relational.ageBins($"dob", $"asof").as("b")).as[String].collect()
    assert(got.toSeq == Seq("under 18", "75-85"))
  }

  test("groupStats computes min/avg/max/count") {
    val df = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val row = Relational.groupStats(df, Seq("k"), "v").filter($"k" === 1).collect()(0)
    assert(row.getDouble(1) == 10.0 && row.getDouble(2) == 15.0 &&
      row.getDouble(3) == 20.0 && row.getLong(4) == 2L)
  }

  test("topKPerGroup returns exactly k deterministic rows") {
    val df = Seq((1, 5, "a"), (1, 5, "b"), (1, 3, "c"), (2, 9, "d")).toDF("k", "x", "id")
    val got = Relational.topKPerGroup(df, Seq("k"), Seq($"x".desc, $"id"), 2)
      .select("id").as[String].collect().sorted
    assert(got.toSeq == Seq("a", "b", "d"))
  }

  test("property: dedupKeyedAgg (skew-safe min_by) equals dedupKeyed window form") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 300).map(_ =>
      (rng.nextInt(8), rng.nextInt(50), rng.nextInt(1000), s"p${rng.nextInt(999)}"))
    val df = rows.toDF("k", "ord", "uniq", "payload")
    // (ord, uniq) is a total order within every key with high probability;
    // regenerate-proof: assert it, then compare the two forms row-for-row
    val window = Relational.dedupKeyed(df, Seq("k"), Seq($"ord", $"uniq"))
      .as[(Int, Int, Int, String)].collect().toSet
    val agg = Relational.dedupKeyedAgg(df, Seq("k"), Seq("ord", "uniq"))
      .as[(Int, Int, Int, String)].collect().toSet
    assert(agg == window)
  }

  test("property: topKPerGroupSalted equals one-phase topKPerGroup on a hot key") {
    val rng = new scala.util.Random(11)
    // one celebrity key with 500 rows + a tail of small keys
    val rows = (0 until 500).map(i => (0, rng.nextInt(10000), i)) ++
      (0 until 100).map(i => (1 + rng.nextInt(5), rng.nextInt(10000), 1000 + i))
    val df = rows.toDF("k", "x", "id")
    val order = Seq($"x".desc, $"id")
    val onePhase = Relational.topKPerGroup(df, Seq("k"), order, 7)
      .as[(Int, Int, Int)].collect().toSet
    val salted = Relational.topKPerGroupSalted(df, Seq("k"), order, 7, saltFactor = 8)
      .as[(Int, Int, Int)].collect().toSet
    assert(salted == onePhase)
  }

  test("asOfJoin picks latest right at-or-before, left outer, equal-ts matches") {
    val left = Seq((1L, 100L, "l1"), (1L, 200L, "l2"), (1L, 50L, "l0"),
        (2L, 10L, "lx")).toDF("u", "ts", "lv")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (1L, 90L, "r90"),
        (3L, 5L, "rz")).toDF("u", "rts", "rv")
      .select($"u", $"rts", $"rv")
    val got = Relational.asOfJoin(left, right, Seq("u"), "ts", "rts", Seq("rv"))
      .as[(Long, Long, String, Option[String])].collect().toSet
    assert(got == Set(
      (1L, 100L, "l1", Some("r100")), // equal ts matches (>= bound)
      (1L, 200L, "l2", Some("r150")), // latest of {90,100,150} <= 200
      (1L, 50L, "l0", None),          // no right row at-or-before → null
      (2L, 10L, "lx", None)))         // key absent on right → null
  }

  test("property: asOfJoin equals the naive per-row argmax lookup") {
    val rng = new scala.util.Random(13)
    val left = (0 until 200).map(i => (rng.nextInt(6).toLong, rng.nextInt(1000).toLong, i))
      .toDF("u", "ts", "lid")
    val right = (0 until 150).map(i => (rng.nextInt(6).toLong, rng.nextInt(1000).toLong, 1000 + i))
      .toDF("u", "rts", "rid")
    // contract: unique (key, rts) — dedup keeping max rid, as a caller would
    val rightU = Relational.dedupKeyedAgg(
      right.withColumn("neg", -$"rid"), Seq("u", "rts"), Seq("neg")).drop("neg")
    val fast = Relational.asOfJoin(left, rightU, Seq("u"), "ts", "rts", Seq("rid"))
      .as[(Long, Long, Int, Option[Int])].collect().toSet
    val naive = {
      val r = rightU.as[(Long, Long, Int)].collect()
      left.as[(Long, Long, Int)].collect().map { case (u, ts, lid) =>
        val m = r.filter(x => x._1 == u && x._2 <= ts)
        (u, ts, lid, if (m.isEmpty) None else Some(m.maxBy(_._2)._3))
      }.toSet
    }
    assert(fast == naive)
  }

  test("binnedPointInterval equals naive cross filter, closed bounds") {
    val rng = new scala.util.Random(17)
    val pts = (0 until 300).map(_ => rng.nextInt(5000).toLong).toDF("pt")
    val ivs = (0 until 80).map { i =>
      val lo = rng.nextInt(5000).toLong; (i, lo, lo + rng.nextInt(400).toLong)
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.binnedPointInterval(pts, "pt", ivs, "lo", "hi", 256L)
      .select("iid", "pt").as[(Int, Long)].collect()
    val naive = {
      val p = pts.as[Long].collect(); val iv = ivs.as[(Int, Long, Long)].collect()
      for { x <- p; (iid, lo, hi) <- iv if x >= lo && x <= hi } yield (iid, x)
    }
    // multiset equality: duplicates from repeated points must be preserved
    assert(got.groupBy(identity).view.mapValues(_.length).toMap ==
      naive.groupBy(identity).view.mapValues(_.length).toMap)
  }

  test("funnel: strict stage order, first-occurrence anchoring, window cutoff") {
    // u1: full funnel in order; u2: click BEFORE first view (must not count);
    // u3: click exactly at the window edge (inclusive), purchase 1µs past
    // the click window (excluded); u4: view only
    val win = 100L
    val ev = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L), (2L, "purchase", 50L),
      (3L, "view", 0L), (3L, "click", 100L), (3L, "purchase", 201L),
      (4L, "view", 7L)
    ).toDF("user_id", "event_type", "ts_us")
    val got = Relational.funnel(ev, "user_id", "ts_us", "event_type",
        Seq("view", "click", "purchase"), windowUs = win)
      .as[(String, Long)].collect().toMap
    assert(got == Map("1_view" -> 4L, "2_click" -> 2L, "3_purchase" -> 1L), got)
    // u2's purchase at 50 does not count: no valid click stage to anchor it
    // u3's click at exactly view+100 counts (<=); purchase at click+101 doesn't
  }
}
