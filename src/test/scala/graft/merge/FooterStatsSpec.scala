package graft.merge

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Parity pin for the footer-stats fast path (r13): the strings
  * [[FooterStats]] derives from parquet footers must ROUND-TRIP (via
  * `cast`, which is how [[LogTable.readRange]] consumes them) to exactly
  * the values the Spark min/max-aggregate path they replaced would have
  * produced — for every supported type, including null corners. */
class FooterStatsSpec extends SparkSpec {
  import spark.implicits._

  private def stagedFiles(dir: String): Seq[Path] =
    Files.walk(java.nio.file.Paths.get(dir)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq

  test("footer min/max round-trips to the aggregate path's values for " +
      "every supported type; null columns behave identically") {
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, 1.5D, CAST(0.25 AS FLOAT), 'apple', false, DATE'1999-12-31',
        |   TIMESTAMP_NTZ'2021-03-04 05:06:07.123456', CAST(NULL AS LONG),
        |   CAST(NULL AS DOUBLE)),
        |  (-7L, -2.25D, CAST(8.5 AS FLOAT), 'zebra', true, DATE'2001-02-03',
        |   TIMESTAMP_NTZ'2021-03-04 05:06:07.12', CAST(NULL AS LONG), 3.5D),
        |  (100L, 0.1D, CAST(1.1 AS FLOAT), 'mango', true, DATE'2000-01-01',
        |   TIMESTAMP_NTZ'1995-01-01 00:00:00', CAST(NULL AS LONG), -1.25D)
        |AS t(l, d, f, s, b, dt, tntz, nl, pn)""".stripMargin)
    val dir = Files.createTempDirectory("fstats-").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val staged = stagedFiles(dir)
    assert(staged.size == 1)
    val cols = Seq("l", "d", "f", "s", "b", "dt", "tntz", "nl", "pn")
    // the aggregate path's strings (what the manifest used to store)
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).cast("string").as(s"lo_$c"),
      max(col(c)).cast("string").as(s"hi_$c")))
    val agg = spark.read.parquet(staged.head.toString)
      .agg(aggs.head, aggs.tail: _*).collect().head
    val expected = cols.flatMap { c =>
      val lo = agg.getAs[String](s"lo_$c"); val hi = agg.getAs[String](s"hi_$c")
      if (lo == null || hi == null) None else Some(c -> (lo, hi))
    }.toMap
    // the footer path
    val got = FooterStats.read(staged, cols, df.schema, "UTC",
      _.getFileName.toString).head._2._2
    assert(got.keySet == expected.keySet,
      s"stats presence diverged: footer=${got.keySet} agg=${expected.keySet}")
    assert(!got.contains("nl"), "an all-null column must carry no stats")
    // every string must round-trip to the same typed value the aggregate
    // string does (readRange consumes them through cast, so round-trip
    // equality — not byte equality — is the contract)
    val byName = df.schema.fields.map(f => f.name -> f.dataType).toMap
    got.foreach { case (c, (lo, hi)) =>
      val (elo, ehi) = expected(c)
      val cmp = Seq((lo, elo, "lo"), (hi, ehi, "hi")).map { case (a, b, tag) =>
        val eq = spark.sql(
          s"SELECT CAST('$a' AS ${byName(c).sql}) <=> CAST('$b' AS ${byName(c).sql})")
          .collect().head.getBoolean(0)
        (tag, a, b, eq)
      }
      assert(cmp.forall(_._4),
        s"column $c: footer strings ${cmp} do not round-trip to the " +
          "aggregate path's values")
    }
    // exact string equality where the formats are specified to match
    // (integers, strings, booleans, dates, NTZ timestamps w/ trimmed frac)
    Seq("l", "s", "b", "dt", "tntz").foreach { c =>
      assert(got(c) == expected(c),
        s"column $c: footer ${got(c)} != aggregate ${expected(c)}")
    }
    // and row counts come straight off the footer
    assert(FooterStats.read(staged, Nil, df.schema, "UTC",
      _.getFileName.toString).head._2._1 == 3L)
  }

  test("NaN-bearing float/double columns are served STAT-LESS, not with " +
      "bounds that exclude the NaN (superset-safe vs the aggregate path)") {
    // Spark 4.1's parquet writer emits "min/max not defined" (hasNonNullValue
    // = false, num_nulls = 0) for any FP row group containing NaN — which the
    // reader must treat as POISON (can't bound the group), not as an all-null
    // group contributing nothing: merging only the finite groups would
    // produce bounds that exclude NaN, and a hi=NaN range query could then
    // wrongly prune a file whose NaN rows match. The aggregate path would
    // have reported max = NaN (Spark orders NaN greatest); stat-less (never
    // pruned) is the superset-safe footer rendering of the same file.
    val df = spark.sql(
      """SELECT * FROM VALUES
        |  (1.5D, CAST(0.25 AS FLOAT), 10L),
        |  (CAST('NaN' AS DOUBLE), CAST('NaN' AS FLOAT), 20L),
        |  (-2.0D, CAST(8.5 AS FLOAT), 30L)
        |AS t(d, f, k)""".stripMargin)
    val dir = Files.createTempDirectory("fstats-nan-").toString
    df.coalesce(1).write.mode("overwrite").parquet(dir)
    val staged = stagedFiles(dir)
    val (rows, got) = FooterStats.read(staged, Seq("d", "f", "k"), df.schema,
      "UTC", _.getFileName.toString).head._2
    assert(rows == 3L)
    assert(!got.contains("d") && !got.contains("f"),
      s"NaN-bearing FP columns must carry no footer stats, got $got")
    // a NaN-free column in the same file still gets exact bounds
    assert(got("k") == ("10", "30"))
    // and supports() still admits FP — the guard is per-file at read time,
    // so NaN-free FP stats columns keep the footer fast path
    assert(FooterStats.supports(df.schema, Seq("d", "f"), ltzAsInt64 = true))
  }

  test("supports() gates the LTZ timestamp on the int64 write mode and " +
      "rejects exotic types") {
    val s = StructType(Seq(
      StructField("ts", TimestampType), StructField("k", LongType),
      StructField("dec", DecimalType(10, 2))))
    assert(FooterStats.supports(s, Seq("k"), ltzAsInt64 = false))
    assert(!FooterStats.supports(s, Seq("ts"), ltzAsInt64 = false),
      "INT96 LTZ has no usable footer stats — must fall back")
    assert(FooterStats.supports(s, Seq("ts"), ltzAsInt64 = true))
    assert(!FooterStats.supports(s, Seq("dec"), ltzAsInt64 = true))
    assert(!FooterStats.supports(s, Seq("missing"), ltzAsInt64 = true))
  }
}
