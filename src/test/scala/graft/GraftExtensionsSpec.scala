package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions path: a session created with
  * `spark.sql.extensions=graft.GraftExtensions` can call every native
  * function from pure SQL with no register* call. */
class GraftExtensionsSpec extends SparkSpec {

  test("extension-created session exposes all native functions in SQL") {
    val base = spark // force shared-session init before we swap actives
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // same SparkContext, fresh session. withExtensions is the same hook
      // the static spark.sql.extensions conf calls at application launch —
      // that conf is read from the SparkContext at JVM start, so a test
      // sharing the context must inject through the builder instead
      val s2 = SparkSession.builder()
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      assert(s2 ne base)
      val row = s2.sql(
        """SELECT
          |  cosine_sim(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS cos,
          |  content_fingerprint('Hello,   World!') =
          |    content_fingerprint('hello world') AS fp_eq,
          |  quantize_int8(array(1.0d, -2.0d)).q_csv AS q,
          |  size(word_shingles('a b c d', 3)) AS n_sh,
          |  size(winnow_fps('abcdefghij', 4, 2)) AS n_fps,
          |  sign_lsh(array(1.0d), 8, 64) AS bucket,
          |  interleave_bits(3, 1) AS z,
          |  nearest_cells(array(1.0d, 0.0d),
          |    array(1.0d, 0.0d, 0.0d, 1.0d), 2, 1)[0].cell AS cell,
          |  nearest_cell_l2(array(1L, 9L),
          |    array(0L, 0L, 0L, 10L), 2) AS l2cell,
          |  hierarchical_cells(array(0.0d, 1.0d),
          |    array(1.0d, 0.0d, 0.0d, 1.0d),
          |    array(1.0d, 0.0d, 0.0d, 1.0d),
          |    array(0, 1), array(0, 1, 2), 2, 1, 1)[0].cell AS hcell
          |""".stripMargin).first()
      assert(row.getDouble(0) == 1.0)
      assert(row.getBoolean(1))
      assert(row.getString(2) == "64,-127")
      assert(row.getInt(3) == 2)
      assert(row.getInt(4) >= 1)
      assert(row.getLong(5) >= 0 && row.getLong(5) < 256)
      assert(row.getLong(6) == 7L)   // morton(3,1): a bits 0,2 + b bit 1
      assert(row.getInt(7) == 0)     // x-axis query → cell 0
      assert(row.getInt(8) == 1)     // (1,9) nearer (0,10) → L2 cell 1
      assert(row.getInt(9) == 1)     // y-axis query → super 1 → cell 1
      // nfc_normalize from pure SQL: decomposed e+U+0301 composes to U+00E9
      assert(s2.sql("SELECT nfc_normalize('café') = 'café' AS ok")
        .first().getBoolean(0), "SQL nfc_normalize must compose")
      // bpe_encode from pure SQL: the frozen merge table is compiled in
      assert(s2.sql("SELECT bpe_encode('slow join') AS t").first()
        .getSeq[String](0) == Seq("slow", "join"))
      // sketch aggregates resolve from pure SQL (the ScalaAggregator bridge):
      // 100 distinct keys < k=256 → KMV estimate is exactly the distinct
      // count; HLL lands within its 256-register error band; CMS counter
      // matrix has d·w cells summing to d·n rows
      val sk = s2.sql(
        """SELECT
          |  kmv_distinct(md5(CAST(id AS STRING))) AS kmv,
          |  kmv_distinct(md5(CAST(id AS STRING)), 16) AS kmv16,
          |  cms_sketch(CAST(id % 10 AS STRING)) AS cms
          |FROM range(100)""".stripMargin).first()
      assert(sk.getDouble(0) == 100.0, "kmv under-full buffer = exact count")
      assert(sk.getDouble(1) > 0.0 && sk.getDouble(1) != 100.0,
        "k=16 arg respected: saturated buffer estimates, not exact-counts")
      // raw-HLL (no small-range correction, by q39 design) needs n >> m=256
      val hll = s2.sql(
        """SELECT hll_distinct(md5(CAST(id AS STRING))) AS hll
          |FROM range(5000)""".stripMargin).first().getDouble(0)
      assert(math.abs(hll - 5000.0) < 1500.0, s"hll far off: $hll")
      val cms = sk.getSeq[Long](2)
      assert(cms.length == 4 * 64 && cms.sum == 4L * 100)
      // bloom_might_contain needs a real serialized filter — build one
      val bf = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
      bf.putLong(42L)
      val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
      import org.apache.spark.sql.functions.{call_function, col, lit}
      val hits = s2.range(41, 44).select(
        call_function("bloom_might_contain", col("id"), lit(bos.toByteArray))
          .as("hit")).collect().map(_.getBoolean(0))
      assert(hits(1), "inserted key must hit")
      // img_dhash over a literal BMP matches the static helper directly
      val bmp = graft.operators.BmpCodec.encode(8, 8, (x, y) => (x * 30, y * 30, 0))
      val fp = s2.range(1).select(
        call_function("img_dhash", lit(bmp)).as("fp")).first().getLong(0)
      assert(fp == graft.functions.DHashExpr.compute(bmp))
      // audio_ehash / video_khash over literal WAV/AVI match the helpers
      val wav = graft.operators.WavCodec.encode(16000, 1,
        Array.tabulate(114)(i => ((i * 37) % 200 - 100).toShort))
      val efp = s2.range(1).select(
        call_function("audio_ehash", lit(wav)).as("fp")).first().getLong(0)
      assert(efp == graft.functions.AudioHashExpr.compute(wav))
      val avi = graft.operators.AviCodec.encode(8, 8, 8, 10,
        (f, x, y) => (x * 20 + f, y * 20, f * 10))
      val vfp = s2.range(1).select(
        call_function("video_khash", lit(avi)).as("fp")).first().getLong(0)
      assert(vfp == graft.functions.VideoHashExpr.compute(avi))
      // PQ through pure SQL: 2 subspaces x 2 codes x 2 dims; vector (1,0,0,5)
      // encodes to (code0=0: (1,0) nearer (0,0) than (9,9); code1=1: (0,5)
      // nearer (0,4)), ADC of own code = (1-0)^2 + (5-4)^2 = 2
      val adc = s2.sql(
        """SELECT pq_adc(
          |  pq_dist_table(CAST(array(1.0, 0.0, 0.0, 5.0) AS ARRAY<DOUBLE>),
          |    CAST(array(0.0,0.0, 9.0,9.0, 9.0,9.0, 0.0,4.0) AS ARRAY<DOUBLE>), 2, 2, 2),
          |  pq_encode(CAST(array(1.0, 0.0, 0.0, 5.0) AS ARRAY<DOUBLE>),
          |    CAST(array(0.0,0.0, 9.0,9.0, 9.0,9.0, 0.0,4.0) AS ARRAY<DOUBLE>), 2, 2, 2),
          |  2, 2) AS a""".stripMargin).first().getDouble(0)
      assert(adc == 2.0, s"pq SQL path: expected 2.0, got $adc")
      // plan-time int args accept any integral width (a bare SQL literal may
      // be INT or BIGINT) and fail with a named AnalysisException otherwise
      assert(s2.sql("SELECT kmv_distinct(md5(CAST(id AS STRING)), CAST(16 AS BIGINT)) AS e FROM range(100)")
        .first().getDouble(0) > 0.0, "BIGINT k literal must work")
      val err = intercept[org.apache.spark.sql.AnalysisException](
        s2.sql("SELECT word_shingles('a b c', id) FROM range(3)").collect())
      assert(err.getMessage.contains("word_shingles") && err.getMessage.contains("`n`"),
        s"expected a named NON_FOLDABLE_ARGUMENT error, got: ${err.getMessage}")
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
