package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.InterleaveBits

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("morton code matches the canonical 4x4 z-curve") {
    // the textbook order: (0,0)=0 (1,0)=1 (0,1)=2 (1,1)=3 (2,0)=4 ...
    val expected = Map(
      (0, 0) -> 0L, (1, 0) -> 1L, (0, 1) -> 2L, (1, 1) -> 3L,
      (2, 0) -> 4L, (3, 0) -> 5L, (2, 1) -> 6L, (3, 1) -> 7L,
      (0, 2) -> 8L, (3, 3) -> 15L)
    expected.foreach { case ((a, b), z) =>
      assert(InterleaveBits.morton(a, b) == z, s"morton($a,$b)")
    }
    // full 32-bit width survives: alternating masks reassemble exactly
    assert(InterleaveBits.morton(0xFFFFFFFF, 0) == 0x5555555555555555L)
    assert(InterleaveBits.morton(0, 0xFFFFFFFF) == 0xAAAAAAAAAAAAAAAAL)
  }

  test("native expression agrees with the JVM helper through codegen") {
    ZOrder.register(spark)
    val got = (0 until 1000).map(i => (i, i * 7 % 1024, i * 13 % 1024))
      .toDF("id", "x", "y")
      .select($"x", $"y", ZOrder.zkey($"x", $"y").as("z"))
      .as[(Int, Int, Long)].collect()
    got.foreach { case (x, y, z) =>
      assert(z == InterleaveBits.morton(x, y))
    }
  }

  test("rankBucket fails loudly past its bounded-input contract") {
    val small = spark.range(100).select($"id".cast("int").as("v"))
    // within bound: equi-depth over the sorted domain
    val ok = small.select($"v", ZOrder.rankBucket($"v", 4, maxRows = 1000).as("b"))
      .groupBy($"b").count().orderBy($"b").as[(Int, Long)].collect()
    assert(ok.map(_._1).toSeq == Seq(0, 1, 2, 3) && ok.forall(_._2 == 25), ok.toSeq)
    // past bound: raises at execution instead of silently serializing
    val ex = intercept[Exception] {
      spark.range(5000).select(ZOrder.rankBucket($"id", 4, maxRows = 1000)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("bounded-relation contract")), ex.getMessage)
  }

  test("rangeBucketed: equi-depth without a single-partition exchange") {
    val n = 100000
    val data = spark.range(n).select(xxhash64($"id").as("v")).repartition(8)
    val bucketed = ZOrder.rangeBucketed(data, "v", 16, "b")
    val p = bucketed.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition") && !p.contains("Window"),
      s"rangeBucketed must not serialize through one reducer:\n$p")
    val counts = bucketed.groupBy($"b").count().as[(Int, Long)].collect().toMap
    assert(counts.keySet == (0 until 16).toSet, s"bucket ids: ${counts.keySet}")
    // equi-depth within the sketch's rank error (relErr 0.001 ⇒ ±100 rows)
    counts.values.foreach(c =>
      assert(math.abs(c - n / 16) <= 300, s"bucket sizes skewed: $counts"))
    // bucket id is monotone in v: max(v) of bucket i < min(v) of bucket i+1
    val ranges = bucketed.groupBy($"b")
      .agg(min($"v").as("lo"), max($"v").as("hi"))
      .orderBy($"b").as[(Int, Long, Long)].collect()
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi < lo, ranges.toSeq)
      case _ =>
    }
  }

  test("z-ordered layout prunes row groups on BOTH filter columns; " +
      "single-key sort only prunes the leading key") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val hc = spark.sparkContext.hadoopConfiguration
    val prevBlock = hc.get("parquet.block.size")
    hc.setInt("parquet.block.size", 16 * 1024) // many row groups per file
    def scannedRows(df: org.apache.spark.sql.DataFrame): Long = {
      df.collect()
      df.queryExecution.executedPlan
        .collect { case s: FileSourceScanExec => s }
        .map(_.metrics("numOutputRows").value).sum
    }
    try {
      val n = 100000
      // two independent uniform dimensions (hash-decorrelated from id)
      val data = spark.range(n).select(
        pmod(xxhash64(col("id")), lit(256)).cast("int").as("x"),
        pmod(xxhash64(col("id") + 1000000), lit(256)).cast("int").as("y"),
        md5(col("id").cast("string")).as("payload"))
      val zDir = java.nio.file.Files.createTempDirectory("zorder-").toString
      ZOrder.clusteredWrite(data, "x", "y", zDir, nFiles = 2)
      val xDir = java.nio.file.Files.createTempDirectory("xsort-").toString
      data.repartitionByRange(2, col("x"))
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite").parquet(xDir)

      val zScanY = scannedRows(spark.read.parquet(zDir).filter($"y" === 7))
      val xScanY = scannedRows(spark.read.parquet(xDir).filter($"y" === 7))
      val zScanX = scannedRows(spark.read.parquet(zDir).filter($"x" === 7))

      // control proves stats+pruning are live: y-filter on the x-sorted
      // layout reads ~everything, the z-layout skips most row groups
      assert(xScanY > n / 2, s"control vacuous: x-sorted y-scan=$xScanY")
      assert(zScanY < xScanY / 4,
        s"z-order lost y-pruning: z=$zScanY vs x-sorted=$xScanY")
      assert(zScanX < n / 4, s"z-order lost x-pruning: $zScanX of $n")
    } finally {
      if (prevBlock == null) hc.unset("parquet.block.size")
      else hc.set("parquet.block.size", prevBlock)
    }
  }
}
