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
