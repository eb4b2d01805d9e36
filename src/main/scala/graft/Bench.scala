package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query at the given scale factor,
  * emits ONE JSON line. A warm-up action first amortizes JVM/codegen/session
  * startup so per-query numbers measure the queries, not JIT. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm-up: session init, codegen paths, parquet footer reads
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach(n =>
      graft.sources.Tables(spark, sfDir, n).count())
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable => System.err.println(s"[bench] $name FAILED: $e"); false }
      // a failed query must not read as a (fast) success: report -1
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.count(_._2 < 0)
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // stdout arrives wrapped in sbt's "[info] " prefix — also drop the raw
    // JSON line in a file so round-over-round diffs stay machine-readable
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
