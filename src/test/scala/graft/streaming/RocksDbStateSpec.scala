package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.SparkSpec

/** The reference runs its streams on the RocksDB state-store provider
  * (`Test Scripts/07-run.py:19-21`) — the provider that keeps streaming
  * state off-heap and spillable, which is what makes large dedup/agg state
  * viable at cluster scale. This spec proves the bundled provider works in
  * this runtime and produces identical results. */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  test("streaming aggregation state lives in RocksDB, results identical") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sqlCtx = spark.sqlContext
      val in = MemoryStream[(String, Long)]
      in.addData(("a", 1L), ("a", 2L), ("b", 5L))
      val agg = in.toDF().toDF("k", "v")
        .groupBy($"k").agg(org.apache.spark.sql.functions.sum($"v").as("s"))
      val ckpt = java.nio.file.Files.createTempDirectory("rocksdb-ckpt-")
      val q = agg.writeStream
        .format("memory").queryName("rocksdb_agg")
        .outputMode("complete")
        .option("checkpointLocation", ckpt.toString)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val got = spark.table("rocksdb_agg").as[(String, Long)].collect().toSet
      assert(got == Set(("a", 3L), ("b", 5L)))
      // the state directory really is a RocksDB layout (zip snapshots +
      // changelog, no HDFS-provider .delta files)
      import scala.jdk.CollectionConverters._
      val stateFiles = java.nio.file.Files.walk(ckpt.resolve("state"))
        .iterator().asScala.map(_.getFileName.toString).toSeq
      assert(stateFiles.exists(f => f.endsWith(".zip") || f.endsWith(".changelog")),
        s"no RocksDB artifacts under state/: $stateFiles")
      assert(!stateFiles.exists(_.endsWith(".delta")),
        "HDFS-provider .delta files present — RocksDB provider not in effect")
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }
}
