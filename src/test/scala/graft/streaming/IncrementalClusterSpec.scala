package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Dedup

/** Incremental clustering ≡ from-scratch — the invariant that makes
  * [[Dedup.dupClustersIncremental]] deployable on a growing corpus. */
class IncrementalClusterSpec extends SparkSpec {
  import spark.implicits._

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("incremental equals from-scratch on a two-batch replay (hard cases)") {
    // batch 1: clusters {5,9,12}, {20,30}, {40}, {100,101} (untouched later)
    val batch1 = Seq(5L, 9L, 12L, 20L, 30L, 40L, 100L, 101L).toDF("doc_id")
    val pairs1 = Seq((5L, 9L), (9L, 12L), (20L, 30L), (100L, 101L))
      .toDF("doc_a", "doc_b")
    // batch 2 exercises every tricky path:
    //  - doc 3 < old min 5 attaches mid-chain at 9: the new smaller label
    //    must back-propagate through the star to 5 and 12
    //  - doc 25 bridges TWO old clusters ({20,30} and {40})
    //  - doc 50 is isolated
    //  - cluster {100,101} is untouched and must pass through verbatim
    val batch2 = Seq(3L, 25L, 50L).toDF("doc_id")
    val pairs2 = Seq((3L, 9L), (25L, 40L), (25L, 30L)).toDF("doc_a", "doc_b")

    val prior = Dedup.dupClusters(pairs1, batch1, "doc_id")
    val inc = Dedup.dupClustersIncremental(prior, pairs2, batch2, "doc_id")
    val scratch = Dedup.dupClusters(
      pairs1.unionByName(pairs2), batch1.unionByName(batch2), "doc_id")

    val expected = Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 12L -> 3L,
      20L -> 20L, 25L -> 20L, 30L -> 20L, 40L -> 20L,
      50L -> 50L, 100L -> 100L, 101L -> 100L)
    assert(labelMap(inc) == expected)
    assert(labelMap(scratch) == expected)
    prior.unpersist(); inc.unpersist(); scratch.unpersist()
  }

  test("incremental with empty prior degenerates to from-scratch") {
    val docs = Seq(1L, 2L, 3L).toDF("doc_id")
    val pairs = Seq((2L, 3L)).toDF("doc_a", "doc_b")
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    val inc = Dedup.dupClustersIncremental(empty, pairs, docs, "doc_id")
    assert(labelMap(inc) == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
    inc.unpersist()
  }

  test("string ids use the changed-count convergence path") {
    val docs = Seq("b", "c", "d").toDF("doc_id")
    val pairs = Seq(("c", "d")).toDF("doc_a", "doc_b")
    val labels = Dedup.dupClusters(pairs, docs, "doc_id")
    val got = labels.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("b" -> "b", "c" -> "c", "d" -> "c"))
    labels.unpersist()
  }

  test("foreachBatch pipeline replay matches from-scratch ngram clustering") {
    val t1 = "the quick brown fox jumps over the lazy dog tonight"
    val t3 = "entirely different words compose this second document body here"
    val t5 = "yet another unique piece of text with no overlap at all"
    val batch1 = Seq((1L, t1), (2L, t1), (3L, t3)).toDF("doc_id", "text")
    val batch2 = Seq((4L, t1), (5L, t5), (6L, t3)).toDF("doc_id", "text")
    val allDocs = batch1.unionByName(batch2)

    val root = java.nio.file.Files.createTempDirectory("inc-cluster-").toString
    val pipe = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5)
    pipe.processBatch(batch1, 0L)
    pipe.processBatch(batch2, 1L)

    val scratchPairs = Dedup.ngramJaccard(allDocs, "doc_id", "text",
      n = 3, minJaccard = 0.5)
    val scratch = Dedup.dupClusters(scratchPairs, allDocs, "doc_id")
    assert(labelMap(pipe.labelsTable.read()) == labelMap(scratch))
    assert(labelMap(scratch) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 1L, 5L -> 5L, 6L -> 3L))
    scratch.unpersist()
  }

  test("df-capped replay equals capped from-scratch; candidates collapse >=100x") {
    // the r6b skew scenario as a stream: every doc carries a 40-word shared
    // boilerplate tail (hot from batch 1: df 20 > maxDf 10), plus 10 unique
    // words; four true dup pairs, two of them cross-batch
    val boiler = (1 to 40).map(i => s"bp$i").mkString(" ")
    val group = Map(2L -> 1L, 25L -> 5L, 50L -> 30L, 42L -> 41L)
    def text(i: Long): String = {
      val g = group.getOrElse(i, i)
      (1 to 10).map(j => s"u${g}w$j").mkString(" ") + " " + boiler
    }
    val docs = (1L to 60L).map(i => (i, text(i)))
    val batches = docs.grouped(20).map(_.toDF("doc_id", "text")).toSeq
    val allDocs = docs.toDF("doc_id", "text")
    val maxDf = 10

    // (a) candidate-row collapse: the pre-agg inverted-index join rows
    val ds = Dedup.docShingles(allDocs, "doc_id", "text", 3)
    def candRows(d: DataFrame): Long = d.select(col("doc_id").as("a"), col("shingle"))
      .join(d.select(col("doc_id").as("b"), col("shingle")), Seq("shingle"))
      .filter(col("a") < col("b")).count()
    val uncappedRows = candRows(ds)
    val cappedRows = candRows(Dedup.capShingles(ds, maxDf))
    assert(uncappedRows >= 100L * cappedRows,
      s"expected >=100x collapse, got $uncappedRows vs $cappedRows")

    // (b) capped streaming replay ≡ capped from-scratch closure
    val root = java.nio.file.Files.createTempDirectory("inc-cluster-cap-").toString
    val pipe = new IncrementalClustering(spark, root, n = 3, minJaccard = 0.5,
      maxDf = maxDf)
    batches.zipWithIndex.foreach { case (b, i) => pipe.processBatch(b, i.toLong) }
    val scratchPairs = Dedup.ngramJaccard(allDocs, "doc_id", "text",
      n = 3, minJaccard = 0.5, maxDf = maxDf)
    val scratch = Dedup.dupClusters(scratchPairs, allDocs, "doc_id")
    val got = labelMap(pipe.labelsTable.read())
    assert(got == labelMap(scratch))
    // teeth: the four dup pairs merged, nothing else did
    assert(got.values.groupBy(identity).count(_._2.size == 2) == 4)
    assert(got.size == 60 && got.values.toSet.size == 56)
    scratch.unpersist()
  }

  test("attach wires the pipeline as a streaming foreachBatch sink") {
    val root = java.nio.file.Files.createTempDirectory("inc-cluster-stream-").toString
    val ckpt = java.nio.file.Files.createTempDirectory("inc-cluster-ckpt-").toString
    val pipe = new IncrementalClustering(spark, root, n = 2, minJaccard = 0.5)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val stream = mem.toDF().toDF("doc_id", "text")
    val q = pipe.attach(stream, ckpt,
      org.apache.spark.sql.streaming.Trigger.ProcessingTime(0L))
    try {
      mem.addData((10L, "alpha beta gamma"), (11L, "alpha beta gamma"))
      q.processAllAvailable()
      mem.addData((12L, "alpha beta gamma"), (13L, "delta epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    assert(labelMap(pipe.labelsTable.read()) ==
      Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 13L))
  }
}
