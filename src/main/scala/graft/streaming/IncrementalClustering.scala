package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StringType, StructType}
import graft.merge.ParquetTable
import graft.operators.Dedup

/** Streaming duplicate-cluster maintenance — the foreachBatch analog of s04
  * for the dedup ladder: documents arrive as a stream, and the pipeline keeps
  * a `labels` table (doc_id → cluster_id = min reachable doc id) continuously
  * equal to what a from-scratch [[Dedup.dupClusters]] over the whole corpus
  * would produce — without ever recomputing closed components.
  *
  * Per micro-batch work is proportional to the BATCH, never the corpus:
  *   1. shingle only the new docs ([[Dedup.docShingles]], native codegen);
  *   2. candidate pairs = new-shingles ⋈ persistent shingle index (new↔old)
  *      plus a new↔new self-join — the accumulated corpus is only ever
  *      touched through the shingle-keyed index join, exactly how a 100 TB
  *      near-dup index is queried;
  *   3. exact Jaccard over candidates via the global per-doc set sizes;
  *   4. [[Dedup.dupClustersIncremental]] extends the prior labels (touched
  *      clusters only) and the result replaces the labels table.
  *
  * The index/sizes tables are append-only (parquet append, no swap); labels
  * is rewrite-and-swap. Batch-replay equivalence with the from-scratch
  * operator is pinned by IncrementalClusterSpec.
  *
  * Df-capping (`maxDf < Int.MaxValue`): [[graft.operators.Dedup.capShingles]]
  * needs GLOBAL document frequencies, so the cap is applied at INDEX-QUERY
  * time — the only place a growing corpus has them. A `shingle_df` table
  * accumulates per-batch (shingle, delta) counts (append-only, compactable);
  * each batch folds in its own delta, takes the shingles with
  * `sum(delta) > maxDf` as the hot set (tiny by construction — that is what
  * "boilerplate" means), and broadcast-anti-joins it out of BOTH sides of
  * the candidate join. Jaccard then runs on the capped sets: capped
  * set_size = stored (uncapped) size − per-doc hot-shingle count, computed
  * only for docs touched by a candidate pair, so the per-batch shuffle
  * stays batch-proportional — the corpus is read but never re-shuffled.
  * This reproduces `Dedup.ngramJaccard(maxDf)` exactly while the hot set is
  * STABLE across the stream (boilerplate present from its first batch — the
  * r6b skew scenario). A shingle that crosses the cap mid-stream stops
  * generating candidates from that batch on, but pairs it already merged
  * are never retracted (labels stay a superset of the final-df from-scratch
  * closure — conservative in the more-dedup direction). The uncapped
  * default keeps strict replay ≡ uncapped from-scratch, the original spec
  * proof, and skips the df table entirely.
  */
final class IncrementalClustering(spark: SparkSession, root: String,
                                  n: Int = 3, minJaccard: Double = 0.5,
                                  maxDf: Int = Int.MaxValue) {

  private val indexSchema = new StructType()
    .add("doc_id", LongType).add("shingle", StringType)
  private val sizesSchema = new StructType()
    .add("doc_id", LongType).add("set_size", LongType)
  private val labelsSchema = new StructType()
    .add("doc_id", LongType).add("cluster_id", LongType)

  private val dfSchema = new StructType()
    .add("shingle", StringType).add("delta", LongType)

  val indexTable = new ParquetTable(spark, s"$root/shingle_index", indexSchema)
  val sizesTable = new ParquetTable(spark, s"$root/doc_sizes", sizesSchema)
  val labelsTable = new ParquetTable(spark, s"$root/labels", labelsSchema)
  /** Per-batch document-frequency deltas; only maintained when capped. */
  val dfTable = new ParquetTable(spark, s"$root/shingle_df", dfSchema)

  /** Exact Jaccard for candidate pairs (doc_a, doc_b, n_inter) given global
    * per-doc set sizes. */
  private def jaccardOf(inter: DataFrame, sizes: DataFrame): DataFrame =
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("set_size").as("size_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("set_size").as("size_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") / (col("size_a") + col("size_b") - col("n_inter")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))

  // ==Restart / exactly-once contract (CrashRecoverySpec)==
  // The checkpoint makes the SOURCE exactly-once (files are never re-read
  // after their batch commits), but Structured Streaming re-delivers the
  // last batch when a stop lands between the offset-log and commit-log
  // writes. The `_last_batch` marker — written LAST, after every table
  // write, via atomic rename — makes a fully-applied re-delivery a no-op.
  // Write order is recompute-safe up to the first append: labels overwrite
  // is a pure function of (tables, batch) so re-running it is idempotent;
  // a crash BETWEEN the appends (index written, sizes not) is outside this
  // single-writer parquet protocol's envelope — production hardening is a
  // transactional table format (Delta/Iceberg) for the two appends, or a
  // batch-id column plus insert-only [[graft.merge.Merge]] on the natural
  // keys ((doc_id, shingle) / doc_id), which the merge family already
  // supports.
  private def markerPath = java.nio.file.Paths.get(root, "_last_batch")

  /** Highest batchId whose table writes all completed; -1 before any. */
  def lastAppliedBatch: Long =
    if (java.nio.file.Files.exists(markerPath))
      new String(java.nio.file.Files.readAllBytes(markerPath),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
    else -1L

  private def writeMarker(batchId: Long): Unit = {
    val tmp = java.nio.file.Files.createTempFile(
      java.nio.file.Paths.get(root), ".marker-", ".tmp")
    java.nio.file.Files.write(tmp, batchId.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, markerPath,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Ingest one batch of new documents (doc_id, text); updates all three
    * tables. Public so a replay (or a spec) can drive it deterministically;
    * [[attach]] wires it as the foreachBatch sink. Re-delivery of an
    * already-applied batchId is a no-op (see restart contract above). */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batchId <= lastAppliedBatch) return
    val newShingles = Dedup.docShingles(batch, "doc_id", "text", n).persist()
    val newSizes = newShingles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("set_size"))
    val oldIndex = indexTable.read()
    val capped = maxDf != Int.MaxValue

    // hot set over the corpus INCLUDING this batch — the index-query-time
    // view of the global document frequencies (tiny by construction: few
    // shingles exceed any sane cap)
    val newDelta = newShingles.groupBy(col("shingle"))
      .agg(count(lit(1)).as("delta"))
    val hot = if (!capped) null
    else dfTable.read().unionByName(newDelta)
      .groupBy(col("shingle")).agg(sum(col("delta")).as("df"))
      .filter(col("df") > maxDf).select(col("shingle")).persist()
    def capSide(ds: DataFrame): DataFrame =
      if (!capped) ds else ds.join(broadcast(hot), Seq("shingle"), "left_anti")
    val cNew = capSide(newShingles)
    val cOld = capSide(oldIndex)

    // new↔old: one shingle-keyed join against the index (direction is fixed,
    // so each unordered pair appears once; normalize with least/greatest)
    val newOld = cNew.select(col("doc_id").as("new_id"), col("shingle"))
      .join(cOld.select(col("doc_id").as("old_id"), col("shingle")), "shingle")
      .select(least(col("new_id"), col("old_id")).as("doc_a"),
        greatest(col("new_id"), col("old_id")).as("doc_b"))
    // new↔new: self-join with doc_a < doc_b (each pair once)
    val newNew = cNew.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(cNew.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val inter0 = newOld.unionByName(newNew)
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    val inter = if (capped) inter0.persist() else inter0 // consumed 2x below
    val sizesStored = sizesTable.read().unionByName(newSizes)
    val sizes = if (!capped) sizesStored
    else {
      // capped set_size = stored (uncapped) size − per-doc hot-shingle
      // count, computed only for docs TOUCHED by a candidate pair — the
      // corpus index is scanned (broadcast filters) but the shuffle carries
      // only touched docs, keeping per-batch work batch-proportional
      val touched = inter.select(col("doc_a").as("doc_id"))
        .unionByName(inter.select(col("doc_b").as("doc_id"))).distinct()
      val hotCounts = oldIndex.unionByName(newShingles.select(oldIndex.columns.map(col): _*))
        .join(broadcast(hot), Seq("shingle"))
        .join(broadcast(touched), Seq("doc_id"), "left_semi")
        .groupBy(col("doc_id")).agg(count(lit(1)).as("hot_n"))
      sizesStored.join(broadcast(touched), Seq("doc_id"), "left_semi")
        .join(hotCounts, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (col("set_size") - coalesce(col("hot_n"), lit(0L))).as("set_size"))
    }
    val pairs = jaccardOf(inter, sizes)

    val labels = Dedup.dupClustersIncremental(
      labelsTable.read(), pairs, batch.select(col("doc_id")), "doc_id")
    labelsTable.overwrite(labels)
    indexTable.append(newShingles)
    sizesTable.append(newSizes)
    if (capped) { dfTable.append(newDelta); hot.unpersist(); inter.unpersist() }
    writeMarker(batchId)
    labels.unpersist()
    newShingles.unpersist()
  }

  /** Wire a streaming documents source (doc_id, text) into the pipeline. */
  def attach(docsStream: DataFrame, checkpointDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    docsStream
      .writeStream
      .queryName("incremental_clustering")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .start()
}
