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
  * Note on df-capping: [[graft.operators.Dedup.capShingles]] needs GLOBAL
  * document frequencies; a growing corpus can only apply the cap at index-
  * query time (step 2 reads the index anyway, so a `HAVING count ≤ maxDf`
  * view is where it goes). Left uncapped here so replay ≡ the uncapped
  * from-scratch operator, which is what the spec proves.
  */
final class IncrementalClustering(spark: SparkSession, root: String,
                                  n: Int = 3, minJaccard: Double = 0.5) {

  private val indexSchema = new StructType()
    .add("doc_id", LongType).add("shingle", StringType)
  private val sizesSchema = new StructType()
    .add("doc_id", LongType).add("set_size", LongType)
  private val labelsSchema = new StructType()
    .add("doc_id", LongType).add("cluster_id", LongType)

  val indexTable = new ParquetTable(spark, s"$root/shingle_index", indexSchema)
  val sizesTable = new ParquetTable(spark, s"$root/doc_sizes", sizesSchema)
  val labelsTable = new ParquetTable(spark, s"$root/labels", labelsSchema)

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

  /** Ingest one batch of new documents (doc_id, text); updates all three
    * tables. Public so a replay (or a spec) can drive it deterministically;
    * [[attach]] wires it as the foreachBatch sink. */
  def processBatch(batch: DataFrame, batchId: Long): Unit = {
    val newShingles = Dedup.docShingles(batch, "doc_id", "text", n).persist()
    val newSizes = newShingles.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("set_size"))
    val oldIndex = indexTable.read()

    // new↔old: one shingle-keyed join against the index (direction is fixed,
    // so each unordered pair appears once; normalize with least/greatest)
    val newOld = newShingles.select(col("doc_id").as("new_id"), col("shingle"))
      .join(oldIndex.select(col("doc_id").as("old_id"), col("shingle")), "shingle")
      .select(least(col("new_id"), col("old_id")).as("doc_a"),
        greatest(col("new_id"), col("old_id")).as("doc_b"))
    // new↔new: self-join with doc_a < doc_b (each pair once)
    val newNew = newShingles.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(newShingles.select(col("doc_id").as("doc_b"), col("shingle")), "shingle")
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
    val inter = newOld.unionByName(newNew)
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
    val sizes = sizesTable.read().unionByName(newSizes)
    val pairs = jaccardOf(inter, sizes)

    val labels = Dedup.dupClustersIncremental(
      labelsTable.read(), pairs, batch.select(col("doc_id")), "doc_id")
    labelsTable.overwrite(labels)
    indexTable.append(newShingles)
    sizesTable.append(newSizes)
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
