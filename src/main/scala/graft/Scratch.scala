package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling main (not part of the driver contract): times selected queries
  * twice in one session to separate codegen cost from execution cost, plus a
  * stage-by-stage breakdown mode (`d05pieces`) for the dedup ladder. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    graft.sources.Tables.names.foreach(n => graft.sources.Tables(spark, sfDir, n).count())

    def timed(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    if (args.headOption.contains("sf1")) {
      // synthetic sf1: 10 replicas of the sf0.1 documents, each replica's
      // words prefixed with a replica tag — zero cross-replica shingle
      // overlap, so the corpus is exactly 10 independent copies and pair
      // count scales linearly (the honest 10x scaling shape)
      import graft.operators.Dedup
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val reps = (0 until 10).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"))
      }
      val docs = reps.reduce(_ unionByName _)
        .repartition(32).persist()
      timed("sf1 corpus materialize (50k docs)")(docs.count())
      timed("d01_exact")(Dedup.exact(docs, "doc_id", "text").count())
      timed("d05_ngram_jaccard")(
        Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, minJaccard = 0.2,
          maxDf = 20).count())
      timed("d06_minhash_lsh")(
        Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
          minJaccard = 0.2, maxDf = 20).count())
      timed("d08_dup_clusters")({
        val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8,
          r = 2, minJaccard = 0.2, maxDf = 20)
        Dedup.dupClusters(pairs, docs, "doc_id").count()
      })
      timed("d12_simhash_neardup")(
        Dedup.simhashNearDup(
          Dedup.simhashFeatures(
            Dedup.docShingles(docs, "doc_id", "text", n = 3), "shingle",
            bits = 32),
          bits = 32, blocks = 4, maxHamming = 3).count())
    } else if (args.headOption.contains("d18pieces")) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val pairs = graft.operators.Dedup.minhashLsh(docs, "doc_id", "text",
        n = 3, k = 8, r = 2, minJaccard = 0.2, maxDf = 20).persist()
      timed("pairs persist")(pairs.count())
      val isOld = (c: org.apache.spark.sql.Column) => c % 10 < 7
      val batch1 = docs.filter(isOld(col("doc_id")))
      val batch2 = docs.filter(!isOld(col("doc_id")))
      val priorPairs = pairs.filter(isOld(col("doc_a")) && isOld(col("doc_b")))
      val newPairs = pairs.filter(!isOld(col("doc_a")) || !isOld(col("doc_b")))
      var prior: org.apache.spark.sql.DataFrame = null
      timed("prior propagate")(
        { prior = graft.operators.Dedup.dupClusters(priorPairs, batch1, "doc_id"); prior.count() })
      timed("incremental")(
        graft.operators.Dedup.dupClustersIncremental(prior, newPairs, batch2, "doc_id").count())
    } else if (args.headOption.contains("d05pieces")) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      val raw = graft.operators.Dedup.docShingles(docs, "doc_id", "text", 3).persist()
      timed("raw shingles persist")(raw.count())
      val capped = graft.operators.Dedup.capShingles(raw, 20).persist()
      timed("capped persist")(capped.count())
      val sizes = capped.groupBy(col("doc_id")).agg(count(lit(1)).as("set_size"))
      timed("sizes agg")(sizes.count())
      val a = capped.select(col("doc_id").as("doc_a"), col("shingle"))
      val b = capped.select(col("doc_id").as("doc_b"), col("shingle"))
      val inter = a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_inter"))
      timed("self-join + inter agg")(inter.count())
      timed("full d05 again")(SparkEntry.queries("d05_ngram_jaccard")(spark, sfDir).count())
    } else {
      val names = if (args.nonEmpty) args.toSeq
        else Seq("d05_ngram_jaccard", "d06_minhash_lsh", "d08_dup_clusters")
      for (name <- names; i <- 1 to 2) {
        timed(s"$name run$i")(SparkEntry.queries(name)(spark, sfDir).count())
      }
    }
    spark.stop()
  }
}
