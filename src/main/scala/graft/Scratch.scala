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

    if (args.headOption.contains("q")) {
      // time registered queries in isolation: Scratch q <n1,n2,...> [repeats]
      // (bench-identical session; run1 = cold incl. codegen, rest = warm)
      val n = args.lift(2).map(_.toInt).getOrElse(3)
      args(1).split(',').foreach { name =>
        val fn = graft.queries.Registry.queries(name)
        (1 to n).foreach { i => timed(s"$name run$i") { fn(spark, sfDir).count() } }
      }
    } else if (args.headOption.contains("qf")) {
      // like `q` but FORCES projection work: count() lets Catalyst prune
      // unreferenced projection columns (the d24sf1 lesson), so operators
      // whose cost is in per-row rewrites (BPE, PII redaction) read as
      // phantom-fast. Aggregate over every output column instead.
      val n = args.lift(2).map(_.toInt).getOrElse(3)
      args(1).split(',').foreach { name =>
        val fn = graft.queries.Registry.queries(name)
        (1 to n).foreach { i =>
          timed(s"$name run$i (forced)") { Bench.forceAll(fn(spark, sfDir)) }
        }
      }
    } else if (args.headOption.contains("jobs")) {
      // Generic job-count probe: Scratch jobs <n1,n2,...> [repeats] — runs
      // each registered query forced (qf protocol) with a listener counting
      // Spark jobs and summed in-job time, to separate job-floor cost
      // (scheduling, commit machinery) from compute.
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val jobMs = new java.util.concurrent.atomic.AtomicLong(0)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); starts.put(j.jobId, j.time)
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(starts.remove(j.jobId))
              .foreach(t0 => jobMs.addAndGet(j.time - t0))
        })
      val n = args.lift(2).map(_.toInt).getOrElse(3)
      args(1).split(',').foreach { name =>
        val fn = graft.queries.Registry.queries(name)
        (1 to n).foreach { i =>
          val j0 = jobs.get(); val m0 = jobMs.get(); val t0 = System.nanoTime()
          Bench.forceAll(fn(spark, sfDir))
          println(f"[scratch] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
            f" (${jobs.get() - j0} jobs, ${(jobMs.get() - m0) / 1e3}%.2f s in-job)")
        }
      }
    } else if (args.headOption.contains("q67pieces")) {
      // Per-verb breakdown of the q67 lifecycle (r13 creep bisect): replays
      // the query's commits with a timer around each LogTable verb.
      import graft.merge.{LogTable, Merge}
      import graft.sources.Tables
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val jobMs = new java.util.concurrent.atomic.AtomicLong(0)
      val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet(); starts.put(j.jobId, j.time)
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
            Option(starts.remove(j.jobId))
              .foreach(t0 => jobMs.addAndGet(j.time - t0))
        })
      def timedJ(label: String)(f: => Any): Unit = {
        val j0 = jobs.get(); val m0 = jobMs.get(); val t0 = System.nanoTime()
        f
        println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          f" (${jobs.get() - j0} jobs, ${(jobMs.get() - m0) / 1e3}%.2f s in-job)")
      }
      val reps = args.lift(1).map(_.toInt).getOrElse(2)
      (1 to reps).foreach { rep =>
        val o = Tables.orders(spark, sfDir)
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
            col("o_totalprice"), col("o_orderdate"))
        val root = graft.queries.FixtureDirs.create("q67prof-")
          .resolve("orders_log").toString
        val t = new LogTable(spark, root, o.schema,
          bucketBy = Some((Seq("o_orderkey"), 8)), statsBy = Seq("o_orderdate"))
        timedJ(s"rep$rep overwrite")(t.overwrite(
          o.filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))))
        timedJ(s"rep$rep merge")(t.merge(o.filter(col("o_totalprice") > 150000))(
          (cur, b) => Merge.insertOnly(cur, b, Seq("o_orderkey"))))
        timedJ(s"rep$rep deleteWhere")(
          t.deleteWhere(pmod(col("o_custkey"), lit(7)) === 3))
        val batchA = o.filter(col("o_orderstatus") === "F")
          .withColumn("o_totalprice", round(col("o_totalprice") + 1000, 2))
          .withColumn("o_orderstatus", lit("R"))
        val batchB = o.filter(col("o_custkey") % 5 === 1)
        timedJ(s"rep$rep occMergeA")(t.occMerge(batchA)((c2, b2) =>
          Merge.scd1(c2, b2, Seq("o_orderkey"))))
        timedJ(s"rep$rep occMergeB")(t.occMerge(batchB)((cur, b) =>
          Merge.insertOnly(cur, b, Seq("o_orderkey"))))
        timedJ(s"rep$rep reads") {
          val range = t.readRange("o_orderdate",
            lit("1996-01-01").cast("timestamp"), lit("1996-06-30").cast("timestamp"))
          def phase(name: String, df: org.apache.spark.sql.DataFrame) =
            df.agg(count(lit(1)).as("n"),
              round(sum(col("o_totalprice")), 2).as("sum_price"))
              .select(lit(name).as("phase"), col("n"), col("sum_price"))
          (1L to 5L).map(v => phase(s"v$v", t.readVersion(v)))
            .reduce(_ union _).union(phase("range", range)).collect()
        }
      }
    } else if (args.headOption.contains("graphdiag")) {
      // Dissect the v36 sf1 recall collapse (VERDICT r12 ask 6): at the
      // replica sfdir, measure panel recall of (a) the base kNN edges
      // themselves, (b) beam over the BASE graph (no inserts), (c) beam
      // over the GROWN graph — isolating base-build quality vs beam budget
      // vs insert back-edge hijack as the collapsing stage.
      import graft.functions.VectorFunctions
      import graft.operators.Similarity
      import org.apache.spark.sql.expressions.Window
      VectorFunctions.register(spark)
      val B = args.lift(1).map(_.toInt).getOrElse(8)
      val R = args.lift(2).map(_.toInt).getOrElse(4)
      val K = 3
      println(s"[graphdiag] B=$B R=$R")
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding")).localCheckpoint(true)
      val isNew = pmod(col("vec_id"), lit(9)) === 4
      val base = emb.filter(!isNew).localCheckpoint(true)
      val nbase = base.count()
      val nlist = math.max(16L, nbase / 50).toInt
      val stride = math.max(1L, nbase / nlist)
      println(s"[graphdiag] nbase=$nbase nlist=$nlist stride=$stride")
      val baseEdges = Similarity.ivfTopK(base, base,
          VectorFunctions.cosineSim, k = 5, nlist = nlist, nprobe = 4)
        .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
        .localCheckpoint(true)
      val entries = base.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .orderBy(col("vec_id")).limit(nlist).select(col("vec_id"))
        .localCheckpoint(true)
      println(s"[graphdiag] entries=${entries.count()} " +
        s"replicas=${entries.select((col("vec_id") / 1000000L).cast("long")).distinct().count()}")
      val qPred = pmod(col("vec_id"), lit(53)) === 0 &&
        col("vec_id") <= lit(53L * 40)
      val queries = emb.filter(qPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(emb.filter(qPred), emb,
          VectorFunctions.cosineSim, k = K)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = queries.count()
      println(s"[graphdiag] panel=$q truth=${truth.size}")
      // (a) base-edge recall: are the true neighbors even IN the kNN edges?
      val edgeHits = baseEdges.select(col("src"), col("dst")).collect()
        .count(r => truth.contains((r.getLong(0), r.getLong(1))))
      println(s"[graphdiag] (a) truth pairs present in base kNN edges: $edgeHits / ${truth.size}")
      def beamRecall(tag: String, edges: org.apache.spark.sql.DataFrame): Unit = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        val hits = Similarity.beamSearchVisited(emb,
            edges.select(col("src"), col("dst")), queries,
            queries.select(col("query_id")).crossJoin(entries), B, R)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
          .select(col("query_id"), col("vec_id")).collect()
          .count(r => truth.contains((r.getLong(0), r.getLong(1))))
        println(s"[graphdiag] $tag beam recall: $hits / ${q * K}")
      }
      beamRecall("(b) base graph", baseEdges)
      val grown = Similarity.graphInsert(base, baseEdges, emb.filter(isNew),
        entries, beam = 8, rounds = 3, m = 5, outDegree = 5)
        .localCheckpoint(true)
      beamRecall("(c) grown graph", grown)
      // hijack evidence: how many replica-0 srcs lost edges to
      // cross-replica back-edges?
      val hijacked = grown.filter(col("src") < 1000000L && col("dst") >= 1000000L)
        .count()
      println(s"[graphdiag] replica-0 -> other-replica edges in grown: $hijacked")
      // HYPOTHESIS: the collapse is the FROZEN nprobe=4 against a 10x
      // nlist (probe fraction 11% -> 1.1%). Rebuild with nprobe scaled to
      // keep the fraction (nlist/9, floor 4 — identity at sf0.1 and below).
      val nprobe2 = math.max(4, nlist / 9)
      println(s"[graphdiag] scaled nprobe=$nprobe2")
      val baseEdges2 = Similarity.ivfTopK(base, base,
          VectorFunctions.cosineSim, k = 5, nlist = nlist, nprobe = nprobe2)
        .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
        .localCheckpoint(true)
      val edgeHits2 = baseEdges2.select(col("src"), col("dst")).collect()
        .count(r => truth.contains((r.getLong(0), r.getLong(1))))
      println(s"[graphdiag] (a2) truth pairs in scaled-nprobe edges: $edgeHits2 / ${truth.size}")
      beamRecall("(b2) base graph scaled-nprobe", baseEdges2)
      val grown2 = Similarity.graphInsert(base, baseEdges2, emb.filter(isNew),
        entries, beam = B, rounds = 3, m = 5, outDegree = 5)
        .localCheckpoint(true)
      beamRecall("(c2) grown graph scaled-nprobe", grown2)
      val hijacked2 = grown2.filter(col("src") < 1000000L && col("dst") >= 1000000L)
        .count()
      println(s"[graphdiag] (scaled) replica-0 -> other-replica edges: $hijacked2")
    } else if (args.headOption.contains("s10bflat")) {
      // Batch-proportionality evidence for the CAPPED incremental-clustering
      // path (the r10 rework): drive processBatch directly over N equal
      // slices of the boilerplate-injected corpus and print per-batch wall
      // time. Batch-proportional = the curve stays ~flat as the accumulated
      // corpus grows N-fold; the pre-rework design (per-batch full df-log
      // fold + full index re-scan) grew with the prefix instead.
      // Usage: Scratch s10bflat [nBatches] (sfDir from env).
      val n = args.lift(1).map(_.toInt).getOrElse(10)
      val boiler = " standard footer boilerplate legal notice text"
      val docs = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), concat(col("text"), lit(boiler)).as("text"))
        .localCheckpoint(true)
      val root = java.nio.file.Files.createTempDirectory("s10bflat-").toString
      val pipe = new graft.streaming.IncrementalClustering(
        spark, root, n = 3, minJaccard = 0.5, maxDf = 50)
      (0 until n).foreach { i =>
        val b = docs.filter(col("doc_id") % n === i)
        val t0 = System.nanoTime()
        pipe.processBatch(b, i.toLong)
        println(f"[s10bflat] batch $i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          f"(corpus after: ${pipe.labelsTable.read().count()})")
      }
    } else if (args.headOption.contains("v17scaled")) {
      // v17 at 10x with nlist SCALED with the corpus (the honest 100 TB
      // configuration — the registered row freezes nlist=16 for oracle
      // parity, the v06-class trade): candidates/query stay ~constant when
      // cells hold ~constant members, so the mutual k-NN graph is ~linear
      // in corpus size. Usage: Scratch v17scaled <nlist> (sfDir from env).
      import graft.functions.VectorFunctions
      VectorFunctions.register(spark)
      val nlist = args.lift(1).map(_.toInt).getOrElse(160)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
      def mutual(): Long = {
        val knn = graft.operators.Similarity.ivfTopK(emb, emb,
          VectorFunctions.cosineSim, k = 5, nlist = nlist, nprobe = 4)
          .localCheckpoint(true)
        val fwd = knn.select(col("query_id").as("id_a"), col("vec_id").as("id_b"), col("cos"))
        val rev = knn.select(col("query_id").as("id_b"), col("vec_id").as("id_a"))
        fwd.join(rev, Seq("id_a", "id_b")).filter(col("id_a") < col("id_b")).count()
      }
      (1 to 2).foreach { i => timed(s"v17 nlist=$nlist run$i")(println(s"edges=${mutual()}")) }
    } else if (args.headOption.contains("clusterworld")) {
      // Materialize a CLUSTERABLE embedding corpus (the 100 TB-realistic
      // case the r13 verdict asked to measure: real embedding corpora have
      // cluster structure; the driver testdata is deliberately near-uniform
      // on the sphere, which forces nprobe ∝ nlist at fixed recall and makes
      // the kNN build O(n²/50) — COVERAGE r12/r13). Deterministic, no RNG:
      // G = n/50 planted clusters; center c_g = normalized hash-derived
      // point; vector = normalize(c_g + σ·u) with σ = 0.16 giving
      // within-cluster cosine ≈ 0.55–0.74 (floor 0.45; cross-cluster p99
      // < 0.35 — SyntheticEmbeddings' probe-verified range, pinned by
      // AdaptiveClusterSpec) — the separation regime of real
      // sentence-embedding corpora. Schema matches the driver's
      // embeddings.parquet (vec_id, array<float>, label = cluster id).
      // Usage: Scratch clusterworld <outDir> <n>
      val out = args(1)
      val n = args(2).toLong
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      val noisy = graft.sources.SyntheticEmbeddings.generate(spark, n)
      val tmp = java.nio.file.Files.createTempDirectory("cw-")
      noisy.orderBy(col("vec_id")).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val f = java.nio.file.Files.list(tmp)
        .filter(_.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(f,
        java.nio.file.Paths.get(out, "embeddings.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      // drop the staging leftovers (_SUCCESS, CRCs) — only the moved part
      // file matters (r14 ADVICE)
      java.nio.file.Files.walk(tmp).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      println(s"[clusterworld] wrote $out/embeddings.parquet n=$n " +
        s"clusters=${graft.sources.SyntheticEmbeddings.clusterCount(n, 50)}")
    } else if (args.headOption.contains("clusterbuild")) {
      // The r14 headline measurement: the graph-ANN BUILD class on a
      // clusterable corpus, with the v32 margin rule choosing nprobe
      // per-query instead of the unclusterable world's nprobe ∝ nlist.
      // Reports build wall time (cold + warm), mean n_probed (the
      // mechanism: ~1 on clusterable data), edge-truth recall, beam recall
      // over the base graph, and the v36-class insert+beam recall — run at
      // n and 10n, the time ratio is the linearity evidence (r6 method).
      // Usage: Scratch clusterbuild <dir> [maxProbe] [delta]
      import graft.functions.VectorFunctions
      import graft.operators.Similarity
      import org.apache.spark.sql.expressions.Window
      VectorFunctions.register(spark)
      val dir = args(1)
      val maxProbe = args.lift(2).map(_.toInt).getOrElse(6)
      val delta = args.lift(3).map(_.toDouble).getOrElse(0.10)
      val probeSupers = args.lift(4).map(_.toInt).getOrElse(0)
      // repartition BEFORE checkpointing: the fixture is one parquet file,
      // so the scan is a single partition and localCheckpoint preserves it —
      // every per-row stage (the O(nlist·dims) assignment especially) would
      // run in ONE task (observed: the 200k run sat at load 1 for 25+ min)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
        .repartition(32).localCheckpoint(true)
      val n = emb.count()
      val nlist = math.max(16L, n / 50).toInt
      println(s"[clusterbuild] dir=$dir n=$n nlist=$nlist maxProbe=$maxProbe " +
        s"delta=$delta probeSupers=$probeSupers")
      def knnAdaptive(nodes: org.apache.spark.sql.DataFrame) =
        Similarity.adaptiveIvfTopK(nodes, nodes, VectorFunctions.cosineSim,
          k = 5, nlist = nlist, maxProbe = maxProbe, delta = delta,
          probeSupers = probeSupers)
      var knn: org.apache.spark.sql.DataFrame = null
      (1 to 2).foreach { i =>
        timed(s"v17-class adaptive kNN build run$i (n=$n)") {
          knn = knnAdaptive(emb).localCheckpoint(true)
        }
      }
      val probedAvg = knn.agg(avg(col("n_probed"))).head.getDouble(0)
      val mutual = {
        val fwd = knn.select(col("query_id").as("a"), col("vec_id").as("b"))
        val rev = knn.select(col("query_id").as("b"), col("vec_id").as("a"))
        fwd.join(rev, Seq("a", "b")).filter(col("a") < col("b")).count()
      }
      println(f"[clusterbuild] mean n_probed=$probedAvg%.2f mutual_edges=$mutual")
      // recall panel: 40 deterministic queries, brute-force truth @3
      val K = 3
      val qPred = pmod(col("vec_id"), lit(53)) === 0 && col("vec_id") <= lit(53L * 40)
      val queries = emb.filter(qPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(emb.filter(qPred), emb,
          VectorFunctions.cosineSim, k = K)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val q = queries.count()
      val edges = knn.select(col("query_id").as("src"), col("vec_id").as("dst"),
        col("cos")).localCheckpoint(true)
      val edgeHits = edges.select(col("src"), col("dst")).collect()
        .count(r => truth.contains((r.getLong(0), r.getLong(1))))
      println(s"[clusterbuild] truth pairs in kNN edges: $edgeHits / ${truth.size}")
      // v36-class: CONSTANT beam over the base graph (the clusterable-world
      // claim: parameters stop needing to scale with n)
      val stride = math.max(1L, n / nlist)
      val entries = emb.filter(pmod(col("vec_id"), lit(stride)) === 0)
        .orderBy(col("vec_id")).limit(nlist).select(col("vec_id"))
        .localCheckpoint(true)
      def beamRecall(tag: String, es: org.apache.spark.sql.DataFrame): Unit = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        val hits = Similarity.beamSearchVisited(emb,
            es.select(col("src"), col("dst")), queries,
            queries.select(col("query_id")).crossJoin(entries), 8, 4)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
          .select(col("query_id"), col("vec_id")).collect()
          .count(r => truth.contains((r.getLong(0), r.getLong(1))))
        println(s"[clusterbuild] $tag beam recall(B=8): $hits / ${q * K}")
      }
      beamRecall("base graph", edges)
      // insert path: hold out 1/9, build base over the rest, grow
      val isNew = pmod(col("vec_id"), lit(9)) === 4
      val baseNodes = emb.filter(!isNew).localCheckpoint(true)
      var baseEdges: org.apache.spark.sql.DataFrame = null
      timed(s"v36-class base build (n=$n)") {
        baseEdges = knnAdaptive(baseNodes)
          .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
          .localCheckpoint(true)
      }
      var grown: org.apache.spark.sql.DataFrame = null
      timed(s"v36-class insert all-entries seed (n=$n)") {
        grown = Similarity.graphInsert(baseNodes, baseEdges, emb.filter(isNew),
          entries, beam = 8, rounds = 3, m = 5, outDegree = 5)
          .localCheckpoint(true)
      }
      beamRecall("grown graph (all-entries seed)", grown)
      // IVF-ROUTED insert seeds (the SPANN-style hybrid): one entry node per
      // cell, each insert seeds only its margin-rule probe cells' entries —
      // seeds O(n_probed) per insert instead of |entries|, the linear form
      var grownR: org.apache.spark.sql.DataFrame = null
      // cell assignment + per-cell entry node are INDEX METADATA (the
      // persisted IVF index — VectorIndex — stores the assignment; a real
      // deployment amortizes it across every insert batch), so the seeder —
      // which computes them eagerly — sits outside the per-batch timing
      val seedsFor = Similarity.marginRoutedSeeder(baseNodes,
        VectorFunctions.cosineSim, nlist, maxProbe, delta, probeSupers)
      timed(s"v36-class insert ivf-routed seed (n=$n)") {
        grownR = Similarity.graphInsertSeeded(baseNodes, baseEdges,
          emb.filter(isNew), seedsFor, beam = 8, rounds = 3, m = 5,
          outDegree = 5).localCheckpoint(true)
      }
      beamRecall("grown graph (ivf-routed seed)", grownR)
    } else if (args.headOption.contains("sf1dir")) {
      // Materialize a PERSISTED sf1 replica dir (10x sf0.1, all tables) for
      // the full-suite 10x bench: key-shifted replicas keep every join/
      // blocking dimension disjoint across replicas (the honest linear-
      // scaling construction of the `sf1`/`sf1new` modes), dimensions
      // (region/nation) stay single-copy so FKs remain valid, dates and
      // event times are UNSHIFTED so date-filtered scans keep their
      // selectivity (filters pass 10x the rows — density scaling).
      // documents get word-prefixed replicas (zero cross-replica shingles);
      // embeddings get per-replica sign flips (cross-replica cosine ~
      // random). Each table lands as ONE file named <table>.parquet to
      // match the driver layout (the streaming sources glob that name).
      val out = args(1)
      val n = 10
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(out))
      def writeOne(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("sf1gen-")
        df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
        val f = java.nio.file.Files.list(tmp)
          .filter(_.toString.endsWith(".parquet")).findFirst().get()
        java.nio.file.Files.move(f, java.nio.file.Paths.get(out, s"$name.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        println(s"[sf1dir] wrote $name")
      }
      def replicate(name: String, shifts: Map[String, Long]): Unit = {
        val base = graft.sources.Tables(spark, sfDir, name)
        writeOne((0 until n).map { k =>
          base.select(base.columns.map(c => shifts.get(c)
            .map(s => (col(c) + lit(k.toLong * s)).as(c)).getOrElse(col(c))).toIndexedSeq: _*)
        }.reduce(_ unionByName _), name)
      }
      writeOne(graft.sources.Tables(spark, sfDir, "region"), "region")
      writeOne(graft.sources.Tables(spark, sfDir, "nation"), "nation")
      replicate("customer", Map("c_custkey" -> 10000000L))
      replicate("supplier", Map("s_suppkey" -> 10000000L))
      replicate("part", Map("p_partkey" -> 10000000L))
      replicate("orders", Map("o_orderkey" -> 100000000L, "o_custkey" -> 10000000L))
      replicate("lineitem", Map("l_orderkey" -> 100000000L,
        "l_partkey" -> 10000000L, "l_suppkey" -> 10000000L))
      replicate("events", Map("event_id" -> 100000000L, "user_id" -> 1000000L))
      val docsBase = graft.sources.Tables.documents(spark, sfDir)
      writeOne((0 until n).map { k =>
        docsBase.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"),
          col("lang"), concat(lit(s"r$k"), col("source")).as("source"),
          col("n_chars"))
      }.reduce(_ unionByName _), "documents")
      val embBase = graft.sources.Tables.embeddings(spark, sfDir)
      writeOne((0 until n).map { k =>
        // Per-(dim, replica) PSEUDO-RANDOM sign mask. The first construction
        // (flip dims where (i + 7k) % 10 < 5) left replica pairs at mask
        // offset ±1 with cross-replica twin cosine ≈ +0.6 — ABOVE the
        // organic neighbor range, so every vector's sf1 top-3 truth was its
        // deterministic replica twins and graph-ANN recall collapsed by
        // fixture construction (r12 graphdiag: truth-in-edges 17/114 with
        // 9198 cross-replica edges). A murmur-hash mask makes twin cosine a
        // ±x_i² random sum: 0 ± ~0.17 at D=64, below the organic floor.
        // Replica 0 stays verbatim so sf0.1 results carry over.
        val flip = transform(col("embedding"),
          (x, i) => if (k == 0) x
                    else when(pmod(hash(i, lit(k)), lit(2)) === 0, x).otherwise(-x))
        embBase.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          flip.as("embedding"),
          // labels are v01's blocking dimension — shift per replica so
          // blocks stay disjoint (10 independent copies, not 10x occupancy)
          (col("label") + lit(k * 100000)).as("label"))
      }.reduce(_ unionByName _), "embeddings")
    } else if (args.headOption.contains("sf1")) {
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
    } else if (args.headOption.contains("sf1new")) {
      // 10x scaling points for the round-3 operators, same independence
      // construction as `sf1`: each replica is disjoint in the operator's
      // join/blocking dimension, so the honest linear-scaling shape is 10
      // independent copies of the sf0.1 problem.
      import graft.operators.{Dedup, Sampling}
      import graft.ops.{RangeJoin, Relational}
      // documents: word-prefixed replicas (zero cross-replica shingles)
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"), col("source"))
      val docs = (0 until 10).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"),
          concat(lit(s"r$k"), col("source")).as("source"))
      }.reduce(_ unionByName _).repartition(32).persist()
      timed("docs materialize (50k)")(docs.count())
      val hb = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10)
        .cast("int")
      timed("d21_decontaminate")(
        Dedup.decontaminate(docs.filter(hb < 250), docs.filter(hb >= 250),
          "doc_id", "text", n = 4).count())
      timed("d22_source_cap")(
        Relational.topKPerGroupSalted(docs.select(col("doc_id"), col("source")),
          Seq("source"),
          Seq(md5(concat(col("doc_id").cast("string"), lit("s22"))).asc,
            col("doc_id").asc), 10).count())
      docs.unpersist()
      // events: time- and user-shifted replicas (disjoint keys AND spans)
      val ev = graft.sources.Tables.eventsUs(spark, sfDir)
        .select(col("event_id"), col("user_id"), col("ts_us"), col("event_type"))
      val yearUs = 31536000000000L
      val evx = (0 until 10).map { k =>
        ev.select((col("event_id") + lit(k * 10000000L)).as("event_id"),
          (col("user_id") + lit(k * 1000000L)).as("user_id"),
          (col("ts_us") + lit(k * yearUs)).as("ts_us"), col("event_type"))
      }.reduce(_ unionByName _).repartition(32).persist()
      timed("events materialize (1M)")(evx.count())
      timed("q36_asof_join") {
        val purchases = evx.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts_us"))
        val clicks = evx.filter(col("event_type") === "click")
          .select(col("event_id").as("click_id"), col("user_id"),
            col("ts_us").as("click_ts"))
        Relational.asOfJoin(purchases, clicks, Seq("user_id"),
          "ts_us", "click_ts", Seq("click_id", "click_ts")).count()
      }
      timed("q37_range_bin") {
        val binW = 300000000L
        val probes = evx.select(col("event_id"),
          (col("ts_us") - binW).as("lo"), col("ts_us").as("hi"))
        val pts = evx.select(col("ts_us").as("pt"))
        RangeJoin.binnedPointInterval(pts, "pt", probes, "lo", "hi", binW)
          .groupBy(col("event_id"), col("hi")).count().count()
      }
      evx.unpersist()
      // embeddings: per-replica sign patterns decorrelate the copies
      // (cosine across replicas ~ random), so cells stay balanced
      graft.functions.VectorFunctions.register(spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val embx = (0 until 10).map { k =>
        val flip = transform(col("embedding"),
          (x, i) => when(pmod(i + lit(k * 7), lit(10)) < 5, x).otherwise(-x))
        emb.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          flip.as("embedding"))
      }.reduce(_ unionByName _).repartition(32).persist()
      timed("embeddings materialize (50k)")(embx.count())
      timed("v06_semantic_dedup (nlist=160)")(
        Dedup.semanticDedup(embx, "vec_id",
          graft.functions.VectorFunctions.cosineSim,
          nlist = 160, minCos = 0.3).count())
      timed("v06 hierarchical (nlist=160, probe 4/13 supers)")(
        Dedup.semanticDedup(embx, "vec_id",
          graft.functions.VectorFunctions.cosineSim,
          nlist = 160, minCos = 0.3, probeSupers = 4).count())
      embx.unpersist()
    } else if (args.headOption.contains("d18pieces")) {
      val docs = graft.sources.Tables.documents(spark, sfDir)
      var pairs: org.apache.spark.sql.DataFrame = graft.operators.Dedup
        .minhashLsh(docs, "doc_id", "text",
          n = 3, k = 8, r = 2, minJaccard = 0.2, maxDf = 20)
      timed("pairs persist")(
        { pairs = pairs.localCheckpoint(true); pairs.count() })
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
    } else if (args.headOption.contains("d18sf1")) {
      // incremental-clustering 10x scaling point: the corpus grows to 10
      // replicas (sf1 construction, zero cross-replica shingle overlap) but
      // the NEW BATCH stays the same absolute size as the sf0.1 d18pieces
      // batch (the doc_id%10>=7 slice of replica 0 only, ~1.5k docs). If
      // incremental work is ∝ batch + touched clusters, its time stays ~flat
      // while the from-scratch prior propagation grows ~10x.
      import graft.operators.Dedup
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val reps = (0 until 10).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"))
      }
      // localCheckpoint (not persist): production reads the prior labels and
      // the pair index FROM STORAGE — live lineage here (10-way union +
      // minhashLsh) would re-ANALYZE per downstream plan and the measurement
      // becomes driver-side analysis cost, not incremental work (CLAUDE.md
      // "checkpoint INPUT relations too")
      var docs = reps.reduce(_ unionByName _).repartition(32)
      timed("sf1 corpus materialize (50k docs)")(
        { docs = docs.localCheckpoint(true); docs.count() })
      var pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = 20)
      timed("pairs persist")(
        { pairs = pairs.localCheckpoint(true); pairs.count() })
      val isNew = (c: org.apache.spark.sql.Column) =>
        c < 1000000L && c % 10 >= 7
      val batch1 = docs.filter(!isNew(col("doc_id")))
      val batch2 = docs.filter(isNew(col("doc_id")))
      val priorPairs = pairs.filter(!isNew(col("doc_a")) && !isNew(col("doc_b")))
      val newPairs = pairs.filter(isNew(col("doc_a")) || isNew(col("doc_b")))
      var prior: org.apache.spark.sql.DataFrame = null
      timed("prior propagate (48.5k docs)")(
        { prior = Dedup.dupClusters(priorPairs, batch1, "doc_id"); prior.count() })
      timed("incremental (1.5k batch)")(
        Dedup.dupClustersIncremental(prior, newPairs, batch2, "doc_id").count())
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
    } else if (args.headOption.contains("v06pieces")) {
      import graft.operators.{Dedup, Similarity}
      import graft.functions.VectorFunctions
      VectorFunctions.register(spark)
      val emb = graft.sources.Tables.embeddings(spark, sfDir)
      val cents = Similarity.strideCentroids(emb, 16)
      val topCells = Similarity.topCellsOf(cents, VectorFunctions.cosineSim) _
      for (i <- 1 to 2) {
        timed(s"assign-only run$i")(
          emb.withColumn("cell",
            element_at(topCells(col("embedding"), 1), 1).getField("cell"))
            .select(col("vec_id"), col("cell")).count())
      }
      for (i <- 1 to 2)
        timed(s"full v06 run$i")(
          { val k = Dedup.semanticDedup(emb, "vec_id",
              VectorFunctions.cosineSim, 16, 0.3); k.count(); k.unpersist() })
      // pair join over the two assignment implementations
      def hofCells(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
        val scored = array(cents.map { case (i, c) =>
          struct(VectorFunctions.cosineSim(v, typedlit(c)).as("a"),
            lit(i).as("cell"))
        }.toIndexedSeq: _*)
        slice(reverse(array_sort(scored)), 1, 1)
      }
      def pairCost(assigned: org.apache.spark.sql.DataFrame, tag: String): Unit = {
        val a = assigned.persist(); a.count()
        val as = a.select(col("cell"), col("vec_id").as("id_a"), col("embedding").as("vec_a"))
        val bs = a.select(col("cell"), col("vec_id").as("id_b"), col("embedding").as("vec_b"))
        for (i <- 1 to 2)
          timed(s"pairs-$tag run$i")(
            as.join(bs, Seq("cell")).filter(col("id_a") < col("id_b"))
              .filter(round(VectorFunctions.cosineSim(col("vec_a"), col("vec_b")), 6) >= 0.3)
              .count())
        a.unpersist()
      }
      pairCost(emb.withColumn("cell",
        element_at(topCells(col("embedding"), 1), 1).getField("cell"))
        .select(col("vec_id"), col("embedding"), col("cell")), "native")
      pairCost(emb.withColumn("cell",
        element_at(hofCells(col("embedding")), 1).getField("cell"))
        .select(col("vec_id"), col("embedding"), col("cell")), "hof")
    } else if (args.headOption.contains("kmvab")) {
      // isolated A/B of the KMV reduce path at k=256: the r4 list-based
      // reduce (contains + sort per surviving row, re-inlined here verbatim
      // for the comparison) vs the current sorted-array reduce (O(1)
      // full-buffer reject). Pure-JVM fold — no Spark in the loop — so the
      // delta is the reduce path alone. Both must produce the same estimate.
      val kk = 256
      val n = 2000000
      val digest = java.security.MessageDigest.getInstance("MD5")
      val hashes = Array.tabulate(n) { i =>
        digest.digest(s"key-$i".getBytes("UTF-8")).map(b => f"$b%02x").mkString
      }
      def oldReduce(buf: List[String], h: String): List[String] =
        if (buf.contains(h)) buf
        else { val l = (h :: buf).sorted; if (l.length > kk) l.take(kk) else l }
      val agg = new graft.functions.Sketches.Kmv(kk)
      for (i <- 1 to 3) {
        var oldBuf: List[String] = Nil
        timed(s"old list reduce x$n run$i")(hashes.foreach(h => oldBuf = oldReduce(oldBuf, h)))
        var newBuf = agg.zero
        timed(s"new array reduce x$n run$i")(hashes.foreach(h => newBuf = agg.reduce(newBuf, h)))
        require(oldBuf == newBuf.toList && oldBuf.length == kk,
          "A/B implementations disagree")
      }
    } else if (args.headOption.contains("m04pieces")) {
      // fixture-vs-operator cost split for the image near-dup row: the m04
      // bench number blends fixture BMP-encode + parquet write (generation,
      // not the operator) with decode + dHash + pigeonhole join (the
      // operator). Two runs each; read the second.
      import graft.operators.{BmpCodec, Dedup}
      import graft.queries.FixtureDirs
      import spark.implicits._
      val ids = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id")).as[Long]
      def mediaDf = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, BmpCodec.encode(w, h, (x, y) => {
            val sp = if (x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y)) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      for (i <- 1 to 2) {
        var fixture: org.apache.spark.sql.DataFrame = null
        timed(s"m04 fixture (encode + parquet round trip) run$i") {
          fixture = FixtureDirs.parquetRoundTrip(mediaDf, "m04pieces-")
          fixture.count()
        }
        timed(s"m04 operator (decode + dHash + join) run$i")(
          Dedup.imageNearDup(fixture, "media_id", "media").count())
      }
    } else if (args.headOption.contains("d23sf1")) {
      // 10x scaling point for content-defined-chunking substring dedup:
      // word-prefixed replicas (the sf1 construction) have disjoint chunk
      // hashes, so duplicated-passage output scales exactly 10x and the
      // honest shape is linear (per-char md5 chunking dominates; the two
      // hash-keyed shuffles carry only span rows). Warm each corpus once,
      // read the second run.
      import graft.operators.Dedup
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val small = base.repartition(32).persist()
      small.count()
      val reps = (0 until 10).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"))
      }
      val big = reps.reduce(_ unionByName _).repartition(32).persist()
      timed("sf1 corpus materialize (50k docs)")(big.count())
      for (i <- 1 to 2) {
        timed(s"d23 spans sf0.1 run$i")(
          Dedup.exactSubstringSpans(small, "doc_id", "text").count())
        timed(s"d23 spans sf1 (10x) run$i")(
          Dedup.exactSubstringSpans(big, "doc_id", "text").count())
      }
    } else if (args.headOption.contains("m06pieces")) {
      // fixture-vs-operator cost split for the audio near-dup row (the m04
      // split, audio leg): fixture = WAV encode + parquet round trip;
      // operator = WAV decode + energy hash + pigeonhole join.
      import graft.operators.{Dedup, WavCodec}
      import graft.queries.FixtureDirs
      import spark.implicits._
      val ids = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id")).as[Long]
      def mediaDf = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val spf = (gid % 5 + 3).toInt
          val n = 57 * spf
          val gain = (id % 4 + 1).toInt
          val spike = if (id % 5 == 0) 1000 else 0
          val samples = Array.tabulate(n) { i =>
            val base = (((gid + 5) * (i.toLong * i + 3 * i + 7) + (2 * gid + 1) * i) % 14001) - 7000
            val sp = if (i == 0) spike else 0
            (gain * (base + sp)).toShort
          }
          (id, WavCodec.encode(16000, 1, samples))
        }
      }.toDF("media_id", "media")
      for (i <- 1 to 2) {
        var fixture: org.apache.spark.sql.DataFrame = null
        timed(s"m06 fixture (encode + parquet round trip) run$i") {
          fixture = FixtureDirs.parquetRoundTrip(mediaDf, "m06pieces-")
          fixture.count()
        }
        timed(s"m06 operator (decode + energy hash + join) run$i")(
          Dedup.audioNearDup(fixture, "media_id", "media").count())
      }
    } else if (args.headOption.contains("m07pieces")) {
      // fixture-vs-operator cost split for the video near-dup row (the m04
      // split, video leg): fixture = AVI encode + parquet round trip;
      // operator = AVI decode + keyframe dHash fold + pigeonhole join.
      import graft.operators.{AviCodec, Dedup}
      import graft.queries.FixtureDirs
      import spark.implicits._
      val ids = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id")).as[Long]
      def mediaDf = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val nF = 8 * (gid % 3 + 1).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, AviCodec.encode(w, h, nF, 10, (f, x, y) => {
            val sp = if (f == 0 && x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x + 11L * f * (x + y + 1)) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y + 13L * f * (y + 1)) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y) + 17L * f * f) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      for (i <- 1 to 2) {
        var fixture: org.apache.spark.sql.DataFrame = null
        timed(s"m07 fixture (encode + parquet round trip) run$i") {
          fixture = FixtureDirs.parquetRoundTrip(mediaDf, "m07pieces-")
          fixture.count()
        }
        timed(s"m07 operator (decode + keyframe hash + join) run$i")(
          Dedup.videoNearDup(fixture, "media_id", "media").count())
      }
    } else if (args.headOption.contains("d24sf1")) {
      // 10x scaling point for the exact-substring REWRITE (d24 = d23 spans
      // + cut-and-keep-first): word-prefixed replicas keep chunk hashes
      // disjoint across replicas, so rewrite work scales with the data and
      // the honest shape is linear. Warm each corpus once, read run2.
      import graft.operators.Dedup
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      val small = base.repartition(32).persist()
      small.count()
      val reps = (0 until 10).map { k =>
        base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"r$k$$1").as("text"))
      }
      val big = reps.reduce(_ unionByName _).repartition(32).persist()
      timed("sf1 corpus materialize (50k docs)")(big.count())
      // sum over clean_md5 bytes, NOT count(): count() lets Catalyst prune
      // the rebuilt-text projection — the operator's actual work
      def force(df: org.apache.spark.sql.DataFrame): Unit =
        df.agg(sum(length(col("clean_md5"))), sum(col("cut_chars"))).collect()
      for (i <- 1 to 2) {
        timed(s"d24 rewrite sf0.1 run$i")(
          force(Dedup.removeDuplicatedPassages(small, "doc_id", "text")))
        timed(s"d24 rewrite sf1 (10x) run$i")(
          force(Dedup.removeDuplicatedPassages(big, "doc_id", "text")))
      }
      // d25 on the same replicas (word-prefixes make replica trigram sets
      // mostly disjoint — DF spreads, the vocabulary grows ~10x: the
      // WORST case for the broadcast side, which is the claim under test)
      import graft.functions.TextFunctions
      TextFunctions.registerNative(spark)
      def coherence(df: org.apache.spark.sql.DataFrame): Unit = {
        val tri = df.select(col("doc_id"),
          explode(TextFunctions.charShinglesNative(col("text"), 3)).as("g"))
        val dfreq = tri.groupBy(col("g")).agg(count(lit(1)).as("df"))
        tri.join(broadcast(dfreq), Seq("g")).groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tri"),
            sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_common"))
          .agg(sum(col("n_tri")), sum(col("n_common"))).collect()
      }
      for (i <- 1 to 2) {
        timed(s"d25 coherence sf0.1 run$i")(coherence(small))
        timed(s"d25 coherence sf1 (10x) run$i")(coherence(big))
      }
    } else if (args.headOption.contains("skewcorpus")) {
      // adversarial boilerplate skew: EVERY doc shares one 40-word
      // boilerplate prefix (license header / nav bar shape), so uncapped
      // the inverted-index join degenerates into the single-reducer bomb —
      // each shared shingle joins df² rows. The df-cap claim under test:
      // capped cost on the boilerplate corpus ≈ the clean corpus's cost,
      // while Σ df² (the exact row count through the shingle join) shows
      // what uncapped WOULD process. 10x replicas as in d23sf1.
      import graft.operators.Dedup
      val boiler = ("begin standard corpus license header all rights " +
        "reserved redistribution and use in source and binary forms with " +
        "or without modification are permitted provided that the above " +
        "copyright notice and this disclaimer appear in all copies end").trim
      val base = graft.sources.Tables.documents(spark, sfDir)
        .select(col("doc_id"), col("text"))
      def reps(src: org.apache.spark.sql.DataFrame, prefix: String) =
        (0 until 10).map { k =>
          src.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            concat(lit(prefix), regexp_replace(col("text"), "(\\S+)", s"r$k$$1"))
              .as("text"))
        }.reduce(_ unionByName _).repartition(32).persist()
      val clean = reps(base, "")
      val skewed = reps(base, boiler + " ")
      timed("materialize clean 50k")(clean.count())
      timed("materialize boilerplate 50k")(skewed.count())
      for ((tag, corpus) <- Seq(("clean", clean), ("boilerplate", skewed))) {
        val df2 = Dedup.docShingles(corpus, "doc_id", "text")
          .groupBy(col("shingle")).agg(count(lit(1)).as("df"))
          .agg(sum(col("df") * col("df")).as("uncapped"),
            sum(when(col("df") <= graft.queries.TextQueries.DedupMaxDf,
              col("df") * col("df")).otherwise(0L)).as("capped"))
          .collect()(0)
        println(s"[scratch] $tag 50k join rows: uncapped=${df2.getLong(0)} " +
          s"capped=${df2.getLong(1)}")
        for (i <- 1 to 2)
          timed(s"$tag d05 capped run$i")(
            Dedup.ngramJaccard(corpus, "doc_id", "text", n = 3,
              minJaccard = 0.2, maxDf = graft.queries.TextQueries.DedupMaxDf)
              .count())
      }
      clean.unpersist(); skewed.unpersist()
    } else if (args.headOption.contains("annrecall")) {
      // recall@10 vs cost for the approximate ANN paths against brute-force
      // ground truth — what a v03/v04 user actually cares about. Corpus:
      // sf0.1 embeddings (2k × 64d) and the sf1new decorrelated 10x replica
      // (20k). Queries: the first 100 vectors (replica 0 at sf1). Times are
      // wall clock of the full top-10 retrieval (collect of 1000 rows).
      import graft.operators.Similarity
      import graft.functions.VectorFunctions
      VectorFunctions.register(spark)
      val emb0 = graft.sources.Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      val embx = (0 until 10).map { k =>
        val flip = transform(col("embedding"),
          (x, i) => when(pmod(i + lit(k * 7), lit(10)) < 5, x).otherwise(-x))
        emb0.select((col("vec_id") + lit(k * 1000000L)).as("vec_id"),
          flip.as("embedding"))
      }.reduce(_ unionByName _).repartition(32)
      for ((tag, corpusRaw) <- Seq(("sf0.1", emb0), ("sf1", embx))) {
        val c = corpusRaw.persist(); c.count()
        val q = c.filter(col("vec_id") < 100)
        def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
          df.select(col("query_id"), col("vec_id")).collect()
            .map(r => (r.getLong(0), r.getLong(1))).toSet
        var ground: Set[(Long, Long)] = null
        timed(s"$tag brute-force ground truth") {
          ground = pairsOf(Similarity.bruteForceTopK(
            q, c, VectorFunctions.cosineSim, 10))
        }
        def report(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
          var got: Set[(Long, Long)] = null
          timed(s"$tag $label") { got = pairsOf(df) }
          println(f"[scratch] $tag $label recall@10 = ${
            (ground & got).size.toDouble / ground.size}%.3f")
        }
        for ((t, p) <- Seq((4, 8), (8, 6), (8, 4), (12, 4), (15, 3)))
          report(s"lsh tables=$t planes=$p")(Similarity.lshTopK(
            q, c, VectorFunctions.cosineSim, 10, tables = t, planesPerTable = p))
        for (probe <- Seq(1, 2, 4, 8))
          report(s"ivf nlist=16 nprobe=$probe")(Similarity.ivfTopK(
            q, c, VectorFunctions.cosineSim, 10, nlist = 16, nprobe = probe))
        // PQ: pure ADC (32-bit codes, no corpus vectors at query time) and
        // the deployed shortlist+rerank shape at three shortlist widths
        report("pq adc m=8 ksub=16")(Similarity.pqTopK(q, c, 10))
        for (r <- Seq(50, 100, 200))
          report(s"pq rerank R=$r")(Similarity.pqTopKRerank(
            q, c, VectorFunctions.cosineSim, 10, shortlist = r))
        c.unpersist()
      }
    } else if (args.headOption.contains("streamsf1")) {
      // streaming 10x scaling point: time- and user-shifted event replicas
      // (the sf1new independence construction — disjoint keys AND disjoint
      // time spans, so state per key and per window is unchanged; only the
      // VOLUME grows 10x) written as a single events.parquet file so the
      // s0x file-stream queries run on it unmodified. Claim under test:
      // state-bounded streaming ops grow ∝ data, and the 1-2 s micro-batch
      // machinery floor amortizes away at scale. Two runs per query per
      // scale; read the SECOND (first pays plan-shape codegen).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
      val yearNs = 31536000000000000L
      // year shift adaptive to the ts generation (epoch-nanos long vs µs
      // timestamp): timestampadd keeps the source column type either way
      val shiftTs: Int => org.apache.spark.sql.Column =
        if (ev.schema("ts").dataType == org.apache.spark.sql.types.LongType)
          k => col("ts") + lit(k * yearNs)
        else k => expr(s"timestampadd(DAY, ${k * 365}, ts)")
      val evx = (0 until 10).map { k =>
        ev.select(
          (col("event_id") + lit(k * 10000000L)).as("event_id"),
          shiftTs(k).as("ts"),
          (col("user_id") + lit(k * 1000000L)).as("user_id"),
          col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
      val dir10 = java.nio.file.Files.createTempDirectory("streamsf1-")
      val stage = java.nio.file.Files.createTempDirectory("streamsf1-stage-")
      evx.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage)
        .filter(p => p.toString.endsWith(".parquet")).findFirst().get()
      java.nio.file.Files.move(part, dir10.resolve("events.parquet"))
      println(s"[scratch] 10x events at $dir10")
      if (args.lift(1).contains("widths")) {
        // does the 4-state-partition local optimum (profiled at sf0.1) still
        // hold at 10x the per-batch volume, or must width scale with data?
        import graft.queries.StreamingQueries
        for (parts <- Seq(4, 8, 16);
             name <- Seq("s02_stream_dedup", "s06_stream_session_window")) {
          StreamingQueries.statePartitions = parts
          for (i <- 1 to 3)
            timed(s"sf1 parts=$parts $name run$i")(
              SparkEntry.queries(name)(spark, dir10.toString).count())
        }
        StreamingQueries.statePartitions = 4
      } else {
        val qs = Seq("s02_stream_dedup", "s03_stream_interval_join",
          "s05_stream_outer_interval_join", "s06_stream_session_window",
          "s09_dedup_within_watermark", "s11_stream_funnel")
        for (name <- qs; i <- 1 to 2)
          timed(s"sf0.1 $name run$i")(SparkEntry.queries(name)(spark, sfDir).count())
        for (name <- qs; i <- 1 to 2)
          timed(s"sf1 $name run$i")(SparkEntry.queries(name)(spark, dir10.toString).count())
      }
    } else if (args.headOption.contains("drainprofile")) {
      // isolate the streaming-drain fixed cost: A/B checkpoint filesystem
      // (/tmp on /dev/vda vs /dev/shm tmpfs) x state-partition width for the
      // three expensive drain families (stream-stream join, session window,
      // dedup-within-watermark). Two runs per config; read the SECOND run
      // (first pays codegen for that plan shape).
      import graft.queries.StreamingQueries
      val qs = Seq("s03_stream_interval_join", "s06_stream_session_window",
        "s09_dedup_within_watermark")
      for (root <- Seq(None, Some("/dev/shm"));
           parts <- Seq(1, 4, 8)) {
        StreamingQueries.ckptRoot = root
        StreamingQueries.statePartitions = parts
        val tag = s"ckpt=${root.getOrElse("/tmp")} parts=$parts"
        for (name <- qs; i <- 1 to 2)
          timed(s"$tag $name run$i")(SparkEntry.queries(name)(spark, sfDir).count())
      }
      StreamingQueries.ckptRoot = None
      StreamingQueries.statePartitions = 4
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
