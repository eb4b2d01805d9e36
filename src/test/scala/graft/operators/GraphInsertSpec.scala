package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.sources.Tables

/** [[Similarity.graphInsert]] — the HNSW-style incremental insert:
  * idempotent under batch redelivery, back-edges make inserts reachable,
  * and beam recall over the incrementally-grown graph holds a floor
  * against the from-scratch build over the union corpus (exact graph
  * equality is NOT guaranteed — the insert sees only the base graph — so
  * the contract is recall, the property a serving layer actually needs).
  *
  * The contracts run under BOTH seeding routes (r14 VERDICT ask): the
  * default all-entries crossJoin and [[Similarity.marginRoutedSeeder]] —
  * the SPANN-style O(n_probed) routing that is the production insert shape
  * at scale (COVERAGE r14: faster AND better recall at 200k). A routed
  * insert sees FEWER seeds, so its grown graph differs from all-entries'
  * — the contracts (idempotency, reachability, degree bound, recall floor)
  * are exactly what must survive the routing change. */
class GraphInsertSpec extends SparkSpec {

  private def edgeSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private lazy val fixture = {
    VectorFunctions.register(spark)
    val emb = Tables.embeddings(spark, sf001)
      .select(col("vec_id"), col("embedding")).localCheckpoint(true)
    val isNew = pmod(col("vec_id"), lit(9)) === 4
    val base = emb.filter(!isNew).localCheckpoint(true)
    val batch = emb.filter(isNew).localCheckpoint(true)
    val nbase = base.count()
    val nlist = math.max(16L, nbase / 50).toInt
    val stride = math.max(1L, nbase / nlist)
    val baseEdges = Similarity.ivfTopK(base, base, VectorFunctions.cosineSim,
        k = 5, nlist = nlist, nprobe = 4)
      .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
      .localCheckpoint(true)
    val entries = base.filter(pmod(col("vec_id"), lit(stride)) === 0)
      .orderBy(col("vec_id")).limit(nlist).select(col("vec_id"))
      .localCheckpoint(true)
    (emb, base, batch, baseEdges, entries)
  }

  /** The two seeding routes under test, as (tag, seedsFor-builder): the
    * builder takes (base, entries, nlist) so each route derives its seeds
    * the way its production caller does. */
  private def seederFor(tag: String,
                        base: org.apache.spark.sql.DataFrame,
                        entries: org.apache.spark.sql.DataFrame,
                        nlist: Int)
      : org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame =
    tag match {
      case "all-entries" =>
        q => q.select(col("query_id")).crossJoin(entries)
      case "margin-routed" =>
        Similarity.marginRoutedSeeder(base, VectorFunctions.cosineSim, nlist)
    }

  for (tag <- Seq("all-entries", "margin-routed")) {

    test(s"[$tag] insert is idempotent: re-delivering the batch over the " +
        "grown graph is a set-exact no-op") {
      val (emb, base, batch, baseEdges, entries) = fixture
      val nlist = math.max(16L, base.count() / 50).toInt
      val seeds = seederFor(tag, base, entries, nlist)
      val grown = Similarity.graphInsertSeeded(base, baseEdges, batch, seeds)
        .localCheckpoint(true)
      // second delivery: the union corpus already contains every batch id,
      // so the insert must anti-join them away and return the same edge set
      val again = Similarity.graphInsertSeeded(emb, grown, batch, seeds)
      assert(edgeSet(again) == edgeSet(grown),
        "re-inserting an already-present batch changed the graph")
    }

    test(s"[$tag] back-edges land: every inserted node is reachable (has " +
        "in-edges) and has out-edges; base out-degree stays <= 5") {
      val (emb, base, batch, baseEdges, entries) = fixture
      val nlist = math.max(16L, base.count() / 50).toInt
      val seeds = seederFor(tag, base, entries, nlist)
      val grown = Similarity.graphInsertSeeded(base, baseEdges, batch, seeds)
        .localCheckpoint(true)
      val newIds = batch.select(col("vec_id")).collect().map(_.getLong(0)).toSet
      val inDeg = grown.filter(col("dst").isin(newIds.toSeq: _*))
        .select(col("dst")).distinct().count()
      val outDeg = grown.filter(col("src").isin(newIds.toSeq: _*))
        .select(col("src")).distinct().count()
      assert(inDeg == newIds.size, s"only $inDeg of ${newIds.size} inserts have in-edges")
      assert(outDeg == newIds.size, s"only $outDeg of ${newIds.size} inserts have out-edges")
      val maxOut = grown.groupBy(col("src")).count()
        .agg(max(col("count"))).head().getLong(0)
      assert(maxOut <= 5L, s"neighbor-shrink failed: out-degree $maxOut > 5")
    }
  }

  test("delete composes with insert: removing the inserted batch unlinks " +
      "it completely, repairs donate, degrees stay bounded, deterministic") {
    val (emb, base, batch, baseEdges, entries) = fixture
    val grown = Similarity.graphInsert(base, baseEdges, batch, entries)
      .localCheckpoint(true)
    val dead = batch.select(col("vec_id"))
    def del() = Similarity.graphDelete(emb, grown, dead,
      graft.functions.VectorFunctions.cosineSim)
    val repaired = del().localCheckpoint(true)
    val deadIds = dead.collect().map(_.getLong(0)).toSet
    val touching = repaired.filter(col("src").isin(deadIds.toSeq: _*) ||
      col("dst").isin(deadIds.toSeq: _*)).count()
    assert(touching == 0, s"$touching edges still touch deleted nodes")
    val maxOut = repaired.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxOut <= 5L, s"out-degree $maxOut > 5 after repair")
    // the repair must donate: srcs that pointed at deleted nodes keep
    // full fan-out where donors exist
    val prunedOnly = grown
      .filter(!col("src").isin(deadIds.toSeq: _*) &&
        !col("dst").isin(deadIds.toSeq: _*))
    assert(repaired.count() > prunedOnly.count(),
      "consolidation donated nothing")
    // pure function: a second run is set-identical
    assert(edgeSet(del()) == edgeSet(repaired))
  }

  for (tag <- Seq("all-entries", "margin-routed")) {
    test(s"[$tag] recall contract: beam recall over the grown graph meets " +
        "the floor vs the from-scratch graph over the union corpus") {
      val (emb, base, batch, baseEdges, entries) = fixture
      val B = 8; val R = 4; val K = 3
      val nbase = math.max(16L, base.count() / 50).toInt
      val seeds = seederFor(tag, base, entries, nbase)
      val grown = Similarity.graphInsertSeeded(base, baseEdges, batch, seeds)
        .select(col("src"), col("dst")).localCheckpoint(true)
      // from-scratch: the same scaled-nlist build over the UNION corpus
      val n = emb.count()
      val nlist = math.max(16L, n / 50).toInt
      val scratch = Similarity.ivfTopK(emb, emb, VectorFunctions.cosineSim,
          k = 5, nlist = nlist, nprobe = 4)
        .select(col("query_id").as("src"), col("vec_id").as("dst"))
        .localCheckpoint(true)
      val qPred = pmod(col("vec_id"), lit(53)) === 0 &&
        col("vec_id") <= lit(53L * 40)
      val queries = emb.filter(qPred)
        .select(col("vec_id").as("query_id"), col("embedding").as("q_vec"))
        .localCheckpoint(true)
      val truth = Similarity.bruteForceTopK(emb.filter(qPred), emb,
          VectorFunctions.cosineSim, k = K)
        .select(col("query_id"), col("vec_id")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(edges: org.apache.spark.sql.DataFrame): Long = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("vec_id"))
        Similarity.beamSearchVisited(emb, edges, queries,
            queries.select(col("query_id")).crossJoin(entries), B, R)
          .filter(col("vec_id") =!= col("query_id"))
          .withColumn("rank", row_number().over(w)).filter(col("rank") <= K)
          .select(col("query_id"), col("vec_id")).collect()
          .count(r => truth.contains((r.getLong(0), r.getLong(1))))
      }
      val grownHits = recall(grown)
      val scratchHits = recall(scratch)
      assert(grownHits * 2 >= scratchHits,
        s"grown-graph recall collapsed: $grownHits hits vs from-scratch $scratchHits")
      assert(grownHits > 0, "grown-graph beam found no true neighbors at all")
    }
  }

  /** ADVERSARIAL degree-cap collision (the documented failure bound,
    * `Similarity.insertEdges`' comment): when MORE than `outDegree` inserts
    * elect the same nearest neighbor, the priority seat can protect only
    * `outDegree` of them — the overflow may orphan if every other
    * back-edge also loses its shrink. This test constructs exactly that
    * worst case (a dense base cluster whose internal cos beats any insert
    * back-edge, one isolated hub all inserts elect) and pins the bound:
    * orphans == clustered − outDegree there, and zero when the cluster
    * fits under the cap. */
  test("adversarial: > outDegree inserts electing one nearest neighbor " +
      "orphan exactly the overflow; <= outDegree orphan none") {
    import spark.implicits._
    VectorFunctions.register(spark)
    def vec(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(8)(0.0f)
      parts.foreach { case (i, v) => a(i) = v.toFloat }
      a.toSeq
    }
    // dense cluster 0..7: mutual cos ≈ 1 (their edges always win a shrink);
    // hub 100 orthogonal to the cluster
    val dense = (0 until 8).map(i => (i.toLong, vec(0 -> 1.0, 1 -> 0.01 * (i + 1))))
    val hub = Seq((100L, vec(7 -> 1.0)))
    val base = (dense ++ hub).toDF("vec_id", "embedding").localCheckpoint(true)
    val baseEdges = Similarity.bruteForceTopK(base, base,
        VectorFunctions.cosineSim, k = 5)
      .select(col("query_id").as("src"), col("vec_id").as("dst"), col("cos"))
      .localCheckpoint(true)
    val entries = base.select(col("vec_id")).localCheckpoint(true)
    // 7 inserts, ALL nearest to the hub (distinct margins → deterministic
    // shrink order: smaller perturbation = higher cos = earlier seat)
    val inserts = (0 until 7).map(j =>
      (200L + j, vec(7 -> 1.0, 1 -> 0.05 * (j + 1))))
      .toDF("vec_id", "embedding").localCheckpoint(true)
    val grown = Similarity.graphInsert(base, baseEdges, inserts, entries)
      .localCheckpoint(true)
    val maxOut = grown.groupBy(col("src")).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxOut <= 5L, s"degree cap broken under collision: $maxOut")
    // the hub's seats go to the 5 closest inserts, in cos order
    val hubOut = grown.filter(col("src") === 100L)
      .select(col("dst")).collect().map(_.getLong(0)).toSet
    assert(hubOut == Set(200L, 201L, 202L, 203L, 204L),
      s"hub out-list should hold the 5 closest inserts, got $hubOut")
    // orphans are EXACTLY the overflow (205, 206): every other back-edge
    // lost to the dense cluster's internal edges
    val withIn = grown.filter(col("dst") >= 200L)
      .select(col("dst")).distinct().collect().map(_.getLong(0)).toSet
    assert((Set(200L, 201L, 202L, 203L, 204L, 205L, 206L) -- withIn) ==
      Set(205L, 206L),
      s"expected overflow {205,206} orphaned, in-linked: $withIn")
    // under the cap: same fixture, 5 inserts — nobody orphans
    val few = inserts.filter(col("vec_id") <= 204L)
    val grownFew = Similarity.graphInsert(base, baseEdges, few, entries)
    val inFew = grownFew.filter(col("dst") >= 200L)
      .select(col("dst")).distinct().count()
    assert(inFew == 5L, s"under-cap insert orphaned: only $inFew in-linked")
  }
}
