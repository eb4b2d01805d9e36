package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.functions.VectorFunctions
import graft.merge.LogTable
import graft.sources.Tables

/** The r12 partition-scoped maintained-graph state (the r11 s44 scale
  * flag): [[Similarity.graphInsertDelta]] emits ONLY touched-src rows, and
  * a src-bucketed [[LogTable.occMerge]] rewrites only the buckets holding
  * them — per-batch write bytes ∝ touched srcs, never O(graph). */
class GraphStateScopedSpec extends SparkSpec {
  import spark.implicits._

  private def edgeRows(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select(col("src"), col("dst"), col("cos")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("delta form ∪ untouched == full graphInsert (the equivalence the " +
      "partition-scoped sink relies on)") {
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
    val full = Similarity.graphInsert(base, baseEdges, batch, entries)
    val delta = Similarity.graphInsertDelta(base, baseEdges, batch, entries)
      .localCheckpoint(true)
    val composed = baseEdges
      .join(delta.select(col("src")).distinct(), Seq("src"), "left_anti")
      .unionByName(delta)
    assert(edgeRows(composed) == edgeRows(full),
      "delta ∪ untouched diverged from the full insert")
    // the delta really is a delta: strictly fewer rows than the state
    assert(delta.count() < full.count(),
      "delta form returned the whole graph")
  }

  test("src-bucketed occMerge is partition-scoped AND transactional: " +
      "untouched buckets keep files, txn re-delivery is a no-op, " +
      "every version stays readable") {
    val schema = StructType(Seq(StructField("src", LongType),
      StructField("dst", LongType), StructField("cos", DoubleType)))
    val root = java.nio.file.Files.createTempDirectory("graph-scoped-")
      .resolve("edges").toString
    val t = new LogTable(spark, root, schema,
      bucketBy = Some((Seq("src"), 8)))
    val base = (0L until 40L).map(i => (i, i + 1, 0.5)).toDF("src", "dst", "cos")
    t.append(base) // v1
    val v1Files = t.liveFileNames().toSet

    // batch 0: replace src=0's out-list, insert a new src=100
    val delta1 = Seq((0L, 5L, 0.9), (100L, 0L, 0.8)).toDF("src", "dst", "cos")
    def apply(cur: org.apache.spark.sql.DataFrame,
              d: org.apache.spark.sql.DataFrame) =
      cur.join(d.select(col("src")).distinct(), Seq("src"), "left_anti")
        .unionByName(d)
    t.occMerge(delta1, txn = Some(("graph", 0L)))(apply) // v2
    val v2Files = t.liveFileNames().toSet
    val shared = v1Files.intersect(v2Files)
    assert(shared.nonEmpty,
      "no file shared across versions — occMerge rewrote the whole table")
    // write bytes ∝ touched buckets: 2 srcs → ≤ 2 fresh bucket files
    assert((v2Files -- v1Files).size <= 2,
      s"expected ≤2 fresh files for 2 touched srcs, got ${(v2Files -- v1Files).size}")

    // txn re-delivery: no version cut, content unchanged
    val vBefore = t.currentVersion
    t.occMerge(delta1, txn = Some(("graph", 0L)))(apply)
    assert(t.currentVersion == vBefore, "re-delivered batch cut a version")

    // content: src=0 replaced wholesale, src=100 inserted, rest untouched
    val got = edgeRows(t.read())
    val want = ((1L until 40L).map(i => (i, i + 1, 0.5)) ++
      Seq((0L, 5L, 0.9), (100L, 0L, 0.8))).toSet
    assert(got == want)
    // time travel composes with the scoped rewrite
    assert(edgeRows(t.readVersion(1)) ==
      (0L until 40L).map(i => (i, i + 1, 0.5)).toSet)
  }
}
