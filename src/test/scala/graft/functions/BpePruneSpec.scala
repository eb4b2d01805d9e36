package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Vocab-pruned retrain ([[BpeMerges.pruneToLive]] + [[BpeEncodeWithExpr]],
  * d58): the closure prune is an encode IDENTITY on the measured corpus,
  * the naive unused-drop is NOT — the ancestor closure is load-bearing. */
class BpePruneSpec extends SparkSpec {
  import spark.implicits._

  private def streams(docs: Seq[String],
                      pairs: IndexedSeq[(String, String)]): Seq[String] = {
    TextFunctions.registerNative(spark)
    docs.toDF("text")
      .select(concat_ws(" ", TextFunctions.bpeTokensWith(col("text"), pairs))
        .as("s"))
      .as[String].collect().toSeq
  }

  private def fullStreams(docs: Seq[String]): Seq[String] = {
    TextFunctions.registerNative(spark)
    docs.toDF("text")
      .select(concat_ws(" ", TextFunctions.bpeTokens(col("text"))).as("s"))
      .as[String].collect().toSeq
  }

  private def liveProducts(docs: Seq[String]): Set[String] = {
    TextFunctions.registerNative(spark)
    docs.toDF("text")
      .select(explode(TextFunctions.bpeTokens(col("text"))).as("t"))
      .filter(length(col("t")) > 1).distinct().as[String].collect().toSet
  }

  // "batch" exercises the dead-intermediate chain: at → atc → atch → batch
  // fire in sequence but only "batch" surfaces — the naive prune would drop
  // the three intermediates and break the chain
  private val corpus = Seq("batch jobs batch", "order the vector",
    "customer data table", "all small merges align")

  test("closure prune preserves the encoded stream byte-identically") {
    val live = liveProducts(corpus)
    val pruned = BpeMerges.pruneToLive(live)
    assert(pruned.size < BpeMerges.pairs.size, "nothing pruned — fixture vacuous")
    assert(streams(corpus, pruned) == fullStreams(corpus))
    // the pruned table stays well-formed: every multi-char side produced
    // by an earlier kept merge (the invariant the encode equivalence needs)
    val produced = scala.collection.mutable.Set.empty[String]
    pruned.foreach { case (a, b) =>
      Seq(a, b).foreach(s => assert(s.length == 1 || produced.contains(s),
        s"pruned table ill-formed: '$s' has no earlier producer"))
      produced += (a + b)
    }
  }

  test("naive unused-drop changes the encoding — the closure is necessary") {
    val live = liveProducts(corpus)
    // keep only merges whose product surfaces (drop dead intermediates)
    val naive = BpeMerges.pairs.filter { case (a, b) => live.contains(a + b) }
    assert(naive.size < BpeMerges.pruneToLive(live).size,
      "fixture has no dead intermediate — counterexample vacuous")
    assert(streams(corpus, naive) != fullStreams(corpus),
      "naive prune unexpectedly preserved the encoding; the fixture no " +
        "longer exercises a dead-but-required intermediate merge")
  }

  test("pruneToLive keeps exactly live + ancestors, in original order") {
    // live = {batch}: ancestors are at(6), atc(16), atch(17), batch(18)
    val kept = BpeMerges.pruneToLive(Set("batch"))
    assert(kept == IndexedSeq(("a", "t"), ("at", "c"), ("atc", "h"), ("b", "atch")))
    // empty live set prunes everything
    assert(BpeMerges.pruneToLive(Set.empty).isEmpty)
    // full live set keeps everything
    val all = BpeMerges.pairs.map { case (a, b) => a + b }.toSet
    assert(BpeMerges.pruneToLive(all) == BpeMerges.pairs)
  }

  test("custom-table expression with the FULL table matches bpe_encode") {
    assert(streams(corpus, BpeMerges.pairs) == fullStreams(corpus))
  }

  test("property: closure prune is an encode identity on ANY random domain") {
    // deterministic ScalaCheck generators, fixed seeds (the repo's
    // MergePropertiesSpec pattern): random domains drawn from the testdata
    // vocabulary, merge-rich words, and arbitrary letter strings — the
    // closure argument (every firing merge reaches a surfaced product) is
    // corpus-independent, so the identity must hold for every domain
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val pool = Seq("join", "hash", "row", "batch", "scan", "column",
      "customer", "filter", "small", "merge", "slow", "order", "vector",
      "line", "table", "data", "value", "group", "agg", "the", "query",
      "batcher", "customerize", "vectorize", "lowdata", "uptable")
    val wordGen = Gen.frequency(
      (4, Gen.oneOf(pool)),
      (1, Gen.choose(1, 12).flatMap(n =>
        Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))))
    val domainGen = Gen.choose(1, 15).flatMap(n => Gen.listOfN(n, wordGen))
    for (seed <- 0 until 25) {
      val domain = domainGen.apply(Gen.Parameters.default, Seed(seed.toLong))
        .get.distinct
      val full = domain.map(w => BpeEncodeExpr.encodeWord(w).toSeq)
      val live = full.flatten.filter(_.length > 1).toSet
      val pruned = BpeMerges.pruneToLive(live)
      val t = new BpeTable(pruned)
      domain.zip(full).foreach { case (w, expect) =>
        val got = BpeEncodeExpr.encodeWordWith(w, t.pairs, t.rank, t.memo).toSeq
        assert(got == expect,
          s"seed $seed: pruned encode of '$w' diverged: $got vs $expect " +
            s"(live=$live, kept=${pruned.size})")
      }
    }
  }
}
