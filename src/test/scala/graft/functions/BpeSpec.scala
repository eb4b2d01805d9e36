package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** True BPE ([[BpeMerges]] + [[BpeEncodeExpr]]): pins the merge-table
  * well-formedness consequence (all-occurrences-per-round ≡ leftmost-single-
  * merge, the property the d36 DuckDB oracle relies on), exact encodings,
  * and the expression surface (nulls, empties, codegen path). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val rank: Map[String, Int] =
    BpeMerges.pairs.zipWithIndex.map { case ((a, b), i) => (a + " " + b) -> i }.toMap

  /** Independent reimplementation of the ORACLE's semantics: one merge per
    * step — the leftmost occurrence of the lowest-ranked present pair. */
  private def leftmostSingle(w: String): Seq[String] = {
    var syms = w.map(_.toString)
    var done = false
    while (!done && syms.length > 1) {
      val ranked = syms.indices.dropRight(1)
        .flatMap(i => rank.get(syms(i) + " " + syms(i + 1)).map(r => (r, i)))
      if (ranked.isEmpty) done = true
      else {
        val (_, p) = ranked.min // lowest rank, then leftmost
        syms = (syms.take(p) :+ (syms(p) + syms(p + 1))) ++ syms.drop(p + 2)
      }
    }
    syms
  }

  test("merge table is well-formed (construction guard ran) and ranks unique") {
    assert(BpeMerges.pairs.distinct.size == BpeMerges.pairs.size)
    assert(BpeMerges.sqlLiteral.startsWith("['e r', 'i n',"))
  }

  test("all-occurrences greedy equals leftmost-single-merge on every corpus word") {
    val words = graft.sources.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .distinct().as[String].collect()
    // plus adversarial shapes: overlap runs, merge products adjacent to
    // their own components, every table token as a word
    val extra = Seq("tttt", "erer", "joinjoin", "hashash", "batchbatch",
      "lowlow", "orderorder", "aaa", "ababab") ++
      BpeMerges.pairs.map { case (a, b) => a + b + a + b }
    (words ++ extra).foreach { w =>
      assert(BpeEncodeExpr.encodeWord(w).toSeq == leftmostSingle(w),
        s"divergence on word '$w'")
    }
  }

  test("exact encodings: merges apply rank-first, not left-first") {
    // "slower": (e,r) rank 0 fires BEFORE the leftward (o,w) rank 2, then
    // (o,w), (l,ow) 39, (s,low) 41 cascade bottom-up -> [slow, er]
    assert(BpeEncodeExpr.encodeWord("slower").toSeq == Seq("slow", "er"))
    assert(BpeEncodeExpr.encodeWord("join").toSeq == Seq("join"))
    assert(BpeEncodeExpr.encodeWord("customer").toSeq == Seq("customer"))
    assert(BpeEncodeExpr.encodeWord("zzz").toSeq == Seq("z", "z", "z"))
    assert(BpeEncodeExpr.encodeWord("x").toSeq == Seq("x"))
  }

  test("expression: pre-tokenization, ordering, nulls, empties") {
    TextFunctions.registerNative(spark)
    val df = Seq(
      (1L, "slow join, fast merge"),
      (2L, ""),
      (3L, "   "),
      (4L, "a1b2")).toDF("id", "t")
      .select(col("id"), TextFunctions.bpeTokens(col("t")).as("toks"))
      .orderBy("id")
    val got = df.as[(Long, Seq[String])].collect().toSeq
    assert(got(0)._2 == Seq("slow", "join", ",", "f", "a", "st", "merge"))
    assert(got(1)._2 == Seq.empty && got(2)._2 == Seq.empty)
    // digits pre-tokenize singly, never merging across class boundaries
    assert(got(3)._2 == Seq("a", "1", "b", "2"))
    // null in, null out
    val n = Seq((1L, Option.empty[String])).toDF("id", "t")
      .select(TextFunctions.bpeTokens(col("t"))).collect()
    assert(n(0).isNullAt(0))
  }

  test("BpeTrainer: textbook example, overlap convention, determinism") {
    // Sennrich-style toy: counts weight the argmax
    val wc = Seq(("low", 5L), ("lower", 2L), ("newest", 6L), ("widest", 3L))
    val m = BpeTrainer.train(wc, 4)
    // pair counts round 1: (e,s)=9, (s,t)=9, (l,o)=7, (o,w)=7, ... —
    // (e,s) wins the (count DESC, left, right) tie-break over (s,t)
    assert(m(0).left == "e" && m(0).right == "s" && m(0).pairCount == 9L)
    assert(m(1).left == "es" && m(1).right == "t" && m(1).pairCount == 9L)
    assert(m(2).left == "l" && m(2).right == "o" && m(2).pairCount == 7L)
    assert(m(3).left == "lo" && m(3).right == "w" && m(3).pairCount == 7L)
    // overlapping occurrences all count: "aaa" has TWO (a,a) positions
    val o = BpeTrainer.train(Seq(("aaa", 1L)), 1)
    assert(o(0) == BpeTrainer.Merge("a", "a", 2L))
    // ...but application is left-to-right NON-overlapping: "aaaa" -> aa aa
    val o2 = BpeTrainer.train(Seq(("aaaa", 1L)), 2)
    assert(o2(1) == BpeTrainer.Merge("aa", "aa", 1L))
    // loud failure when pairs run dry
    intercept[IllegalArgumentException] { BpeTrainer.train(Seq(("ab", 1L)), 2) }
  }

  test("BpeTrainer on the testdata corpus reproduces the frozen BpeMerges prefix") {
    // the d36 table was trained by this algorithm at sf0.01 — training must
    // regenerate its leading ranks exactly (closure of learn + apply; the
    // sf0.001 subsample's frequency mix legitimately reorders ranks 2-8,
    // so the closure is pinned at the table's training corpus)
    val wc = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toSeq
    val learned = BpeTrainer.train(wc, 8).map(m => (m.left, m.right))
    assert(learned == BpeMerges.pairs.take(8),
      s"training diverged from the frozen table: $learned")
  }
}
