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
}
