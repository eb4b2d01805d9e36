package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / tokenCount handle empty and multi-space text") {
    val df = Seq("", "  ", "a  b c", "one").toDF("t")
    val got = df.select(TextFunctions.tokenCount($"t")).as[Int].collect()
    assert(got.toSeq == Seq(0, 0, 3, 1))
  }

  test("charShingles: normalized distinct trigrams, sub-n empty") {
    TextFunctions.registerNative(spark)
    val df = Seq("Ab  cD", "ab", "aaaa", "  X\tY\nZ  ").toDF("t")
    val got = df.select(TextFunctions.charShinglesNative($"t", 3))
      .as[Seq[String]].collect()
    // "Ab  cD" normalizes to "ab cd": trigrams ab_, b_c, _cd (space shown _)
    assert(got(0) == Seq("ab ", "b c", " cd"))
    assert(got(1) == Seq.empty)              // shorter than n after trim
    assert(got(2) == Seq("aaa"))             // distinct collapses repeats
    assert(got(3) == Seq("x y", " y ", "y z")) // tabs/newlines collapse, trim
  }

  test("wordShingles: distinct n-grams, short-text safe") {
    val df = Seq("a b c d", "a b", "x y x y x y").toDF("t")
    val got = df.select(TextFunctions.wordShingles($"t", 3)).as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
    assert(got(2).toSet == Set("x y x", "y x y")) // distinct collapses repeats
  }

  test("fingerprint normalizes case/punct/whitespace") {
    val df = Seq(("Hello,   World!", "hello world"), ("a-b", "a b")).toDF("x", "y")
    val eq = df.select((TextFunctions.fingerprint($"x") === TextFunctions.fingerprint($"y")).as("e"))
      .as[Boolean].collect()
    assert(eq.forall(identity))
  }

  test("langId picks max-hit language with alphabetical tiebreak") {
    val df = Seq(
      "the cat and the dog is in that house with them",
      "der hund und die katze ist nicht ein",
      "xyz qqq").toDF("t")
    val got = df.select(TextFunctions.langId($"t")).as[String].collect()
    assert(got(0) == "en" && got(1) == "de")
    assert(got(2) == "de") // zero hits everywhere -> alphabetically first
  }

  test("quality score in [0,1] and ranks clean text above punct soup") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog and runs far away to the hills",
      "!!! ### $$$ %%% ^^^ &&& *** ((( )))").toDF("t")
    val got = df.select(TextFunctions.qualityScore($"t")).as[Double].collect()
    assert(got.forall(s => s >= 0.0 && s <= 1.0))
    assert(got(0) > got(1))
  }

  test("CosineSimilarity expression: interpreted, codegen, and fold agree") {
    val df = Seq(
      (Array(1.0, 2.0, 3.0), Array(3.0, 2.0, 1.0)),
      (Array(1.0, 0.0, 0.0), Array(1.0, 0.0, 0.0)),
      (Array(0.0, 0.0, 0.0), Array(1.0, 1.0, 1.0))).toDF("a", "b")
    VectorFunctions.register(spark)
    val rows = df.select(
      VectorFunctions.cosineSim($"a", $"b").as("expr"),
      VectorFunctions.cosineFold($"a", $"b").as("fold")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
    assert(math.abs(rows(0).getDouble(0) - 10.0 / 14.0) < 1e-12)
    assert(rows(1).getDouble(0) == 1.0)
    assert(rows(2).getDouble(0) == 0.0) // zero-norm guard
  }

  test("signLshBucket is deterministic and within range") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet").limit(50)
    val b1 = emb.select(VectorFunctions.signLshBucket($"embedding", 8).as("b"))
      .as[Long].collect()
    val b2 = emb.select(VectorFunctions.signLshBucket($"embedding", 8).as("b"))
      .as[Long].collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
  }

  test("quantizeInt8 native == HOF fold, including edge cases") {
    VectorFunctions.register(spark)
    // edge cases: empty array, zero vector, exact .5 rounding boundary
    // (1.5/ (3.0/127) lands mid-integer only by construction below), negatives
    val edge = Seq(
      Seq.empty[Double],
      Seq(0.0, 0.0),
      Seq(3.0, 1.5, -3.0, -0.75),
      Seq(127.0, -1.0, 0.5)).toDF("embedding")
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select($"embedding".cast("array<double>").as("embedding"))
    for (df <- Seq(edge, emb)) {
      val both = df.select(
        VectorFunctions.quantizeInt8($"embedding").as("n"),
        VectorFunctions.quantizeInt8Fold($"embedding").as("f"))
      assert(both.filter($"n.scale" =!= $"f.scale" || $"n.q_csv" =!= $"f.q_csv")
        .count() == 0)
    }
    val z = edge.select(VectorFunctions.quantizeInt8($"embedding").as("q"))
      .select($"q.scale", $"q.q_csv").collect()
    assert(z(0).getDouble(0) == 0.0 && z(0).getString(1) == "")
    assert(z(1).getString(1) == "0,0")
    assert(z(2).getString(1).split(",").head == "127")
  }

  test("nearestCellL2 native == crossJoin/window argmin, ties to lower cell") {
    VectorFunctions.register(spark)
    import org.apache.spark.sql.functions._
    // cells: 0=(0,0) 1=(10,0) 2=(0,10); includes an exact TIE row (5,0) is
    // equidistant from cells 0 and 1 → must pick the LOWER cell (0)
    val cents = Seq(0L, 0L, 10L, 0L, 0L, 10L)
    val df = Seq(
      (1L, Seq(1L, 1L)), (2L, Seq(9L, 1L)), (3L, Seq(1L, 9L)),
      (4L, Seq(5L, 0L))).toDF("vec_id", "v")
    val native = df.select($"vec_id",
        VectorFunctions.nearestCellL2($"v", cents, 2).as("cell"))
      .orderBy($"vec_id").as[(Long, Int)].collect().toSeq
    // reference composition — the plan v11 used before the native expr
    val centDf = broadcast(cents.grouped(2).zipWithIndex
      .map { case (cv, i) => (i, cv) }.toSeq.toDF("cell", "cv"))
    val dist = aggregate(
      zip_with($"v", $"cv", (a, b) => (a - b) * (a - b)), lit(0L), _ + _)
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"vec_id")
      .orderBy($"dist".asc, $"cell".asc)
    val composed = df.crossJoin(centDf).withColumn("dist", dist)
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"vec_id", $"cell").orderBy($"vec_id")
      .as[(Long, Int)].collect().toSeq
    assert(native == composed)
    assert(native == Seq((1L, 0), (2L, 1), (3L, 2), (4L, 0)))
    // quantized-domain invariant on real data: identical assignments from
    // interpreted eval and the codegen'd path (the suite runs both via
    // collect on a small frame — determinism check)
    val again = df.select($"vec_id",
        VectorFunctions.nearestCellL2($"v", cents, 2).as("cell"))
      .orderBy($"vec_id").as[(Long, Int)].collect().toSeq
    assert(again == native)
  }
  test("topBigramFrac: native linear pass equals the quadratic HOF reference") {
    TopBigramFrac.registerNative(spark)
    val edge = Seq(
      "", "  ", "one", "a b", "a b a b a b", "x y z x y z x y",
      "the the the", "a  b   a b", "\ta b", "word " * 40 + "tail")
    val corpus = graft.sources.Tables.documents(spark, sf001)
      .select($"text").as[String].collect().toSeq
    val df = (edge ++ corpus).toDF("text")
    val got = df.select(
      TopBigramFrac.topBigramFrac($"text").as("native"),
      graft.queries.TextQueries.topBigramFracHof($"text").as("hof"))
      .collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"row $i: native ${r.getDouble(0)} != hof ${r.getDouble(1)}")
    }
  }

}
