package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorFunctions

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("Dedup.exact groups normalized duplicates") {
    val docs = Seq((1L, "Hello World"), (2L, "hello,  world!"), (3L, "other text"))
      .toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .orderBy("keep_id").select("keep_id", "n_dups").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("Dedup.ngramJaccard finds near-identical docs, skips unrelated") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different words appear in this sentence")).toDF("doc_id", "text")
    val got = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, minJaccard = 0.3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L)))
  }

  test("minhashLsh candidates are verified: no false positives vs exact jaccard") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val lsh = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2, minJaccard = 0.2)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    val exact = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3, minJaccard = 0.2)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect().toSet
    // LSH output must be a subset of the exact pairs (verification step) ...
    assert(lsh.subsetOf(exact))
    // ... and catch most of them at this similarity level
    if (exact.nonEmpty) assert(lsh.size.toDouble / exact.size >= 0.5)
  }

  test("simhash: identical docs share fingerprints, near-dup join finds them") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally unrelated content here now")).toDF("doc_id", "text")
    val sh = Dedup.simhash(docs, "doc_id", "text")
    val fps = sh.orderBy("doc_id").select("simhash").as[Long].collect()
    assert(fps(0) == fps(1))
    val nd = Dedup.simhashNearDup(sh, maxHamming = 0)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(nd.toSeq.contains((1L, 2L)))
  }

  test("crossDocNovelty: verbatim dup scores 0, fresh doc 1, mosaic in between; " +
      "shingle totals conserved") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // first: all novel
      (2L, "the quick brown fox jumps over the lazy dog"),   // verbatim dup: 0
      (3L, "entirely fresh content with new words here"),    // disjoint: 1
      (4L, "the quick brown fox sat beside entirely fresh content")) // mosaic
      .toDF("doc_id", "text")
    val got = Dedup.crossDocNovelty(docs, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_shingles", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(got(0)._4 == 1.0)
    assert(got(1)._4 == 0.0)
    assert(got(2)._4 == 1.0)
    assert(got(3)._4 > 0.0 && got(3)._4 < 1.0)
    // every shingle's first occurrence is attributed exactly once
    val distinctShingles = Dedup.docShingles(docs, "doc_id", "text", 3)
      .select("shingle").distinct().count()
    assert(got.map(_._3).sum == distinctShingles)
  }

  test("dupClusters: min-label connected components incl. isolated nodes") {
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, docs, "doc_id")
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L)))
  }

  test("dupClusters: 40-hop chain converges via pointer jumping (log rounds)") {
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val docs = (1L to 40L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, docs, "doc_id", maxIters = 8)
      .as[(Long, Long)].collect()
    assert(got.forall(_._2 == 1L)) // one component, all labeled 1 within 8 rounds
  }

  test("dupClusters: reliable checkpoint mode survives with a checkpoint dir") {
    val ckpt = java.nio.file.Files.createTempDirectory("cc-ckpt-").toString
    spark.sparkContext.setCheckpointDir(ckpt)
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val got = Dedup.dupClusters(pairs, docs, "doc_id", reliableCheckpoint = true)
      .orderBy("doc_id").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L)))
    // checkpoint files actually landed in the reliable dir
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(ckpt)).count() > 0)
  }

  test("capShingles drops boilerplate; capped ngramJaccard ignores a hot shingle") {
    // 100 docs all sharing one boilerplate sentence (a hot shingle in every
    // doc) plus unique content: uncapped, the hot shingles alone produce
    // C(100,2)=4950 candidate pairs through one reducer key; capped, the
    // boilerplate contributes nothing and only the two real near-dups pair up.
    val boiler = "all rights reserved by the original author"
    val docs = ((0 until 98).map(i => (i.toLong, s"$boiler unique$i words$i here$i also$i")) ++
      Seq((98L, s"$boiler shared dup content exactly here"),
          (99L, s"$boiler shared dup content exactly there"))).toDF("doc_id", "text")
    val ds = Dedup.docShingles(docs, "doc_id", "text", n = 3)
    val capped = Dedup.capShingles(ds, maxDf = 10)
    // every shingle of the boilerplate prefix (df=100) is gone
    assert(capped.filter(col("shingle") === "all rights reserved").count() == 0)
    assert(capped.groupBy("shingle").count().agg(max("count")).as[Long].head() <= 10)
    val pairs = Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
        minJaccard = 0.3, maxDf = 10)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((98L, 99L)))
  }

  test("winnowing: shared substring >= k+w-1 chars ⇒ shared fingerprint; " +
      "whitespace/case normalization invariant") {
    import graft.functions.TextFunctions
    TextFunctions.registerNative(spark)
    val common = "this exact sentence appears verbatim in both documents"
    val docs = Seq(
      (1L, s"prefix one $common and then diverges completely afterwards"),
      (2L, s"A totally different opening here $common closing words"),
      (3L, "nothing in common with the others at all whatsoever"),
      (4L, s"  PREFIX   ONE\t$common and then DIVERGES completely afterwards "))
      .toDF("doc_id", "text")
    val fps = docs.select(col("doc_id"),
        explode(TextFunctions.winnowFingerprints(col("text"), k = 8, w = 4)).as("fp"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def setOf(id: Long) = fps.filter(_._1 == id).map(_._2).toSet
    assert((setOf(1) & setOf(2)).nonEmpty)   // winnowing guarantee
    assert((setOf(1) & setOf(3)).isEmpty)    // unrelated docs don't collide
    assert(setOf(1) == setOf(4))             // case/whitespace-normalized
  }

  test("native fingerprint ≡ regex fingerprint on edge cases (incl. non-ASCII)") {
    import graft.functions.TextFunctions
    TextFunctions.registerNative(spark)
    val texts = Seq("", "   ", "Hello, World!", "a--b..c", "MiXeD CaSe",
      "tabs\there\nnewlines", "  padded !! punct ~~ ", "ümläut Größe STRASSE",
      "中文 text; mixed!", "a.b.c.d.e.f.g").zipWithIndex.map(_.swap).toDF("i", "t")
    val both = texts.select(
      TextFunctions.fingerprint(col("t")).as("re"),
      TextFunctions.fingerprintNative(col("t")).as("native"))
    assert(both.filter(col("re") =!= col("native")).count() == 0)
  }

  test("native wordShingles ≡ HOF wordShingles on edge cases") {
    import graft.functions.TextFunctions
    TextFunctions.registerNative(spark)
    val texts = Seq("", "   ", "one", "one two", "one two three",
      "a b c d e f", "  padded   spacing  here  x ", "a\tb\nc d e",
      "dup dup dup dup dup").zipWithIndex.map(_.swap).toDF("i", "t")
    val both = texts.select(
      TextFunctions.wordShingles(col("t"), 3).as("hof"),
      TextFunctions.wordShinglesNative(col("t"), 3).as("native"))
    assert(both.filter(col("hof") =!= col("native")).count() == 0)
  }

  test("ivfTopK recall >= 0.5 vs brute force; all cells covered") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(q, emb, VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(q, emb, VectorFunctions.cosineSim, 5,
        nlist = 8, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & ivf).size.toDouble / bf.size >= 0.5)
    assert(ivf.groupBy(_._1).forall(_._2.size == 5)) // full top-k per query

    // k-means-refined cells must hold the same recall bar (tighter cells →
    // usually better; the bound keeps the test robust to float-mean jitter)
    val ivfKm = Similarity.ivfTopK(q, emb, VectorFunctions.cosineSim, 5,
        nlist = 8, nprobe = 4, kmeansIters = 2)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & ivfKm).size.toDouble / bf.size >= 0.5)
  }

  test("ivfHardNegatives: recall >= 0.5 vs cross-label brute force; " +
      "no same-label or self pairs survive") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select($"vec_id", $"embedding", $"label")
    val q = emb.filter($"vec_id" < 10)
    // ground truth: brute-force top-5 among cross-label candidates only
    val labels = emb.select($"vec_id".as("query_id"), $"label".as("q_lab"))
    val bf = Similarity.bruteForceTopK(q, emb, VectorFunctions.cosineSim, k = 1000)
      .join(labels, Seq("query_id"))
      .join(emb.select($"vec_id", $"label".as("c_lab")), Seq("vec_id"))
      .filter($"q_lab" =!= $"c_lab")
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"query_id")
          .orderBy($"cos".desc, $"vec_id")))
      .filter($"rk" <= 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val hn = Similarity.ivfHardNegatives(q, emb, VectorFunctions.cosineSim,
        k = 5, labelCol = "label", nlist = 8, nprobe = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & hn).size.toDouble / bf.size >= 0.5,
      s"hard-negative recall ${(bf & hn).size.toDouble / bf.size}")
    // the per-pair predicate actually held: no self pairs, no same-label pairs
    val lab = emb.select($"vec_id", $"label").as[(Long, Long)].collect().toMap
    hn.foreach { case (a, b) =>
      assert(a != b && lab(a) != lab(b), s"pair ($a,$b) violates the predicate")
    }
  }

  test("lshTopK recall >= 0.6 vs brute force on real embeddings") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val bf = Similarity.bruteForceTopK(q, emb, VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(q, emb, VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & lsh).size.toDouble / bf.size >= 0.6)
  }

  test("mmrRerank: k distinct picks per query; greedy order demotes the " +
      "near-clone of the first pick below the diverse candidate") {
    VectorFunctions.register(spark)
    // q's top two relevances are near-clones of each other (a, b); c is less
    // relevant but diverse. Greedy MMR at λ=0.5 must pick the clone LAST.
    val emb = Seq(
      (100L, Array(1f, 0f, 0f)),       // query
      (1L, Array(9f, 3f, 0f)),         // a: rel .9487
      (2L, Array(9.1f, 3f, 0f)),       // b: rel .9497, sim(a,b) ~ .99994
      (3L, Array(5f, 0f, 5f))          // c: rel .7071, sim to a/b ~ .67
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.mmrRerank(
        emb.filter($"vec_id" === 100L), emb.filter($"vec_id" < 100L),
        VectorFunctions.cosineSim, candidates = 3, k = 3)
      .orderBy($"sel_rank")
      .select($"sel_rank", $"vec_id").as[(Int, Long)].collect().toSeq
    assert(out == Seq((1, 2L), (2, 3L), (3, 1L)),
      s"greedy trajectory $out — expected b, then diverse c, clone a last")

    // contract on real embeddings: exactly k distinct picks per query, and
    // step 1 is the brute-force top-1
    val real = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = real.filter($"vec_id" < 5)
    val mmr = graft.operators.Similarity.mmrRerank(q, real,
        VectorFunctions.cosineSim, candidates = 8, k = 4)
      .select("query_id", "sel_rank", "vec_id")
      .as[(Long, Int, Long)].collect().toSeq
    val perQ = mmr.groupBy(_._1)
    assert(perQ.size == 5 && perQ.values.forall(s => s.size == 4 &&
      s.map(_._3).distinct.size == 4))
    val top1 = graft.operators.Similarity.bruteForceTopK(q, real,
        VectorFunctions.cosineSim, 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toMap
    perQ.foreach { case (qid, sels) =>
      assert(sels.find(_._2 == 1).get._3 == top1(qid),
        s"step-1 pick for $qid is not the max-relevance candidate")
    }
  }

  test("truncatedRerank: with full shortlist ≡ brute force exactly; " +
      "narrow shortlist keeps recall") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    val bf = graft.operators.Similarity.bruteForceTopK(q, emb,
        VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    // shortlist ≥ corpus ⇒ the prefix stage prunes nothing ⇒ bit-equal ranks
    val full = graft.operators.Similarity.truncatedRerank(q, emb,
        VectorFunctions.cosineSim, prefixDims = 16, shortlist = 500, k = 5)
      .select("query_id", "vec_id", "cos", "rank")
      .as[(Long, Long, Double, Int)].collect().toSet
    assert(full == bf)
    // narrow shortlist: the 16-of-64-dim prefilter still lands most of top-5
    val narrow = graft.operators.Similarity.truncatedRerank(q, emb,
        VectorFunctions.cosineSim, prefixDims = 16, shortlist = 50, k = 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val bfIds = bf.map(t => (t._1, t._2))
    assert((bfIds & narrow).size.toDouble / bfIds.size >= 0.5,
      s"matryoshka recall ${(bfIds & narrow).size.toDouble / bfIds.size}")
  }

  test("binaryHammingTopK: self-fingerprint Hamming 0; recall vs brute " +
      "force at shortlist 100") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val q = emb.filter($"vec_id" < 10)
    // identical vectors pack to identical words → the true NN of a vector's
    // clone sits at Hamming 0; check via a query joined against itself
    val self = graft.operators.Similarity.binaryHammingTopK(
        q, q.withColumn("vec_id", $"vec_id" + 1000), VectorFunctions.cosineSim,
        k = 1, shortlist = 10)
      .filter($"vec_id" === $"query_id" + 1000)
      .select("hamming").as[Int].collect()
    assert(self.length == 10 && self.forall(_ == 0),
      "clone fingerprints must collide at Hamming 0")
    val bf = graft.operators.Similarity.bruteForceTopK(q, emb,
        VectorFunctions.cosineSim, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val bh = graft.operators.Similarity.binaryHammingTopK(q, emb,
        VectorFunctions.cosineSim, k = 5, shortlist = 100)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((bf & bh).size.toDouble / bf.size >= 0.5,
      s"binary-Hamming recall ${(bf & bh).size.toDouble / bf.size}")
  }

  test("decontaminate flags exactly the docs sharing an n-gram with the benchmark") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon"), // shares "beta gamma delta" ✔
      (2L, "one two three four five"),        // no overlap
      (3L, "x beta gamma delta y z")          // shares ✔
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "q beta gamma delta r")).toDF("doc_id", "text")
    val got = Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet == Set(1L, 3L))
    assert(got(1L) == 1L && got(3L) == 1L) // exactly one shared 3-gram each
  }

  test("SQ8 cosine ranking: high recall vs float brute force; exact cross-run") {
    import graft.functions.VectorFunctions
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select($"vec_id", $"embedding")
    val qemb = emb.select($"vec_id",
      VectorFunctions.quantizeInt8Vec($"embedding").as("embedding"))
    def top(df: org.apache.spark.sql.DataFrame) =
      Similarity.bruteForceTopK(df.filter($"vec_id" < 10), df,
          VectorFunctions.cosineSim, 5)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val floatTop = top(emb)
    val sq8Top = top(qemb)
    // int8 quantization error is ~1/254 per component — top-5 should
    // largely survive even on near-random worst-case vectors
    val recall = (floatTop & sq8Top).size.toDouble / floatTop.size
    assert(recall >= 0.7, s"SQ8 recall $recall")
    assert(sq8Top == top(qemb), "SQ8 ranking must be deterministic")
  }

  test("decontaminateBloom == decontaminate at any fpp (exactness is fpp-free)") {
    val corpus = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" % 5 =!= 0)
    val bench = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text").filter($"doc_id" % 5 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_id").as[(Long, Long)].collect().toSeq
    val exact = rows(Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 3))
    assert(exact.nonEmpty, "fixture has no overlap — test has no teeth")
    // tight AND absurdly loose fpp: the verify join must erase the
    // difference — identical (doc_id, n_shared) rows in both cases
    assert(rows(Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
      n = 3, fpp = 0.01)) == exact)
    assert(rows(Dedup.decontaminateBloom(corpus, bench, "doc_id", "text",
      n = 3, fpp = 0.5)) == exact)
  }

  test("fuzzyPrefixJoin: EXACT recall vs brute-force levenshtein (pigeonhole guarantee)") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select($"doc_id", $"text")
    val got = Dedup.fuzzyPrefixJoin(docs, "doc_id", "text", width = 24, maxDist = 5)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got.nonEmpty, "fixture yields no fuzzy pairs — test has no teeth")
    // brute force over all keyed pairs: every within-distance pair MUST be
    // found (segments give exact recall, unlike LSH), with the same distance
    val norm = trim(regexp_replace(lower($"text"), "[ \\t\\n\\f\\r]+", " "))
    val keyed = docs.select($"doc_id", substring(norm, 1, 24).as("p"))
      .filter(length($"p") === 24)
    val brute = keyed.as("a").crossJoin(keyed.as("b"))
      .filter($"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id", $"b.doc_id", levenshtein($"a.p", $"b.p").as("d"))
      .filter($"d" <= 5)
      .orderBy($"a.doc_id", $"b.doc_id").as[(Long, Long, Int)].collect().toSeq
    assert(got == brute)
  }

  test("fuzzyPrefixJoin contracts: width divisibility; short keys excluded") {
    val e = intercept[IllegalArgumentException] {
      Dedup.fuzzyPrefixJoin(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", width = 25, maxDist = 5)
    }
    assert(e.getMessage.contains("split evenly"))
    // keys shorter than width are excluded, not padded or crashed
    val tiny = Seq((1L, "short"), (2L, "short")).toDF("doc_id", "text")
    assert(Dedup.fuzzyPrefixJoin(tiny, "doc_id", "text").count() == 0)
  }

  // measured curve on the (near-random) testdata embeddings, probe 1..8 of
  // 8 supers: 0.47, 0.65, 0.76, 0.83, 0.90, 0.94, 0.98, 1.0 — clustered
  // real-world embeddings sit far above this floor because the coarse
  // quantizer actually summarizes structure there
  test("hierarchical assignment: agreement grows with probe width, " +
      "exact at full probe") {
    VectorFunctions.register(spark)
    import org.apache.spark.sql.functions.{col, element_at}
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val cents = Similarity.strideCentroids(emb, 64)
    def assignWith(cells: (org.apache.spark.sql.Column, Int) => org.apache.spark.sql.Column) =
      emb.select(col("vec_id"),
          element_at(cells(col("embedding"), 1), 1).getField("cell").as("cell"))
        .as[(Long, Int)].collect().toMap
    val flat = assignWith(Similarity.topCellsOf(cents, VectorFunctions.cosineSim))
    val agree = (1 to 8).map { p =>
      val h = assignWith(Similarity.topCellsHierarchical(cents, probeSupers = p))
      p -> flat.count { case (id, c) => h(id) == c }.toDouble / flat.size
    }.toMap
    info(s"agreement by probe width: ${agree.toSeq.sortBy(_._1)}")
    assert(agree(3) >= 0.7, s"hierarchical(3) agreement ${agree(3)}")
    // near-random vectors are the WORST case for a coarse quantizer (no
    // structure to summarize); measured deterministic floor: 0.898@5,
    // 0.942@6. Clustered production embeddings sit well above 0.9 by
    // width 5 — this pins the floor doesn't regress.
    assert(agree(5) >= 0.89, s"hierarchical(5) agreement ${agree(5)}")
    assert(agree(6) >= 0.9, s"hierarchical(6) agreement ${agree(6)}")
    assert((1 until 8).forall(p => agree(p + 1) >= agree(p) - 0.02),
      s"agreement should be ~monotone in probe width: $agree")
    // probing every super == exhaustive search ⇒ exact agreement
    assert(agree(8) == 1.0,
      "probing all supers must reproduce flat assignment exactly")
  }

  test("semanticDedup keeps the min-id representative per near-dup neighborhood") {
    VectorFunctions.register(spark)
    // 6 vectors, stride centroids = ids 0 and 3 (n=6, nlist=2 → stride 3).
    // Cell 0 ≈ x-axis {0,1,2}, cell 1 ≈ y-axis {3,4}; id 5 is orthogonal to
    // both centroids (cos 0 ties → higher cell) and near-dup to nobody.
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)), (1L, Seq(1f, 0.01f, 0f, 0f)),
      (2L, Seq(0.9f, 0f, 0.1f, 0f)), (3L, Seq(0f, 1f, 0f, 0f)),
      (4L, Seq(0f, 1f, 0.01f, 0f)), (5L, Seq(0f, 0f, 0f, 1f)))
      .toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(emb, "vec_id",
        VectorFunctions.cosineSim, nlist = 2, minCos = 0.9)
    val got = kept.as[(Long, Int)].collect().toMap
    kept.unpersist()
    assert(got == Map(0L -> 0, 3L -> 1, 5L -> 1)) // 1,2,4 dropped to a lower id
  }

  test("leakage-aware split (d40): near-dup pairs never straddle splits; " +
       "per-doc hash split would leak on the same corpus") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
      minJaccard = 0.2)
    val split = graft.queries.TextQueries.clusterSplit(
        Dedup.dupClusters(pairs, docs, "doc_id"))
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    // every doc assigned exactly once
    assert(split.size == docs.count())
    val pairSeq = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairSeq.nonEmpty, "fixture must exercise the property")
    // the contract: no near-dup pair crosses a split boundary
    pairSeq.foreach { case (a, b) =>
      assert(split(a) == split(b), s"pair ($a,$b) leaked across splits") }
    // contrast: d17's per-doc hash DOES place some near-dup pair in two
    // different splits on this corpus — the leak d40 exists to prevent
    def byte(id: Long): Int =
      Integer.parseInt(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 2), 16)
    def docSplit(id: Long): String = {
      val b = byte(id); if (b < 243) "train" else if (b < 250) "val" else "test" }
    assert(pairSeq.exists { case (a, b) => docSplit(a) != docSplit(b) },
      "corpus too small to demonstrate the per-doc leak (tighten fixture)")
  }

  test("preference pairs (d43): chosen strictly outranks rejected; " +
       "singletons yield no pair; pair members share a cluster") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val got = graft.queries.TextQueries.d43.spark(spark, sf001)
      .select("cluster_id", "chosen_id", "rejected_id", "quality_gap", "n_members")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(got.nonEmpty, "fixture must produce pairs")
    val clusters = {
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2)
      Dedup.dupClusters(pairs, docs, "doc_id")
        .as[(Long, Long)].collect().toMap // doc_id -> cluster_id
    }
    got.foreach { case (cid, chosen, rejected, gap, nm) =>
      assert(chosen != rejected, s"cluster $cid pairs a doc with itself")
      assert(nm >= 2, s"cluster $cid emitted a singleton pair")
      assert(gap >= 0.0, s"cluster $cid has negative quality gap $gap")
      assert(clusters(chosen) == cid && clusters(rejected) == cid,
        s"cluster $cid pair members belong to other clusters")
    }
  }

  test("lm fluency (d45): common transitions outscore rare ones; " +
      "deterministic transitions score 1; empty doc scores 0") {
    val dir = java.nio.file.Files.createTempDirectory("d45spec").toString
    (Seq.tabulate(6)(i => (i.toLong, "the cat sat")) ++
        Seq((6L, "the dog ran"), (7L, "")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.d45.spark(spark, dir)
      .select("doc_id", "n_bigrams", "fluency", "fluent")
      .as[(Long, Long, Double, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // p(cat|the) = 6/7, p(sat|cat) = 1 → fluency = (6/7 + 1)/2, exactly
    assert(got(0L)._3 == (6.0 / 7 + 1.0) / 2)
    // p(dog|the) = 1/7, p(ran|dog) = 1 → (1/7 + 1)/2
    assert(got(6L)._3 == (1.0 / 7 + 1.0) / 2)
    assert(got(0L)._3 > got(6L)._3, "common transitions must outscore rare")
    assert(got(7L) == ((7L, 0L, 0.0, false)), "empty doc: 0 bigrams, score 0")
    assert(got(0L)._4, "the templated doc passes the gate")
  }

  test("cross-modal consistency (m12): unrelated captions on near-dup images " +
       "are flagged, identical captions pass") {
    // groups of 4 ids share an image (the m04 construction); doc texts are
    // the captions. At sf0.001 every image near-dup pair with unrelated
    // word-soup captions must come out inconsistent unless the captions
    // genuinely share 3-grams at jaccard >= 0.2.
    val rows = graft.queries.TextQueries.m12.spark(spark, sf001)
      .select("doc_a", "doc_b", "n_common", "caption_jaccard", "consistent")
      .as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(rows.nonEmpty, "fixture must produce image near-dup pairs")
    rows.foreach { case (a, b, nc, j, cons) =>
      assert(cons == (j >= 0.2), s"flag disagrees with jaccard for ($a,$b)")
      if (nc == 0L) assert(j == 0.0 && !cons, s"($a,$b) zero overlap must fail")
    }
    // the corpus-backed fixture exercises BOTH outcomes
    assert(rows.exists(!_._5), "no inconsistent pair found — fixture too weak")
  }

  test("embeddingDrift (v22): identical snapshots -> cos ~= 1, orthogonal -> 0") {
    VectorFunctions.register(spark)
    // label 1: snapshot halves identical (vec 2i ≡ vec 2i+1) → drift cos ≈ 1
    // label 2: half A on x-dims, half B on y-dims → dot = 0 → cos = 0 exactly
    val emb = Seq(
      (0L, 1, Seq(0.3f, -0.8f, 0.1f, 0f)), (1L, 1, Seq(0.3f, -0.8f, 0.1f, 0f)),
      (2L, 1, Seq(-0.5f, 0.2f, 0.9f, 0f)), (3L, 1, Seq(-0.5f, 0.2f, 0.9f, 0f)),
      (4L, 2, Seq(1f, 0f, 0f, 0f)), (5L, 2, Seq(0f, 0f, 1f, 0.5f)),
      (6L, 2, Seq(0.7f, 0.2f, 0f, 0f)), (7L, 2, Seq(0f, 0f, 0.4f, 1f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.queries.VectorQueries.embeddingDrift(emb)
      .select("label", "centroid_cos").as[(Int, Double)].collect().toMap
    assert(math.abs(got(1) - 1.0) < 1e-12, s"identical halves: ${got(1)}")
    assert(got(2) == 0.0, s"orthogonal halves: ${got(2)}")
  }

  test("fuzzyDecontaminate (d52): planted paraphrases map to their bench " +
      "source; direct operator finds a suffixed copy, skips unrelated") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally unrelated content about something else entirely here"))
      .toDF("doc_id", "text")
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val hits = Dedup.fuzzyDecontaminate(corpus, bench, "doc_id", "text",
        n = 3, minJaccard = 0.5)
      .select("doc_id", "bench_id").as[(Long, Long)].collect().toSet
    assert(hits == Set((1L, 100L)), s"got $hits")

    val got = graft.queries.TextQueries.d52.spark(spark, sf001)
      .select("doc_id", "bench_id").as[(Long, Long)].collect()
    assert(got.nonEmpty, "planted variants must be detected")
    got.filter(_._1 >= 10000000L).foreach { case (d, b) =>
      assert(d - 10000000L == b, s"planted $d must leak its own source, got $b")
    }
  }

  test("OOD fluency (d51): unseen transitions counted and Laplace-scored " +
      "at 1/V, seen ones at (c+1)/(c·+V)") {
    // find ids on each side of the md5-byte split (testdata can't exercise
    // unseen bigrams — its vocabulary is shared corpus-wide)
    def hb(id: Long): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      ((d(0) & 0xf0) >> 4) * 16 + (d(0) & 0x0f)
    }
    val trainIds = (0L to 500L).filter(hb(_) < 250).take(3)
    val evalIds = (0L to 500L).filter(hb(_) >= 250).take(2)
    assert(trainIds.size == 3 && evalIds.size == 2)
    val dir = java.nio.file.Files.createTempDirectory("d51spec").toString
    (trainIds.map(id => (id, "src0", "the cat sat on the mat")) ++
        Seq((evalIds(0), "src0", "zebra quantum flux"),
          (evalIds(1), "src0", "the cat zebra")))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.TextQueries.d51.spark(spark, dir)
      .select("doc_id", "n_bigrams", "n_unseen", "fluency")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // V = 5 (the cat sat on mat); all-unseen doc: both bigrams at 1/V
    assert(got(evalIds(0)) == ((evalIds(0), 2L, 2L, 1.0 / 5)))
    // mixed doc: (the,cat) seen c=3, c(the·)=6 -> (3+1)/(6+5); (cat,zebra)
    // unseen with seen prefix c(cat·)=3 -> 1/(3+5)
    val expect = (4.0 / 11 + 1.0 / 8) / 2
    assert(got(evalIds(1)) == ((evalIds(1), 2L, 1L, expect)))
  }

  test("driftPartialSums fold over any batch split ≡ embeddingDrift " +
      "bit-for-bit (the s27 drain ≡ batch property)") {
    VectorFunctions.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
    val direct = graft.queries.VectorQueries.embeddingDrift(emb)
      .collect().toSeq.map(_.toSeq)
    val parts = (0 to 2).map(i => graft.queries.VectorQueries
        .driftPartialSums(emb.filter($"vec_id" % 3 === i)))
      .reduce(_ unionByName _)
    val folded = graft.queries.VectorQueries.driftFromPartials(parts)
      .collect().toSeq.map(_.toSeq)
    assert(folded == direct)
  }
}
