package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.Tables

/** LLM training-data text operators over the `documents` table, each with a
  * DuckDB oracle built from the same md5/regex primitives (both engines
  * compute them identically).
  */
object TextQueries {

  /** Shared DuckDB text-normalization/tokenization fragments mirroring
    * TextFunctions (string_split_regex ≡ split; list semantics checked). */
  private val tokCte =
    """toks AS (SELECT doc_id, text,
      |  CASE WHEN length(trim(text)) = 0 THEN []
      |       ELSE string_split_regex(trim(text), '\s+') END AS w
      |FROM documents)""".stripMargin

  /** Boilerplate cap for the dedup ladder: shingles in more than `maxDf`
    * docs carry no dedup signal but fan the inverted-index join out
    * quadratically at scale (mirrors [[Dedup.capShingles]]). */
  private[graft] val DedupMaxDf = 20

  /** toks → sh (exploded distinct 3-gram shingles) — the uncapped shingle
    * relation (mirrors [[Dedup.docShingles]]). */
  private val rawShingleCte =
    s"""toks AS (SELECT doc_id,
      |  CASE WHEN length(trim(text)) = 0 THEN []
      |       ELSE string_split_regex(trim(text), '\\s+') END AS w FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(
      |    CASE WHEN length(w) < 3 THEN []
      |         ELSE [array_to_string(list_slice(w, i+1, i+3), ' ') for i in range(0, length(w)-2)] END)) AS shingle
      |  FROM toks)""".stripMargin

  /** Shared 3-gram shingle CTE chain: toks → sh (exploded distinct
    * shingles) → shc (document-frequency-capped universe). */
  private val shingleCte =
    s"""$rawShingleCte,
       |dfc AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= $DedupMaxDf),
       |shc AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN dfc USING (shingle))""".stripMargin

  /** d07/d12 shared SimHash CTE fragment (md5-nibble votes over a feature
    * relation exposing (doc_id, `featCol`)): `votes` + `fp(doc_id, simhash)`
    * CTE bodies, to be appended after the feature CTEs. */
  private def simhashCtes(bits: Int, featRel: String, featCol: String): String = {
    val votes = (0 until bits).map { b =>
      s"sum(CASE WHEN substr(md5($featCol), ${b + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE -1 END) AS v$b"
    }.mkString(",\n    ")
    val fp = (0 until bits).map(b => s"CASE WHEN v$b > 0 THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""votes AS (SELECT doc_id,
       |    $votes
       |  FROM $featRel GROUP BY doc_id),
       |fp AS (SELECT doc_id, CAST($fp AS BIGINT) AS simhash FROM votes)""".stripMargin
  }

  /** Exact dedup via normalized-content fingerprint (hash-groupBy). */
  val d01 = QueryDef(
    "d01_dedup_exact",
    (spark, dir) => {
      Dedup.exact(Tables.documentsWide(spark, dir), "doc_id", "text")
        .orderBy(col("fp"))
    },
    Some("""SELECT md5(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g'))) AS fp,
           |       min(doc_id) AS keep_id, count(*) AS n_dups
           |FROM documents GROUP BY 1 ORDER BY fp""".stripMargin),
    "exact dedup: md5 fingerprint hash-groupBy (LLM-pipeline op)")

  /** Token counting: whitespace + BPE-ish regex token counts. */
  val d02 = QueryDef(
    "d02_token_count",
    (spark, dir) => {
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"),
          TextFunctions.bpeTokenCount(col("text")).as("n_bpe_tokens"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $tokCte
            |SELECT doc_id,
            |  CAST(length(w) AS INTEGER) AS n_tokens,
            |  CAST(length(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS INTEGER) AS n_bpe_tokens
            |FROM toks ORDER BY doc_id""".stripMargin),
    "token counting: whitespace + BPE-ish regex (LLM-pipeline op)")

  /** Quality scoring: char-class ratios, mean word length, stopword ratio,
    * composite score. Per-row float math — identical IEEE ops both sides. */
  val d03 = QueryDef(
    "d03_text_quality",
    (spark, dir) => {
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          TextFunctions.alphaRatio(col("text")).as("alpha_ratio"),
          TextFunctions.punctRatio(col("text")).as("punct_ratio"),
          TextFunctions.avgWordLen(col("text")).as("avg_word_len"),
          TextFunctions.stopwordRatio(col("text")).as("stopword_ratio"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $tokCte
            |SELECT doc_id,
            |  CASE WHEN length(text) = 0 THEN 0.0
            |       ELSE CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END AS alpha_ratio,
            |  CASE WHEN length(text) = 0 THEN 0.0
            |       ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
            |  CASE WHEN length(w) = 0 THEN 0.0
            |       ELSE CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / length(w) END AS avg_word_len,
            |  CASE WHEN length(w) = 0 THEN 0.0
            |       ELSE CAST(length(list_filter(w, x -> list_contains(['the','a','an','and','or','of','to','in','is','are','was','for','on','with','as','by','at','it','this','that'], x))) AS DOUBLE) / length(w) END AS stopword_ratio
            |FROM toks ORDER BY doc_id""".stripMargin),
    "quality scoring: ratios + word stats (LLM-pipeline op)")

  /** Language ID: argmax of per-language marker hits, alphabetical tiebreak. */
  val d04 = QueryDef(
    "d04_lang_id",
    (spark, dir) => {
      Tables.documentsWide(spark, dir).select(
          col("doc_id"), col("lang").as("declared_lang"),
          TextFunctions.langId(col("text")).as("detected_lang"))
        .orderBy(col("doc_id"))
    },
    Some {
      val markerSql = TextFunctions.langMarkers.map { case (l, ms) =>
        val arr = ms.map(m => s"'$m'").mkString("[", ",", "]")
        s"length(list_intersect(dw, $arr)) AS s_$l"
      }.mkString(",\n  ")
      val langs = TextFunctions.langMarkers.map(_._1)
      val caseSql = langs.map { l =>
        val conds = langs.filter(_ != l).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString("\n    ")
      s"""WITH t AS (SELECT doc_id, lang,
         |  list_distinct(CASE WHEN length(trim(lower(text))) = 0 THEN []
         |       ELSE string_split_regex(trim(lower(text)), '\\s+') END) AS dw
         |FROM documents),
         |scored AS (SELECT doc_id, lang,
         |  $markerSql
         |FROM t)
         |SELECT doc_id, lang AS declared_lang,
         |  CASE $caseSql ELSE 'und' END AS detected_lang
         |FROM scored ORDER BY doc_id""".stripMargin
    },
    "language ID: n-gram marker heuristic argmax (LLM-pipeline op)")

  /** n-gram Jaccard near-dup: inverted-index join on shared shingles,
    * boilerplate-capped (df ≤ [[DedupMaxDf]], mirrored in `shc`). */
  val d05 = QueryDef(
    "d05_ngram_jaccard",
    (spark, dir) => {
      Dedup.ngramJaccard(Tables.documentsWide(spark, dir), "doc_id", "text",
          n = 3, minJaccard = 0.2, maxDf = DedupMaxDf)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(s"""WITH $shingleCte,
            |sizes AS (SELECT doc_id, count(*) AS set_size FROM shc GROUP BY doc_id),
            |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
            |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            |  GROUP BY 1, 2)
            |SELECT doc_a, doc_b,
            |  CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) AS jaccard
            |FROM inter
            |JOIN sizes sa ON sa.doc_id = doc_a
            |JOIN sizes sb ON sb.doc_id = doc_b
            |WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.2
            |ORDER BY doc_a, doc_b""".stripMargin),
    "n-gram Jaccard near-dup via inverted-index join (LLM-pipeline op)")

  /** MinHash + LSH banding near-dup with exact verification, over the
    * boilerplate-capped shingle universe. */
  val d06 = QueryDef(
    "d06_minhash_lsh",
    (spark, dir) => {
      Dedup.minhashLsh(Tables.documentsWide(spark, dir), "doc_id", "text",
          n = 3, k = 8, r = 2, minJaccard = 0.2, maxDf = DedupMaxDf)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val k = 8; val r = 2
      val mhCols = (0 until k).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(",\n    ")
      val bandRows = (0 until k / r).map { b =>
        val parts = (0 until r).map(j => s"mh${b * r + j}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_idx, md5($parts) AS band_hash FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH $shingleCte,
         |sig AS (SELECT doc_id,
         |    $mhCols
         |  FROM shc GROUP BY doc_id),
         |bands AS ($bandRows),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shc GROUP BY doc_id),
         |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS n_inter
         |  FROM cand c
         |  JOIN shc a ON a.doc_id = c.doc_a
         |  JOIN shc b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |  CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) AS jaccard
         |FROM inter
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.2
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "MinHash signatures + LSH banding + exact verify (LLM-pipeline op)")

  /** SimHash fingerprints (16-bit, md5-nibble votes). */
  val d07 = QueryDef(
    "d07_simhash",
    (spark, dir) => {
      Dedup.simhash(Tables.documentsWide(spark, dir), "doc_id", "text", bits = 16)
        .orderBy(col("doc_id"))
    },
    Some {
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN length(trim(lower(text))) = 0 THEN []
         |         ELSE string_split_regex(trim(lower(text)), '\\s+') END)) AS tok
         |  FROM documents),
         |${simhashCtes(16, "t", "tok")}
         |SELECT doc_id, simhash FROM fp ORDER BY doc_id""".stripMargin
    },
    "SimHash document fingerprinting (LLM-pipeline op)")

  /** Multimodal feature extraction (stubbed codec, real plumbing — see
    * [[graft.operators.Multimodal]]). Output is flattened to hashable scalars
    * (`frame_offsets` joined to a CSV string — the driver's checker cannot
    * hash array columns); MultimodalSpec still pins the raw array values.
    *
    * The oracle mirrors the stub codec's byte math in SQL. It treats
    * characters as bytes, which is exact because the testdata documents are
    * pure ASCII (verified: octet_length(encode(text)) == length(text) for
    * every row); `n_bytes` itself uses octet_length so the size columns stay
    * correct regardless. Entropy is rounded to 6 decimals on both sides
    * (log/div chains are not bit-portable across libm implementations). */
  val m01 = QueryDef(
    "m01_multimodal_features",
    (spark, dir) => {
      val media = graft.operators.Multimodal.mediaFromDocuments(
        spark, Tables.documents(spark, dir))
      graft.operators.Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("byte_entropy"), 6).as("byte_entropy"),
          col("thumb_bytes"), col("n_frames"),
          array_join(col("frame_offsets"), ",").as("frame_offsets"))
        .orderBy(col("media_id"))
    },
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           |    octet_length(encode(text)) AS n_bytes,
           |    (n_chars % 640 + 1) * (n_chars % 480 + 1) AS px,
           |    text FROM documents),
           |ch AS (SELECT media_id, n_bytes,
           |    unnest([text[i] for i in range(1, length(text) + 1)]) AS c FROM m),
           |cnt AS (SELECT media_id, n_bytes, c, count(*) AS k FROM ch GROUP BY 1, 2, 3),
           |ent AS (SELECT media_id,
           |    -sum((k / CAST(n_bytes AS DOUBLE)) * ln(k / CAST(n_bytes AS DOUBLE)) / ln(2)) AS e
           |  FROM cnt GROUP BY media_id)
           |SELECT m.media_id, m.kind, CAST(m.n_bytes AS BIGINT) AS n_bytes,
           |  round(coalesce(ent.e, 0.0) + 0.0, 6) AS byte_entropy,
           |  CAST(greatest(1, m.n_bytes * 4096 // m.px) AS BIGINT) AS thumb_bytes,
           |  CAST(4 AS INTEGER) AS n_frames,
           |  CASE WHEN m.n_bytes = 0 THEN ''
           |       ELSE array_to_string([CAST(i * m.n_bytes // 4 AS VARCHAR) for i in range(0, 4)], ',') END AS frame_offsets
           |FROM m LEFT JOIN ent USING (media_id) ORDER BY media_id""".stripMargin),
    "multimodal decode/resize/frame-sample plumbing over binary media (LLM-pipeline op)")

  /** Duplicate-cluster assignment: connected components over the MinHash-LSH
    * near-dup pairs; oracle is the same pair SQL + a recursive-CTE min-label
    * closure — both sides give cluster_id = min reachable doc_id. */
  val d08 = QueryDef(
    "d08_dup_clusters",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = DedupMaxDf)
      Dedup.dupClusters(pairs, docs, "doc_id")
        .orderBy(col("doc_id"))
    },
    Some {
      val pairSql = d06.oracle.get
        .replace("ORDER BY doc_a, doc_b", "")
      s"""WITH pairs AS ($pairSql),
         |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
         |          UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT doc_id FROM documents),
         |reach AS (
         |  WITH RECURSIVE r(doc_id, lab) AS (
         |    SELECT doc_id, doc_id FROM nodes
         |    UNION
         |    SELECT e.dst, r.lab FROM r JOIN edges e ON e.src = r.doc_id)
         |  SELECT doc_id, lab FROM r)
         |SELECT doc_id, min(lab) AS cluster_id FROM reach
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "near-dup clustering: connected components via min-label propagation (LLM-pipeline op)")

  /** PII scrubbing + audit counts. documents.text is synthetic word soup
    * (no real PII), so the scrub is usually the identity here — the oracle
    * still verifies the full regex semantics on every row, and the spec
    * covers positive cases. */
  val d09 = QueryDef(
    "d09_pii_scrub",
    (spark, dir) => {
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          md5(TextFunctions.scrubPii(col("text"))).as("scrubbed_md5"),
          col("n_chars"),
          TextFunctions.piiCounts(col("text")).getField("n_email").as("n_email"),
          TextFunctions.piiCounts(col("text")).getField("n_number").as("n_number"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  md5(regexp_replace(regexp_replace(regexp_replace(text,
           |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
           |    '[0-9][0-9 ().-]{6,}[0-9]', '<NUMBER>', 'g')) AS scrubbed_md5,
           |  n_chars,
           |  CAST(length(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
           |  CAST(length(regexp_extract_all(text, '[0-9][0-9 ().-]{6,}[0-9]')) AS INTEGER) AS n_number
           |FROM documents ORDER BY doc_id""".stripMargin),
    "PII scrubbing (emails/IPs/number runs) + audit counts (LLM-pipeline op)")

  /** Consistent per-source sampling via the MinKSample typed Aggregator:
    * k docs with the smallest md5(text) per source — deterministic,
    * partition-independent, engine-portable (oracle: windowed top-k by the
    * same hash). */
  val d10 = QueryDef(
    "d10_consistent_sample",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documentsWide(spark, dir)
        .select(col("source"), col("doc_id"), md5(col("text")).as("h"))
        .as[(String, Long, String)]
      val agg = new graft.functions.MinKSample(5).toColumn
      docs.groupByKey(_._1)
        .mapValues(r => (r._2, r._3))
        .agg(agg.name("sample"))
        .toDF("source", "sample")
        .select(col("source"), explode(col("sample")).as("doc_id"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some("""SELECT source, doc_id FROM (
           |  SELECT source, doc_id,
           |    row_number() OVER (PARTITION BY source ORDER BY md5(text), doc_id) AS rn
           |  FROM documents) WHERE rn <= 5
           |ORDER BY source, doc_id""".stripMargin),
    "consistent min-k sampling via typed Aggregator (LLM-pipeline op)")

  /** `scored(doc_id, quality)` CTE chain mirroring
    * [[TextFunctions.qualityScore]] — shared by d11 (the score itself) and
    * d32 (score-weighted sampling). Same formula, same association order. */
  private val qualityScoredCte = {
    val sw = TextFunctions.stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""q AS (SELECT doc_id,
       |  CASE WHEN length(text) = 0 THEN 0.0
       |       ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
       |  CASE WHEN length(w) = 0 THEN 0.0
       |       ELSE CAST(length(list_filter(w, x -> list_contains($sw, x))) AS DOUBLE) / length(w) END AS sw,
       |  CASE WHEN length(w) = 0 THEN 0.0
       |       ELSE CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / length(w) END AS awl,
       |  CASE WHEN length(w) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END AS len_ok
       |FROM toks),
       |scored AS (SELECT doc_id,
       |  (least(sw * 4.0, 1.0) + (1.0 - least(pr * 5.0, 1.0)) + len_ok
       |   + CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) / 4.0 AS quality
       |FROM q)""".stripMargin
  }

  /** Composite quality score — the classic cheap pretraining-quality
    * heuristic. Pure per-row float math over components already verified by
    * d03 (bit-identical IEEE on both engines) composed with identical
    * association order → unrounded exact match. */
  val d11 = QueryDef(
    "d11_quality_score",
    (spark, dir) => {
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $tokCte,
            |$qualityScoredCte
            |SELECT doc_id, quality FROM scored ORDER BY doc_id""".stripMargin),
    "composite quality score: stopword/punct/length heuristic (LLM-pipeline op)")

  /** SimHash near-dup pairs via pigeonhole block join — the Hamming-distance
    * companion to d07. Fingerprints here are 32-bit over SHINGLE features
    * (vs d07's 16-bit over tokens): on a shared-vocabulary corpus every doc
    * has nearly the same token set, so token fingerprints collapse to a
    * handful of values and the chunk join goes quadratic (measured: 15.3M
    * candidate pairs at sf0.1); shingles stay doc-specific (496 distinct
    * fingerprints over 500 docs, candidate count linear in corpus size),
    * and 8-bit chunks give 256-way buckets. */
  val d12 = QueryDef(
    "d12_simhash_neardup",
    (spark, dir) => {
      // documentsWide: the shingle+fingerprint map stage is the row's cost;
      // a bare single-file scan runs it serially (r15 lesson)
      val docs = Tables.documentsWide(spark, dir)
      Dedup.simhashNearDup(
          Dedup.simhashFeatures(
            Dedup.docShingles(docs, "doc_id", "text", n = 3), "shingle", bits = 32),
          bits = 32, blocks = 4, maxHamming = 3)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some {
      val shingleSrc =
        """toks AS (SELECT doc_id,
          |  CASE WHEN length(trim(text)) = 0 THEN []
          |       ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
          |shg AS (SELECT doc_id, unnest(list_distinct(
          |    CASE WHEN length(w) < 3 THEN []
          |         ELSE [array_to_string(list_slice(w, i+1, i+3), ' ') for i in range(0, length(w)-2)] END)) AS shingle
          |  FROM toks)""".stripMargin
      s"""WITH $shingleSrc,
         |${simhashCtes(32, "shg", "shingle")},
         |chunks AS (SELECT doc_id, simhash, c AS chunk_idx, (simhash >> (c * 8)) & 255 AS chunk
         |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
         |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM chunks a JOIN chunks b
         |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
         |FROM p WHERE bit_count(xor(sh_a, sh_b)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin
    },
    "SimHash near-dup: pigeonhole block-partitioned Hamming join (LLM-pipeline op)")

  /** Winnowing (MOSS) document fingerprints: min md5 k-gram hash per sliding
    * window — every shared substring of length ≥ k+w-1 shares a fingerprint.
    * The rolling-hash fingerprinting entry of the text ladder; native
    * codegen'd expression ([[graft.functions.WinnowingExpr]]). */
  val d13 = QueryDef(
    "d13_winnow_fingerprints",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          explode(TextFunctions.winnowFingerprints(col("text"), k = 8, w = 4)).as("fp"))
        .orderBy(col("doc_id"), col("fp"))
    },
    Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
           |  FROM documents),
           |g AS (SELECT doc_id,
           |    CASE WHEN length(t) < 8 THEN []
           |         ELSE [md5(substr(t, i+1, 8)) for i in range(0, length(t) - 7)] END AS hs
           |  FROM n),
           |f AS (SELECT doc_id,
           |    CASE WHEN length(hs) = 0 THEN []
           |         WHEN length(hs) <= 4 THEN [list_min(hs)]
           |         ELSE list_distinct([list_min(hs[j+1:j+4]) for j in range(0, length(hs) - 3)]) END AS fps
           |  FROM g)
           |SELECT doc_id, unnest(fps) AS fp FROM f
           |ORDER BY doc_id, fp""".stripMargin),
    "winnowing rolling-hash fingerprints, MOSS-style (LLM-pipeline op)")

  /** Repetition ratios (Gopher-style): fraction of token / 2-gram
    * occurrences that repeat an earlier one — integer counts and one
    * division per row, unrounded IEEE parity. */
  val d14 = QueryDef(
    "d14_repetition",
    (spark, dir) => {
      // documentsWide: map-only row — its whole cost is the per-row
      // expressions a single-file scan would serialize (r15: 28 s → ~2 s sf1)
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          TextFunctions.repetitionRatio(col("text"), 1).as("dup_word_ratio"),
          TextFunctions.repetitionRatio(col("text"), 2).as("dup_bigram_ratio"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $tokCte,
            |g AS (SELECT doc_id, w,
            |  CASE WHEN length(w) < 2 THEN []
            |       ELSE [w[i+1] || ' ' || w[i+2] for i in range(0, length(w) - 1)] END AS g2
            |FROM toks)
            |SELECT doc_id,
            |  CASE WHEN length(w) = 0 THEN 0.0
            |       ELSE CAST(length(w) - length(list_distinct(w)) AS DOUBLE) / length(w) END AS dup_word_ratio,
            |  CASE WHEN length(g2) = 0 THEN 0.0
            |       ELSE CAST(length(g2) - length(list_distinct(g2)) AS DOUBLE) / length(g2) END AS dup_bigram_ratio
            |FROM g ORDER BY doc_id""".stripMargin),
    "repetition ratios: duplicate word / bigram fractions (LLM-pipeline op)")

  /** Sliding-window document chunking — the standard long-document →
    * training-sample transform: windows of `W` tokens advancing by stride
    * `S = W - overlap`; the final window is clipped to the tail. Per-row
    * explode of a computed chunk array — no shuffle at all until a
    * downstream groupBy. */
  val d15 = QueryDef(
    "d15_chunking",
    (spark, dir) => {
      val W = 64; val S = 48 // 16-token overlap
      val docs = Tables.documentsWide(spark, dir)
        .select(col("doc_id"), TextFunctions.tokens(col("text")).as("w"))
        .withColumn("len", size(col("w")))
        .withColumn("n_chunks",
          when(col("len") === 0, 0).when(col("len") <= W, 1)
            .otherwise(expr(s"1 + ((len - $W + $S - 1) div $S)").cast("int")))
      docs.select(col("doc_id"),
          explode(when(col("n_chunks") === 0,
              array().cast("array<struct<chunk_idx:int,chunk:string>>"))
            .otherwise(transform(sequence(lit(0), col("n_chunks") - 1), i =>
              struct(i.cast("int").as("chunk_idx"),
                array_join(slice(col("w"), i * S + 1, lit(W)), " ").as("chunk")))))
            .as("c"))
        .select(col("doc_id"), col("c.chunk_idx"), col("c.chunk"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    },
    Some(s"""WITH $tokCte,
            |g AS (SELECT doc_id, w,
            |  CASE WHEN length(w) = 0 THEN 0
            |       WHEN length(w) <= 64 THEN 1
            |       ELSE 1 + ((length(w) - 64 + 47) // 48) END AS n_chunks
            |FROM toks)
            |SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
            |  array_to_string(w[i*48 + 1 : least(i*48 + 64, length(w))], ' ') AS chunk
            |FROM g, unnest(range(n_chunks)) AS t(i)
            |ORDER BY doc_id, chunk_idx""".stripMargin),
    "sliding-window document chunking with overlap (LLM-pipeline op)")

  /** Contiguous sequence packing: per source, docs fill 4096-token bins in
    * doc_id order (bin = prefix-token-count div capacity) — the packing
    * pass that turns a corpus into fixed-budget training sequences. One
    * windowed prefix sum per source partition. */
  val d16 = QueryDef(
    "d16_packing",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documentsWide(spark, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          expr("(cum - n_tokens) div 4096").cast("int").as("bin"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some(s"""WITH $tokCte,
            |t AS (SELECT doc_id, CAST(length(w) AS INTEGER) AS n_tokens FROM toks)
            |SELECT d.source, d.doc_id, t.n_tokens,
            |  CAST((sum(t.n_tokens) OVER (PARTITION BY d.source ORDER BY d.doc_id
            |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - t.n_tokens) // 4096
            |    AS INTEGER) AS bin
            |FROM documents d JOIN t USING (doc_id)
            |ORDER BY d.source, d.doc_id""".stripMargin),
    "contiguous sequence packing into fixed token budgets (LLM-pipeline op)")

  /** Deterministic train/val/test split on a content-independent hash of
    * the id — stable under corpus growth (a doc never changes split), the
    * property random sampling lacks. First hash byte: <243 train (~95%),
    * <250 val (~2.7%), else test. */
  val d17 = QueryDef(
    "d17_split",
    (spark, dir) => {
      val b = expr("cast(conv(substring(md5(cast(doc_id as string)), 1, 2), 16, 10) as int)")
      Tables.documentsWide(spark, dir).select(
          col("doc_id"),
          when(b < 243, "train").when(b < 250, "val").otherwise("test").as("split"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
           |  CASE WHEN b < 243 THEN 'train' WHEN b < 250 THEN 'val' ELSE 'test' END AS split
           |FROM (SELECT doc_id,
           |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS b
           |  FROM documents)
           |ORDER BY doc_id""".stripMargin),
    "deterministic hash-based train/val/test split (LLM-pipeline op)")

  /** Multimodal plumbing over a TRUE binary column: m01 derives media from
    * text cast to binary (always valid UTF-8); this row exercises the
    * binary-ingest path end-to-end — a payload spanning the full 0-255 byte
    * range (1-4 chained md5 digests, hex-decoded) is written to parquet
    * BINARY, read back, and fed through the same mapPartitions codec
    * plumbing. The oracle rebuilds the identical bytes from the hex string
    * (strpos nibble trick, d17 pattern) — no blob indexing needed. */
  val m02 = QueryDef(
    "m02_multimodal_binary",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val k = col("doc_id") % 4 + 1
      val hexExpr = concat(
        md5(col("doc_id").cast("string")),
        when(k >= 2, md5((col("doc_id") + 1000000L).cast("string"))).otherwise(lit("")),
        when(k >= 3, md5((col("doc_id") + 2000000L).cast("string"))).otherwise(lit("")),
        when(k >= 4, md5((col("doc_id") + 3000000L).cast("string"))).otherwise(lit("")))
      val fixture = docs.select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
        unhex(hexExpr).as("media"),
        (col("doc_id") % 640 + 1).cast("int").as("width"),
        (col("doc_id") % 480 + 1).cast("int").as("height"),
        lit(16000).cast("int").as("sample_rate"))
      // the binary-ingest path: persist as a parquet BINARY column, read back
      val media = FixtureDirs.cachedRoundTrip(fixture, "m02-media-", dir)
        .as[graft.operators.Multimodal.MediaRow]
      graft.operators.Multimodal.extractFeatures(media).toDF()
        .select(col("media_id"), col("kind"), col("n_bytes"),
          round(col("byte_entropy"), 6).as("byte_entropy"),
          col("thumb_bytes"), col("n_frames"),
          array_join(col("frame_offsets"), ",").as("frame_offsets"))
        .orderBy(col("media_id"))
    },
    Some("""WITH m AS (SELECT doc_id AS media_id,
           |    CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
           |    md5(CAST(doc_id AS VARCHAR))
           |      || CASE WHEN doc_id % 4 + 1 >= 2 THEN md5(CAST(doc_id + 1000000 AS VARCHAR)) ELSE '' END
           |      || CASE WHEN doc_id % 4 + 1 >= 3 THEN md5(CAST(doc_id + 2000000 AS VARCHAR)) ELSE '' END
           |      || CASE WHEN doc_id % 4 + 1 >= 4 THEN md5(CAST(doc_id + 3000000 AS VARCHAR)) ELSE '' END AS hex,
           |    (doc_id % 640 + 1) * (doc_id % 480 + 1) AS px
           |  FROM documents),
           |b AS (SELECT media_id, length(hex) // 2 AS n_bytes, hex FROM m),
           |bytes AS (SELECT media_id, n_bytes,
           |    (strpos('0123456789abcdef', substr(hex, 2*i+1, 1)) - 1) * 16
           |    + strpos('0123456789abcdef', substr(hex, 2*i+2, 1)) - 1 AS v
           |  FROM b, unnest(range(n_bytes)) AS t(i)),
           |cnt AS (SELECT media_id, n_bytes, v, count(*) AS c FROM bytes GROUP BY 1, 2, 3),
           |ent AS (SELECT media_id,
           |    -sum((c / CAST(n_bytes AS DOUBLE)) * ln(c / CAST(n_bytes AS DOUBLE)) / ln(2)) AS e
           |  FROM cnt GROUP BY media_id)
           |SELECT m.media_id, m.kind, CAST(b.n_bytes AS BIGINT) AS n_bytes,
           |  round(coalesce(ent.e, 0.0) + 0.0, 6) AS byte_entropy,
           |  CAST(greatest(1, b.n_bytes * 4096 // m.px) AS BIGINT) AS thumb_bytes,
           |  CAST(4 AS INTEGER) AS n_frames,
           |  array_to_string([CAST(i * b.n_bytes // 4 AS VARCHAR) for i in range(0, 4)], ',') AS frame_offsets
           |FROM m JOIN b USING (media_id) LEFT JOIN ent USING (media_id)
           |ORDER BY media_id""".stripMargin),
    "multimodal plumbing over a true binary parquet column (LLM-pipeline op)")

  /** REAL image decode (no stub): every document gets a true 24-bit BMP —
    * deterministic per-pixel RGB functions of (doc_id, x, y), encoded with
    * [[graft.operators.BmpCodec.encode]] into valid files — persisted
    * through a parquet BINARY column and decoded back executor-side by
    * [[graft.operators.BmpCodec.decode]]. The oracle computes the channel
    * sums ANALYTICALLY from the pixel functions (exact integer arithmetic),
    * so the hash match proves the full encode→parquet→decode round trip:
    * little-endian header fields, bottom-up row order, BGR byte order and
    * 4-byte stride padding all have to be exactly right (widths 2..14 hit
    * every padding residue; `wsum_r` is geometry-sensitive on purpose). */
  val m03 = QueryDef(
    "m03_image_decode",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
          (id, graft.operators.BmpCodec.encode(w, h, (x, y) => (
            ((id + 7L * x + 13L * y) % 256).toInt,
            ((3L * x + 5L * y + 1L) % 256).toInt,
            ((x.toLong * y + id % 17) % 256).toInt)))
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal
        .imageFeatures(FixtureDirs.cachedRoundTrip(media, "m03-media-", dir),
          "media_id", "media")
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH d AS (SELECT doc_id AS media_id, doc_id % 13 + 2 AS w, doc_id % 7 + 2 AS h
           |  FROM documents)
           |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  CAST(list_sum(flatten([[ (media_id + 7*x + 13*y) % 256
           |    for x in range(0, w)] for y in range(0, h)])) AS BIGINT) AS sum_r,
           |  CAST(list_sum(flatten([[ (3*x + 5*y + 1) % 256
           |    for x in range(0, w)] for y in range(0, h)])) AS BIGINT) AS sum_g,
           |  CAST(list_sum(flatten([[ (x*y + media_id % 17) % 256
           |    for x in range(0, w)] for y in range(0, h)])) AS BIGINT) AS sum_b,
           |  CAST(list_sum(flatten([[ (x + w*y + 1) * ((media_id + 7*x + 13*y) % 256)
           |    for x in range(0, w)] for y in range(0, h)])) AS BIGINT) AS wsum_r,
           |  CAST(media_id % 256 AS INTEGER) AS r_first,
           |  CAST((media_id + 7*(w-1) + 13*(h-1)) % 256 AS INTEGER) AS r_last
           |FROM d ORDER BY media_id""".stripMargin),
    "real 24-bit BMP decode: encode->parquet BINARY->decode, analytic oracle (LLM-pipeline op)")

  /** Image NEAR-DUP — the dedup ladder applied to decoded pixels. Fixture:
    * docs in groups of 4 (`gid = doc_id / 4`) share one group-specific
    * texture (nonlinear integer pixel functions of (gid, x, y), mod 199 so
    * brightness headroom exists); within a group each doc gets a uniform
    * brightness shift (`doc_id % 7`, which dHash is invariant to) and every
    * doc_id % 5 == 0 additionally a +40 spot on pixel (0,0) (flips ≤ 1
    * fingerprint bit). So same-group renditions land within Hamming ≤ 1 and
    * pair at maxHamming = 3, while cross-group textures stay far apart.
    * The encode→parquet→decode chain is m03's; the oracle computes the
    * 56-bit dHash ANALYTICALLY from the pixel functions (sampling the same
    * 8×8 integer-division grid) and mirrors the pigeonhole chunk join, so a
    * hash match proves decode + hash + join end-to-end. Widths 6..14 hit
    * every BMP stride-padding residue. */
  val m04 = QueryDef(
    "m04_image_neardup",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, graft.operators.BmpCodec.encode(w, h, (x, y) => {
            val sp = if (x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y)) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      // Fixture encode + parquet write happen once per (query, sf dir) —
      // session-cached, so bench medians measure decode + dHash + pigeonhole
      // join only (see FixtureDirs.cachedRoundTrip and COVERAGE.md's
      // fixture-cost split).
      Dedup.imageNearDup(FixtureDirs.cachedRoundTrip(media, "m04-media-", dir),
          "media_id", "media")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 7 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 6 AS w, (doc_id // 4) % 5 + 8 AS h
           |  FROM documents),
           |g AS (SELECT doc_id,
           |    [[ ( ((gid + 3) * ((gx*w//8) + 1) * ((gy*h//8) + 2) + 5 * (gx*w//8) * (gx*w//8)) % 199
           |       + ((gid + 7) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 3 * (gy*h//8) * (gy*h//8)) % 199
           |       + ((2*gid + 1) * ((gx*w//8) * (gy*h//8) + (gx*w//8) + (gy*h//8))) % 199
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM d),
           |fp AS (SELECT doc_id, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS fp
           |  FROM g),
           |chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.fp AS fp_a, b.fp AS fp_b
           |  FROM chunks a JOIN chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
           |FROM p WHERE bit_count(xor(fp_a, fp_b)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin),
    "image near-dup: perceptual dHash over decoded BMP pixels + pigeonhole Hamming join (LLM-pipeline op)")

  /** CROSS-FORMAT image near-dup: the m04 construction with the corpus split
    * between real formats — even doc_ids encode their texture as PNG (JDK
    * `javax.imageio` writer via [[graft.operators.PngCodec]]), odd as 24-bit
    * BMP — and decode routed through the magic-sniffing
    * [[graft.operators.ImageCodec]]. PNG truecolor is lossless, so
    * decode(encode(f)) ≡ f for both formats and the analytic dHash oracle
    * applies unchanged; a hash match proves the PNG decode path AND that a
    * PNG rendition pairs with a BMP rendition of the same texture (groups of
    * 4 contain both formats). Widths 5..13 cover every BMP stride residue
    * and sub-8-px sampling duplication. */
  val m05 = QueryDef(
    "m05_image_neardup_png",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 5).toInt; val h = (gid % 5 + 7).toInt
          val bright = (id % 6).toInt
          val spot = if (id % 5 == 0) 40 else 0
          val pix = (x: Int, y: Int) => {
            val sp = if (x == 0 && y == 0) spot else 0
            ((((gid + 5) * (x + 2) * (y + 1) + 7L * x * x) % 197 + bright + sp).toInt,
             (((gid + 11) * (x + 1) * (y + 3) + 2L * y * y) % 197 + bright + sp).toInt,
             (((3 * gid + 2) * (x.toLong * y + 2 * x + y)) % 197 + bright + sp).toInt)
          }
          val bytes =
            if (id % 2 == 0) graft.operators.PngCodec.encode(w, h, pix)
            else graft.operators.BmpCodec.encode(w, h, pix)
          (id, bytes)
        }
      }.toDF("media_id", "media")
      Dedup.imageNearDup(FixtureDirs.cachedRoundTrip(media, "m05-media-", dir),
          "media_id", "media")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 6 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 5 AS w, (doc_id // 4) % 5 + 7 AS h
           |  FROM documents),
           |g AS (SELECT doc_id,
           |    [[ ( ((gid + 5) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 7 * (gx*w//8) * (gx*w//8)) % 197
           |       + ((gid + 11) * ((gx*w//8) + 1) * ((gy*h//8) + 3) + 2 * (gy*h//8) * (gy*h//8)) % 197
           |       + ((3*gid + 2) * ((gx*w//8) * (gy*h//8) + 2*(gx*w//8) + (gy*h//8))) % 197
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM d),
           |fp AS (SELECT doc_id, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS fp
           |  FROM g),
           |chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.fp AS fp_a, b.fp AS fp_b
           |  FROM chunks a JOIN chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
           |FROM p WHERE bit_count(xor(fp_a, fp_b)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin),
    "cross-format image near-dup: PNG (javax.imageio) + BMP renditions, format-sniffed decode, dHash + pigeonhole join (LLM-pipeline op)")

  /** Audio NEAR-DUP — the dedup ladder applied to decoded PCM samples, the
    * m04 construction for the audio modality. Fixture: docs in groups of 4
    * (`gid = doc_id / 4`) share one group-specific clip (bounded
    * pseudo-random integer samples of (gid, i) in ±7000, length 57·spf so
    * the `f·n/57` frame boundaries are exact multiples); within a group
    * each doc gets an integer gain 1..4 (which the energy-gradient hash is
    * exactly invariant to — frame sums scale, comparisons don't move) and
    * every doc_id % 5 == 0 additionally a +1000 spike on sample 0 (flips
    * ≤ 2 fingerprint bits). So same-group renditions land within Hamming
    * ≤ 2 and pair at maxHamming = 3 (pigeonhole: ≥ 1 of 4 14-bit chunks
    * identical), while cross-group clips stay far apart. The encode →
    * parquet BINARY → decode chain is [[graft.operators.WavCodec]]'s; the
    * oracle computes the 56-bit fingerprint ANALYTICALLY from the
    * sample-generating functions (exact integer frame sums) and mirrors
    * the chunk join, so a hash match proves RIFF parse + 16-bit LE sample
    * decode + framing + hash + join end-to-end. Gains up to 4 exercise
    * negative 16-bit samples at ±32000, two bytes from the rails. */
  val m06 = QueryDef(
    "m06_audio_neardup",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
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
          (id, graft.operators.WavCodec.encode(16000, 1, samples))
        }
      }.toDF("media_id", "media")
      Dedup.audioNearDup(FixtureDirs.cachedRoundTrip(media, "m06-media-", dir),
          "media_id", "media")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 4 + 1 AS g,
           |    CASE WHEN doc_id % 5 = 0 THEN 1000 ELSE 0 END AS spike,
           |    (doc_id // 4) % 5 + 3 AS spf
           |  FROM documents),
           |e AS (SELECT doc_id,
           |    [ list_sum([ abs(g * ((((gid + 5) * ((f*spf+j)*(f*spf+j) + 3*(f*spf+j) + 7)
           |        + (2*gid + 1) * (f*spf+j)) % 14001) - 7000
           |        + CASE WHEN f*spf + j = 0 THEN spike ELSE 0 END))
           |      for j in range(0, spf)])
           |      for f in range(0, 57)] AS en
           |  FROM d),
           |fp AS (SELECT doc_id, CAST(list_sum(
           |    [CASE WHEN en[f+2] > en[f+1] THEN 1::BIGINT << f ELSE 0::BIGINT END
           |     for f in range(0, 56)]) AS BIGINT) AS fp
           |  FROM e),
           |chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.fp AS fp_a, b.fp AS fp_b
           |  FROM chunks a JOIN chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
           |FROM p WHERE bit_count(xor(fp_a, fp_b)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin),
    "audio near-dup: energy-difference fingerprint over decoded PCM WAV + pigeonhole Hamming join (LLM-pipeline op)")

  /** Video NEAR-DUP — the dedup ladder applied to decoded AVI frames, the
    * m04 construction for the video modality (the last one: image/audio/
    * video all run real codecs now). Fixture: docs in groups of 4
    * (`gid = doc_id / 4`) share one group-specific clip — nonlinear integer
    * pixel functions of (gid, f, x, y), mod 199, with genuine frame motion
    * (f-dependent terms) — at 8·(gid%3+1) frames so the `k·nF/8` keyframe
    * indices land on exact frame multiples `k·m`. Within a group each doc
    * gets a uniform brightness shift (`doc_id % 7`, which every per-frame
    * dHash is invariant to, so the whole video fingerprint is too) and
    * every doc_id % 5 == 0 additionally a +40 spot on pixel (0,0) of frame
    * 0 — keyframe 0, rotation 0 in the XOR fold, so it flips ≤ 1
    * fingerprint bit. Same-group renditions land within Hamming ≤ 1 and
    * pair at maxHamming = 3; cross-group clips stay far apart. The
    * encode → parquet BINARY → decode chain is
    * [[graft.operators.AviCodec]]'s (RIFF walk, DIB bottom-up BGR rows);
    * the oracle computes each keyframe's 56-bit dHash ANALYTICALLY from
    * the frame functions, folds them with the same 56-bit rotate-XOR
    * (exact integer halves, BIGINT-safe), and mirrors the chunk join — a
    * hash match proves container parse + frame decode + keyframe sampling
    * + hash + fold + join end-to-end. Widths 6..14 hit every DIB stride
    * residue; frame counts 8/16/24 exercise the keyframe stride. */
  val m07 = QueryDef(
    "m07_video_neardup",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val nF = 8 * (gid % 3 + 1).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, graft.operators.AviCodec.encode(w, h, nF, 10, (f, x, y) => {
            val sp = if (f == 0 && x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x + 11L * f * (x + y + 1)) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y + 13L * f * (y + 1)) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y) + 17L * f * f) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      Dedup.videoNearDup(FixtureDirs.cachedRoundTrip(media, "m07-media-", dir),
          "media_id", "media")
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 7 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 6 AS w, (doc_id // 4) % 5 + 8 AS h,
           |    (doc_id // 4) % 3 + 1 AS m
           |  FROM documents),
           |k AS (SELECT d.*, kf FROM d, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS kf)),
           |g AS (SELECT doc_id, kf,
           |    [[ ( ((gid + 3) * ((gx*w//8) + 1) * ((gy*h//8) + 2) + 5 * (gx*w//8) * (gx*w//8)
           |          + 11 * (kf*m) * ((gx*w//8) + (gy*h//8) + 1)) % 199
           |       + ((gid + 7) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 3 * (gy*h//8) * (gy*h//8)
           |          + 13 * (kf*m) * ((gy*h//8) + 1)) % 199
           |       + ((2*gid + 1) * ((gx*w//8) * (gy*h//8) + (gx*w//8) + (gy*h//8))
           |          + 17 * (kf*m) * (kf*m)) % 199
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 AND kf = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM k),
           |dh AS (SELECT doc_id, kf, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS dh
           |  FROM g),
           |fp AS (SELECT doc_id, CAST(bit_xor(
           |      ((dh & ((1::BIGINT << (56 - 7*kf)) - 1)) << (7*kf)) | (dh >> (56 - 7*kf))
           |    ) AS BIGINT) AS fp
           |  FROM dh GROUP BY doc_id),
           |chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.fp AS fp_a, b.fp AS fp_b
           |  FROM chunks a JOIN chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
           |SELECT doc_a, doc_b, CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
           |FROM p WHERE bit_count(xor(fp_a, fp_b)) <= 3
           |ORDER BY doc_a, doc_b""".stripMargin),
    "video near-dup: per-keyframe dHash over decoded AVI frames, order-sensitive rotate-XOR fold + pigeonhole Hamming join (LLM-pipeline op)")

  /** Multimodal RESIZE — thumbnail generation, completing the decode /
    * feature-extract / frame-sample / resize verb set with every stage
    * real: format-sniffed decode (PNG for even ids, BMP for odd),
    * nearest-neighbor resize to 8×6 (`sx = gx·w/W` integer division — the
    * dHash sampling rule per output pixel), BMP re-encode, then the m03
    * feature extraction ON THE THUMB. The oracle computes the thumb's
    * geometry-sensitive features analytically by sampling the source pixel
    * functions at the resize coordinates — a hash match pins decode,
    * sampler, re-encode, and the second decode end-to-end (any stride,
    * row-order, or channel-order bug at EITHER image size breaks wsum_r).
    * Source dims 9..21 × 7..13 always exceed the 8×6 thumb, so every row
    * is a genuine downscale. */
  val m08 = QueryDef(
    "m08_thumbnail_resize",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 13 + 9).toInt; val h = (id % 7 + 7).toInt
          val pix = (x: Int, y: Int) => (
            ((id + 5L * x + 11L * y) % 251).toInt,
            ((2L * x + 7L * y + 3L) % 251).toInt,
            ((x.toLong * y + id % 29) % 251).toInt)
          val bytes =
            if (id % 2 == 0) graft.operators.PngCodec.encode(w, h, pix)
            else graft.operators.BmpCodec.encode(w, h, pix)
          (id, bytes)
        }
      }.toDF("media_id", "media")
      val thumbs = graft.operators.Multimodal.thumbnails(
        FixtureDirs.cachedRoundTrip(media, "m08-media-", dir), "media_id", "media",
        outW = 8, outH = 6)
      graft.operators.Multimodal.imageFeatures(thumbs, "media_id", "thumb")
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH d AS (SELECT doc_id AS media_id, doc_id % 13 + 9 AS w, doc_id % 7 + 7 AS h
           |  FROM documents)
           |SELECT media_id, CAST(8 AS INTEGER) AS width, CAST(6 AS INTEGER) AS height,
           |  CAST(list_sum(flatten([[ (media_id + 5*(gx*w//8) + 11*(gy*h//6)) % 251
           |    for gx in range(0, 8)] for gy in range(0, 6)])) AS BIGINT) AS sum_r,
           |  CAST(list_sum(flatten([[ (2*(gx*w//8) + 7*(gy*h//6) + 3) % 251
           |    for gx in range(0, 8)] for gy in range(0, 6)])) AS BIGINT) AS sum_g,
           |  CAST(list_sum(flatten([[ ((gx*w//8)*(gy*h//6) + media_id % 29) % 251
           |    for gx in range(0, 8)] for gy in range(0, 6)])) AS BIGINT) AS sum_b,
           |  CAST(list_sum(flatten([[ (gx + 8*gy + 1) * ((media_id + 5*(gx*w//8) + 11*(gy*h//6)) % 251)
           |    for gx in range(0, 8)] for gy in range(0, 6)])) AS BIGINT) AS wsum_r,
           |  CAST(media_id % 251 AS INTEGER) AS r_first,
           |  CAST((media_id + 5*(7*w//8) + 11*(5*h//6)) % 251 AS INTEGER) AS r_last
           |FROM d ORDER BY media_id""".stripMargin),
    "multimodal resize: format-sniffed decode, nearest-neighbor 8x6 thumbnail, re-encode + analytic feature oracle (LLM-pipeline op)")

  /** Exact duplicated-passage spans via content-defined chunking
    * ([[Dedup.exactSubstringSpans]]): every ≥16-char normalized chunk
    * occurring ≥2 times in the corpus, with the 0-based span to cut. The
    * exact-substring half of training-data dedup (the fuzzy half is
    * d05/d06/d07); at sf0.01 the 31-word vocabulary yields ~340 genuinely
    * repeated passages across ~60 docs. The oracle recomputes boundaries
    * position-by-position from the same md5 anchor rule. */
  val d23 = QueryDef(
    "d23_exact_substring_spans",
    (spark, dir) =>
      Dedup.exactSubstringSpans(Tables.documentsWide(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id"), col("start")),
    Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
           |  FROM documents),
           |c0 AS (SELECT doc_id, t, length(t) AS n,
           |    CASE WHEN length(t) < 8 THEN []
           |         ELSE [i + 8 for i in range(0, length(t) - 7)
           |               if substr(md5(substr(t, i+1, 8)), 1, 1) = '0'] END AS cuts
           |  FROM n),
           |b AS (SELECT doc_id, t, list_sort(list_distinct([0] || cuts || [n])) AS bs
           |  FROM c0 WHERE n > 0),
           |ch AS (SELECT doc_id, bs[j+1] AS start, bs[j+2] - bs[j+1] AS chunk_len,
           |    md5(substr(t, bs[j+1] + 1, bs[j+2] - bs[j+1])) AS h
           |  FROM b, unnest(range(length(bs) - 1)) AS u(j)),
           |f AS (SELECT * FROM ch WHERE chunk_len >= 16),
           |g AS (SELECT h, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
           |  FROM f GROUP BY h HAVING count(*) >= 2)
           |SELECT f.doc_id, CAST(f.start AS BIGINT) AS start,
           |  CAST(f.chunk_len AS BIGINT) AS chunk_len,
           |  CAST(g.n_docs AS BIGINT) AS n_docs, CAST(g.n_occ AS BIGINT) AS n_occ
           |FROM f JOIN g USING (h)
           |ORDER BY doc_id, start""".stripMargin),
    "exact duplicated-passage spans: content-defined chunking + hash equi-join (LLM-pipeline op)")

  /** The REWRITE half of exact-substring dedup
    * ([[Dedup.removeDuplicatedPassages]]): d23 finds the duplicated spans,
    * this row cuts them — every duplicated ≥16-char chunk loses all but its
    * first (doc_id, start) occurrence corpus-wide, and each document is
    * reassembled from its kept chunks (chunks tile the text, so rebuild is
    * pure concatenation). The oracle recomputes boundaries, ranks
    * occurrences with a window, and string_aggs the kept chunk texts in
    * start order — md5 of the rebuilt text must match character-exact. */
  val d24 = QueryDef(
    "d24_remove_dup_passages",
    (spark, dir) =>
      // documentsWide: CDC chunking + rebuild are per-row heavy (r15 lesson)
      Dedup.removeDuplicatedPassages(Tables.documentsWide(spark, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
    Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS t
           |  FROM documents),
           |c0 AS (SELECT doc_id, t, length(t) AS n,
           |    CASE WHEN length(t) < 8 THEN []
           |         ELSE [i + 8 for i in range(0, length(t) - 7)
           |               if substr(md5(substr(t, i+1, 8)), 1, 1) = '0'] END AS cuts
           |  FROM n),
           |b AS (SELECT doc_id, t, list_sort(list_distinct([0] || cuts || [n])) AS bs
           |  FROM c0 WHERE n > 0),
           |ch AS (SELECT doc_id, bs[j+1] AS start, bs[j+2] - bs[j+1] AS len,
           |    md5(substr(t, bs[j+1] + 1, bs[j+2] - bs[j+1])) AS h,
           |    substr(t, bs[j+1] + 1, bs[j+2] - bs[j+1]) AS txt
           |  FROM b, unnest(range(length(bs) - 1)) AS u(j)),
           |marked AS (SELECT doc_id, start, len, txt,
           |    CASE WHEN len >= 16
           |      AND count(*) OVER (PARTITION BY CASE WHEN len >= 16 THEN h END) >= 2
           |      AND row_number() OVER (PARTITION BY CASE WHEN len >= 16 THEN h END
           |                             ORDER BY doc_id, start) > 1
           |      THEN TRUE ELSE FALSE END AS cut
           |  FROM ch),
           |rebuilt AS (SELECT doc_id,
           |    string_agg(CASE WHEN NOT cut THEN txt END, '' ORDER BY start) AS cleaned,
           |    count(*) FILTER (cut) AS n_cut,
           |    coalesce(sum(len) FILTER (cut), 0) AS cut_chars
           |  FROM marked GROUP BY doc_id)
           |SELECT d.doc_id, md5(coalesce(r.cleaned, '')) AS clean_md5,
           |  CAST(length(coalesce(r.cleaned, '')) AS BIGINT) AS clean_chars,
           |  CAST(coalesce(r.n_cut, 0) AS BIGINT) AS n_cut,
           |  CAST(coalesce(r.cut_chars, 0) AS BIGINT) AS cut_chars
           |FROM documents d LEFT JOIN rebuilt r USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin),
    "exact-substring dedup rewrite: cut duplicated passages, keep first occurrence (LLM-pipeline op)")

  /** Incremental clustering: replay the corpus as two batches — docs with
    * doc_id % 10 < 7 are the prior snapshot, the rest arrive as a new batch —
    * and extend the prior labels with [[Dedup.dupClustersIncremental]]
    * instead of re-running connected components from scratch. Pairs are
    * computed ONCE over the full corpus (in production the persistent
    * shingle index owns the df stats) and split by which batch closes them.
    * Incremental ≡ from-scratch, so the oracle is d08's full recursive-CTE
    * closure, verbatim. */
  val d18 = QueryDef(
    "d18_dup_clusters_incremental",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = DedupMaxDf).persist()
      val isOld = (c: Column) => c % 10 < 7
      val batch1 = docs.filter(isOld(col("doc_id")))
      val batch2 = docs.filter(!isOld(col("doc_id")))
      val priorPairs = pairs.filter(isOld(col("doc_a")) && isOld(col("doc_b")))
      val newPairs = pairs.filter(!isOld(col("doc_a")) || !isOld(col("doc_b")))
      val prior = Dedup.dupClusters(priorPairs, batch1, "doc_id")
      val out = Dedup.dupClustersIncremental(prior, newPairs, batch2, "doc_id")
      prior.unpersist(); pairs.unpersist()
      out.orderBy(col("doc_id"))
    },
    d08.oracle,
    "incremental connected components over a two-batch corpus replay (LLM-pipeline op)")

  /** Deterministic stratified sampling — downsample the dominant language,
    * keep the tails ([[graft.operators.Sampling.stratifiedSample]]: salted
    * md5 byte vs per-stratum threshold). The rebalancing pass every
    * multilingual corpus runs; salt 's19' decorrelates it from the d17
    * train/val/test split, which hashes the same ids unsalted. */
  val d19 = QueryDef(
    "d19_stratified_sample",
    (spark, dir) => {
      graft.operators.Sampling.stratifiedSample(
          Tables.documentsWide(spark, dir), "doc_id", "lang",
          rates = Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 0.75,
          salt = "s19")
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, lang FROM (
           |  SELECT doc_id, lang,
           |    (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 's19'), 1, 1)) - 1) * 16
           |    + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR) || 's19'), 2, 1)) - 1 AS b,
           |    CASE lang WHEN 'en' THEN 64 WHEN 'zh' THEN 128 ELSE 192 END AS thr
           |  FROM documents)
           |WHERE b < thr ORDER BY doc_id""".stripMargin),
    "deterministic stratified corpus rebalancing (LLM-pipeline op)")

  /** TF-IDF / BM25 term scoring over a query vocabulary. Tokenize → explode
    * → (doc, term) counts → df per term → per-row BM25. The idf factor is
    * the RATIONAL Robertson form (N - df + 0.5)/(df + 0.5) WITHOUT the log:
    * every op is then IEEE exact-rounded (+,·,/) and bit-identical across
    * engines, where ln() differs at ulp level between libm implementations
    * (CLAUDE.md float rule 3). Monotone in df, so per-term document ranking
    * is unchanged; at 100 TB the shape is two keyed aggregations (doc, term)
    * + a broadcast of |vocab| df counts — no full-corpus shuffle beyond the
    * token explode. */
  val d20 = QueryDef(
    "d20_tfidf_bm25",
    (spark, dir) => {
      val vocab = Seq("spark", "vector", "merge", "table")
      val k1 = 1.2; val b = 0.75
      val docs = Tables.documentsWide(spark, dir)
      val toks = docs.select(col("doc_id"),
        filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("toks"))
      val dl = toks.select(col("doc_id"), size(col("toks")).as("dl"))
      val stats = dl.agg(sum(col("dl")).as("sum_dl"),
        count(lit(1)).as("n_docs"))
      val tf = toks.select(col("doc_id"), explode(col("toks")).as("term"))
        .filter(col("term").isin(vocab: _*))
        .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      val dfc = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val scored = tf.join(broadcast(dfc), "term").join(dl, "doc_id")
        .crossJoin(broadcast(stats))
        .withColumn("idf_r",
          (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
        .withColumn("bm25",
          col("idf_r") * (col("tf") * lit(k1 + 1)) /
            (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") /
              (col("sum_dl") / col("n_docs")))))
      scored.select(col("doc_id"), col("term"), col("tf"), col("df"),
          col("dl"), col("bm25"))
        .orderBy(col("doc_id"), col("term"))
    },
    Some("""WITH toks AS (
           |  SELECT doc_id, list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '') AS toks
           |  FROM documents),
           |dl AS (SELECT doc_id, CAST(length(toks) AS INTEGER) AS dl FROM toks),
           |stats AS (SELECT sum(dl) AS sum_dl, count(*) AS n_docs FROM dl),
           |tf AS (SELECT doc_id, term, count(*) AS tf
           |  FROM (SELECT doc_id, unnest(toks) AS term FROM toks)
           |  WHERE term IN ('spark', 'vector', 'merge', 'table')
           |  GROUP BY doc_id, term),
           |dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
           |SELECT tf.doc_id, tf.term, tf.tf, dfc.df, dl.dl,
           |  ((n_docs - df + CAST(0.5 AS DOUBLE)) / (df + CAST(0.5 AS DOUBLE)))
           |    * (tf * CAST(2.2 AS DOUBLE))
           |    / (tf + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
           |       + CAST(0.75 AS DOUBLE) * dl / (sum_dl / n_docs))) AS bm25
           |FROM tf JOIN dfc USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
           |ORDER BY doc_id, term""".stripMargin),
    "TF-IDF / BM25 term scoring, log-free rational idf (LLM-pipeline op)")

  /** Test-set decontamination — flag train/val documents sharing any 4-gram
    * with the d17 test split ([[Dedup.decontaminate]]: benchmark shingles
    * broadcast, corpus never shuffled). 4-grams are this corpus' n-gram
    * discrimination point (n=5 flags nothing on a 31-word vocab; real
    * pipelines run 8–13-grams); 8 of 489 train docs flag at sf0.01. */
  val d21 = QueryDef(
    "d21_decontaminate",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      Dedup.decontaminate(corpus, bench, "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (SELECT doc_id,
           |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb, text
           |  FROM documents),
           |toks AS (SELECT doc_id, hb,
           |  CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\s+') END AS w
           |  FROM b),
           |sh AS (SELECT doc_id, hb, unnest(list_distinct(
           |    CASE WHEN length(w) < 4 THEN []
           |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
           |  FROM toks),
           |bench AS (SELECT DISTINCT shingle FROM sh WHERE hb >= 250)
           |SELECT sh.doc_id, count(*) AS n_shared
           |FROM sh JOIN bench USING (shingle) WHERE sh.hb < 250
           |GROUP BY sh.doc_id ORDER BY sh.doc_id""".stripMargin),
    "benchmark decontamination: n-gram overlap vs eval split (LLM-pipeline op)")

  /** The 100 TB variant of d21 ([[Dedup.decontaminateBloom]]): when the
    * eval set's distinct shingles outgrow a broadcast SET, ship their bloom
    * (bits, not rows), pre-filter the corpus map-side with the codegen'd
    * probe, and exact-verify the rare survivors. No false negatives + the
    * verify join removing false positives ⇒ the result is exactly d21's,
    * so the two rows share one oracle text — the hash match proves the
    * bloom path changes the COST SHAPE, not the answer. */
  val d28 = QueryDef(
    "d28_decontaminate_bloom",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      Dedup.decontaminateBloom(corpus, bench, "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    },
    d21.oracle,
    "two-stage bloom decontamination: map-side prefilter + exact verify, == d21 (LLM-pipeline op)")

  /** Per-source quota capping (RefinedWeb/C4-style source balancing): keep
    * at most k documents per source, chosen by salted-hash order — an
    * unbiased deterministic draw, not "first k by id". Rides the skew-safe
    * [[graft.ops.Relational.topKPerGroupSalted]] (a hot source at 100 TB is
    * precisely the celebrity-key case). */
  val d22 = QueryDef(
    "d22_source_cap",
    (spark, dir) => {
      val order = Seq(
        md5(concat(col("doc_id").cast("string"), lit("s22"))).asc,
        col("doc_id").asc)
      graft.ops.Relational.topKPerGroupSalted(
          Tables.documentsWide(spark, dir).select(col("doc_id"), col("source")),
          Seq("source"), order, k = 10)
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source FROM (
           |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
           |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 's22'), doc_id) AS rn
           |  FROM documents)
           |WHERE rn <= 10 ORDER BY doc_id""".stripMargin),
    "per-source quota cap via salted-hash draw (LLM-pipeline op)")

  /** Temperature-based source mixing — the data-mixture recipe every large
    * pretraining run uses (sample source i ∝ nᵢ^α, α<1 upweights small
    * sources; the multilingual/PaLM/Llama resampling rule). Two stages:
    * per-source counts (bounded by #sources — collected and folded on the
    * driver in SORTED source order so the float normalization is
    * deterministic and engine-mirrorable, the centroid-collect class), then
    * per-source quotas enforced by the d22 salted-hash draw (partition-
    * independent, no global shuffle — rank only within source). α = 0.5,
    * budget = half the corpus. √n is a single correctly-rounded IEEE op
    * and W folds in source order = DuckDB's `list_sum(list(wt ORDER BY
    * source))` — bit-identical; quotas are exact floors. */
  val d26 = QueryDef(
    "d26_temperature_mix",
    (spark, dir) => {
      val docs = Tables.documents(spark, dir).select(col("doc_id"), col("source"))
      val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val total = counts.map(_._2).sum
      val budget = total / 2
      val weights = counts.map { case (s, n) => (s, math.sqrt(n.toDouble)) }
      val bigW = weights.foldLeft(0.0)(_ + _._2) // sorted-source fold order
      val quotas = weights.map { case (s, w) =>
        (s, math.floor(budget * w / bigW).toLong)
      }.toMap
      import spark.implicits._
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit("mix"))).asc,
          col("doc_id").asc)
      val quotaDf = quotas.toSeq.toDF("source", "quota")
      docs.withColumn("rn", row_number().over(w))
        .join(broadcast(quotaDf), Seq("source"))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
           |w AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
           |tot AS (SELECT list_sum(list(wt ORDER BY source)) AS W,
           |    (SELECT count(*) FROM documents) // 2 AS N FROM w),
           |q AS (SELECT source, CAST(floor(N * wt / W) AS BIGINT) AS quota FROM w, tot),
           |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
           |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'mix'), doc_id) AS rn
           |  FROM documents)
           |SELECT doc_id, source FROM r JOIN q USING (source)
           |WHERE rn <= quota ORDER BY doc_id""".stripMargin),
    "temperature-resampled source mixing: n^0.5 weights, deterministic salted draw (LLM-pipeline op)")

  /** Corpus-statistical quality scoring: per doc, how COMMON are its char
    * trigrams corpus-wide — the gibberish/noise filter family (CCNet/
    * fastText-style lexical scoring re-expressed relationally; d03/d11 are
    * per-row heuristics, this is the two-pass corpus signal they can't
    * see: mojibake, hex dumps, and markup have locally-plausible word
    * stats but corpus-rare trigrams). Native [[CharShinglesExpr]] in the
    * scan stage; one shuffle on the trigram for document frequency; the
    * join BACK is a broadcast (trigram vocabulary is charset-bounded — a
    * few 100k entries at any corpus size, the 100 TB-safe side); one
    * shuffle on doc_id for the final roll-up. All features are exact
    * integer counts or single int/int double divisions — bit-identical
    * across engines unrounded (CLAUDE.md rule 3: pure per-row
    * arithmetic). */
  val d25 = QueryDef(
    "d25_ngram_coherence",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      val tri = Tables.documentsWide(spark, dir).select(col("doc_id"),
        explode(TextFunctions.charShinglesNative(col("text"), 3)).as("g"))
      val dfreq = tri.groupBy(col("g")).agg(count(lit(1)).as("df"))
      tri.join(broadcast(dfreq), Seq("g"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tri"),
          sum(when(col("df") >= 3, 1L).otherwise(0L)).as("n_common"),
          sum(col("df")).as("sum_df"))
        .select(col("doc_id"), col("n_tri"), col("n_common"),
          (col("n_common").cast("double") / col("n_tri")).as("coherence"),
          (col("sum_df").cast("double") / col("n_tri")).as("avg_df"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH n AS (SELECT doc_id, trim(regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g')) AS t
           |  FROM documents),
           |tl AS (SELECT doc_id, list_distinct(
           |    [substring(t, i + 1, 3) for i in range(0, greatest(length(t) - 2, 0))]) AS gs
           |  FROM n),
           |tri AS (SELECT doc_id, unnest(gs) AS g FROM tl),
           |dfreq AS (SELECT g, count(*) AS df FROM tri GROUP BY g)
           |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tri,
           |  CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
           |  CAST(sum(CASE WHEN df >= 3 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS coherence,
           |  CAST(sum(df) AS DOUBLE) / count(*) AS avg_df
           |FROM tri JOIN dfreq USING (g)
           |GROUP BY doc_id ORDER BY doc_id""".stripMargin),
    "corpus-statistical quality: char-trigram document-frequency coherence (LLM-pipeline op)")

  /** END-TO-END preprocessing pipeline in ONE plan — the composition proof:
    * eval-split carve-out (d21's md5-byte rule) → quality gate (d11's
    * composite score ≥ 0.75) → exact dedup keep-min (d01's fingerprint) →
    * benchmark decontamination (drop docs sharing any 4-gram with the eval
    * split) → temperature mix over the survivors (d26's α=0.5 quotas,
    * recomputed on the POST-filter counts — mixture always runs last in a
    * real pipeline, on what actually survived). Each stage is an
    * already-verified operator; this row pins that they compose — shared
    * lineage, one Catalyst plan per action, no materialization between
    * stages except the bounded per-source count collect (the d26 class).
    * The oracle is the same composition in CTEs. */
  val d27 = QueryDef(
    "d27_full_pipeline",
    (spark, dir) => {
      import spark.implicits._
      TextFunctions.registerNative(spark)
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val q = corpus.filter(TextFunctions.qualityScore(col("text")) >= 0.75)
      val keep = Dedup.exact(q, "doc_id", "text").select(col("keep_id").as("doc_id"))
      val deduped = q.join(keep, Seq("doc_id"))
      val contaminated = Dedup.decontaminate(deduped, bench, "doc_id", "text", n = 4)
        .select(col("doc_id"))
      // consumed twice (count collect + final select) — without the persist
      // the whole gate→dedup→decontaminate lineage recomputes per action
      val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti").persist()
      val counts = clean.groupBy(col("source")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      val budget = counts.map(_._2).sum / 2
      val weights = counts.map { case (s, n) => (s, math.sqrt(n.toDouble)) }
      val bigW = weights.foldLeft(0.0)(_ + _._2)
      val quotaDf = weights.map { case (s, w) =>
        (s, math.floor(budget * w / bigW).toLong)
      }.toSeq.toDF("source", "quota")
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
        .orderBy(md5(concat(col("doc_id").cast("string"), lit("p27"))).asc,
          col("doc_id").asc)
      // materialize the (tiny) survivor selection eagerly so the persisted
      // intermediate can be dropped before returning — cached blocks must
      // not accumulate across a 106-query bench session
      val out = clean.withColumn("rn", row_number().over(w))
        .join(broadcast(quotaDf), Seq("source"))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
        .localCheckpoint(true)
      clean.unpersist()
      out
    },
    Some {
      val sw = TextFunctions.stopwords.map(s => s"'$s'").mkString("[", ",", "]")
      s"""WITH b AS (SELECT doc_id, text, source,
         |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb
         |  FROM documents),
         |toks AS (SELECT doc_id, hb, source, text,
         |  CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\\s+') END AS w
         |  FROM b),
         |feat AS (SELECT doc_id, hb, source, text, w,
         |  CASE WHEN length(text) = 0 THEN 0.0
         |       ELSE CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) / length(text) END AS pr,
         |  CASE WHEN length(w) = 0 THEN 0.0
         |       ELSE CAST(length(list_filter(w, x -> list_contains($sw, x))) AS DOUBLE) / length(w) END AS swr,
         |  CASE WHEN length(w) = 0 THEN 0.0
         |       ELSE CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / length(w) END AS awl,
         |  CASE WHEN length(w) BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.0 END AS len_ok
         |  FROM toks),
         |corpus AS (SELECT doc_id, source, text, w FROM feat WHERE hb < 250
         |  AND (least(swr * 4.0, 1.0) + (1.0 - least(pr * 5.0, 1.0)) + len_ok
         |       + CASE WHEN awl BETWEEN 2.0 AND 12.0 THEN 1.0 ELSE 0.0 END) / 4.0 >= 0.75),
         |fp AS (SELECT doc_id, source, w,
         |  md5(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g'))) AS f
         |  FROM corpus),
         |keep AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY f),
         |dd AS (SELECT fp.doc_id, fp.source, fp.w FROM fp JOIN keep USING (doc_id)),
         |csh AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN length(w) < 4 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
         |  FROM dd),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    CASE WHEN length(w) < 4 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
         |  FROM toks WHERE hb >= 250),
         |contam AS (SELECT DISTINCT doc_id FROM csh JOIN bsh USING (shingle)),
         |clean AS (SELECT doc_id, source FROM dd
         |  WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |c AS (SELECT source, count(*) AS n FROM clean GROUP BY source),
         |wts AS (SELECT source, sqrt(CAST(n AS DOUBLE)) AS wt FROM c),
         |tot AS (SELECT list_sum(list(wt ORDER BY source)) AS W,
         |    (SELECT count(*) FROM clean) // 2 AS N FROM wts),
         |qta AS (SELECT source, CAST(floor(N * wt / W) AS BIGINT) AS quota FROM wts, tot),
         |r AS (SELECT doc_id, source, row_number() OVER (PARTITION BY source
         |    ORDER BY md5(CAST(doc_id AS VARCHAR) || 'p27'), doc_id) AS rn
         |  FROM clean)
         |SELECT doc_id, source FROM r JOIN qta USING (source)
         |WHERE rn <= quota ORDER BY doc_id""".stripMargin
    },
    "end-to-end pipeline: eval split -> quality gate -> exact dedup -> decontaminate -> temperature mix, one plan (LLM-pipeline op)")

  /** Edit-distance fuzzy join ([[graft.operators.Dedup.fuzzyPrefixJoin]]):
    * PassJoin pigeonhole segments over the 24-char normalized prefix with
    * the position rule (|Δpos| ≤ maxDist), levenshtein ≤ 2 verify — entity
    * resolution for near-identical titles/keys. maxDist = 2 (8-char
    * segments): the operator doc's measured ladder — 5→2 cuts the
    * shared-vocab candidate join 22×, the position rule another 2.4×
    * (6.86 M → 82 k rows at sf0.1; the uncapped maxDist=5 row benched
    * 72 s). The oracle re-states the exact construction (positioned
    * segment × grams join, DuckDB `levenshtein` — both engines implement
    * unit-cost Wagner-Fischer, identical on ASCII), so the hash match pins
    * blocking AND verify. */
  val d29 = QueryDef(
    "d29_fuzzy_join",
    (spark, dir) => {
      Dedup.fuzzyPrefixJoin(Tables.documentsWide(spark, dir), "doc_id", "text",
          width = 24, maxDist = 2)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("""WITH n AS (SELECT doc_id,
           |    substring(trim(regexp_replace(lower(text), '[ \t\n\f\r]+', ' ', 'g')), 1, 24) AS p
           |  FROM documents),
           |f AS (SELECT doc_id, p FROM n WHERE length(p) = 24),
           |segs AS (SELECT doc_id, p, i*8 AS pos, substring(p, 1 + i*8, 8) AS g
           |  FROM f, unnest(range(0, 3)) AS t(i)),
           |grams AS (SELECT doc_id, p, i AS pos, substring(p, i + 1, 8) AS g
           |  FROM f, unnest(range(0, 17)) AS t(i)),
           |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.p AS pa, b.p AS pb
           |  FROM segs a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
           |    AND abs(a.pos - b.pos) <= 2)
           |SELECT id_a, id_b, CAST(levenshtein(pa, pb) AS INTEGER) AS dist
           |FROM cand WHERE levenshtein(pa, pb) <= 2
           |ORDER BY id_a, id_b""".stripMargin),
    "fuzzy entity-resolution join: PassJoin pigeonhole + position rule, thresholded levenshtein verify (LLM-pipeline op)")

  /** Unicode NFC normalization ([[graft.functions.NfcNormalizeExpr]] — the
    * canonical-composition pass that runs before any hash-based dedup so
    * composed and decomposed renditions of the same text fingerprint
    * identically). The ASCII testdata is NFC-trivially, so the row
    * manufactures the hard case: every 'e' gains a COMBINING ACUTE
    * (U+0301), making the text genuinely decomposed; both engines then
    * normalize and the md5-of-bytes match proves the JDK's UAX #15
    * implementation and DuckDB's `nfc_normalize` compose to the SAME byte
    * sequence. `len_raw > len_nfc` pins that composition actually happened
    * (e + U+0301 → single é codepoint); idempotency pins NFC's fixpoint
    * property. Map-only, codegen'd, no shuffle until the final sort. */
  val d30 = QueryDef(
    "d30_unicode_nfc",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      val injected = regexp_replace(col("text"), "e", "e\u0301") // e + COMBINING ACUTE (decomposed)
      Tables.documentsWide(spark, dir)
        .select(col("doc_id"), injected.as("t"))
        .select(col("doc_id"), col("t"),
          TextFunctions.nfcNormalize(col("t")).as("nt"))
        .select(col("doc_id"),
          length(col("t")).as("len_raw"),
          length(col("nt")).as("len_nfc"),
          md5(col("nt")).as("nfc_md5"),
          (TextFunctions.nfcNormalize(col("nt")) === col("nt")).as("idempotent"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH inj AS (SELECT doc_id, regexp_replace(text, 'e', 'e' || chr(769), 'g') AS t
           |  FROM documents),
           |n AS (SELECT doc_id, t, nfc_normalize(t) AS nt FROM inj)
           |SELECT doc_id, CAST(length(t) AS INTEGER) AS len_raw,
           |       CAST(length(nt) AS INTEGER) AS len_nfc,
           |       md5(nt) AS nfc_md5, nfc_normalize(nt) = nt AS idempotent
           |FROM n ORDER BY doc_id""".stripMargin),
    "Unicode NFC normalization: native UAX #15 expression, byte-identical to DuckDB nfc_normalize (LLM-pipeline op)")

  /** Cross-document novelty ([[Dedup.crossDocNovelty]]): fraction of each
    * doc's distinct 3-gram shingles first seen (min doc_id) in that doc —
    * the inter-document diversity signal complementing d14's intra-doc
    * repetition. Docs with < 3 tokens have no shingles and drop out (both
    * sides). The novelty double is a single int64/int64 IEEE division —
    * bit-identical across engines, no rounding (CLAUDE.md float rule:
    * pure per-row arithmetic stays unrounded). */
  val d31 = QueryDef(
    "d31_cross_doc_novelty",
    (spark, dir) => {
      Dedup.crossDocNovelty(Tables.documentsWide(spark, dir), "doc_id", "text", n = 3)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $rawShingleCte,
            |per_doc AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
            |firsts AS (SELECT min(doc_id) AS doc_id FROM sh GROUP BY shingle),
            |novel AS (SELECT doc_id, count(*) AS n_novel FROM firsts GROUP BY doc_id)
            |SELECT p.doc_id, p.n_shingles, coalesce(n.n_novel, 0) AS n_novel,
            |  CAST(coalesce(n.n_novel, 0) AS DOUBLE) / p.n_shingles AS novelty
            |FROM per_doc p LEFT JOIN novel n USING (doc_id)
            |ORDER BY p.doc_id""".stripMargin),
    "cross-document novelty: first-occurrence shingle fraction, skew-immune two-pass agg (LLM-pipeline op)")

  /** Quality-WEIGHTED sampling — the soft-threshold curation step (keep a
    * doc with probability equal to its quality score) that modern pipelines
    * prefer over a hard cutoff: borderline docs survive in proportion to
    * their score instead of cliff-edging at a threshold. Deterministic and
    * engine-portable: the per-doc uniform is the 8-nibble md5 prefix of a
    * salted doc_id, a dyadic rational n/2^32 (exact in a double, q30's KMV
    * rule), and the quality double is d11's bit-identical score — so the
    * keep decision `u < quality` compares two exactly-reproducible doubles.
    * Map-only per-row math; no shuffle until the final sort. */
  val d32 = QueryDef(
    "d32_quality_weighted_sample",
    (spark, dir) => {
      val u = (conv(substring(md5(concat(lit("smp|"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long").cast("double") / lit(4294967296.0)).as("u")
      // documentsWide: qualityScore is the row's whole cost (r15 lesson)
      Tables.documentsWide(spark, dir)
        .select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"), u)
        .filter(col("u") < col("quality"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $tokCte,
            |$qualityScoredCte,
            |s AS (SELECT doc_id, quality,
            |  CAST(CAST('0x' || substr(md5('smp|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) AS DOUBLE)
            |    / CAST(4294967296 AS DOUBLE) AS u
            |FROM scored)
            |SELECT doc_id, quality, u FROM s WHERE u < quality
            |ORDER BY doc_id""".stripMargin),
    "quality-weighted sampling: keep-probability = quality score, md5-dyadic uniform (LLM-pipeline op)")

  /** Gopher-style rule-set quality gate (Rae et al. 2021, Appendix A) —
    * the named rule battery modern pretraining pipelines run BEFORE any
    * model-based scoring: document length bounds [50, 100k] words,
    * mean-word-length band [3, 10], symbol-to-word ratio (# and ellipsis)
    * < 0.1, ≥ 80% of words containing an alphabetic char, ≥ 2 distinct
    * stopwords present, and the repetition cap (characters in the most
    * frequent bigram < 20% of the document). Emits every per-rule statistic
    * plus the composite keep decision so a downstream mix can re-threshold
    * without recomputing. Map-only per-row math — no shuffle before the
    * final sort; at 100 TB this runs entirely inside the scan stage.
    * Gopher's line-shaped rules (bullet starts, ellipsis line ends) are
    * inapplicable to this corpus (no newlines) and are documented out of
    * the envelope rather than faked. All ratios are exact-int-valued
    * doubles over single divisions — bit-identical across engines; the
    * threshold comparisons are float-safe (CLAUDE.md rule 7). */
  /** The six Gopher rule statistics as aliased columns over `text` —
    * shared by d33 and the streaming router s21 so both paths gate with
    * byte-identical math. */
  /** The top-bigram rule as the original HOF composition — QUADRATIC and
    * interpreted, kept only as the reference implementation the
    * GopherGateSpec equality-checks [[graft.functions.TopBigramFracExpr]]
    * against (the production path below uses the native linear pass; the
    * s21 drain measured the HOF at ~3.4 ms/doc single-threaded). */
  private[graft] def topBigramFracHof(text: Column): Column = {
    val w = TextFunctions.tokens(text)
    val n = size(w)
    val m = n - 1
    val g2 = when(n < 2, array().cast("array<string>"))
      .otherwise(zip_with(slice(w, lit(1), m), slice(w, lit(2), m),
        (a, b) => concat(a, lit(" "), b)))
    when(size(g2) === 0 || length(text) === 0, lit(0.0))
      .otherwise(array_max(transform(array_distinct(g2),
        x => size(filter(g2, y => y === x)) * length(x))).cast("double")
        / length(text))
  }

  /** Callers must have [[graft.functions.TopBigramFrac.registerNative]]
    * (or GraftExtensions) applied to the session — the bigram rule runs as
    * the native codegen'd expression. */
  private[queries] def gopherStatCols(text: Column): Seq[Column] = {
    val w = TextFunctions.tokens(text)
    val n = size(w)
    val symbols = (length(text) - length(translate(text, "#", ""))) +
      expr("(length(text) - length(replace(text, '...', ''))) div 3")
    Seq(
      n.cast("int").as("n_words"),
      TextFunctions.avgWordLen(text).as("mean_word_len"),
      when(n === 0, lit(0.0))
        .otherwise(size(filter(w, x => x.rlike("[A-Za-z]"))).cast("double") / n)
        .as("alpha_word_ratio"),
      when(n === 0, lit(0.0)).otherwise(symbols.cast("double") / n)
        .as("symbol_word_ratio"),
      size(array_intersect(array_distinct(w),
        array(TextFunctions.stopwords.map(lit): _*))).cast("int")
        .as("stopword_hits"),
      graft.functions.TopBigramFrac.topBigramFrac(text)
        .as("top_bigram_char_frac"))
  }

  /** Composite Gopher keep decision over the [[gopherStatCols]] aliases. */
  private[queries] val gopherKeep: Column =
    col("n_words").between(50, 100000) &&
      col("mean_word_len").between(3, 10) &&
      col("symbol_word_ratio") < 0.1 && col("alpha_word_ratio") > 0.8 &&
      col("stopword_hits") >= 2 && col("top_bigram_char_frac") < 0.2

  /** Shared DuckDB mirror of [[gopherStatCols]]+[[gopherKeep]]: CTE chain
    * ending in `gated(doc_id, <6 stats>, keep)` — d33 selects it whole,
    * s21 routes on it. */
  private[queries] val gopherCte: String = {
    val sw = TextFunctions.stopwords.map(s => s"'$s'").mkString("[", ",", "]")
    s"""$tokCte,
       |g AS (SELECT doc_id, text, w,
       |  CASE WHEN length(w) < 2 THEN []
       |       ELSE [w[i+1] || ' ' || w[i+2] for i in range(0, length(w) - 1)] END AS g2
       |FROM toks),
       |stats AS (SELECT doc_id,
       |  CAST(length(w) AS INTEGER) AS n_words,
       |  CASE WHEN length(w) = 0 THEN 0.0
       |       ELSE CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / length(w) END AS mean_word_len,
       |  CASE WHEN length(w) = 0 THEN 0.0
       |       ELSE CAST(length(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / length(w) END AS alpha_word_ratio,
       |  CASE WHEN length(w) = 0 THEN 0.0
       |       ELSE CAST(length(text) - length(replace(text, '#', ''))
       |            + (length(text) - length(replace(text, '...', ''))) // 3 AS DOUBLE) / length(w) END AS symbol_word_ratio,
       |  CAST(length(list_intersect(list_distinct(w), $sw)) AS INTEGER) AS stopword_hits,
       |  CASE WHEN length(g2) = 0 OR length(text) = 0 THEN 0.0
       |       ELSE CAST(list_max(list_transform(list_distinct(g2),
       |            x -> length(list_filter(g2, y -> y = x)) * length(x))) AS DOUBLE) / length(text) END AS top_bigram_char_frac
       |FROM g),
       |gated AS (SELECT *, (n_words BETWEEN 50 AND 100000 AND mean_word_len BETWEEN 3 AND 10
       |  AND symbol_word_ratio < 0.1 AND alpha_word_ratio > 0.8
       |  AND stopword_hits >= 2 AND top_bigram_char_frac < 0.2) AS keep
       |FROM stats)""".stripMargin
  }

  val d33 = QueryDef(
    "d33_gopher_rules",
    (spark, dir) => {
      graft.functions.TopBigramFrac.registerNative(spark)
      Tables.documentsWide(spark, dir)
        .select(col("doc_id") +: gopherStatCols(col("text")): _*)
        .withColumn("keep", gopherKeep)
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH $gopherCte
            |SELECT * FROM gated ORDER BY doc_id""".stripMargin),
    "Gopher rule-set quality gate: per-rule stats + composite keep (LLM-pipeline op)")

  /** Word bigrams (WITH multiplicity — DSIR counts) hashed to 256 md5
    * buckets: `(doc_id, bkt)` per bigram occurrence. Shared by the DSIR
    * family (d34 selection, d35 pipeline, s23 streaming gate). Tokenizes
    * exactly like tokCte (space-trim, `\s+` split); the shifted `zip_with`
    * keeps duplicates where [[graft.functions.WordShinglesExpr]] would
    * dedup. Interpreted-HOF cost is acceptable here: one pass per scored
    * relation, parallel over the scan (the s21 single-partition trap does
    * not apply — s23's gate joins AFTER this explode repartitions). */
  private[queries] def bigramBuckets(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = df
    .withColumn("w", when(length(trim(col("text"))) === 0,
        array().cast("array<string>"))
      .otherwise(split(trim(col("text")), "\\s+")))
    .withColumn("g", explode(zip_with(
      slice(col("w"), lit(1), greatest(size(col("w")) - 1, lit(0))),
      slice(col("w"), lit(2), greatest(size(col("w")) - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))))
    .withColumn("bkt",
      conv(substring(md5(col("g")), 1, 2), 16, 10).cast("int"))
    .select(col("doc_id"), col("bkt"))

  /** DSIR-style data selection (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): rank raw-corpus documents
    * by how much they resemble a target domain, using hashed n-gram
    * features — here word BIGRAMS (with multiplicity, DSIR's counts) hashed
    * to 256 md5 buckets. The published score is Σ c_f·log(p_t(f)/p_r(f));
    * ln() differs at ulp level across engines (the d20 precedent), so this
    * row ranks by the log-free linear surrogate Σ c_f·(p̂_t(f) − p̂_r(f))
    * scaled to integers: with add-one smoothing over B=256 buckets,
    * score = Σ_g [(CT[b(g)]+1)·(R+B) − (CR[b(g)]+1)·(T+B)] — exact int64
    * end to end (document the trade: same sign per feature as the log
    * ratio, different weighting of extreme ratios). Shape at 100 TB: one
    * bigram explode (map-side), two 256-row count aggregations, the bucket
    * stats re-joined BROADCAST — the corpus shuffles only (doc, bucket)
    * pairs into the per-doc sum; counts approach int64 products ~1e13 at
    * sf1, DECIMAL(38) is the headroom upgrade if a deployment needs it. */
  val d34 = QueryDef(
    "d34_dsir_importance",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      // the corpus-wide bigram explode feeds the bucket counts AND the
      // per-doc scoring join. The 256-row bucket stats are eager-checkpointed
      // so each is computed ONCE and every consumer (broadcast build side,
      // totals fold) reads a materialized 256-row relation instead of
      // re-running the explode lineage (was ~3 explodes per run, now 2).
      // rawBg itself is deliberately NOT persisted: it is a map-side
      // projection off the parquet scan, and at 100 TB recomputing that one
      // extra scan pass beats caching a corpus-sized exploded relation.
      val rawBg = bigramBuckets(docs.filter(col("source") =!= "src0"))
      val tgt = bigramBuckets(docs.filter(col("source") === "src0"))
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
        .localCheckpoint(true)
      val rawCnt = rawBg.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
        .localCheckpoint(true)
      val tot = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("t_tot"))
        .crossJoin(rawCnt.agg(coalesce(sum(col("cr")), lit(0L)).as("r_tot")))
      val scored = rawBg
        .join(broadcast(rawCnt), Seq("bkt"))
        .join(broadcast(tgt), Seq("bkt"), "left")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          sum((coalesce(col("ct"), lit(0L)) + 1) * (col("r_tot") + 256) -
              (col("cr") + 1) * (col("t_tot") + 256)).as("score"))
      val rawDocs = docs.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("source"))
      rawDocs.join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("score"), lit(0L)).as("score"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 50)
        .orderBy(col("rank"))
    },
    Some("""WITH toks AS (SELECT doc_id, source,
           |  CASE WHEN length(trim(text)) = 0 THEN []
           |       ELSE string_split_regex(trim(text), '\s+') END AS w
           |  FROM documents),
           |bg AS (SELECT doc_id, source, unnest(
           |    CASE WHEN length(w) < 2 THEN []
           |         ELSE [w[i] || ' ' || w[i+1] for i in range(1, length(w))] END) AS g
           |  FROM toks),
           |bb AS (SELECT doc_id, source,
           |  (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1 AS bkt
           |  FROM bg),
           |ct AS (SELECT bkt, count(*) AS ct FROM bb WHERE source = 'src0' GROUP BY bkt),
           |cr AS (SELECT bkt, count(*) AS cr FROM bb WHERE source <> 'src0' GROUP BY bkt),
           |tot AS (SELECT CAST((SELECT coalesce(sum(ct), 0) FROM ct) AS BIGINT) AS t_tot,
           |               CAST((SELECT coalesce(sum(cr), 0) FROM cr) AS BIGINT) AS r_tot),
           |sc AS (SELECT bb.doc_id, count(*) AS n_bigrams,
           |    CAST(sum((coalesce(ct.ct, 0) + 1) * (tot.r_tot + 256)
           |             - (cr.cr + 1) * (tot.t_tot + 256)) AS BIGINT) AS score
           |  FROM bb JOIN cr USING (bkt) LEFT JOIN ct USING (bkt) CROSS JOIN tot
           |  WHERE bb.source <> 'src0' GROUP BY bb.doc_id)
           |SELECT doc_id, source, n_bigrams, score, rank FROM (
           |  SELECT a.doc_id, a.source,
           |    coalesce(sc.n_bigrams, 0) AS n_bigrams,
           |    coalesce(sc.score, 0) AS score,
           |    CAST(row_number() OVER (ORDER BY coalesce(sc.score, 0) DESC, a.doc_id)
           |      AS INTEGER) AS rank
           |  FROM (SELECT doc_id, source FROM documents WHERE source <> 'src0') a
           |  LEFT JOIN sc USING (doc_id))
           |WHERE rank <= 50 ORDER BY rank""".stripMargin),
    "DSIR-style importance resampling: hashed-bigram domain score, log-free integer surrogate (LLM-pipeline op)")

  /** Video SCENE-CUT detection — shot-boundary search over decoded frames,
    * the keyframe-selection primitive video curation runs before any
    * per-shot processing (pixel-domain frame differencing, the Zhang et
    * al. 1993 formulation). Fixture: per-doc clips whose pixel functions
    * carry (a) a small alternating drift (`f % 2` per channel → consecutive
    * frame-sum delta exactly 3·w·h) and (b) one hard cut at `nF/2` (+40
    * per channel → delta 120·w·h ± the drift flip). The detector is the
    * plan itself: native [[graft.functions.FrameEnergyExpr]] reduces each
    * video to its per-frame energy profile inside the scan stage (media
    * bytes never shuffle — the profile is nFrames × 8 bytes), then
    * relational `lag` + threshold (60·w·h, cleanly between 3·w·h and
    * 117·w·h) finds the boundary. Oracle = the construction's closed form:
    * cut at nF/2 with delta (120 ± 3)·w·h by cut parity — a hash match
    * pins container parse, frame decode, energy sum, lag, and threshold
    * end-to-end. */
  val m10 = QueryDef(
    "m10_video_scene_detect",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 7 + 6).toInt; val h = (id % 5 + 7).toInt
          val nF = (12 + (id % 3) * 6).toInt
          val cut = nF / 2
          (id, graft.operators.AviCodec.encode(w, h, nF, 10, (f, x, y) => {
            val drift = f % 2
            val jump = if (f >= cut) 40 else 0
            ((((id + 3) * (x + 1) * (y + 2) + 5L * x) % 199 + drift + jump).toInt,
             (((id + 7) * (x + 2) * (y + 1) + 3L * y) % 199 + drift + jump).toInt,
             (((2 * id + 1) * (x.toLong * y + x + y) + 11L) % 199 + drift + jump).toInt)
          }))
        }
      }.toDF("media_id", "media")
      graft.functions.FrameEnergy.registerNative(spark)
      val prof = FixtureDirs.cachedRoundTrip(media, "m10-media-", dir)
        .select(col("media_id").as("doc_id"),
          posexplode(graft.functions.FrameEnergy.frameEnergy(col("media")))
            .as(Seq("f", "s")))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("f"))
      prof.withColumn("prev", lag(col("s"), 1).over(w))
        .filter(col("prev").isNotNull)
        .withColumn("delta", abs(col("s") - col("prev")))
        .filter(col("delta") >=
          lit(60L) * (col("doc_id") % 7 + 6) * (col("doc_id") % 5 + 7))
        .select(col("doc_id"), col("f").as("cut_frame"), col("delta"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 7 + 6 AS w, doc_id % 5 + 7 AS h,
           |    12 + (doc_id % 3) * 6 AS nf
           |  FROM documents)
           |SELECT doc_id, CAST(nf // 2 AS INTEGER) AS cut_frame,
           |  CAST(CASE WHEN (nf // 2) % 2 = 1 THEN 123 * w * h
           |            ELSE 117 * w * h END AS BIGINT) AS delta
           |FROM d ORDER BY doc_id""".stripMargin),
    "video scene-cut detection: native per-frame energy profile + relational lag/threshold (LLM-pipeline op)")

  /** Curation pipeline v2 — the d27 composition exercise over THIS round's
    * pieces, as ONE plan: Gopher rule gate (d33) → benchmark
    * decontamination (d21) → exact dedup keep-first (d01) → DSIR
    * importance selection vs the src0 target domain (d34), emitting the
    * final top-100 training manifest. Stage order is the production one:
    * cheap map-only gate first (kills 53% of the corpus before anything
    * shuffles), decon + dedup next (so the selection quota fills with
    * clean unique docs), importance ranking last. DSIR bucket statistics
    * follow the pipeline: target counts over the full src0 reference,
    * raw counts over the survivor set itself. Every stage is individually
    * verified (d33/d21/d01/d34); this row pins that they COMPOSE — same
    * hash discipline as d27. */
  val d35 = QueryDef(
    "d35_curation_pipeline_v2",
    (spark, dir) => {
      graft.functions.TopBigramFrac.registerNative(spark)
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
        .select(col("doc_id"), col("text"), col("source"))
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      // 1. Gopher gate (map-only, native bigram rule)
      val gated = corpus
        .select(col("doc_id") +: col("source") +: col("text") +:
          gopherStatCols(col("text")): _*)
        .filter(gopherKeep)
        .select(col("doc_id"), col("source"), col("text"))
      // 2. decontamination vs the eval split (broadcast bench shingles)
      val contaminated = Dedup.decontaminate(gated, bench, "doc_id", "text", n = 4)
        .select(col("doc_id"))
      val cleanDocs = gated.join(contaminated, Seq("doc_id"), "left_anti")
      // 3. exact dedup, keep-first
      val keepIds = Dedup.exact(cleanDocs, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      // consumed twice below (raw bigram stats + the scored selection) —
      // persist, then eagerly materialize the tiny result and unpersist
      val deduped = cleanDocs.join(keepIds, Seq("doc_id")).persist()
      // 4. DSIR selection: hashed-bigram importance vs the src0 target
      val tgt = bigramBuckets(docs.filter(col("source") === "src0"))
        .groupBy(col("bkt")).agg(count(lit(1)).as("ct"))
      val rawBg = bigramBuckets(deduped.filter(col("source") =!= "src0"))
      val rawCnt = rawBg.groupBy(col("bkt")).agg(count(lit(1)).as("cr"))
      val tot = tgt.agg(coalesce(sum(col("ct")), lit(0L)).as("t_tot"))
        .crossJoin(rawCnt.agg(coalesce(sum(col("cr")), lit(0L)).as("r_tot")))
      val scored = rawBg
        .join(broadcast(rawCnt), Seq("bkt"))
        .join(broadcast(tgt), Seq("bkt"), "left")
        .crossJoin(broadcast(tot))
        .groupBy(col("doc_id"))
        .agg(sum((coalesce(col("ct"), lit(0L)) + 1) * (col("r_tot") + 256) -
            (col("cr") + 1) * (col("t_tot") + 256)).as("score"))
      val out = deduped.filter(col("source") =!= "src0")
        .select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("score"), lit(0L)).as("score"))
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("score").desc, col("doc_id"))))
        .filter(col("rank") <= 100)
        .orderBy(col("rank"))
        .localCheckpoint(true)
      deduped.unpersist()
      out
    },
    Some {
      s"""WITH $gopherCte,
         |hb AS (SELECT doc_id,
         |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS b
         |  FROM documents),
         |gk AS (SELECT g.doc_id, d.source, d.text
         |  FROM gated g JOIN documents d USING (doc_id) JOIN hb USING (doc_id)
         |  WHERE g.keep AND hb.b < 250),
         |gsh AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN length(w) < 4 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
         |  FROM toks WHERE doc_id IN (SELECT doc_id FROM gk)),
         |bsh AS (SELECT DISTINCT unnest(list_distinct(
         |    CASE WHEN length(w) < 4 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
         |  FROM toks JOIN hb USING (doc_id) WHERE hb.b >= 250),
         |contam AS (SELECT DISTINCT doc_id FROM gsh JOIN bsh USING (shingle)),
         |cl AS (SELECT * FROM gk WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
         |keepids AS (SELECT min(doc_id) AS doc_id FROM cl
         |  GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', ' ', 'g'), '\\s+', ' ', 'g')))),
         |dd AS (SELECT cl.* FROM cl JOIN keepids USING (doc_id)),
         |tb AS (SELECT doc_id, unnest(
         |    CASE WHEN length(w) < 2 THEN []
         |         ELSE [w[i] || ' ' || w[i+1] for i in range(1, length(w))] END) AS g
         |  FROM toks WHERE doc_id IN (SELECT doc_id FROM documents WHERE source = 'src0')),
         |rb AS (SELECT t.doc_id, unnest(
         |    CASE WHEN length(t.w) < 2 THEN []
         |         ELSE [t.w[i] || ' ' || t.w[i+1] for i in range(1, length(t.w))] END) AS g
         |  FROM toks t JOIN dd USING (doc_id) WHERE dd.source <> 'src0'),
         |ct AS (SELECT (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
         |    + strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1 AS bkt, count(*) AS ct
         |  FROM tb GROUP BY 1),
         |cr AS (SELECT (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
         |    + strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1 AS bkt, count(*) AS cr
         |  FROM rb GROUP BY 1),
         |tot AS (SELECT CAST((SELECT coalesce(sum(ct), 0) FROM ct) AS BIGINT) AS t_tot,
         |               CAST((SELECT coalesce(sum(cr), 0) FROM cr) AS BIGINT) AS r_tot),
         |sc AS (SELECT rbb.doc_id,
         |    CAST(sum((coalesce(ct.ct, 0) + 1) * (tot.r_tot + 256)
         |             - (cr.cr + 1) * (tot.t_tot + 256)) AS BIGINT) AS score
         |  FROM (SELECT doc_id, (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 16
         |          + strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1 AS bkt FROM rb) rbb
         |  JOIN cr USING (bkt) LEFT JOIN ct USING (bkt) CROSS JOIN tot
         |  GROUP BY rbb.doc_id)
         |SELECT doc_id, source, score, rank FROM (
         |  SELECT d.doc_id, d.source, coalesce(sc.score, 0) AS score,
         |    CAST(row_number() OVER (ORDER BY coalesce(sc.score, 0) DESC, d.doc_id)
         |      AS INTEGER) AS rank
         |  FROM (SELECT doc_id, source FROM dd WHERE source <> 'src0') d
         |  LEFT JOIN sc USING (doc_id))
         |WHERE rank <= 100 ORDER BY rank""".stripMargin
    },
    "curation pipeline v2: Gopher gate -> decontamination -> exact dedup -> DSIR selection as ONE plan (LLM-pipeline op)")

  /** TRUE byte-pair encoding over the frozen trained merge table
    * ([[graft.functions.BpeMerges]]) — the real tokenizer behind the token
    * budgets that packing (d16) and mixing (d26) model; d02's
    * `bpeTokenCount` is the regex proxy. Native [[graft.functions.BpeEncodeExpr]]
    * (greedy lowest-rank-first, all occurrences per round, memoized per
    * word); the row emits the exact subword STREAM plus the count, so a hash
    * match pins every merge decision, not just totals.
    *
    * The oracle replays the merges in a DuckDB recursive CTE — one leftmost
    * lowest-ranked merge per step — which equals the all-occurrences loop
    * because the trained table is well-formed (see [[graft.functions.BpeMerges]];
    * BpeSpec pins the equivalence against an independent reimplementation).
    *
    * Scale: map-only — one native-expression pass per row, no shuffle before
    * the output sort; the merge table is a compiled-in constant (production
    * tokenizers broadcast `merges.txt` the same way), and the per-word memo
    * exploits Zipfian word repetition. */
  /** Shared DuckDB replay of the frozen [[graft.functions.BpeMerges]] table
    * (d36's oracle, reused by d37): pre-tokenize with d02's classes, then
    * one leftmost lowest-ranked merge per recursion step — equivalent to
    * the native all-occurrences loop because the trained table is
    * well-formed (see [[graft.functions.BpeMerges]]). Ends at `fin`
    * (doc_id, widx, syms = final subwords per pre-token). Caller must open
    * with `WITH RECURSIVE`. Kept s-interpolated (CLAUDE.md rule 10). */
  private[queries] def bpeCte: String = bpeCteOver("documents")

  /** [[bpeCte]] over an arbitrary `(doc_id, text)` relation — d58 replays
    * the encode over the deployment domain instead of the corpus. */
  private[queries] def bpeCteOver(rel: String): String =
    s"""pre AS (SELECT doc_id, regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]') AS ws
       |  FROM $rel),
       |words0 AS (SELECT doc_id, unnest([{'i': i, 't': ws[i]} for i in generate_series(1, len(ws))]) AS w
       |  FROM pre),
       |words AS (SELECT doc_id, w.i AS widx, w.t AS tok FROM words0),
       |init AS (SELECT doc_id, widx, [tok[i] for i in generate_series(1, length(tok))] AS syms FROM words),
       |bpe(doc_id, widx, syms) AS (
       |  SELECT * FROM init
       |  UNION ALL
       |  SELECT doc_id, widx, syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:]
       |  FROM (SELECT doc_id, widx, syms,
       |      (list_sort(list_filter([{'r': list_position(${graft.functions.BpeMerges.sqlLiteral}, syms[i] || ' ' || syms[i+1]), 'i': i}
       |        for i in generate_series(1, len(syms)-1)], x -> x.r > 0)))[1].i AS p
       |    FROM bpe) WHERE p IS NOT NULL),
       |fin AS (SELECT doc_id, widx, syms FROM bpe
       |  QUALIFY row_number() OVER (PARTITION BY doc_id, widx ORDER BY len(syms)) = 1)""".stripMargin

  val d36 = QueryDef(
    "d36_bpe_tokenize",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      Tables.documentsWide(spark, dir)
        .select(col("doc_id"), TextFunctions.bpeTokens(col("text")).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_tokens"),
          concat_ws(" ", col("toks")).as("token_stream"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $bpeCte,
            |agg AS (SELECT doc_id, CAST(sum(len(syms)) AS INTEGER) AS n_tokens,
            |    string_agg(array_to_string(syms, ' '), ' ' ORDER BY widx) AS token_stream
            |  FROM fin GROUP BY doc_id)
            |SELECT d.doc_id, coalesce(a.n_tokens, 0) AS n_tokens,
            |  coalesce(a.token_stream, '') AS token_stream
            |FROM documents d LEFT JOIN agg a USING (doc_id)
            |ORDER BY d.doc_id""".stripMargin),
    "true BPE tokenization: frozen trained merge table, native greedy pair-merge, recursive-CTE oracle replay (LLM-pipeline op)")

  /** Sequence packing on TRUE BPE counts (d16 ∘ d36): the packing budget a
    * real pipeline allocates is measured in the deployed tokenizer's
    * tokens, not a regex proxy — same windowed prefix-sum shape as d16,
    * n_tokens from the native [[graft.functions.BpeEncodeExpr]]. Budget 512
    * (BPE tokens run ~16× denser than d16's whitespace tokens on this
    * corpus, so bins stay multi-doc and the prefix-sum boundary logic is
    * actually exercised). Oracle shares d36's recursive merge-replay CTEs. */
  val d37 = QueryDef(
    "d37_packing_bpe",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      Tables.documentsWide(spark, dir)
        .select(col("source"), col("doc_id"),
          size(TextFunctions.bpeTokens(col("text"))).as("n_tokens"))
        .withColumn("cum", sum(col("n_tokens")).over(w))
        .select(col("source"), col("doc_id"), col("n_tokens"),
          expr("(cum - n_tokens) div 512").cast("int").as("bin"))
        .orderBy(col("source"), col("doc_id"))
    },
    Some(s"""WITH RECURSIVE $bpeCte,
            |bcnt AS (SELECT doc_id, CAST(sum(len(syms)) AS INTEGER) AS n_tokens
            |  FROM fin GROUP BY doc_id),
            |t AS (SELECT d.source, d.doc_id, coalesce(b.n_tokens, 0) AS n_tokens
            |  FROM documents d LEFT JOIN bcnt b USING (doc_id))
            |SELECT source, doc_id, n_tokens,
            |  CAST((sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
            |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens) // 512
            |    AS INTEGER) AS bin
            |FROM t ORDER BY source, doc_id""".stripMargin),
    "sequence packing on true BPE token budgets — d16's prefix-sum over d36's tokenizer (LLM-pipeline op)")

  /** PII DETECTION + REDACTION — the compliance pass every training-data
    * pipeline runs before release: regex-class detectors (email, NANP
    * phone, IPv4) counted per document, then masked with typed placeholders
    * in detector order. The corpus's 31-word vocabulary contains no PII, so
    * the row AUGMENTS the text with deterministic synthetic PII derived
    * from doc_id (both engines construct the identical augmented text —
    * the m0x authored-fixture pattern); the operator under test is the
    * count+redact pass. Patterns are Java/RE2-portable (no lookaround;
    * `\b` agrees — CLAUDE.md rule 4) and non-overlapping by construction
    * (emails redacted first carry no digits into the phone pass, etc.).
    * Map-only: counts and rewrites ride the scan stage; at 100 TB this is
    * one pass, no shuffle before the output sort. */
  private val PiiEmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val PiiPhoneRe = "\\b\\d{3}-\\d{3}-\\d{4}\\b"
  private val PiiIpRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  /** The d38/s24 PII pass over (doc_id, text): deterministic doc_id-derived
    * augmentation (the corpus vocabulary has no natural PII), per-type
    * counts, then triple redaction in detector order. Pure per-row
    * projections — codegen'd, stateless, safe in single-partition
    * micro-batches (the s21 HOF trap does not apply: no HOFs here). */
  private[queries] def piiProject(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val aug = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        concat(lit(" contact user"), col("doc_id").cast("string"),
          lit("@mail.example.com now")))
        .otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit(" call 555-"),
          lpad((col("doc_id") % 1000).cast("string"), 3, "0"), lit("-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(col("doc_id") % 7 === 0,
        concat(lit(" host 10."), (col("doc_id") % 256).cast("string"),
          lit(".0."), (col("doc_id") % 256).cast("string")))
        .otherwise(lit("")))
    df.withColumn("aug", aug)
      .select(col("doc_id"),
        size(regexp_extract_all(col("aug"), lit(PiiEmailRe), lit(0))).as("n_email"),
        size(regexp_extract_all(col("aug"), lit(PiiPhoneRe), lit(0))).as("n_phone"),
        size(regexp_extract_all(col("aug"), lit(PiiIpRe), lit(0))).as("n_ip"),
        regexp_replace(regexp_replace(regexp_replace(col("aug"),
            lit(PiiEmailRe), lit("<EMAIL>")),
            lit(PiiPhoneRe), lit("<PHONE>")),
            lit(PiiIpRe), lit("<IP>")).as("redacted"))
  }

  /** Shared d38/s24 oracle: the identical augmentation + counts + redaction
    * in DuckDB (kept s-interpolated — CLAUDE.md rule 10). */
  private[queries] def piiOracleSql: String =
    s"""WITH aug AS (SELECT doc_id, text ||
       |    CASE WHEN doc_id % 3 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@mail.example.com now' ELSE '' END ||
       |    CASE WHEN doc_id % 5 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 256 AS VARCHAR) ELSE '' END AS t
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(t, '$PiiEmailRe')) AS INTEGER) AS n_email,
       |  CAST(len(regexp_extract_all(t, '$PiiPhoneRe')) AS INTEGER) AS n_phone,
       |  CAST(len(regexp_extract_all(t, '$PiiIpRe')) AS INTEGER) AS n_ip,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '$PiiEmailRe', '<EMAIL>', 'g'),
       |    '$PiiPhoneRe', '<PHONE>', 'g'),
       |    '$PiiIpRe', '<IP>', 'g') AS redacted
       |FROM aug ORDER BY doc_id""".stripMargin

  val d38 = QueryDef(
    "d38_pii_redact",
    (spark, dir) =>
      piiProject(Tables.documentsWide(spark, dir).select(col("doc_id"), col("text")))
        .orderBy(col("doc_id")),
    Some(piiOracleSql),
    "PII detection + redaction: typed regex detectors, per-doc counts, placeholder masking (LLM-pipeline op)")

  /** EPOCH SHARD LAYOUT — the training data-loader step after curation:
    * each epoch gets its own deterministic pseudo-random permutation of the
    * corpus, laid out as (shard, position-within-shard) so N loader workers
    * read N disjoint shards sequentially. Shard and order are md5-derived
    * from (doc_id, epoch) — content-independent (stable under text edits),
    * epoch-varying (each epoch is a genuinely different permutation, which
    * the multi-epoch output pins), and engine-portable (rule-4 hashing).
    * At 100 TB: one keyed shuffle per epoch (repartition by shard +
    * sort-within — no global total order is ever materialized; the ORDER BY
    * here is the verification sort, not the layout). */
  val d39 = QueryDef(
    "d39_epoch_shards",
    (spark, dir) => {
      import spark.implicits._
      val epochs = Seq(1, 2).toDF("epoch")
      val shard = pmod(
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("e"), col("epoch").cast("string"))), 1, 1), 16, 10).cast("int"),
        lit(4))
      val ord = md5(concat(col("doc_id").cast("string"),
        lit("p"), col("epoch").cast("string")))
      Tables.documentsWide(spark, dir).select(col("doc_id"))
        .crossJoin(epochs)
        .withColumn("shard", shard)
        .withColumn("pos", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("epoch"), col("shard"))
            .orderBy(ord, col("doc_id"))))
        .select(col("epoch"), col("shard"), col("pos"), col("doc_id"))
        .orderBy(col("epoch"), col("shard"), col("pos"))
    },
    Some("""WITH e AS (SELECT 1 AS epoch UNION ALL SELECT 2),
           |a AS (SELECT d.doc_id, e.epoch,
           |    (strpos('0123456789abcdef',
           |       substr(md5(CAST(d.doc_id AS VARCHAR) || 'e' || CAST(e.epoch AS VARCHAR)), 1, 1)) - 1) % 4 AS shard,
           |    md5(CAST(d.doc_id AS VARCHAR) || 'p' || CAST(e.epoch AS VARCHAR)) AS ord
           |  FROM documents d CROSS JOIN e)
           |SELECT epoch, CAST(shard AS INTEGER) AS shard,
           |  CAST(row_number() OVER (PARTITION BY epoch, shard ORDER BY ord, doc_id) AS INTEGER) AS pos,
           |  doc_id
           |FROM a ORDER BY epoch, shard, pos""".stripMargin),
    "epoch shard layout: deterministic per-epoch permutation into loader shards, md5-keyed (LLM-pipeline op)")

  /** LEAKAGE-AWARE SPLIT — d17's deterministic hash split applied to the
    * near-dup CLUSTER instead of the document: every member of a connected
    * near-dup component hashes on the shared cluster_id (min reachable
    * doc_id), so near-duplicates can never straddle train/val/test — the
    * eval-contamination mode a per-doc split (d17) cannot prevent and
    * decontamination (d21) only patches after the fact. Contract is
    * NO-LEAKAGE, not immutability: corpus growth that merges two clusters
    * re-keys the merged component (documented; a frozen historical split
    * would instead pin cluster_id at split time). Scale shape = d08's
    * (df-capped LSH index join + min-label propagation) plus one map-side
    * projection — the hash adds no shuffle. */
  /** d40 core: d17's first-hash-byte thresholds applied to cluster_id —
    * factored out so the spec can pin the no-leakage property on synthetic
    * cluster labelings. */
  private[graft] def clusterSplit(clusters: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val b = expr(
      "cast(conv(substring(md5(cast(cluster_id as string)), 1, 2), 16, 10) as int)")
    clusters.select(col("doc_id"), col("cluster_id"),
      when(b < 243, "train").when(b < 250, "val").otherwise("test").as("split"))
  }

  val d40 = QueryDef(
    "d40_leakage_split",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = DedupMaxDf)
      clusterSplit(Dedup.dupClusters(pairs, docs, "doc_id"))
        .orderBy(col("doc_id"))
    },
    Some {
      val clusterSql = d08.oracle.get
        .replace("GROUP BY doc_id ORDER BY doc_id", "GROUP BY doc_id")
      s"""WITH c AS ($clusterSql)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN b < 243 THEN 'train' WHEN b < 250 THEN 'val' ELSE 'test' END AS split
         |FROM (SELECT doc_id, cluster_id,
         |  (strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)) - 1) * 16
         |  + strpos('0123456789abcdef', substr(md5(CAST(cluster_id AS VARCHAR)), 2, 1)) - 1 AS b
         |  FROM c)
         |ORDER BY doc_id""".stripMargin
    },
    "leakage-aware train/val/test split: hash the near-dup cluster, not the doc (LLM-pipeline op)")

  /** CORPUS DATA CARD — the per-source composition report every released
    * dataset ships (docs, token/char budgets, exact-dup rate, quality-pass
    * and language coverage): the aggregate face of the curation ladder,
    * computed in ONE pass. All statistics are exact integers plus one
    * int/int IEEE division (dup_rate) and a float-safe threshold count on
    * d11's bit-identical quality score — no order-dependent float sums
    * (the mean-quality trap; a mean would need the d26 sorted-fold
    * mirroring, a threshold count needs nothing). Scale shape: map-side
    * per-row projections (token count, md5, quality) ride the scan, then
    * one keyed shuffle to |sources| groups; the distinct-fingerprint count
    * is the only two-level agg and partial-aggregates per partition. */
  val d41 = QueryDef(
    "d41_data_card",
    (spark, dir) => {
      val rows = Tables.documentsWide(spark, dir).select(
        col("source"), col("lang"), col("n_chars"),
        md5(col("text")).as("fp"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      rows.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"),
          sum(col("n_tokens")).as("total_tokens"),
          sum(col("n_chars")).as("total_chars"),
          sum(when(col("quality") >= 0.5, 1L).otherwise(0L)).as("n_quality_ok"),
          countDistinct(col("lang")).cast("int").as("n_langs"))
        .select(col("source"), col("n_docs"), col("n_unique"),
          ((col("n_docs") - col("n_unique")).cast("double") / col("n_docs"))
            .as("dup_rate"),
          col("total_tokens"), col("total_chars"), col("n_quality_ok"),
          col("n_langs"))
        .orderBy(col("source"))
    },
    Some(s"""WITH $tokCte,
            |$qualityScoredCte
            |SELECT d.source,
            |  CAST(count(*) AS BIGINT) AS n_docs,
            |  CAST(count(DISTINCT md5(d.text)) AS BIGINT) AS n_unique,
            |  CAST(count(*) - count(DISTINCT md5(d.text)) AS DOUBLE) / count(*) AS dup_rate,
            |  CAST(sum(length(t.w)) AS BIGINT) AS total_tokens,
            |  CAST(sum(d.n_chars) AS BIGINT) AS total_chars,
            |  CAST(sum(CASE WHEN s.quality >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality_ok,
            |  CAST(count(DISTINCT d.lang) AS INTEGER) AS n_langs
            |FROM documents d JOIN toks t USING (doc_id) JOIN scored s USING (doc_id)
            |GROUP BY d.source ORDER BY d.source""".stripMargin),
    "corpus data card: per-source docs/tokens/dup-rate/quality/lang report (LLM-pipeline op)")

  /** AUDIO VOICE-ACTIVITY SEGMENTATION — the speech-curation primitive
    * (silence removal bounds every per-segment downstream cost: ASR,
    * diarization, chunked storage), m10's scene-cut design applied to the
    * audio modality: the native [[graft.functions.AudioFrameEnergiesExpr]]
    * reduces each REAL encoded WAV to its exact-integer per-frame Σ|sample|
    * profile inside the scan stage, then thresholding + gaps-and-islands
    * run grouping stay relational. Fixture: every doc gets true 16-bit PCM
    * ([[graft.operators.WavCodec.encode]]) with an analytically-known
    * activity pattern — frame f is LOUD iff (doc_id + f² + 3f) % 5 < 3
    * (samples 500..2499, frame energy ≥ 4000) and near-silent otherwise
    * (samples in {−1,0,1}, energy ≤ 8) — threshold 1000 cleanly between;
    * frame counts 40/48/56 vary per doc. The oracle computes energies from
    * the sample functions and mirrors the islands SQL, so a hash match
    * pins WAV encode → parquet BINARY → decode → framing → threshold →
    * run-grouping end-to-end. */
  val m11 = QueryDef(
    "m11_audio_segments",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val nFrames = (40 + (id % 3) * 8).toInt
          val n = nFrames * 8
          val samples = Array.tabulate(n) { i =>
            val f = i / 8
            val loud = (id + f.toLong * f + 3L * f) % 5 < 3
            if (loud) (500 + (id + 31L * i) % 2000).toShort
            else ((i % 3) - 1).toShort
          }
          (id, graft.operators.WavCodec.encode(16000, 1, samples))
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal.audioSegments(
          FixtureDirs.cachedRoundTrip(media, "m11-media-", dir),
          "media_id", "media", spf = 8, threshold = 1000L)
        .orderBy(col("media_id"), col("seg_idx"))
    },
    Some("""WITH d AS (SELECT doc_id, 40 + (doc_id % 3) * 8 AS nf FROM documents),
           |fr AS (SELECT doc_id, f,
           |    CASE WHEN (doc_id + f*f + 3*f) % 5 < 3
           |         THEN list_sum([500 + (doc_id + 31*(f*8+j)) % 2000 for j in range(0, 8)])
           |         ELSE list_sum([abs((f*8+j) % 3 - 1) for j in range(0, 8)]) END AS en
           |  FROM d, unnest(range(nf)) AS t(f)),
           |a AS (SELECT doc_id, f, en FROM fr WHERE en > 1000),
           |g AS (SELECT doc_id, f, en,
           |    f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp FROM a),
           |s AS (SELECT doc_id AS media_id, min(f) AS start_f, max(f) AS end_f,
           |    count(*) AS n_frames, sum(en) AS energy
           |  FROM g GROUP BY doc_id, grp)
           |SELECT media_id,
           |  CAST(row_number() OVER (PARTITION BY media_id ORDER BY start_f) AS INTEGER) AS seg_idx,
           |  CAST(start_f AS INTEGER) AS start_f, CAST(end_f AS INTEGER) AS end_f,
           |  CAST(n_frames AS BIGINT) AS n_frames, CAST(energy AS BIGINT) AS energy
           |FROM s ORDER BY media_id, seg_idx""".stripMargin),
    "audio voice-activity segmentation: native frame energies + relational islands (LLM-pipeline op)")

  /** AUDIO QUALITY GATE (m15) —
    * [[graft.operators.Multimodal.audioQuality]] over real WAVs: m11's
    * fixture extended with PLANTED defects — every 4th track gets samples
    * at the int16 rail (clipping), every id≡3 (mod 5) track is ~80%
    * silent frames — so both cut reasons fire alongside clean keeps. The
    * oracle recomputes per-frame abs-energies, the clip census, and the
    * silence ratio analytically from the sample functions (m11's
    * technique); a hash match proves WAV decode + clip detection + frame
    * energies + the gate. */
  val m15 = QueryDef(
    "m15_audio_quality_gate",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val nFrames = (40 + (id % 3) * 8).toInt
          val n = nFrames * 8
          val loudBar = if (id % 5 == 3) 1 else 3
          val samples = Array.tabulate(n) { i =>
            val f = i / 8
            val loud = (id + f.toLong * f + 3L * f) % 5 < loudBar
            if (id % 4 == 0 && i % 97 == 0) Short.MaxValue
            else if (loud) (500 + (id + 31L * i) % 2000).toShort
            else ((i % 3) - 1).toShort
          }
          (id, graft.operators.WavCodec.encode(16000, 1, samples))
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal.audioQuality(
          FixtureDirs.cachedRoundTrip(media, "m15-media-", dir),
          "media_id", "media", spf = 8, silenceThreshold = 1000L)
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH d AS (SELECT doc_id, 40 + (doc_id % 3) * 8 AS nf FROM documents),
           |fr AS (SELECT doc_id, f,
           |    list_sum([CASE WHEN doc_id % 4 = 0 AND (f*8+j) % 97 = 0 THEN 32767
           |      WHEN (doc_id + f*f + 3*f) % 5 < (CASE WHEN doc_id % 5 = 3 THEN 1 ELSE 3 END)
           |        THEN 500 + (doc_id + 31*(f*8+j)) % 2000
           |      ELSE abs((f*8+j) % 3 - 1) END for j in range(0, 8)]) AS en
           |  FROM d, unnest(range(nf)) AS t(f)),
           |agg AS (SELECT fr.doc_id, max(d.nf) AS nf,
           |    CAST(sum(CASE WHEN en <= 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_silent
           |  FROM fr JOIN d ON d.doc_id = fr.doc_id GROUP BY fr.doc_id),
           |clip AS (SELECT doc_id, CAST(list_sum(
           |    [CASE WHEN doc_id % 4 = 0 AND i % 97 = 0 THEN 1 ELSE 0 END
           |     for i in range(0, nf*8)]) AS BIGINT) AS n_clipped FROM d)
           |SELECT a.doc_id AS media_id, CAST(a.nf * 8 AS INTEGER) AS n_samples,
           |  c.n_clipped, CAST(a.nf AS INTEGER) AS n_frames, a.n_silent,
           |  CAST(a.n_silent AS DOUBLE) / a.nf AS silence_ratio,
           |  (c.n_clipped = 0 AND CAST(a.n_silent AS DOUBLE) / a.nf <= 0.5) AS keep
           |FROM agg a JOIN clip c USING (doc_id) ORDER BY media_id""".stripMargin),
    "audio quality gate: clipping census + silence-ratio cut over real WAV decode (LLM-pipeline op)")

  /** BEST-RENDITION DEDUP — collapse each near-dup cluster to its
    * HIGHEST-QUALITY member instead of the arbitrary min-id (d01/d08 keep
    * first; production curation keeps the cleanest rendition — the
    * canonical-document choice when the same text circulates as scans,
    * re-encodes and boilerplate-wrapped copies). Keeper = argmax by
    * (quality DESC, doc_id ASC): d11's quality score is bit-identical
    * across engines, so ordering on it is float-safe, and the doc_id
    * tiebreak makes the choice total. Scale shape: d08's clustering plus
    * one (cluster_id)-keyed window over (doc_id, quality) pairs — text
    * never shuffles; quality computes map-side in the scan stage. */
  val d42 = QueryDef(
    "d42_dedup_keep_best",
    (spark, dir) => {
      // documentsWide: shingling + qualityScore map stages (r15 lesson)
      val docs = Tables.documentsWide(spark, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = DedupMaxDf)
      val clusters = Dedup.dupClusters(pairs, docs, "doc_id")
      val scored = docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      clusters.join(scored, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .groupBy(col("cluster_id"))
        .agg(min(when(col("rn") === 1, col("doc_id"))).as("keep_id"),
          max(when(col("rn") === 1, col("quality"))).as("best_quality"),
          count(lit(1)).as("n_members"))
        .orderBy(col("cluster_id"))
    },
    Some {
      val clusterSql = d08.oracle.get
        .replace("GROUP BY doc_id ORDER BY doc_id", "GROUP BY doc_id")
      s"""WITH c AS ($clusterSql),
         |$tokCte,
         |$qualityScoredCte,
         |ranked AS (SELECT c.cluster_id, c.doc_id, s.quality,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY s.quality DESC, c.doc_id) AS rn
         |  FROM c JOIN scored s USING (doc_id))
         |SELECT cluster_id,
         |  min(CASE WHEN rn = 1 THEN doc_id END) AS keep_id,
         |  max(CASE WHEN rn = 1 THEN quality END) AS best_quality,
         |  CAST(count(*) AS BIGINT) AS n_members
         |FROM ranked GROUP BY cluster_id ORDER BY cluster_id""".stripMargin
    },
    "best-rendition dedup: collapse each near-dup cluster to its highest-quality member (LLM-pipeline op)")

  /** PREFERENCE-PAIR MINING — build (chosen, rejected) training pairs from
    * quality signals within near-dup clusters: two renditions of the SAME
    * underlying text whose quality scores differ are exactly the
    * minimal-confound contrastive pair preference-tuning wants (content
    * held constant, quality varies) — the d42 keeper decision emitted as
    * supervision instead of applied as a filter. chosen = argmax, rejected
    * = argmin by (quality, doc_id-tiebreak); singleton clusters yield no
    * pair; quality_gap is one float subtraction of two bit-identical
    * scores (rule-3 unrounded per-row arithmetic). Scale shape identical
    * to d42: clustering + one cluster-keyed window, text never shuffles. */
  val d43 = QueryDef(
    "d43_preference_pairs",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      // documentsWide: shingling + qualityScore map stages (r15 lesson)
      val docs = Tables.documentsWide(spark, dir)
      val pairs = Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 8, r = 2,
        minJaccard = 0.2, maxDf = DedupMaxDf)
      val clusters = Dedup.dupClusters(pairs, docs, "doc_id")
      val scored = docs.select(col("doc_id"),
        TextFunctions.qualityScore(col("text")).as("quality"))
      val wBest = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").desc, col("doc_id"))
      val wWorst = Window.partitionBy(col("cluster_id"))
        .orderBy(col("quality").asc, col("doc_id").desc)
      clusters.join(scored, Seq("doc_id"))
        .withColumn("rb", row_number().over(wBest))
        .withColumn("rw", row_number().over(wWorst))
        .groupBy(col("cluster_id"))
        .agg(min(when(col("rb") === 1, col("doc_id"))).as("chosen_id"),
          min(when(col("rw") === 1, col("doc_id"))).as("rejected_id"),
          (max(when(col("rb") === 1, col("quality"))) -
            max(when(col("rw") === 1, col("quality")))).as("quality_gap"),
          count(lit(1)).as("n_members"))
        .filter(col("n_members") >= 2)
        .orderBy(col("cluster_id"))
    },
    Some {
      val clusterSql = d08.oracle.get
        .replace("GROUP BY doc_id ORDER BY doc_id", "GROUP BY doc_id")
      s"""WITH c AS ($clusterSql),
         |$tokCte,
         |$qualityScoredCte,
         |ranked AS (SELECT c.cluster_id, c.doc_id, s.quality,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY s.quality DESC, c.doc_id) AS rb,
         |    row_number() OVER (PARTITION BY c.cluster_id
         |      ORDER BY s.quality ASC, c.doc_id DESC) AS rw
         |  FROM c JOIN scored s USING (doc_id))
         |SELECT cluster_id,
         |  min(CASE WHEN rb = 1 THEN doc_id END) AS chosen_id,
         |  min(CASE WHEN rw = 1 THEN doc_id END) AS rejected_id,
         |  max(CASE WHEN rb = 1 THEN quality END)
         |    - max(CASE WHEN rw = 1 THEN quality END) AS quality_gap,
         |  CAST(count(*) AS BIGINT) AS n_members
         |FROM ranked GROUP BY cluster_id HAVING count(*) >= 2
         |ORDER BY cluster_id""".stripMargin
    },
    "preference-pair mining: (chosen, rejected) from quality gaps within near-dup clusters (LLM-pipeline op)")

  /** CROSS-MODAL CONSISTENCY FILTER — the LAION-style paired-data check:
    * when two IMAGES are near-duplicates (m04's dHash pigeonhole pairs),
    * their paired CAPTIONS should agree too; a near-identical image whose
    * captions are unrelated marks a mislabeled / scraped-mismatch pair
    * that a unimodal filter cannot see. Per image pair: exact 3-gram
    * caption Jaccard (d05's verify stage computed on the GIVEN pair list,
    * not corpus-wide) + a `consistent` threshold flag. Scale shape: the
    * pair list (already pigeonhole-bounded) joins the per-doc shingle
    * relation twice keyed by doc — shingles of unpaired docs never join;
    * media bytes stay in m04's scan stage. The media fixture shares m04's
    * session cache (same construction, same prefix) so the decode cost is
    * paid once per session. */
  val m12 = QueryDef(
    "m12_crossmodal_consistency",
    (spark, dir) => {
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val ids = docs.select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, graft.operators.BmpCodec.encode(w, h, (x, y) => {
            val sp = if (x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y)) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      val imgPairs = Dedup.imageNearDup(
        FixtureDirs.cachedRoundTrip(media, "m04-media-", dir),
        "media_id", "media")
      val sh = Dedup.docShingles(docs, "doc_id", "text", n = 3)
        .localCheckpoint(true) // consumed three times below
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
      val shA = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      val shB = sh.select(col("doc_id").as("doc_b"), col("shingle"))
      val com = imgPairs.select(col("doc_a"), col("doc_b"))
        .join(shA, Seq("doc_a")).join(shB, Seq("doc_b", "shingle"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("n_common"))
      val denom = col("sz_a") + col("sz_b") - col("n_common")
      imgPairs
        .join(com, Seq("doc_a", "doc_b"), "left")
        .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")),
          Seq("doc_a"), "left")
        .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")),
          Seq("doc_b"), "left")
        .select(col("doc_a"), col("doc_b"), col("hamming"),
          coalesce(col("n_common"), lit(0L)).as("n_common"),
          coalesce(col("sz_a"), lit(0L)).as("sz_a"),
          coalesce(col("sz_b"), lit(0L)).as("sz_b"))
        .select(col("doc_a"), col("doc_b"), col("hamming"), col("n_common"),
          when(denom === 0, lit(0.0))
            .otherwise(col("n_common").cast("double") / denom).as("caption_jaccard"))
        .withColumn("consistent", col("caption_jaccard") >= 0.2)
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 7 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 6 AS w, (doc_id // 4) % 5 + 8 AS h
           |  FROM documents),
           |g AS (SELECT doc_id,
           |    [[ ( ((gid + 3) * ((gx*w//8) + 1) * ((gy*h//8) + 2) + 5 * (gx*w//8) * (gx*w//8)) % 199
           |       + ((gid + 7) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 3 * (gy*h//8) * (gy*h//8)) % 199
           |       + ((2*gid + 1) * ((gx*w//8) * (gy*h//8) + (gx*w//8) + (gy*h//8))) % 199
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM d),
           |fp AS (SELECT doc_id, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS fp
           |  FROM g),
           |chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    a.fp AS fp_a, b.fp AS fp_b
           |  FROM chunks a JOIN chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
           |ipairs AS (SELECT doc_a, doc_b,
           |    CAST(bit_count(xor(fp_a, fp_b)) AS INTEGER) AS hamming
           |  FROM p WHERE bit_count(xor(fp_a, fp_b)) <= 3),
           |toks AS (SELECT doc_id,
           |  CASE WHEN length(trim(text)) = 0 THEN []
           |       ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |shg AS (SELECT doc_id, unnest(list_distinct(
           |    CASE WHEN length(w) < 3 THEN []
           |         ELSE [array_to_string(list_slice(w, i+1, i+3), ' ') for i in range(0, length(w)-2)] END)) AS shingle
           |  FROM toks),
           |ssize AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM shg GROUP BY doc_id),
           |com AS (SELECT i.doc_a, i.doc_b, CAST(count(*) AS BIGINT) AS nc
           |  FROM ipairs i JOIN shg a ON a.doc_id = i.doc_a
           |  JOIN shg b ON b.doc_id = i.doc_b AND b.shingle = a.shingle
           |  GROUP BY i.doc_a, i.doc_b)
           |SELECT i.doc_a, i.doc_b, i.hamming,
           |  coalesce(c.nc, 0) AS n_common,
           |  CASE WHEN coalesce(sa.sz, 0) + coalesce(sb.sz, 0) - coalesce(c.nc, 0) = 0 THEN 0.0
           |       ELSE CAST(coalesce(c.nc, 0) AS DOUBLE)
           |            / (coalesce(sa.sz, 0) + coalesce(sb.sz, 0) - coalesce(c.nc, 0)) END AS caption_jaccard,
           |  (CASE WHEN coalesce(sa.sz, 0) + coalesce(sb.sz, 0) - coalesce(c.nc, 0) = 0 THEN 0.0
           |       ELSE CAST(coalesce(c.nc, 0) AS DOUBLE)
           |            / (coalesce(sa.sz, 0) + coalesce(sb.sz, 0) - coalesce(c.nc, 0)) END) >= 0.2 AS consistent
           |FROM ipairs i
           |LEFT JOIN com c ON c.doc_a = i.doc_a AND c.doc_b = i.doc_b
           |LEFT JOIN ssize sa ON sa.doc_id = i.doc_a
           |LEFT JOIN ssize sb ON sb.doc_id = i.doc_b
           |ORDER BY i.doc_a, i.doc_b""".stripMargin),
    "cross-modal consistency: image near-dup pairs scored by caption agreement (LLM-pipeline op)")

  /** BPE TOKENIZER TRAINING — the learning step d36 only consumes
    * (Sennrich et al. 2016): derive the merge table FROM the corpus. The
    * distributed part is the word-frequency count (one corpus shuffle,
    * vocabulary-bounded output — how HF/sentencepiece trainers scale too);
    * the merge loop itself runs on that vocabulary-sized table via
    * [[graft.functions.BpeTrainer]] (driver-side bounded collect — the
    * codebook/centroid class), with a total (count DESC, left, right)
    * tie-break so the table is deterministic. The oracle replays ALL
    * training rounds in DuckDB: per round, weighted adjacent-pair counts →
    * the same argmax → merge application as a per-word recursive
    * leftmost-rewrite (≡ left-to-right non-overlapping because applying
    * (l,r) can never create a new (l,r) — see BpeTrainer scaladoc), rounds
    * unrolled as generated CTE stages. A hash match pins every selection
    * AND every application step of the training run. */
  val d44 = QueryDef(
    "d44_bpe_train",
    (spark, dir) => {
      import spark.implicits._
      // minCount cap BEFORE the collect: on curated corpora the vocabulary
      // is bounded, but raw web text carries a heavy singleton tail (typos,
      // hex blobs, hashes) that makes "distinct words" not meaningfully
      // bounded — the standard trainer guard (HF/sentencepiece min_frequency)
      // drops count-1 words inside the distributed aggregation, so the
      // driver only ever sees the true repeated vocabulary. A count-1 word
      // also can't win a merge argmax unless everything is a singleton, so
      // on healthy corpora the cap changes nothing but the collect size.
      val minCount = 2L
      val wc = Tables.documentsWide(spark, dir)
        .select(explode(regexp_extract_all(col("text"),
          lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= minCount)
        .as[(String, Long)].collect().toSeq
      val merges = graft.functions.BpeTrainer.train(wc, nMerges = 8)
      merges.zipWithIndex.map { case (m, i) =>
        (i + 1, m.left, m.right, m.pairCount) }
        .toDF("merge_rank", "l_sym", "r_sym", "pair_count")
        .orderBy(col("merge_rank"))
    },
    Some {
      val n = 8
      val rounds = (1 to n).map { r =>
        val prev = if (r == 1) "s0" else s"s${r - 1}"
        s"""p$r AS (SELECT x.l AS l, x.r AS r, CAST(sum(cnt) AS BIGINT) AS ct
           |  FROM (SELECT cnt, unnest([{'l': syms[i], 'r': syms[i+1]}
           |      for i in generate_series(1, len(syms)-1)]) AS x FROM $prev)
           |  GROUP BY x.l, x.r),
           |b$r AS (SELECT l, r, ct FROM p$r ORDER BY ct DESC, l, r LIMIT 1),
           |m$r(w, cnt, syms) AS (
           |  SELECT w, cnt, syms FROM $prev
           |  UNION ALL
           |  SELECT w, cnt, syms[1:p-1] || [syms[p] || syms[p+1]] || syms[p+2:]
           |  FROM (SELECT m.w, m.cnt, m.syms AS syms,
           |      (list_filter([{'i': i} for i in generate_series(1, len(m.syms)-1)],
           |        x -> m.syms[x.i] = b.l AND m.syms[x.i+1] = b.r))[1].i AS p
           |    FROM m$r m CROSS JOIN b$r b) WHERE p IS NOT NULL),
           |s$r AS (SELECT w, cnt, syms FROM m$r
           |  QUALIFY row_number() OVER (PARTITION BY w ORDER BY len(syms)) = 1)"""
          .stripMargin
      }.mkString(",\n")
      val sel = (1 to n).map(r =>
        s"SELECT CAST($r AS INTEGER) AS merge_rank, l AS l_sym, r AS r_sym, ct AS pair_count FROM b$r")
        .mkString("\nUNION ALL ")
      s"""WITH RECURSIVE
         |wc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt FROM (
         |  SELECT unnest(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]')) AS w
         |  FROM documents) GROUP BY w HAVING count(*) >= 2),
         |s0 AS (SELECT w, cnt, [w[i] for i in generate_series(1, length(w))] AS syms FROM wc),
         |$rounds
         |$sel
         |ORDER BY merge_rank""".stripMargin
    },
    "BPE tokenizer training: learn the merge table from corpus word counts, all rounds oracle-replayed (LLM-pipeline op)")

  /** TOKENIZER FERTILITY REPORT (d47) — the tokenizer-health metric every
    * multilingual/multi-domain pipeline tracks: per source, words per the
    * BPE pre-tokenizer, total subword tokens under the frozen trained
    * table (d36/d44), FERTILITY (tokens/word — a rising value means the
    * vocabulary doesn't cover the domain) and the single-token hit rate
    * (fraction of words the vocab absorbs whole — the d44 retrain
    * trigger). Per-word counts ride the same memoized native
    * [[graft.functions.BpeEncodeExpr]] as d36; the relation is one
    * word-explode + one keyed shuffle to |sources| rows; ratios are exact
    * int/int IEEE divisions. Oracle shares d36's recursive merge-replay
    * CTE verbatim. */
  /** d47's ASSOCIATIVE per-source partials (word/token/single-token
    * counts) — exact int64 sums, so any batch split folds to the same
    * integers: the s29 streaming property. */
  private[graft] def fertilityPartials(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("source"), explode(regexp_extract_all(col("text"),
        lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"), lit(0))).as("wtok"))
      .select(col("source"),
        size(TextFunctions.bpeTokens(col("wtok"))).as("nt"))
      .groupBy(col("source")).agg(
        count(lit(1)).as("n_words"),
        sum(col("nt")).as("n_tokens"),
        sum(when(col("nt") === 1, 1L).otherwise(0L)).as("n_single"))

  /** Fold fertility partials (one or many batches of them) and finish
    * d47's ratio projection. */
  private[graft] def fertilityFromPartials(parts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    parts.groupBy(col("source")).agg(
        sum(col("n_words")).as("n_words"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_single")).as("n_single"))
      .select(col("source"), col("n_words"), col("n_tokens"), col("n_single"),
        (col("n_tokens").cast("double") / col("n_words")).as("fertility"),
        (col("n_single").cast("double") / col("n_words")).as("single_token_rate"))
      .orderBy(col("source"))

  val d47 = QueryDef(
    "d47_tokenizer_fertility",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      fertilityFromPartials(fertilityPartials(Tables.documentsWide(spark, dir)))
    },
    Some(s"""WITH RECURSIVE $bpeCte,
            |w AS (SELECT d.source, len(f.syms) AS nt
            |  FROM fin f JOIN documents d USING (doc_id))
            |SELECT source, CAST(count(*) AS BIGINT) AS n_words,
            |  CAST(sum(nt) AS BIGINT) AS n_tokens,
            |  CAST(sum(CASE WHEN nt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_single,
            |  CAST(sum(nt) AS DOUBLE) / count(*) AS fertility,
            |  CAST(sum(CASE WHEN nt = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS single_token_rate
            |FROM w GROUP BY source ORDER BY source""".stripMargin),
    "tokenizer fertility report: per-source tokens/word + single-token hit rate under the frozen BPE (LLM-pipeline op)")

  /** CONTAMINATION SCORE REPORT (d48) — d21 FLAGS contaminated docs; this
    * is the WIMBD-class measurement the release report needs: per corpus
    * document, its distinct 4-gram count, how many of those occur in the
    * eval split, and the overlap FRACTION (partial contamination matters —
    * a doc quoting one benchmark question is different from a verbatim
    * dump). Same md5-byte corpus/bench split and shingle relation as d21
    * (the bench side stays a broadcast set; d28's bloom is the 100 TB
    * variant); the fraction is one int/int IEEE division, the flag a pure
    * comparison. */
  val d48 = QueryDef(
    "d48_contamination_score",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      val cs = Dedup.docShingles(corpus, "doc_id", "text", n = 4)
        .localCheckpoint(true) // consumed by sizes AND the bench join
      val bs = Dedup.docShingles(bench, "doc_id", "text", n = 4)
        .select(col("shingle")).distinct()
      val sizes = cs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      val shared = cs.join(broadcast(bs), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      val frac = when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
        .otherwise(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles"))
      corpus.select(col("doc_id"))
        .join(sizes, Seq("doc_id"), "left")
        .join(shared, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
          coalesce(col("n_shared"), lit(0L)).as("n_shared"),
          frac.as("contamination"))
        .withColumn("contaminated", col("contamination") >= 0.2)
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (SELECT doc_id,
           |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb, text
           |  FROM documents),
           |toks AS (SELECT doc_id, hb,
           |  CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\s+') END AS w
           |  FROM b),
           |sh AS (SELECT doc_id, hb, unnest(list_distinct(
           |    CASE WHEN length(w) < 4 THEN []
           |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
           |  FROM toks),
           |bench AS (SELECT DISTINCT shingle FROM sh WHERE hb >= 250),
           |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
           |  FROM sh WHERE hb < 250 GROUP BY doc_id),
           |shared AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
           |  FROM sh JOIN bench USING (shingle) WHERE sh.hb < 250 GROUP BY sh.doc_id)
           |SELECT b.doc_id, coalesce(s.n_shingles, 0) AS n_shingles,
           |  coalesce(x.n_shared, 0) AS n_shared,
           |  CASE WHEN coalesce(s.n_shingles, 0) = 0 THEN 0.0
           |       ELSE CAST(coalesce(x.n_shared, 0) AS DOUBLE) / s.n_shingles END AS contamination,
           |  (CASE WHEN coalesce(s.n_shingles, 0) = 0 THEN 0.0
           |       ELSE CAST(coalesce(x.n_shared, 0) AS DOUBLE) / s.n_shingles END) >= 0.2 AS contaminated
           |FROM b LEFT JOIN sizes s USING (doc_id) LEFT JOIN shared x USING (doc_id)
           |WHERE b.hb < 250 ORDER BY b.doc_id""".stripMargin),
    "contamination score report: per-doc eval-overlap fraction, the WIMBD-class release measurement (LLM-pipeline op)")

  /** DEDUP RECALL EVALUATION (d46) — v23's index-quality idea applied to
    * TEXT dedup: per exact-Jaccard band, what fraction of true near-dup
    * pairs (d05's inverted-index ground truth) does the MinHash-LSH
    * pipeline (d06, k=8 r=2) surface? The per-band table IS the LSH
    * S-curve — the (bands, rows) tuning signal: low-similarity bands are
    * expected misses, a hole in the ≥0.8 band means the signature config
    * is wrong. Bands cut by pure comparisons (rule-7 safe), recall is one
    * int/int IEEE division. In production the ground-truth side runs on a
    * SAMPLED partition (the v23 panel idea); the relation algebra here is
    * identical, and both sides share the df-capped shingle universe so
    * the eval never pays the all-pairs bomb the cap exists for. */
  val d46 = QueryDef(
    "d46_dedup_recall_eval",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val exact = Dedup.ngramJaccard(docs, "doc_id", "text",
        n = 3, minJaccard = 0.05, maxDf = DedupMaxDf)
      val lsh = Dedup.minhashLsh(docs, "doc_id", "text",
          n = 3, k = 8, r = 2, minJaccard = 0.05, maxDf = DedupMaxDf)
        .select(col("doc_a"), col("doc_b"), lit(1).as("hit"))
      exact.join(lsh, Seq("doc_a", "doc_b"), "left")
        .withColumn("band",
          when(col("jaccard") >= 0.8, 3).when(col("jaccard") >= 0.6, 2)
            .when(col("jaccard") >= 0.4, 1).otherwise(0))
        .groupBy(col("band"))
        .agg(count(lit(1)).as("n_true"),
          sum(coalesce(col("hit"), lit(0))).as("n_caught"))
        .select(col("band"), col("n_true"), col("n_caught"),
          (col("n_caught").cast("double") / col("n_true")).as("recall"))
        .orderBy(col("band"))
    },
    Some {
      val k = 8; val r = 2
      val mhCols = (0 until k).map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(",\n    ")
      val bandRows = (0 until k / r).map { b =>
        val parts = (0 until r).map(j => s"mh${b * r + j}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_idx, md5($parts) AS band_hash FROM sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH $shingleCte,
         |sizes AS (SELECT doc_id, count(*) AS set_size FROM shc GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
         |  FROM shc a JOIN shc b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |exact AS (SELECT doc_a, doc_b,
         |    CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) AS jaccard
         |  FROM inter
         |  JOIN sizes sa ON sa.doc_id = doc_a
         |  JOIN sizes sb ON sb.doc_id = doc_b
         |  WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.05),
         |sig AS (SELECT doc_id,
         |    $mhCols
         |  FROM shc GROUP BY doc_id),
         |bands AS ($bandRows),
         |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         |banded AS (SELECT e.jaccard,
         |    CASE WHEN e.jaccard >= 0.8 THEN 3 WHEN e.jaccard >= 0.6 THEN 2
         |         WHEN e.jaccard >= 0.4 THEN 1 ELSE 0 END AS band,
         |    CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS hit
         |  FROM exact e LEFT JOIN cand c ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_true,
         |  CAST(sum(hit) AS BIGINT) AS n_caught,
         |  CAST(sum(hit) AS DOUBLE) / count(*) AS recall
         |FROM banded GROUP BY band ORDER BY band""".stripMargin
    },
    "dedup recall evaluation: per-Jaccard-band LSH recall vs exact ground truth — the (k,r) tuning signal (LLM-pipeline op)")

  /** CURATION PIPELINE v3 (d49) — the RefinedWeb-shape composition on this
    * round's gates, ONE plan end-to-end: (1) bigram-LM fluency score
    * against the corpus-trained frozen LM (d45) gates word salad; (2) the
    * contamination FRACTION vs the eval split (d48) gates leaked docs at
    * 0.2 — a stronger rule than d35's binary decontamination; (3) exact
    * dedup keeps the min-id rendition per fingerprint; (4) the survivors
    * are ranked BY the fluency score itself and the top-100 selected via
    * `orderBy.limit` (TakeOrderedAndProject — the distributed top-k, not a
    * global single-partition window; the ≤100-row rank window runs after
    * the cut). Fluency is both gate and selection objective — the
    * quality-ranked-selection step real pipelines run after filtering. */
  val d49 = QueryDef(
    "d49_curation_pipeline_v3",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      val (cbT, cpT) = lmCounts(corpus)
      val flu = lmScore(corpus, cbT, cpT)
        .select(col("doc_id"), col("fluency"))
      val cs = Dedup.docShingles(corpus, "doc_id", "text", n = 4)
        .localCheckpoint(true)
      val bs = Dedup.docShingles(bench, "doc_id", "text", n = 4)
        .select(col("shingle")).distinct()
      val sizes = cs.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      val shared = cs.join(broadcast(bs), Seq("shingle"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
      val contamination = when(coalesce(col("n_shingles"), lit(0L)) === 0, lit(0.0))
        .otherwise(coalesce(col("n_shared"), lit(0L)).cast("double") /
          col("n_shingles"))
      val surv = corpus
        .join(flu, Seq("doc_id"))
        .join(sizes, Seq("doc_id"), "left")
        .join(shared, Seq("doc_id"), "left")
        .withColumn("contamination", contamination)
        .filter(col("fluency") >= 0.035 && col("contamination") < 0.2)
        .select(col("doc_id"), col("source"), col("text"), col("fluency"),
          col("contamination"))
        .localCheckpoint(true) // consumed by the dedup group AND the join
      val keep = Dedup.exact(surv, "doc_id", "text")
        .select(col("keep_id").as("doc_id"))
      val top = surv.join(keep, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("fluency"), col("contamination"))
        .orderBy(col("fluency").desc, col("doc_id")).limit(100)
      top.withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("fluency").desc, col("doc_id"))))
        .select(col("rank"), col("doc_id"), col("source"), col("fluency"),
          col("contamination"))
        .orderBy(col("rank"))
    },
    Some("""WITH b AS (SELECT doc_id,
           |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb,
           |  source, text FROM documents),
           |corpus AS (SELECT doc_id, source, text FROM b WHERE hb < 250),
           |tkf AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM corpus),
           |bgf AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM tkf)),
           |cbf AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bgf GROUP BY 1, 2),
           |cpf AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bgf GROUP BY 1),
           |pf AS (SELECT bgf.doc_id, bgf.pos, CAST(cbf.cb AS DOUBLE) / cpf.cp AS p
           |  FROM bgf JOIN cbf ON cbf.w1 = bgf.w1 AND cbf.w2 = bgf.w2
           |  JOIN cpf ON cpf.w1 = bgf.w1),
           |agf AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM pf GROUP BY doc_id),
           |flu AS (SELECT c.doc_id, coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |  FROM corpus c LEFT JOIN agf a USING (doc_id)),
           |tkc AS (SELECT doc_id, hb,
           |  CASE WHEN length(trim(text)) = 0 THEN [] ELSE string_split_regex(trim(text), '\s+') END AS w
           |  FROM b),
           |sh AS (SELECT doc_id, hb, unnest(list_distinct(
           |    CASE WHEN length(w) < 4 THEN []
           |         ELSE [array_to_string(list_slice(w, i+1, i+4), ' ') for i in range(0, length(w)-3)] END)) AS shingle
           |  FROM tkc),
           |bench AS (SELECT DISTINCT shingle FROM sh WHERE hb >= 250),
           |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles
           |  FROM sh WHERE hb < 250 GROUP BY doc_id),
           |shared AS (SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shared
           |  FROM sh JOIN bench USING (shingle) WHERE sh.hb < 250 GROUP BY sh.doc_id),
           |surv AS (SELECT c.doc_id, c.source, c.text, f.fluency,
           |    CASE WHEN coalesce(s.n_shingles, 0) = 0 THEN 0.0
           |         ELSE CAST(coalesce(x.n_shared, 0) AS DOUBLE) / s.n_shingles END AS contamination
           |  FROM corpus c JOIN flu f USING (doc_id)
           |  LEFT JOIN sizes s USING (doc_id) LEFT JOIN shared x USING (doc_id)
           |  WHERE f.fluency >= 0.035
           |    AND (CASE WHEN coalesce(s.n_shingles, 0) = 0 THEN 0.0
           |         ELSE CAST(coalesce(x.n_shared, 0) AS DOUBLE) / s.n_shingles END) < 0.2),
           |keep AS (SELECT min(doc_id) AS doc_id FROM surv
           |  GROUP BY md5(trim(regexp_replace(regexp_replace(lower(text), '[[:punct:]]', ' ', 'g'), '\s+', ' ', 'g')))),
           |sel AS (SELECT s.doc_id, s.source, s.fluency, s.contamination
           |  FROM surv s JOIN keep k ON k.doc_id = s.doc_id)
           |SELECT CAST(rank AS INTEGER) AS rank, doc_id, source, fluency, contamination FROM (
           |  SELECT *, row_number() OVER (ORDER BY fluency DESC, doc_id) AS rank FROM sel)
           |WHERE rank <= 100 ORDER BY rank""".stripMargin),
    "curation pipeline v3: fluency gate -> contamination-fraction gate -> exact dedup -> quality-ranked top-100 in ONE plan (LLM-pipeline op)")

  /** FUZZY DECONTAMINATION (d52) — [[Dedup.fuzzyDecontaminate]]: catches
    * PARAPHRASED benchmark leakage (d21/d28 only see verbatim n-gram
    * overlap) via asymmetric MinHash-LSH — the small eval set's band rows
    * broadcast against the corpus bands (the corpus never self-joins),
    * candidates verified with exact Jaccard ≥ 0.5, output naming WHICH
    * benchmark item each corpus doc leaks. The fixture plants a
    * deterministic suffixed variant of every bench doc into the corpus
    * (the d38 augmentation precedent — the testdata's own near-dups never
    * straddle the md5 split at sf0.01), so both planted hits and honest
    * misses (short docs diluted below 0.5) are exercised. */
  val d52 = QueryDef(
    "d52_fuzzy_decontaminate",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
        .select(col("doc_id"), col("text"))
      val planted = bench.select((col("doc_id") + 10000000L).as("doc_id"),
        concat(col("text"), lit(" planted paraphrase marker tail words")).as("text"))
      val corpus = docs.filter(byte(col("doc_id")) < 250)
        .select(col("doc_id"), col("text"))
        .unionByName(planted)
      Dedup.fuzzyDecontaminate(corpus, bench, "doc_id", "text",
          n = 3, k = 8, r = 2, minJaccard = 0.5)
        .orderBy(col("doc_id"), col("bench_id"))
    },
    Some {
      val k = 8; val r = 2
      def mhCols(src: String) = (0 until k)
        .map(i => s"min(md5('$i|' || shingle)) AS mh$i").mkString(",\n    ")
      def bandRows(sig: String) = (0 until k / r).map { b =>
        val parts = (0 until r).map(j => s"mh${b * r + j}").mkString(" || '|' || ")
        s"SELECT doc_id, $b AS band_idx, md5($parts) AS band_hash FROM $sig"
      }.mkString("\n  UNION ALL ")
      s"""WITH b AS (SELECT doc_id,
         |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
         |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb, text
         |  FROM documents),
         |bench AS (SELECT doc_id, text FROM b WHERE hb >= 250),
         |corpus AS (SELECT doc_id, text FROM b WHERE hb < 250
         |  UNION ALL
         |  SELECT doc_id + 10000000, text || ' planted paraphrase marker tail words' FROM bench),
         |ctk AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |    ELSE string_split_regex(trim(text), '\\s+') END AS w FROM corpus),
         |csh AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN length(w) < 3 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+3), ' ') for i in range(0, length(w)-2)] END)) AS shingle
         |  FROM ctk),
         |btk AS (SELECT doc_id, CASE WHEN length(trim(text)) = 0 THEN []
         |    ELSE string_split_regex(trim(text), '\\s+') END AS w FROM bench),
         |bsh AS (SELECT doc_id, unnest(list_distinct(
         |    CASE WHEN length(w) < 3 THEN []
         |         ELSE [array_to_string(list_slice(w, i+1, i+3), ' ') for i in range(0, length(w)-2)] END)) AS shingle
         |  FROM btk),
         |sigc AS (SELECT doc_id,
         |    ${mhCols("csh")}
         |  FROM csh GROUP BY doc_id),
         |sigb AS (SELECT doc_id,
         |    ${mhCols("bsh")}
         |  FROM bsh GROUP BY doc_id),
         |bandsc AS (${bandRows("sigc")}),
         |bandsb AS (${bandRows("sigb")}),
         |cand AS (SELECT DISTINCT c.doc_id, bb.doc_id AS bench_id
         |  FROM bandsc c JOIN bandsb bb USING (band_idx, band_hash)),
         |csz AS (SELECT doc_id, count(*) AS sa FROM csh GROUP BY doc_id),
         |bsz AS (SELECT doc_id, count(*) AS sb FROM bsh GROUP BY doc_id),
         |inter AS (SELECT cand.doc_id, cand.bench_id, count(*) AS n_inter
         |  FROM cand
         |  JOIN csh ON csh.doc_id = cand.doc_id
         |  JOIN bsh ON bsh.doc_id = cand.bench_id AND bsh.shingle = csh.shingle
         |  GROUP BY 1, 2)
         |SELECT i.doc_id, i.bench_id,
         |  CAST(n_inter AS DOUBLE) / (csz.sa + bsz.sb - n_inter) AS jaccard
         |FROM inter i
         |JOIN csz ON csz.doc_id = i.doc_id
         |JOIN bsz ON bsz.doc_id = i.bench_id
         |WHERE CAST(n_inter AS DOUBLE) / (csz.sa + bsz.sb - n_inter) >= 0.5
         |ORDER BY i.doc_id, i.bench_id""".stripMargin
    },
    "fuzzy decontamination: paraphrased-leakage audit via asymmetric MinHash-LSH vs the eval set (LLM-pipeline op)")

  /** OOD FLUENCY SCORING (d51) — d45 scores text against an LM trained on
    * the SAME corpus, where every bigram is seen; scoring NEW text (the
    * streaming-ingest reality) hits unseen transitions, and d45's inner
    * count-join would silently DROP them — optimistic exactly on the word
    * salad the gate exists for. This row does it right: add-one (Laplace)
    * smoothing `p = (c(w1,w2)+1) / (c(w1·)+V)` with the vocabulary size V
    * from the training split, unseen prefixes scoring 1/V, and an
    * `n_unseen` column as the explicit OOD-ness signal. Train on the
    * md5-byte corpus split, score the held-out eval split — true
    * out-of-distribution scoring. All counts exact int64, each p one IEEE
    * division; V rides a scalar subquery (rule 12) so one oracle text is
    * honest at every scale factor. */
  val d51 = QueryDef(
    "d51_lm_fluency_ood",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documentsWide(spark, dir)
      val train = docs.filter(byte(col("doc_id")) < 250)
      val eval = docs.filter(byte(col("doc_id")) >= 250)
      val bgT = lmBigrams(train)
      val cb = bgT.groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cb")).localCheckpoint(true)
      val cp = bgT.groupBy(col("w1"))
        .agg(count(lit(1)).as("cp")).localCheckpoint(true)
      val vDf = train
        .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
        .agg(countDistinct(col("w")).as("v"))
      val p = lmBigrams(eval)
        .join(cb, Seq("w1", "w2"), "left")
        .join(cp, Seq("w1"), "left")
        .crossJoin(broadcast(vDf))
        .select(col("doc_id"), col("pos"),
          ((coalesce(col("cb"), lit(0L)) + 1).cast("double") /
            (coalesce(col("cp"), lit(0L)) + col("v"))).as("p"),
          when(col("cb").isNull, 1L).otherwise(0L).as("unseen"))
      val agg = p.groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("unseen")).as("n_unseen"),
        aggregate(sort_array(collect_list(struct(col("pos"), col("p")))),
          lit(0.0), (acc, x) => acc + x.getField("p")).as("s"))
      eval.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
          coalesce(col("n_unseen"), lit(0L)).as("n_unseen"),
          coalesce(col("s") / col("n_bigrams"), lit(0.0)).as("fluency"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH b AS (SELECT doc_id,
           |  (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
           |  + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS hb, text
           |  FROM documents),
           |ttk AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM b WHERE hb < 250),
           |v AS (SELECT CAST(count(DISTINCT t.x) AS BIGINT) AS v
           |  FROM (SELECT unnest(w) AS x FROM ttk) t),
           |bgt AS (SELECT doc_id, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM ttk)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bgt GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bgt GROUP BY 1),
           |etk AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM b WHERE hb >= 250),
           |bge AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM etk)),
           |p AS (SELECT e.doc_id, e.pos,
           |    CAST(coalesce(cb.cb, 0) + 1 AS DOUBLE)
           |      / (coalesce(cp.cp, 0) + (SELECT v FROM v)) AS p,
           |    CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS unseen
           |  FROM bge e LEFT JOIN cb ON cb.w1 = e.w1 AND cb.w2 = e.w2
           |  LEFT JOIN cp ON cp.w1 = e.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    CAST(sum(unseen) AS BIGINT) AS n_unseen,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
           |  coalesce(a.n_unseen, 0) AS n_unseen,
           |  coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |FROM (SELECT doc_id FROM b WHERE hb >= 250) d
           |LEFT JOIN agg a USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin),
    "OOD fluency scoring: add-one-smoothed LM over a held-out split, unseen-transition accounting (LLM-pipeline op)")

  /** PERPLEXITY-BUCKETED SHARDING (d53) — the CCNet recipe: split each
    * source's documents into head/middle/tail TERCILES of the LM quality
    * score (d45's fluency as the perplexity surrogate, ranked within
    * source), so downstream mixing can oversample the head and cap the
    * tail instead of applying one hard gate. Bucket assignment is pure
    * integer arithmetic over the rank (`(rn−1)·3 div n` → 2=head, 0=tail
    * after ordering fluency DESC), engine-exact like d39's epoch shards;
    * cost is d45's scoring profile plus one rank window per source. */
  val d53 = QueryDef(
    "d53_perplexity_buckets",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val (cbT, cpT) = lmCounts(docs)
      val scored = lmScore(docs, cbT, cpT)
        .select(col("doc_id"), col("fluency"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("fluency").desc, col("doc_id"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      docs.select(col("doc_id"), col("source")).join(scored, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .select(col("doc_id"), col("source"), col("fluency"),
          expr("CAST(2 - ((rn - 1) * 3) div n AS INT)").as("bucket"))
        .orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |bg AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM toks)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
           |p AS (SELECT bg.doc_id, bg.pos, CAST(cb.cb AS DOUBLE) / cp.cp AS p
           |  FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
           |  JOIN cp ON cp.w1 = bg.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id),
           |scored AS (SELECT d.doc_id, d.source, coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |j AS (SELECT doc_id, source, fluency,
           |    row_number() OVER (PARTITION BY source ORDER BY fluency DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM scored)
           |SELECT doc_id, source, fluency,
           |  CAST(2 - ((rn - 1) * 3) // n AS INTEGER) AS bucket
           |FROM j ORDER BY doc_id""".stripMargin),
    "perplexity-bucketed sharding: per-source head/middle/tail LM-quality terciles, the CCNet mixing recipe (LLM-pipeline op)")

  /** INCREMENTAL CURATION, two-set replay (d54) — the reference's own key
    * test idea (re-deliver OVERLAPPING data, pin the result — SURVEY §5)
    * applied to the d49 pipeline via [[IncrementalCuration]]: ingest the
    * corpus as two overlapping deliveries (70% then 50%, 20% overlap),
    * persisting per-set partials (bigrams, LM count partials, fingerprints,
    * contamination) and refreshing the selection from the stores. The
    * overlap is dropped at ingest (insert-only-merge discipline), counts
    * merge associatively, and the re-score runs the from-scratch float
    * expressions verbatim over the stored bigram relation — so the final
    * selection is BIT-IDENTICAL to from-scratch d49 over the union, and
    * this row's oracle IS d49's oracle text (the s31/d52 sharing pattern).
    * IncrementalCurationSpec additionally pins re-delivery no-ops and the
    * stored-partial row counts. */
  val d54 = QueryDef(
    "d54_incremental_curation",
    (spark, dir) => {
      val byte = (id: Column) => conv(substring(md5(id.cast("string")), 1, 2), 16, 10)
        .cast("int")
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val corpus = docs.filter(byte(col("doc_id")) < 250)
      val bench = docs.filter(byte(col("doc_id")) >= 250)
      val pipe = new IncrementalCuration(spark,
        FixtureDirs.create("d54-state-").toString)
      pipe.freezeBench(bench)
      val set2 = corpus.filter(col("doc_id") % 10 >= 5)
      val n1 = pipe.ingest(corpus.filter(col("doc_id") % 10 < 7))
      val n2 = pipe.ingest(set2)
      // mechanism guards: the second delivery must have exercised the
      // overlap-drop path (ids with doc_id % 10 in {5, 6} re-delivered and
      // dropped), and the two deliveries together must cover the corpus —
      // otherwise the d49-oracle equivalence would be vacuous or wrong
      require(n1 > 0 && n2 > 0 && n2 < set2.count(),
        s"two-set fixture degenerated: ingests added ($n1, $n2) docs, no overlap dropped")
      require(n1 + n2 == corpus.count(),
        s"deliveries must cover the corpus exactly once: $n1 + $n2 != union")
      pipe.select(100)
    },
    d49.oracle, // incremental refresh ≡ from-scratch d49 over the union
    "incremental curation: two overlapping deliveries + partial-store refresh == from-scratch d49 (LLM-pipeline op)")

  /** SCORE CALIBRATION REPORT (d50) — the tool the d49 lesson demands:
    * before freezing any gate threshold, look at the score DISTRIBUTION.
    * Per source: doc count and exact-rank p10/p50/p90 of the d45 fluency
    * score. Percentiles are RANK-exact (value at `ceil(p·n)` by
    * (score, doc_id) order), not interpolated — interpolation multiplies
    * a decimal literal by a count and the two engines disagree at ulp
    * (DuckDB decimal vs Spark double); the rank index is pure integer
    * arithmetic (`(n·p_num + p_den−1) div p_den`) and the reported value
    * is a score that actually occurs. One window + one group-by per
    * source; the scored relation is d45's. */
  val d50 = QueryDef(
    "d50_score_calibration",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val (cbT, cpT) = lmCounts(docs)
      val scored = lmScore(docs, cbT, cpT)
        .select(col("doc_id"), col("fluency"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("fluency"), col("doc_id"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      docs.select(col("doc_id"), col("source")).join(scored, Seq("doc_id"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wn))
        .groupBy(col("source")).agg(
          max(col("n")).as("n_docs"),
          max(when(col("rn") === expr("(n + 9) div 10"), col("fluency"))).as("p10"),
          max(when(col("rn") === expr("(n + 1) div 2"), col("fluency"))).as("p50"),
          max(when(col("rn") === expr("(n * 9 + 9) div 10"), col("fluency"))).as("p90"))
        .orderBy(col("source"))
    },
    Some("""WITH toks AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |bg AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM toks)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
           |p AS (SELECT bg.doc_id, bg.pos, CAST(cb.cb AS DOUBLE) / cp.cp AS p
           |  FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
           |  JOIN cp ON cp.w1 = bg.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id),
           |scored AS (SELECT d.doc_id, d.source, coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |j AS (SELECT source, fluency,
           |    row_number() OVER (PARTITION BY source ORDER BY fluency, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY source) AS n
           |  FROM scored)
           |SELECT source, CAST(max(n) AS BIGINT) AS n_docs,
           |  max(CASE WHEN rn = (n + 9) // 10 THEN fluency END) AS p10,
           |  max(CASE WHEN rn = (n + 1) // 2 THEN fluency END) AS p50,
           |  max(CASE WHEN rn = (n * 9 + 9) // 10 THEN fluency END) AS p90
           |FROM j GROUP BY source ORDER BY source""".stripMargin),
    "score calibration report: per-source rank-exact fluency percentiles — pick gates from data (LLM-pipeline op)")

  /** SAMPLED SCORE CALIBRATION (d50b) — the 100 TB default for threshold
    * picking; exact-rank d50 stays the audit row. d50's percentiles cost a
    * full per-source sort of the scored corpus; here each source keeps a
    * deterministic [[graft.functions.MinKValues]] min-k sample of
    * (md5(doc_id), fluency) — built with partial aggregation, the shuffle
    * carries ≤k-row buffers per (partition, source), and the merge is
    * EXACT (min-k of a union ≡ min-k of per-part min-k's), so the sample
    * — and therefore every reported percentile — is bit-identical across
    * engines, partitionings, and incremental rollups. Percentiles are
    * d50's rank rule applied to the sample (value at `ceil(p·m)` by
    * (score, hash) order over m = |sample| rows — a window over
    * sources·k rows, never the corpus). On sources with ≤ k docs the
    * sample IS the population and d50b's numbers equal d50's. */
  val d50b = QueryDef(
    "d50b_score_calibration_sampled",
    (spark, dir) => {
      val k = 64
      val docs = Tables.documentsWide(spark, dir)
      val (cbT, cpT) = lmCounts(docs)
      val scored = lmScore(docs, cbT, cpT)
        .select(col("doc_id"), col("fluency"))
      val sample = udaf(new graft.functions.MinKValues(k),
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(String, Double)]())
      val hv = docs.select(col("doc_id"), col("source")).join(scored, Seq("doc_id"))
        .select(col("source"), md5(col("doc_id").cast("string")).as("h"),
          col("fluency").as("v"))
      val samples = hv.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"), sample(col("h"), col("v")).as("sk"))
      val ex = samples.select(col("source"), col("n_docs"), explode(col("sk")).as("x"))
        .select(col("source"), col("n_docs"), col("x.h").as("h"), col("x.v").as("v"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("v"), col("h"))
      val wn = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source"))
      ex.withColumn("rn", row_number().over(w))
        .withColumn("m", count(lit(1)).over(wn))
        .groupBy(col("source")).agg(
          max(col("n_docs")).as("n_docs"),
          max(col("m")).as("sample_n"),
          max(when(col("rn") === expr("(m + 9) div 10"), col("v"))).as("p10"),
          max(when(col("rn") === expr("(m + 1) div 2"), col("v"))).as("p50"),
          max(when(col("rn") === expr("(m * 9 + 9) div 10"), col("v"))).as("p90"))
        .orderBy(col("source"))
    },
    Some("""WITH toks AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |bg AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM toks)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
           |p AS (SELECT bg.doc_id, bg.pos, CAST(cb.cb AS DOUBLE) / cp.cp AS p
           |  FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
           |  JOIN cp ON cp.w1 = bg.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id),
           |scored AS (SELECT d.doc_id, d.source, coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |hv AS (SELECT source, md5(CAST(doc_id AS VARCHAR)) AS h, fluency AS v FROM scored),
           |nd AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM hv GROUP BY source),
           |sk AS (SELECT source, h, v FROM hv
           |  QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 64),
           |j AS (SELECT source, v,
           |    row_number() OVER (PARTITION BY source ORDER BY v, h) AS rn,
           |    count(*) OVER (PARTITION BY source) AS m
           |  FROM sk)
           |SELECT j.source, nd.n_docs, CAST(max(m) AS BIGINT) AS sample_n,
           |  max(CASE WHEN rn = (m + 9) // 10 THEN v END) AS p10,
           |  max(CASE WHEN rn = (m + 1) // 2 THEN v END) AS p50,
           |  max(CASE WHEN rn = (m * 9 + 9) // 10 THEN v END) AS p90
           |FROM j JOIN nd USING (source)
           |GROUP BY j.source, nd.n_docs ORDER BY j.source""".stripMargin),
    "sampled score calibration: per-source percentiles from deterministic merge-exact min-k samples — no corpus sort (LLM-pipeline op)")

  /** IMAGE QUALITY GATE (m13) — [[graft.operators.Multimodal.imageQuality]]
    * over a fixture where every third image is a solid color (contrast 0 —
    * the blank-placeholder class the gate exists for) and the rest carry
    * m03's textured pixel functions; sizes sweep 2..14 × 2..8 so the
    * min-pixels cut also fires. The oracle recomputes min/max/distinct
    * summed-channel luminance ANALYTICALLY from the pixel functions
    * (m03's technique) — a hash match proves decode + stats + gate. */
  val m13 = QueryDef(
    "m13_image_quality_gate",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 13 + 2).toInt; val h = (id % 7 + 2).toInt
          val bmp =
            if (id % 3 == 0) {
              val c = (id % 256).toInt
              graft.operators.BmpCodec.encode(w, h, (_, _) => (c, c, c))
            } else graft.operators.BmpCodec.encode(w, h, (x, y) => (
              ((id + 7L * x + 13L * y) % 256).toInt,
              ((3L * x + 5L * y + 1L) % 256).toInt,
              ((x.toLong * y + id % 17) % 256).toInt))
          (id, bmp)
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal
        .imageQuality(FixtureDirs.cachedRoundTrip(media, "m13-media-", dir),
          "media_id", "media")
        .toDF().orderBy(col("media_id"))
    },
    Some("""WITH d AS (SELECT doc_id AS media_id, doc_id % 13 + 2 AS w, doc_id % 7 + 2 AS h
           |  FROM documents),
           |l AS (SELECT media_id, w, h,
           |    CASE WHEN media_id % 3 = 0
           |      THEN flatten([[ 3 * (media_id % 256) for x in range(0, w)] for y in range(0, h)])
           |      ELSE flatten([[ (media_id + 7*x + 13*y) % 256 + (3*x + 5*y + 1) % 256
           |             + (x*y + media_id % 17) % 256
           |        for x in range(0, w)] for y in range(0, h)]) END AS gg
           |  FROM d)
           |SELECT media_id, CAST(w AS INTEGER) AS width, CAST(h AS INTEGER) AS height,
           |  CAST(w * h AS INTEGER) AS n_pixels,
           |  CAST(list_min(gg) AS INTEGER) AS min_lum,
           |  CAST(list_max(gg) AS INTEGER) AS max_lum,
           |  CAST(list_max(gg) - list_min(gg) AS INTEGER) AS contrast,
           |  CAST(len(list_distinct(gg)) AS INTEGER) AS n_distinct_lum,
           |  (w * h >= 16 AND list_max(gg) - list_min(gg) >= 30) AS keep
           |FROM l ORDER BY media_id""".stripMargin),
    "image quality gate: resolution + contrast + palette stats over decoded pixels (LLM-pipeline op)")

  /** JPEG DECODE + QUALITY GATE (m09) — m13's gate over REAL JPEGs
    * ([[graft.operators.JpegCodec]], the production lossy format). JPEG
    * decode is deterministic for a fixed decoder but NOT analytically
    * reproducible in SQL (IDCT rounding — see JpegCodec scaladoc), so the
    * m03/m13 analytic-pixel oracle technique cannot apply; the oracle is
    * instead the GoldenFixtureSpec pattern (the reference's own
    * `Gold/06-gold.py:132-137` golden-file assert): DuckDB reads the
    * COMMITTED decoded-stats fixture under `src/test/resources/golden/`,
    * so a hash match pins encode → parquet round trip → dispatch → decode
    * → stats bit-for-bit against the reviewed fixture. The fixture is
    * generated at sf0.01 (the driver's correctness SF) by JpegGoldenSpec
    * and regenerated with GRAFT_GOLDEN_REGEN=true after an INTENDED codec
    * change. Textured/solid mix as in m13 so both gate verdicts occur;
    * solid 8-px-multiple-free sizes exercise JPEG's block padding. */
  val m09 = QueryDef(
    "m09_jpeg_quality_gate",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 9 + 8).toInt; val h = (id % 5 + 8).toInt
          val jpg =
            if (id % 3 == 0) {
              val c = (id % 256).toInt
              graft.operators.JpegCodec.encode(w, h, (_, _) => (c, c, c))
            } else graft.operators.JpegCodec.encode(w, h, (x, y) => (
              ((id + 7L * x + 13L * y) % 256).toInt,
              ((3L * x + 5L * y + 1L) % 256).toInt,
              ((x.toLong * y + id % 17) % 256).toInt))
          (id, jpg)
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal
        .imageQuality(FixtureDirs.cachedRoundTrip(media, "m09-media-", dir),
          "media_id", "media")
        .toDF().orderBy(col("media_id"))
    },
    Some("""SELECT media_id, width, height, n_pixels, min_lum, max_lum,
           |  contrast, n_distinct_lum, keep
           |FROM '/root/repo/src/test/resources/golden/m09_jpeg_quality_gate.parquet'
           |ORDER BY media_id""".stripMargin),
    "JPEG decode + quality gate vs the committed golden fixture — lossy decode has no analytic oracle (LLM-pipeline op)")

  /** VIDEO FRAME SAMPLE + GATE (m14) —
    * [[graft.operators.Multimodal.videoFrameSample]] over real AVIs where
    * every fourth frame is a SOLID color (the blank-frame class the gate
    * drops; textured frames vary per frame via f-terms in the pixel
    * functions). Sampling every 3rd frame intersects the flat class at
    * f ≡ 3 (mod 12), so the output exercises both verdicts. The oracle
    * recomputes each sampled frame's min/max summed-channel luminance
    * analytically (m10/m13's technique) — a hash match proves container
    * decode, frame indexing, sampling, and the gate. */
  val m14 = QueryDef(
    "m14_video_frame_sample",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val media = ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 7 + 6).toInt; val h = (id % 5 + 7).toInt
          val nF = (12 + (id % 3) * 6).toInt
          (id, graft.operators.AviCodec.encode(w, h, nF, 10, (f, x, y) =>
            if (f % 4 == 3) {
              val c = (id % 199).toInt; (c, c, c)
            } else (
              (((id + 3) * (x + 1) * (y + 2) + 5L * x + 7L * f) % 199).toInt,
              (((id + 7) * (x + 2) * (y + 1) + 3L * y + 11L * f) % 199).toInt,
              (((2 * id + 1) * (x.toLong * y + x + y) + 13L * f) % 199).toInt)))
        }
      }.toDF("media_id", "media")
      graft.operators.Multimodal
        .videoFrameSample(FixtureDirs.cachedRoundTrip(media, "m14-media-", dir),
          "media_id", "media", every = 3)
        .toDF().orderBy(col("media_id"), col("frame"))
    },
    Some("""WITH d AS (SELECT doc_id, doc_id % 7 + 6 AS w, doc_id % 5 + 7 AS h,
           |    12 + (doc_id % 3) * 6 AS nf
           |  FROM documents),
           |fr AS (SELECT doc_id, w, h, unnest([f for f in range(0, nf) if f % 3 = 0]) AS f
           |  FROM d),
           |l AS (SELECT doc_id, f,
           |    CASE WHEN f % 4 = 3
           |      THEN [3 * (doc_id % 199)]
           |      ELSE flatten([[ ((doc_id + 3) * (x + 1) * (y + 2) + 5 * x + 7 * f) % 199
           |             + ((doc_id + 7) * (x + 2) * (y + 1) + 3 * y + 11 * f) % 199
           |             + ((2 * doc_id + 1) * (x * y + x + y) + 13 * f) % 199
           |        for x in range(0, w)] for y in range(0, h)]) END AS gg
           |  FROM fr)
           |SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame,
           |  CAST(list_min(gg) AS INTEGER) AS min_lum,
           |  CAST(list_max(gg) AS INTEGER) AS max_lum,
           |  CAST(list_max(gg) - list_min(gg) AS INTEGER) AS contrast,
           |  (list_max(gg) - list_min(gg)) >= 30 AS keep
           |FROM l ORDER BY media_id, frame""".stripMargin),
    "video frame sampling + blank-frame gate: decode, every-kth sample, per-frame contrast cut (LLM-pipeline op)")

  /** BIGRAM-LM FLUENCY SCORING — the statistical-LM quality filter (the
    * CCNet/KenLM idea with the LM trained IN-ENGINE, d44's pattern): score
    * each document by the mean conditional probability of its word bigrams
    * under the corpus's own bigram model, `mean_i p(w_{i+1}|w_i)` with
    * `p = cnt(w_i,w_{i+1}) / cnt(w_i·)`. Word salad scores near 0 (unseen
    * transitions), templated/repetitive text near 1. Exactness: each `p`
    * is ONE IEEE division of exact int64 counts; the per-doc sum folds in
    * POSITION order (CLAUDE.md rule 9 — Spark's sorted-collect sequential
    * fold ≡ DuckDB `list_sum(list(p ORDER BY pos))`, the v09 mechanism);
    * the mean is one more exact division. Scale shape: the count tables
    * are VOCABULARY-bounded (checkpointed — the d34 rule: cache the small
    * stats, never the corpus-sized bigram explode; the explode is a
    * map-side projection recomputed per consumer), the score join keys on
    * (w1,w2)/(w1) — broadcast-able at any real vocab — and the ordered
    * fold runs post-aggregation on one row per document. */
  /** d45's positioned-bigram relation: (doc_id, pos, w1, w2). A map-side
    * projection off the scan — deliberately never persisted (the d34
    * rule). */
  private[graft] def lmBigrams(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = docs.select(col("doc_id"),
      graft.functions.TextFunctions.tokens(col("text")).as("w"))
    val m = size(col("w")) - 1
    toks.select(col("doc_id"),
        posexplode(when(size(col("w")) < 2,
            array().cast("array<struct<w1:string,w2:string>>"))
          .otherwise(zip_with(slice(col("w"), lit(1), m),
            slice(col("w"), lit(2), m),
            (a, b) => struct(a.as("w1"), b.as("w2"))))).as(Seq("pos0", "x")))
      .select(col("doc_id"), (col("pos0") + 1).as("pos"),
        col("x.w1").as("w1"), col("x.w2").as("w2"))
  }

  /** d45's trained LM: vocabulary-bounded (bigram, prefix) count tables,
    * eagerly checkpointed — the frozen side input s28 streams against. */
  private[graft] def lmCounts(corpus: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val bg = lmBigrams(corpus)
    (bg.groupBy(col("w1"), col("w2"))
       .agg(count(lit(1)).as("cb")).localCheckpoint(true),
     bg.groupBy(col("w1"))
       .agg(count(lit(1)).as("cp")).localCheckpoint(true))
  }

  /** Score `docs` against a (frozen) bigram LM — per-doc mean conditional
    * probability, summed in position order (rule 9). Pure function of
    * (docs, cb, cp): batch-splitting `docs` is score-invariant, the s28
    * drain ≡ batch property. */
  private[graft] def lmScore(docs: org.apache.spark.sql.DataFrame,
                             cb: org.apache.spark.sql.DataFrame,
                             cp: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    lmScoreFromBigrams(docs.select(col("doc_id")), lmBigrams(docs), cb, cp)

  /** [[lmScore]] over an ALREADY-MATERIALIZED bigram relation — the
    * incremental-curation path (d54) re-scores from its stored
    * `(doc_id, pos, w1, w2)` partials without re-tokenizing any document.
    * Shared verbatim with the from-scratch path so both run the identical
    * float expressions (same per-doc pos-ordered fold — rule 9). */
  private[graft] def lmScoreFromBigrams(ids: org.apache.spark.sql.DataFrame,
                                        bg: org.apache.spark.sql.DataFrame,
                                        cb: org.apache.spark.sql.DataFrame,
                                        cp: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val p = bg.join(cb, Seq("w1", "w2")).join(cp, Seq("w1"))
      .select(col("doc_id"), col("pos"),
        (col("cb").cast("double") / col("cp")).as("p"))
    val agg = p.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_bigrams"),
      aggregate(sort_array(collect_list(struct(col("pos"), col("p")))),
        lit(0.0), (acc, x) => acc + x.getField("p")).as("s"))
    ids.select(col("doc_id")).join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("s") / col("n_bigrams"), lit(0.0)).as("fluency"))
      .withColumn("fluent", col("fluency") >= 0.035)
  }

  val d45 = QueryDef(
    "d45_lm_fluency",
    (spark, dir) => {
      val docs = Tables.documentsWide(spark, dir)
      val (cb, cp) = lmCounts(docs)
      lmScore(docs, cb, cp).orderBy(col("doc_id"))
    },
    Some("""WITH toks AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |bg AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM toks)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
           |p AS (SELECT bg.doc_id, bg.pos, CAST(cb.cb AS DOUBLE) / cp.cp AS p
           |  FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
           |  JOIN cp ON cp.w1 = bg.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id)
           |SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams,
           |  coalesce(a.s / a.n_bigrams, 0.0) AS fluency,
           |  coalesce(a.s / a.n_bigrams, 0.0) >= 0.035 AS fluent
           |FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
           |ORDER BY d.doc_id""".stripMargin),
    "bigram-LM fluency scoring: in-engine-trained statistical LM quality filter (LLM-pipeline op)")

  /** Graph trust propagation over the near-dup similarity graph — the
    * web-curation pattern (seed trust at known-good sources, diffuse it over
    * content-similarity edges so unlabeled documents inherit trust from the
    * neighborhoods they duplicate). Harmonic/PageRank-style, but in FIXED-
    * POINT INTEGER arithmetic: trust is scaled to 10^6, each round does
    *
    *   trust'(v) = ( trust(v) + Σ_{u~v} trust(u) div deg(u) ) div 2
    *
    * with integer division throughout — integer sums are associative, so
    * the result is order-free across shuffles and EXACTLY mirrorable in
    * DuckDB (three unrolled CTE rounds with `//`), where a double-weighted
    * propagation would diverge at ulp on sum order (CLAUDE.md float rule).
    *
    * Scale shape: edges come from the SAME df-capped shingle inverted index
    * as the dedup ladder (bucketed equi-join, never all-pairs); the degree
    * is joined into the edge relation ONCE and the whole edge side is
    * eagerly checkpointed before iterating (the measured lesson from the
    * incremental-clustering loop: an unchecked-pointed input re-ANALYZES its
    * full lineage every round). Each round is one edge-keyed join + one
    * dst-keyed integer agg — linear in |E|, three rounds. */
  val d55 = QueryDef(
    "d55_trust_propagation",
    (spark, dir) => {
      val Scale = 1000000L
      // documentsWide: the shingle-graph build's map stage (r15 lesson)
      val docs = Tables.documentsWide(spark, dir)
      val ds = Dedup.capShingles(
        Dedup.docShingles(docs, "doc_id", "text"), DedupMaxDf).persist()
      val half = ds.as("x").join(ds.as("y"),
          col("x.shingle") === col("y.shingle") && col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).as("shared")).filter(col("shared") >= 2)
        .select(col("a"), col("b"))
      val sym = half.union(half.select(col("b").as("a"), col("a").as("b")))
      val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("deg_a"))
      // degree folded into the edges, then the loop input pinned once
      val edges = sym.join(deg, "a").localCheckpoint(true)
      ds.unpersist()
      // the final degree join must read the CHECKPOINTED edges, not `deg`:
      // deg's lineage runs through ds (just unpersisted), so referencing it
      // in the returned plan re-ran the entire shingle-pair graph build a
      // second time inside the timed action (r16 find — 5.9 -> ~4 s).
      // edges carries (a, deg_a) once per edge; distinct restores deg exactly
      val degC = edges.select(col("a"), col("deg_a")).distinct()
      // seed selection keys on the source's TRAILING digits, not a fixed
      // substring offset — the replica worlds prefix source names (r0src0),
      // and the positional parse cast-crashed there (r13 sf1 run; the d66
      // data-derived-fixture lesson)
      val seeds = docs.select(col("doc_id"),
        when(regexp_extract(col("source"), "(\\d+)$", 1).cast("int") % 4 === 0,
          lit(1)).otherwise(lit(0)).as("seed"))
      var t = seeds.withColumn("tr", col("seed").cast("long") * Scale)
        .localCheckpoint(true)
      // vacuity guard (the d49 lesson): a regeneration that drops the digit
      // suffix would make every row non-seed and the diffusion a green no-op;
      // both engines degrade to non-seed identically (Spark NULL cast,
      // DuckDB TRY_CAST), so a silent all-zero world is possible — refuse it
      require(t.agg(sum(col("seed"))).head.getLong(0) > 0,
        "d55 fixture vacuous: no seed sources (no trailing digits % 4 == 0)")
      // Rounds 1-2 PERSIST (lazy) instead of eager-checkpointing: each round
      // is consumed twice by the next (contrib side + outer join), which the
      // cache covers within the ONE job the round-3 eager checkpoint runs —
      // two checkpoint jobs and their materializations removed (guide §2.6:
      // actions are sequential only because the driver calls them; fold the
      // loop into one). Round 3 keeps the eager checkpoint so the returned
      // plan reads materialized blocks and the caches can be dropped here.
      val roundCaches = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
      (1 to 3).foreach { i =>
        val contrib = edges
          .join(t.select(col("doc_id").as("a"), col("tr").as("tr_a")), "a")
          .select(col("b").as("doc_id"), expr("tr_a div deg_a").as("c"))
          .groupBy(col("doc_id")).agg(sum(col("c")).as("c"))
        val next = t.join(contrib, Seq("doc_id"), "left")
          .select(col("doc_id"), col("seed"),
            expr("(tr + coalesce(c, 0L)) div 2").as("tr"))
        t = if (i < 3) { val c = next.persist(); roundCaches += c; c }
            else next.localCheckpoint(true)
      }
      roundCaches.foreach(_.unpersist()) // round 3 materialized through them
      t.join(degC.select(col("a").as("doc_id"), col("deg_a").as("degree")),
          Seq("doc_id"), "left")
        .select(col("doc_id"), col("seed"),
          coalesce(col("degree"), lit(0L)).as("degree"), col("tr").as("trust"))
        .orderBy(col("doc_id"))
    },
    Some {
      def round(prev: String, cur: String) =
        s"""$cur AS (SELECT n.doc_id, n.seed,
           |    (n.tr + coalesce(s.c, 0)) // 2 AS tr
           |  FROM $prev n LEFT JOIN (
           |    SELECT e.b AS doc_id, CAST(sum(t.tr // e.deg_a) AS BIGINT) AS c
           |    FROM edges e JOIN $prev t ON t.doc_id = e.a
           |    GROUP BY e.b) s USING (doc_id))""".stripMargin
      s"""WITH $shingleCte,
         |half AS (SELECT x.doc_id AS a, y.doc_id AS b
         |  FROM shc x JOIN shc y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |sym AS (SELECT a, b FROM half UNION ALL SELECT b, a FROM half),
         |deg AS (SELECT a, count(*) AS deg_a FROM sym GROUP BY a),
         |edges AS (SELECT s.a, s.b, d.deg_a FROM sym s JOIN deg d USING (a)),
         |t0 AS (SELECT doc_id,
         |    CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)$$', 1) AS INTEGER) % 4 = 0 THEN 1 ELSE 0 END AS seed,
         |    CAST(CASE WHEN TRY_CAST(regexp_extract(source, '(\\d+)$$', 1) AS INTEGER) % 4 = 0
         |              THEN 1000000 ELSE 0 END AS BIGINT) AS tr
         |  FROM documents),
         |${round("t0", "t1")},
         |${round("t1", "t2")},
         |${round("t2", "t3")}
         |SELECT t3.doc_id, t3.seed, coalesce(d.deg_a, 0) AS degree, t3.tr AS trust
         |FROM t3 LEFT JOIN deg d ON d.a = t3.doc_id
         |ORDER BY doc_id""".stripMargin
    },
    "graph trust propagation: fixed-point integer diffusion over the df-capped similarity graph, 3 unrolled rounds (LLM-pipeline op)")

  /** Cross-source content overlap from KMV sketches alone — "how much does
    * source A duplicate source B" answered WITHOUT ever joining the two
    * sources' shingles. One pass builds a ≤k-hash KMV sketch per source
    * (mergeable [[graft.functions.Sketches.KmvSketch]] — partial buffers
    * combine map-side, the shuffle carries one buffer per partition); all
    * pairwise estimates then come off the sketch relation (#sources rows):
    *
    *  - union size:   (k−1)/U_k over the merged pair sketch (KMV union is
    *    exact: min-k(A∪B) = min-k of the min-k's);
    *  - Jaccard:      |{h ∈ min-k(A∪B) : h ∈ A_k ∧ h ∈ B_k}| / k (the
    *    standard KMV intersection estimator);
    *  - intersection: Jaccard × union.
    *
    * Under-full sketches (|A∪B| < k) degrade to EXACT set arithmetic — the
    * sketch IS the set. At 100 TB this is the source-curation instrument:
    * per-source sketches are k hashes each, pairwise math touches
    * sources² · k strings, and the corpus is scanned exactly once. The
    * estimates are oracle-exact (rule: md5 dyadic rationals — U_k is m/2^32
    * both sides, every derived value one identical IEEE op chain).
    *
    * The pair join is a tiny theta self-join (src_a < src_b) over #sources
    * rows — broadcast nested loop by construction, nothing corpus-sized. */
  val d56 = QueryDef(
    "d56_cross_source_overlap",
    (spark, dir) => {
      val k = 64
      TextFunctions.registerNative(spark)
      val srcSh = Tables.documentsWide(spark, dir)
        .select(col("source"),
          explode(TextFunctions.wordShinglesNative(col("text"), 3)).as("shingle"))
      val sketch = udaf(new graft.functions.Sketches.KmvSketch(k),
        org.apache.spark.sql.Encoders.STRING)
      val sk = srcSh.select(col("source"), md5(col("shingle")).as("h"))
        .groupBy(col("source")).agg(sketch(col("h")).as("kmv"))
      val pairs = sk.select(col("source").as("src_a"), col("kmv").as("kmv_a"))
        .join(sk.select(col("source").as("src_b"), col("kmv").as("kmv_b")),
          col("src_a") < col("src_b"))
      val kD = lit(k.toDouble)
      pairs
        .withColumn("uni", array_sort(array_union(col("kmv_a"), col("kmv_b"))))
        .withColumn("uk", slice(col("uni"), 1, k))
        .withColumn("full", size(col("uni")) >= k)
        .withColumn("common", size(filter(col("uk"), x =>
          array_contains(col("kmv_a"), x) && array_contains(col("kmv_b"), x))))
        .withColumn("est_union",
          when(!col("full"), size(col("uni")).cast("double"))
            .otherwise(lit((k - 1).toDouble) /
              (conv(substring(element_at(col("uk"), k), 1, 8), 16, 10)
                .cast("long").cast("double") / lit(4294967296.0))))
        .withColumn("est_jaccard", col("common").cast("double") /
          when(col("full"), kD).otherwise(size(col("uni")).cast("double")))
        .withColumn("est_intersection", col("est_jaccard") * col("est_union"))
        .select(col("src_a"), col("src_b"), col("est_union"),
          col("est_jaccard"), col("est_intersection"))
        .orderBy(col("src_a"), col("src_b"))
    },
    Some {
      val nibbleSum = (1 to 8).map(i =>
        s"(strpos('0123456789abcdef', substr(uk[64], $i, 1)) - 1) / ${math.pow(16.0, i)}")
        .mkString(" + ")
      s"""WITH $rawShingleCte,
         |srcsh AS (SELECT DISTINCT d.source, s.shingle
         |          FROM sh s JOIN documents d USING (doc_id)),
         |h AS (SELECT source, md5(shingle) AS h FROM srcsh),
         |topk AS (SELECT source, h FROM h
         |         QUALIFY row_number() OVER (PARTITION BY source ORDER BY h) <= 64),
         |sk AS (SELECT source, list(h ORDER BY h) AS kmv FROM topk GROUP BY source),
         |p AS (SELECT a.source AS src_a, b.source AS src_b,
         |             a.kmv AS ka, b.kmv AS kb
         |      FROM sk a JOIN sk b ON a.source < b.source),
         |u AS (SELECT src_a, src_b, ka, kb,
         |             list_sort(list_distinct(flatten([ka, kb]))) AS uni FROM p),
         |c AS (SELECT src_a, src_b, ka, kb, uni,
         |             uni[1:64] AS uk,
         |             length(uni) >= 64 AS isfull FROM u),
         |e AS (SELECT src_a, src_b, uni, isfull,
         |             length([x for x in uk if list_contains(ka, x) AND list_contains(kb, x)]) AS common,
         |             CASE WHEN NOT isfull THEN CAST(length(uni) AS DOUBLE)
         |                  ELSE 63 / ($nibbleSum) END AS est_union
         |      FROM c)
         |SELECT src_a, src_b, est_union,
         |       CAST(common AS DOUBLE) /
         |         (CASE WHEN isfull THEN CAST(64 AS DOUBLE)
         |               ELSE CAST(length(uni) AS DOUBLE) END) AS est_jaccard,
         |       (CAST(common AS DOUBLE) /
         |         (CASE WHEN isfull THEN CAST(64 AS DOUBLE)
         |               ELSE CAST(length(uni) AS DOUBLE) END)) * est_union AS est_intersection
         |FROM e
         |ORDER BY src_a, src_b""".stripMargin
    },
    "cross-source overlap: pairwise union/Jaccard/intersection estimates from per-source KMV sketches, corpus scanned once (LLM-pipeline op)")

  /** PNG metadata scrub — the multimodal half of the PII story (d09/d38
    * scrub text; camera serials, GPS positions and author tags live in an
    * image's ANCILLARY chunks). Fixture PNGs are synthesized in-engine with
    * a deterministic number of `tEXt` metadata chunks spliced after IHDR
    * ([[graft.operators.PngCodec.withTextChunks]] — real chunk framing,
    * CRC32 and all), then scrubbed with
    * [[graft.operators.PngCodec.stripAncillary]], which keeps critical
    * chunks byte-identical. The row emits chunk counts, bytes removed, and
    * an ACTUAL decoded-pixel equality check; the oracle recomputes counts
    * and byte totals analytically from the generation formula and asserts
    * `pixels_unchanged = TRUE` — so a hash match proves the scrub removed
    * exactly the metadata chunks and nothing of the image.
    *
    * Scale: map-only over the media partition (media bytes never cross an
    * exchange — only the per-image stat row does); chunk surgery is a
    * single linear pass per image, no decode needed on the hot path (the
    * decode here is the verification, not the operator). */
  val m16 = QueryDef(
    "m16_png_metadata_scrub",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      ids.mapPartitions { it =>
        it.map { id =>
          val w = (id % 7 + 4).toInt; val h = (id % 5 + 4).toInt
          val pix = (x: Int, y: Int) => {
            val v = (((id + 3) * (x + 1) * (y + 2)) % 251).toInt
            (v, (v * 7) % 251, (v * 13) % 251)
          }
          val clean = graft.operators.PngCodec.encode(w, h, pix)
          val nMeta = (id % 4).toInt
          val entries = (0 until nMeta).map(j =>
            ("Comment", s"k$j=v${(id * 31 + j * 7) % 1000}"))
          val dirty = graft.operators.PngCodec.withTextChunks(clean, entries)
          val scrubbed = graft.operators.PngCodec.stripAncillary(dirty)
          val pixOk = graft.operators.PngCodec.decode(dirty).pixels
            .sameElements(graft.operators.PngCodec.decode(scrubbed).pixels)
          (id, graft.operators.PngCodec.chunks(dirty).length,
            graft.operators.PngCodec.chunks(scrubbed).length,
            (dirty.length - scrubbed.length).toLong, pixOk)
        }
      }.toDF("media_id", "n_chunks_before", "n_chunks_after",
          "meta_bytes_removed", "pixels_unchanged")
        .orderBy(col("media_id"))
    },
    Some("""SELECT doc_id AS media_id,
           |  CAST(3 + doc_id % 4 AS INT) AS n_chunks_before,
           |  CAST(3 AS INT) AS n_chunks_after,
           |  CAST(coalesce(list_sum(
           |    [24 + length(CAST((doc_id*31 + j*7) % 1000 AS VARCHAR))
           |     for j in range(0, doc_id % 4)]), 0) AS BIGINT) AS meta_bytes_removed,
           |  TRUE AS pixels_unchanged
           |FROM documents ORDER BY media_id""".stripMargin),
    "PNG metadata scrub: ancillary-chunk PII removal with byte-exact accounting, pixels pinned unchanged (multimodal PII op)")

  /** TOKENIZER VOCAB-UTILIZATION AUDIT — the report you run before shipping
    * a tokenizer: for every trained merge (= every multi-char vocabulary
    * entry), how many tokens in the corpus's final encoded stream actually
    * ARE that entry? Entries with zero uses are dead weight — each one is a
    * wasted embedding-matrix row in the model — and a merge can be dead
    * even though training counted it frequent, because a LATER merge
    * swallows every occurrence (e.g. a product that only ever appears as
    * the left side of a higher-rank merge). That's why utilization must be
    * measured on the ENCODED OUTPUT, not read off the training counts —
    * and why this is a distinct op from d44 (training) and d47 (fertility).
    *
    * Scale: one native-BPE pass over the corpus (d36's map-only profile),
    * one token-keyed count collapsed to ≤ vocab-size rows, then a
    * broadcast-sized join against the BpeMerges.pairs-sized merge table
    * (60 entries today). Oracle replays
    * the same merges (d36's recursive CTE) and right-joins the identical
    * literal vocabulary. */
  val d57 = QueryDef(
    "d57_vocab_utilization",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      import spark.implicits._
      val products = graft.functions.BpeMerges.pairs.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a + b) }
        .toDF("merge_rank", "token")
      val uses = Tables.documentsWide(spark, dir)
        .select(explode(TextFunctions.bpeTokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("uses"))
      products.join(uses, Seq("token"), "left")
        .select(col("merge_rank"), col("token"),
          coalesce(col("uses"), lit(0L)).as("uses"),
          (coalesce(col("uses"), lit(0L)) > 0).as("used"))
        .orderBy(col("merge_rank"))
    },
    Some {
      val prods = graft.functions.BpeMerges.pairs
        .map { case (a, b) => s"'${a + b}'" }.mkString("[", ", ", "]")
      s"""WITH RECURSIVE $bpeCte,
         |toks AS (SELECT unnest(syms) AS token FROM fin),
         |cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS uses FROM toks GROUP BY token),
         |vocab AS (SELECT CAST(p.r AS INTEGER) AS merge_rank, p.t AS token FROM (
         |  SELECT unnest([{'r': i, 't': prods[i]}
         |    for i in generate_series(1, len(prods))]) AS p
         |  FROM (SELECT $prods AS prods)) ),
         |j AS (SELECT v.merge_rank, v.token, coalesce(c.uses, 0) AS uses
         |  FROM vocab v LEFT JOIN cnt c USING (token))
         |SELECT merge_rank, token, uses, uses > 0 AS used FROM j ORDER BY merge_rank""".stripMargin
    },
    "tokenizer vocab-utilization audit: per-merge usage counts on the encoded stream, dead-entry detection (LLM-pipeline op)")

  /** DOMAIN-ADAPTED TOKENIZER COMPACTION (d58) — the follow-up d57's
    * finding demands, with a twist the implementation surfaced: on the
    * TRAINING corpus every "dead" product is a live merge's ancestor (it
    * fires as an intermediate), so the full-corpus prune is empty — the
    * compaction verb bites when the corpus-trained tokenizer is DEPLOYED
    * on a narrower domain (here the event-stream vocabulary: five event
    * types, which fire only a handful of the 60 merges). The prune keeps
    * the domain's LIVE products plus their ancestor closure
    * ([[graft.functions.BpeMerges.pruneToLive]] — a dead merge can still
    * fire as an intermediate, so naive unused-dropping would break its
    * consumers; the closure is the survivable cut), re-encodes the domain
    * with the pruned table ([[graft.functions.BpeEncodeWithExpr]], the
    * deployable custom-table path) and `require`s the encoded stream
    * BYTE-IDENTICAL — the proof the dropped entries were unreachable from
    * this domain, at whatever SF the row runs. Output is the compaction
    * audit: per merge, occurrence-weighted usage and the keep decision —
    * each dropped entry is an embedding-matrix row the deployed model
    * never needs. The oracle independently recomputes BOTH: usage by
    * replaying d36's recursive encode over the domain, the keep set by a
    * recursive reachability closure over the literal merge-dependency
    * edges — so the hash pins the closure logic itself, and BpePruneSpec
    * pins the byte-identity equivalence (and that the naive prune is NOT
    * an identity).
    *
    * Scale: the domain's distinct strings are dictionary-sized (encode
    * once, weight by one keyed count over the stream — the event scan
    * never carries tokens), the collect is vocab-bounded (d44 class), and
    * the closure is a driver fold over a 60-entry table. */
  val d58 = QueryDef(
    "d58_vocab_pruned_retrain",
    (spark, dir) => {
      TextFunctions.registerNative(spark)
      import spark.implicits._
      val allProducts = graft.functions.BpeMerges.pairs
        .map { case (a, b) => a + b }.toSet
      // occurrence-weighted token usage over the deployment domain: encode
      // each DISTINCT event type once, weight by its stream frequency
      val tyCnt = Tables.events(spark, dir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        .localCheckpoint(true) // ≤ #event-types rows; consumed twice below
      val uses = tyCnt
        .select(col("n"), explode(TextFunctions.bpeTokens(col("event_type"))).as("token"))
        .groupBy(col("token")).agg(sum(col("n")).as("uses"))
        .localCheckpoint(true) // consumed twice: live collect + audit join
      val live = uses.filter(length(col("token")) > 1)
        .select(col("token")).collect().map(_.getString(0)).toSet
        .intersect(allProducts)
      val pruned = graft.functions.BpeMerges.pruneToLive(live)
      require(pruned.nonEmpty &&
          pruned.size < graft.functions.BpeMerges.pairs.size,
        s"compaction vacuous: kept ${pruned.size} of " +
          s"${graft.functions.BpeMerges.pairs.size} merges")
      // byte-identity of the encoded domain under the pruned table — the
      // compaction's correctness proof (distinct strings; pure function)
      val mismatches = tyCnt.select(
          concat_ws(" ", TextFunctions.bpeTokens(col("event_type"))).as("s_full"),
          concat_ws(" ", TextFunctions.bpeTokensWith(col("event_type"), pruned))
            .as("s_pruned"))
        .filter(col("s_full") =!= col("s_pruned")).count()
      require(mismatches == 0,
        s"compacted tokenizer changed the encoding of $mismatches domain strings")
      val keptSet = pruned.map { case (a, b) => a + b }.toSet
      val audit = graft.functions.BpeMerges.pairs.zipWithIndex
        .map { case ((a, b), i) =>
          (i + 1, a + b, live.contains(a + b), keptSet.contains(a + b))
        }.toDF("merge_rank", "token", "used", "kept")
      audit.join(uses, Seq("token"), "left")
        .select(col("merge_rank"), col("token"),
          coalesce(col("uses"), lit(0L)).as("uses"), col("used"), col("kept"))
        .orderBy(col("merge_rank"))
    },
    Some {
      val mLit = graft.functions.BpeMerges.pairs.zipWithIndex
        .map { case ((a, b), i) => s"{'r': ${i + 1}, 'a': '$a', 'b': '$b'}" }
        .mkString("[", ", ", "]")
      val domain = "(SELECT DISTINCT event_type AS doc_id, event_type AS text FROM events)"
      s"""WITH RECURSIVE ${bpeCteOver(domain)},
         |tycnt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY event_type),
         |toks AS (SELECT doc_id AS event_type, unnest(syms) AS token FROM fin),
         |cnt AS (SELECT token, CAST(sum(n) AS BIGINT) AS uses
         |  FROM toks JOIN tycnt USING (event_type) GROUP BY token),
         |m AS (SELECT CAST(x.r AS INTEGER) AS merge_rank, x.a AS a, x.b AS b,
         |    x.a || x.b AS token
         |  FROM (SELECT unnest($mLit) AS x)),
         |live AS (SELECT token FROM m WHERE token IN (SELECT token FROM cnt)),
         |edge AS (SELECT token AS src, a AS dst FROM m WHERE length(a) > 1
         |  UNION ALL SELECT token, b FROM m WHERE length(b) > 1),
         |reach AS (WITH RECURSIVE rr(t) AS (
         |    SELECT token FROM live
         |    UNION
         |    SELECT e.dst FROM rr JOIN edge e ON e.src = rr.t)
         |  SELECT t FROM rr)
         |SELECT merge_rank, m.token, coalesce(c.uses, 0) AS uses,
         |  m.token IN (SELECT token FROM live) AS used,
         |  m.token IN (SELECT t FROM reach) AS kept
         |FROM m LEFT JOIN cnt c ON c.token = m.token
         |ORDER BY merge_rank""".stripMargin
    },
    "domain-adapted tokenizer compaction: live products + ancestor closure kept for the event-type domain, encode output required byte-identical (LLM-pipeline op)")

  /** TRAINING CURRICULUM ORDER (d59) — the deterministic data-ordering
    * verb: schedule the corpus easy→hard by the d45 fluency signal while
    * INTERLEAVING sources, so early training sees fluent text without
    * domain clumping (curriculum learning + the anti-clumping shuffle real
    * pretraining runs bake into their data order). Per SOURCE: rank by
    * (fluency DESC, doc_id), cut into 4 rank-exact quartile buckets
    * (`(rn−1)·4 div ns` — integer arithmetic, the d50 discipline, no
    * interpolated thresholds); the schedule key is then (bucket,
    * within-bucket round, source) — bucket-major, sources rotating within
    * each bucket.
    *
    * Scale shape: every window is PARTITIONED BY source (parallel per
    * source; a celebrity source is the d22/q35 salting case). The
    * (bucket, round, source, doc_id) key IS the schedule — at 100 TB the
    * writer range-partition-sorts by it and positions are implicit in the
    * written order; the explicit global `position` here is presentation
    * for the verified row (one ≤corpus window, same class as every
    * ORDER BY the gate already requires). */
  val d59 = QueryDef(
    "d59_curriculum_order",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
      val docs = Tables.documentsWide(spark, dir)
      val (cbT, cpT) = lmCounts(docs)
      val scored = lmScore(docs, cbT, cpT).select(col("doc_id"), col("fluency"))
      val wS = w.partitionBy(col("source")).orderBy(col("fluency").desc, col("doc_id"))
      val wN = w.partitionBy(col("source"))
      val keyed = docs.select(col("doc_id"), col("source"))
        .join(scored, Seq("doc_id"))
        .withColumn("rn", row_number().over(wS))
        .withColumn("ns", count(lit(1)).over(wN))
        .withColumn("bucket", expr("((rn - 1) * 4) div ns").cast("int"))
      val wB = w.partitionBy(col("source"), col("bucket")).orderBy(col("rn"))
      keyed.withColumn("rnd", row_number().over(wB))
        .withColumn("position", row_number().over(
          w.orderBy(col("bucket"), col("rnd"), col("source"), col("doc_id"))))
        .select(col("position"), col("doc_id"), col("source"), col("bucket"),
          col("fluency"))
        .orderBy(col("position"))
    },
    Some("""WITH toks AS (SELECT doc_id,
           |    CASE WHEN length(trim(text)) = 0 THEN []
           |         ELSE string_split_regex(trim(text), '\s+') END AS w FROM documents),
           |bg AS (SELECT doc_id, x.pos AS pos, x.w1 AS w1, x.w2 AS w2 FROM (
           |    SELECT doc_id, unnest([{'pos': i, 'w1': w[i], 'w2': w[i+1]}
           |      for i in generate_series(1, len(w)-1)]) AS x FROM toks)),
           |cb AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS cb FROM bg GROUP BY 1, 2),
           |cp AS (SELECT w1, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY 1),
           |p AS (SELECT bg.doc_id, bg.pos, CAST(cb.cb AS DOUBLE) / cp.cp AS p
           |  FROM bg JOIN cb ON cb.w1 = bg.w1 AND cb.w2 = bg.w2
           |  JOIN cp ON cp.w1 = bg.w1),
           |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
           |    list_sum(list(p ORDER BY pos)) AS s FROM p GROUP BY doc_id),
           |scored AS (SELECT d.doc_id, d.source, coalesce(a.s / a.n_bigrams, 0.0) AS fluency
           |  FROM documents d LEFT JOIN agg a USING (doc_id)),
           |j AS (SELECT doc_id, source, fluency,
           |    row_number() OVER (PARTITION BY source ORDER BY fluency DESC, doc_id) AS rn,
           |    count(*) OVER (PARTITION BY source) AS ns
           |  FROM scored),
           |k AS (SELECT *, CAST(((rn - 1) * 4) // ns AS INTEGER) AS bucket FROM j),
           |r AS (SELECT *, row_number() OVER (PARTITION BY source, bucket ORDER BY rn) AS rnd FROM k)
           |SELECT CAST(row_number() OVER (ORDER BY bucket, rnd, source, doc_id) AS INTEGER) AS position,
           |  doc_id, source, bucket, fluency
           |FROM r ORDER BY position""".stripMargin),
    "training curriculum order: easy-to-hard by fluency, rank-exact quartile buckets, sources interleaved within each bucket (LLM-pipeline op)")

  /** TOKEN PROVENANCE / loss-spike forensics (d60) — the training-ops
    * inverse of d16's packing: a loss spike at training step S names a
    * token interval in the packed stream, and the on-call question is
    * "WHICH DOCUMENTS fed those tokens". The packed-stream index is d16's
    * per-source cumulative layout (doc spans `[doc_end − n_tokens,
    * doc_end)` in (source, doc_id) order); probes are three hash-derived
    * 512-token windows per source (deterministic md5 offsets — exact
    * int64 both engines via the strpos nibble-decode mirror, which
    * avoids the `'0x'||hex` string cast that proved DuckDB-version
    * sensitive in the r10 driver run); the
    * answer is the interval join probe × span with the per-doc overlap
    * width.
    *
    * Shape at 100 TB: probes are O(#sources) rows — broadcast; the corpus
    * index is computed with ONE window pass per source (d16's shuffle) and
    * never re-shuffled for the lookup. A standing deployment materializes
    * the span index once per packing run and serves every spike lookup
    * from it. */
  val d60 = QueryDef(
    "d60_token_provenance",
    (spark, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val idx = Tables.documentsWide(spark, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
        .withColumn("doc_end", sum(col("n_tokens")).over(w))
        .withColumn("doc_start", col("doc_end") - col("n_tokens"))
      val probes = idx.groupBy(col("source")).agg(max(col("doc_end")).as("total"))
        .select(col("source").as("p_source"), col("total"),
          explode(array(lit(0), lit(1), lit(2))).as("probe_id"))
        .withColumn("probe_start", expr(
          "cast(conv(substring(md5(concat(p_source, ':', probe_id)), 1, 8), 16, 10) as bigint) % total"))
        .withColumn("probe_end", least(col("probe_start") + 512, col("total")))
        .select(col("p_source"), col("probe_id"), col("probe_start"), col("probe_end"))
      idx.join(broadcast(probes),
          col("source") === col("p_source") &&
          col("doc_start") < col("probe_end") && col("doc_end") > col("probe_start"))
        .select(col("source"), col("probe_id"), col("probe_start"), col("doc_id"),
          (least(col("doc_end"), col("probe_end")) -
            greatest(col("doc_start"), col("probe_start"))).as("overlap_tokens"))
        .orderBy(col("source"), col("probe_id"), col("doc_id"))
    },
    Some(s"""WITH $tokCte,
            |t AS (SELECT doc_id, CAST(length(w) AS BIGINT) AS n_tokens FROM toks),
            |idx AS (SELECT d.source, d.doc_id, t.n_tokens,
            |  CAST(sum(t.n_tokens) OVER (PARTITION BY d.source ORDER BY d.doc_id
            |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS doc_end
            |  FROM documents d JOIN t USING (doc_id)),
            |idx2 AS (SELECT *, doc_end - n_tokens AS doc_start FROM idx),
            |tot AS (SELECT source, CAST(max(doc_end) AS BIGINT) AS total
            |  FROM idx GROUP BY source),
            |ph AS (SELECT source, probe_id, total,
            |    md5(source || ':' || CAST(probe_id AS VARCHAR)) AS h
            |  FROM tot, (SELECT unnest([0, 1, 2]) AS probe_id)),
            |pr AS (SELECT source, probe_id, total,
            |    ( (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 268435456
            |    + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) * 16777216
            |    + (strpos('0123456789abcdef', substr(h, 3, 1)) - 1) * 1048576
            |    + (strpos('0123456789abcdef', substr(h, 4, 1)) - 1) * 65536
            |    + (strpos('0123456789abcdef', substr(h, 5, 1)) - 1) * 4096
            |    + (strpos('0123456789abcdef', substr(h, 6, 1)) - 1) * 256
            |    + (strpos('0123456789abcdef', substr(h, 7, 1)) - 1) * 16
            |    + (strpos('0123456789abcdef', substr(h, 8, 1)) - 1) ) % total
            |      AS probe_start
            |  FROM ph),
            |-- DuckDB promotes integer sum()/window-sum (and anything derived
            |-- from it) to HUGEINT -> Arrow decimal128(38,0); Spark emits int64.
            |-- CAST every sum-derived column back to BIGINT (oracle rule 2).
            |pr2 AS (SELECT source, probe_id, probe_start,
            |    least(probe_start + 512, total) AS probe_end FROM pr)
            |SELECT i.source, p.probe_id,
            |  CAST(p.probe_start AS BIGINT) AS probe_start, i.doc_id,
            |  CAST(least(i.doc_end, p.probe_end) - greatest(i.doc_start, p.probe_start)
            |    AS BIGINT) AS overlap_tokens
            |FROM idx2 i JOIN pr2 p ON i.source = p.source
            |  AND i.doc_start < p.probe_end AND i.doc_end > p.probe_start
            |ORDER BY i.source, p.probe_id, i.doc_id""".stripMargin),
    "token provenance (loss-spike forensics): hash-derived probe windows over the packed stream interval-joined back to source documents — broadcast probes, one window pass, no corpus re-shuffle")

  /** TOKEN-BUDGET MIXTURE PLANNING (d61) — the data-recipe computation a
    * training run starts from (the LLaMA/Pile pattern): given per-source
    * TOKEN counts, temperature weights (√tokens — sqrt is IEEE-exact, so no
    * libm pow divergence), and a total token budget, derive each source's
    * target tokens, its EPOCH factor (how many passes over the source the
    * target implies), cap over-sampled sources at an epoch ceiling, and
    * redistribute the capped shortfall to the uncapped sources in one pass.
    * The epoch cap is DATA-derived (midpoint of the observed epoch range)
    * so both the capped and uncapped branches are `require`d non-empty at
    * every SF (the d49 lesson, again). d26 plans a DOC-count quota by
    * temperature; this is the token-denominated successor with the epoch
    * semantics real data recipes publish.
    *
    * Float discipline: every cross-source total is a SOURCE-ORDERED driver
    * fold over the bounded per-source stats (the d26 mirrorable class) ≡
    * DuckDB `list_sum(list(x ORDER BY source))`; the SQL folds a 0.0 for
    * capped sources where Scala folds the filtered subset — `+0.0` is the
    * IEEE identity, so the partials coincide. Per-source arithmetic stays
    * unrounded (rule 3). Scale: one corpus aggregation (token counts per
    * source); the plan itself is O(#sources) driver rows. */
  /** d61's plan restated in DuckDB, shared by d61/d62's oracles: ends in
    * `plan(source, tokens, epochs, capped, final_tokens)`. */
  private val d61PlanCte =
    s"""$tokCte,
       |c AS (SELECT d.source, CAST(sum(length(t.w)) AS BIGINT) AS tokens
       |      FROM toks t JOIN documents d USING (doc_id) GROUP BY d.source),
       |b AS (SELECT (SELECT sum(tokens) FROM c) * 3 // 2 AS bud),
       |w AS (SELECT source, tokens, sqrt(CAST(tokens AS DOUBLE)) AS wt FROM c),
       |tot AS (SELECT list_sum(list(wt ORDER BY source)) AS bw FROM w),
       |e AS (SELECT source, tokens, wt, bud * wt / bw AS tk,
       |             (bud * wt / bw) / tokens AS epochs
       |      FROM w, tot, b),
       |cap AS (SELECT (min(epochs) + max(epochs)) / 2 AS emax FROM e),
       |c2 AS (SELECT e.*, epochs > emax AS capped,
       |         CASE WHEN epochs > emax THEN emax * tokens ELSE tk END AS fin
       |       FROM e, cap),
       |agg AS (SELECT list_sum(list(fin ORDER BY source)) AS spent,
       |          list_sum(list(CASE WHEN capped THEN CAST(0 AS DOUBLE) ELSE wt END
       |            ORDER BY source)) AS wu
       |        FROM c2),
       |plan AS (SELECT source, tokens, epochs, capped,
       |  CAST(floor(CASE WHEN capped THEN fin
       |             ELSE fin + (bud - spent) * wt / wu END) AS BIGINT) AS final_tokens
       |FROM c2, agg, b)""".stripMargin

  /** d61's plan fold, shared with d62's executor: per source —
    * (source, tokens, epochs, capped, final_tokens). Driver-side over
    * |sources| bounded stats; every cross-source total folds in sorted
    * source order (the d26 mirrorable class). */
  private def tokenBudgetPlan(spark: org.apache.spark.sql.SparkSession,
                              dir: String): Seq[(String, Long, Double, Boolean, Long)] = {
    val perSource = Tables.documentsWide(spark, dir)
      .groupBy(col("source"))
      .agg(sum(TextFunctions.tokenCount(col("text"))).as("tokens"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val budget = perSource.foldLeft(0L)(_ + _._2) * 3L / 2L
    val w = perSource.map { case (s, t) => (s, t, math.sqrt(t.toDouble)) }
    val bigW = w.foldLeft(0.0)(_ + _._3)
    val tgt = w.map { case (s, t, wt) => (s, t, wt, budget * wt / bigW) }
    val epochs = tgt.map { case (_, t, _, tk) => tk / t }
    val eMax = (epochs.min + epochs.max) / 2.0
    require(epochs.exists(_ > eMax) && epochs.exists(_ <= eMax),
      "d61 epoch cap must split the sources — both branches live (d49 lesson)")
    val capped = tgt.map { case (s, t, wt, tk) =>
      val e = tk / t
      val isCapped = e > eMax
      (s, t, wt, e, isCapped, if (isCapped) eMax * t else tk)
    }
    val spent = capped.foldLeft(0.0)(_ + _._6)
    val leftover = budget - spent
    val wUncapped = capped.filter(!_._5).foldLeft(0.0)(_ + _._3)
    capped.map { case (s, t, wt, e, isCapped, fin) =>
      val fin2 = if (isCapped) fin else fin + leftover * wt / wUncapped
      (s, t, e, isCapped, math.floor(fin2).toLong)
    }.toSeq
  }

  val d61 = QueryDef(
    "d61_token_budget_mix",
    (spark, dir) => {
      import spark.implicits._
      tokenBudgetPlan(spark, dir)
        .toDF("source", "tokens", "epochs", "capped", "final_tokens")
        .orderBy(col("source"))
    },
    Some(s"""WITH $d61PlanCte
            |SELECT source, tokens, epochs, capped, final_tokens
            |FROM plan ORDER BY source""".stripMargin),
    "token-budget mixture planning: temperature weights, epoch caps, one-pass shortfall redistribution (LLM-pipeline op)")

  /** MIXTURE-PLAN EXECUTION (d62) — materialize d61's token budgets into
    * the actual sampling manifest a data loader consumes: per source, the
    * budget buys `n_full = budget // tokens` FULL epochs plus a PARTIAL
    * epoch of `rem = budget - n_full·tokens` tokens, filled greedily in a
    * deterministic md5 order (epoch-varying-free — the d39/d10
    * engine-portable draw): a doc joins the partial pass iff the cumulative
    * token count BEFORE it is still under `rem`. Emits one manifest row per
    * sampled doc with its copy count — the executable form of the recipe
    * (n_copies = epochs seen in training). All arithmetic after the plan's
    * floor is exact int64 (budgets, cumsums, comparisons), so the manifest
    * is bit-reproducible across engines.
    *
    * Scale: one broadcast of the O(#sources) plan, one corpus-wide window
    * (per-source ordered prefix sum — range-partition + offset at 100 TB,
    * the d16 packing shape); no shuffle carries text. */
  val d62 = QueryDef(
    "d62_mixture_execute",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.expressions.Window
      val plan = tokenBudgetPlan(spark, dir)
      val planDf = plan.map { case (s, t, _, _, fin) => (s, t, fin) }
        .toDF("source", "src_tokens", "budget")
      val docs = Tables.documentsWide(spark, dir)
        .select(col("source"), col("doc_id"),
          TextFunctions.tokenCount(col("text")).as("tok"),
          md5(concat(col("doc_id").cast("string"), lit(":d62"))).as("h"))
      val cumBefore = sum(col("tok")).over(
        Window.partitionBy(col("source")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, -1))
      val manifest = docs.join(broadcast(planDf), "source")
        .withColumn("n_full", expr("budget div src_tokens"))
        .withColumn("rem", col("budget") - col("n_full") * col("src_tokens"))
        .withColumn("cum_before", coalesce(cumBefore, lit(0L)))
        .withColumn("n_copies",
          col("n_full") + when(col("cum_before") < col("rem"), 1L).otherwise(0L))
        .filter(col("n_copies") > 0)
        .select(col("source"), col("doc_id"), col("n_copies"))
      // vacuity guards: full epochs AND a live partial pass must both occur
      require(plan.exists { case (_, t, _, _, fin) => fin / t >= 1 },
        "d62: no source affords a full epoch — manifest degenerates")
      require(plan.exists { case (_, t, _, _, fin) => fin % t > 0 },
        "d62: every budget is an exact epoch multiple — partial pass dead")
      manifest.orderBy(col("source"), col("doc_id"))
    },
    Some(s"""WITH $d61PlanCte,
            |doc AS (SELECT d.source, d.doc_id, length(t.w) AS tok,
            |               md5(CAST(d.doc_id AS VARCHAR) || ':d62') AS h
            |        FROM toks t JOIN documents d USING (doc_id)),
            |j AS (SELECT doc.*, plan.final_tokens // plan.tokens AS n_full,
            |             plan.final_tokens - (plan.final_tokens // plan.tokens)
            |               * plan.tokens AS rem
            |      FROM doc JOIN plan USING (source)),
            |pre AS (SELECT *, coalesce(sum(tok) OVER (PARTITION BY source ORDER BY h
            |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
            |        FROM j)
            |SELECT source, doc_id,
            |       n_full + CASE WHEN cumb < rem THEN 1 ELSE 0 END AS n_copies
            |FROM pre
            |WHERE n_full + CASE WHEN cumb < rem THEN 1 ELSE 0 END > 0
            |ORDER BY source, doc_id""".stripMargin),
    "mixture-plan execution: per-source full epochs + md5-ordered greedy partial pass to the exact token budget, one manifest row per sampled doc (LLM-pipeline op)")

  /** COUNT-MIN SKETCH heavy-hitter frequencies (d63) — the streaming-
    * frequency sketch the sketch family lacked (q30 KMV = distincts, q39
    * HLL = cardinality; this = per-item counts): D=4 md5-derived hash rows
    * × W data-derived counters (w = max(16, vocab/2) from one corpus
    * probe, so collisions AND exact estimates stay live at every SF —
    * r13; identity w=16 at sf≤0.1), estimate(token) = min over rows of its counter.
    * The sketch is built from the RAW token stream — `groupBy(i, bucket)`
    * over the exploded hashes collapses map-side to ≤ D·W = 64 cells
    * per partition, so the shuffle carries the SKETCH, never the vocab:
    * exactly why CMS exists at 100 TB, where the exact per-token
    * aggregation below (kept here as the oracle's ground truth and error
    * column) is unboundable. All counters exact int64, both engines
    * agree bit-for-bit. The CMS one-sided guarantee (estimate ≥ truth,
    * never under) is `require`d row-by-row, and the W/D choice was
    * checked against BOTH SFs' vocab before freezing (the d49 lesson):
    * overestimates AND exact estimates both occur at both scales, so the
    * hash pins real collision behavior, not a vacuous layout. */
  /** CMS geometry shared by d63 (batch) and s43 (streaming maintenance).
    * The WIDTH is DATA-DERIVED (rule 12): `w = max(16, vocab // 2)` from a
    * corpus probe — the provisioning step a deployed CMS runs anyway. A
    * frozen W=16 went all-collided at the 10× replica vocab and the
    * vacuity guard correctly refused the layout (r13 sf1 run); load factor
    * ~2 keeps BOTH collided and exact estimates live at every SF.
    * Identity at sf≤0.1 (vocab 31 → w=16), so driver hashes are unchanged. */
  private[queries] val CmsDepth = 4

  /** Sketch width for a document corpus — ONE bounded driver probe; the
    * geometry must be frozen before any cells are built (s43 computes it
    * once before the stream starts: additivity needs one geometry). */
  private[queries] def cmsWidthFor(docs: DataFrame): Long =
    math.max(16L, tokenStream(docs).select(col("tok")).distinct().count() / 2)

  /** Hash-row bucket of `tok` under row `i` — md5-derived so DuckDB
    * mirrors it exactly (rule 4). */
  private[queries] def cmsBucket(i: Column, tok: Column, w: Long): Column =
    conv(substring(md5(concat(i.cast("string"), lit(":"), tok)), 1, 8),
      16, 10).cast("long") % w

  /** The exploded hash-row index 0..D-1. */
  private[queries] def cmsRows: Column =
    explode(array((0 until CmsDepth).map(i => lit(i)): _*)).as("i")

  /** Raw token stream of `docs` (non-empty tokens). */
  private[queries] def tokenStream(docs: DataFrame): DataFrame = docs
    .select(explode(TextFunctions.tokens(col("text"))).as("tok"))
    .filter(length(col("tok")) > 0)

  /** CMS cells (i, b, c) of a token stream — map-side combinable to
    * ≤ D·W rows per partition. */
  private[queries] def cmsCells(toks: DataFrame, w: Long): DataFrame =
    toks.select(col("tok"), cmsRows)
      .withColumn("b", cmsBucket(col("i"), col("tok"), w))
      .groupBy("i", "b").agg(count(lit(1)).as("c"))

  /** (token, true_cnt, est_cnt, overcount) from a cell relation + ground
    * truth, with the CMS invariants `require`d (one-sided bound; both
    * collided and exact estimates live — the width derivation keeps that
    * true at every SF). */
  private[queries] def cmsEstimates(tc: DataFrame, cells: DataFrame,
                                    w: Long): DataFrame = {
    val est = tc.select(col("tok"), cmsRows)
      .withColumn("b", cmsBucket(col("i"), col("tok"), w))
      .join(cells, Seq("i", "b"))
      .groupBy("tok").agg(min(col("c")).as("est_cnt"))
    val out = tc.join(est, "tok")
      .select(col("tok").as("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))
      .localCheckpoint(true)
    require(out.filter(col("overcount") < 0).isEmpty,
      "CMS one-sided bound violated: an estimate fell below the truth")
    require(!out.filter(col("overcount") > 0).isEmpty &&
        !out.filter(col("overcount") === 0).isEmpty,
      "CMS layout vacuous: need both collided and exact estimates live")
    out.orderBy(col("token"))
  }

  /** The full CMS computation restated in DuckDB — shared verbatim by d63
    * and s43 (the streaming drain is pinned EQUAL to the batch sketch:
    * CMS cells are additive, so per-batch partials summed ≡ one pass).
    * The width is the SAME data-derived scalar (`wv`), and — because the
    * modulus is now data-derived — the hex prefix decodes via
    * strpos-nibble arithmetic, never `CAST('0x'|| … )` (rule 4: that
    * construct diverged on the driver's DuckDB exactly when piped
    * through `%` of a data-derived BIGINT). */
  private[queries] val cmsOracleSql: String = {
    def dec8(expr: String) = (1 to 8).map(i =>
      s"(strpos('0123456789abcdef', substr($expr, $i, 1)) - 1) * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")
    val h = dec8("md5(CAST(i AS VARCHAR) || ':' || tok)")
    s"""WITH $tokCte,
       |ex AS (SELECT unnest(w) AS tok FROM toks),
       |ex2 AS (SELECT tok FROM ex WHERE length(tok) > 0),
       |wv AS (SELECT greatest(16, count(DISTINCT tok) // 2) AS w FROM ex2),
       |hij AS (SELECT tok, i, $h % (SELECT w FROM wv) AS b
       |  FROM ex2 CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) _i),
       |cells AS (SELECT i, b, CAST(count(*) AS BIGINT) AS c FROM hij GROUP BY i, b),
       |tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS true_cnt FROM ex2 GROUP BY tok),
       |th AS (SELECT tok, true_cnt, i, $h % (SELECT w FROM wv) AS b
       |  FROM tc CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) _i),
       |est AS (SELECT th.tok, CAST(min(cells.c) AS BIGINT) AS est_cnt
       |        FROM th JOIN cells USING (i, b) GROUP BY th.tok)
       |SELECT t.tok AS token, t.true_cnt, e.est_cnt,
       |       e.est_cnt - t.true_cnt AS overcount
       |FROM tc t JOIN est e ON t.tok = e.tok
       |ORDER BY token""".stripMargin
  }

  val d63 = QueryDef(
    "d63_heavy_hitters_cms",
    (spark, dir) => {
      // documentsWide: tokenization + cell hashing are the map-side cost
      // (both the sketch and the width probe tokenize the corpus; r15)
      val docs = Tables.documentsWide(spark, dir)
      val w = cmsWidthFor(docs)
      val toks = tokenStream(docs)
      // ground truth (vocab-bounded HERE; at open vocab only the sketch
      // survives — truth exists for the oracle's error column)
      val tc = toks.groupBy("tok").agg(count(lit(1)).as("true_cnt"))
        .localCheckpoint(true)
      cmsEstimates(tc, cmsCells(toks, w), w)
    },
    Some(cmsOracleSql),
    "count-min sketch token frequencies: 4x16 md5-derived counters built map-side from the raw stream, min-over-rows estimates, one-sided bound required row-by-row (LLM-pipeline sketch op)")

  /** FUSED MULTIMODAL NEAR-DUP (m17) — cross-modal evidence voting, the
    * fusion step video-platform dedup runs on top of per-modality
    * fingerprints: a pair is a duplicate when ≥2 of 3 modalities agree
    * (single-modality matches are noise: re-dubbed videos share frames but
    * not audio; re-cut videos share audio but not frames). Fixture: m04's
    * image groups verbatim (SHARED cache prefix — one encode serves both
    * rows); audio is m06's with ids ≡ 1 (mod 3) carrying a FOREIGN group's
    * soundtrack (gid + 10⁶ — the re-dub), video m07's with ids ≡ 2 (mod 3)
    * re-cut the same way. Within a group of 4 the vote therefore spans all
    * three outcomes: same-residue pairs vote 3, {0,1}/{0,2} pairs vote 2
    * (kept), {1,2} pairs vote 1 (dropped) — `require`d non-vacuous both
    * ways. All three candidate sets come from pigeonhole chunk joins
    * (never all-pairs) and media bytes never cross a shuffle; the fusion
    * itself joins (id, id) pairs only. Oracle: the three analytic
    * fingerprint pipelines prefixed into one WITH clause + the same
    * full-outer vote. */
  val m17 = QueryDef(
    "m17_fused_modal_neardup",
    (spark, dir) => {
      import spark.implicits._
      val ids = Tables.documents(spark, dir).select(col("doc_id")).as[Long]
      val img = ids.mapPartitions { it =>
        it.map { id =>
          val gid = id / 4
          val w = (gid % 9 + 6).toInt; val h = (gid % 5 + 8).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, graft.operators.BmpCodec.encode(w, h, (x, y) => {
            val sp = if (x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y)) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      val aud = ids.mapPartitions { it =>
        it.map { id =>
          val gid0 = id / 4
          val gid = if (id % 3 == 1) gid0 + 1000000L else gid0 // re-dub
          val spf = (gid0 % 5 + 3).toInt
          val n = 57 * spf
          val gain = (id % 4 + 1).toInt
          val spike = if (id % 5 == 0) 1000 else 0
          val samples = Array.tabulate(n) { i =>
            val base = (((gid + 5) * (i.toLong * i + 3 * i + 7) + (2 * gid + 1) * i) % 14001) - 7000
            val sp = if (i == 0) spike else 0
            (gain * (base + sp)).toShort
          }
          (id, graft.operators.WavCodec.encode(16000, 1, samples))
        }
      }.toDF("media_id", "media")
      val vid = ids.mapPartitions { it =>
        it.map { id =>
          val gid0 = id / 4
          val gid = if (id % 3 == 2) gid0 + 1000000L else gid0 // re-cut
          val w = (gid0 % 9 + 6).toInt; val h = (gid0 % 5 + 8).toInt
          val nF = 8 * (gid0 % 3 + 1).toInt
          val bright = (id % 7).toInt
          val spot = if (id % 5 == 0) 40 else 0
          (id, graft.operators.AviCodec.encode(w, h, nF, 10, (f, x, y) => {
            val sp = if (f == 0 && x == 0 && y == 0) spot else 0
            ((((gid + 3) * (x + 1) * (y + 2) + 5L * x * x + 11L * f * (x + y + 1)) % 199 + bright + sp).toInt,
             (((gid + 7) * (x + 2) * (y + 1) + 3L * y * y + 13L * f * (y + 1)) % 199 + bright + sp).toInt,
             (((2 * gid + 1) * (x.toLong * y + x + y) + 17L * f * f) % 199 + bright + sp).toInt)
          }))
        }
      }.toDF("media_id", "media")
      val pi = Dedup.imageNearDup(
          FixtureDirs.cachedRoundTrip(img, "m04-media-", dir), // m04's cache
          "media_id", "media")
        .withColumnRenamed("hamming", "img_ham")
      val pa = Dedup.audioNearDup(
          FixtureDirs.cachedRoundTrip(aud, "m17-aud-", dir), "media_id", "media")
        .withColumnRenamed("hamming", "aud_ham")
      val pv = Dedup.videoNearDup(
          FixtureDirs.cachedRoundTrip(vid, "m17-vid-", dir), "media_id", "media")
        .withColumnRenamed("hamming", "vid_ham")
      val all = pi.join(pa, Seq("doc_a", "doc_b"), "full_outer")
        .join(pv, Seq("doc_a", "doc_b"), "full_outer")
        .withColumn("votes",
          (when(col("img_ham").isNotNull, 1).otherwise(0) +
           when(col("aud_ham").isNotNull, 1).otherwise(0) +
           when(col("vid_ham").isNotNull, 1).otherwise(0)).cast("int"))
        .localCheckpoint(true)
      val out = all.filter(col("votes") >= 2)
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("img_ham"), lit(-1)).cast("int").as("img_ham"),
          coalesce(col("aud_ham"), lit(-1)).cast("int").as("aud_ham"),
          coalesce(col("vid_ham"), lit(-1)).cast("int").as("vid_ham"),
          col("votes"))
        .orderBy(col("doc_a"), col("doc_b"))
        .localCheckpoint(true)
      val v2 = out.filter(col("votes") === 2).count()
      val v3 = out.filter(col("votes") === 3).count()
      val dropped = all.filter(col("votes") < 2).count()
      require(v2 > 0 && v3 > 0 && dropped > 0,
        s"fusion vote degenerate: v2=$v2 v3=$v3 dropped=$dropped — " +
          "the modality twists are not discriminating")
      out
    },
    Some("""WITH i_d AS (SELECT doc_id, doc_id // 4 AS gid, doc_id % 7 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 6 AS w, (doc_id // 4) % 5 + 8 AS h
           |  FROM documents),
           |i_g AS (SELECT doc_id,
           |    [[ ( ((gid + 3) * ((gx*w//8) + 1) * ((gy*h//8) + 2) + 5 * (gx*w//8) * (gx*w//8)) % 199
           |       + ((gid + 7) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 3 * (gy*h//8) * (gy*h//8)) % 199
           |       + ((2*gid + 1) * ((gx*w//8) * (gy*h//8) + (gx*w//8) + (gy*h//8))) % 199
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM i_d),
           |i_fp AS (SELECT doc_id, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS fp
           |  FROM i_g),
           |i_chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM i_fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |i_p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS img_ham
           |  FROM i_chunks a JOIN i_chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
           |a_d AS (SELECT doc_id,
           |    doc_id // 4 + CASE WHEN doc_id % 3 = 1 THEN 1000000 ELSE 0 END AS gid,
           |    doc_id % 4 + 1 AS g,
           |    CASE WHEN doc_id % 5 = 0 THEN 1000 ELSE 0 END AS spike,
           |    (doc_id // 4) % 5 + 3 AS spf
           |  FROM documents),
           |a_e AS (SELECT doc_id,
           |    [ list_sum([ abs(g * ((((gid + 5) * ((f*spf+j)*(f*spf+j) + 3*(f*spf+j) + 7)
           |        + (2*gid + 1) * (f*spf+j)) % 14001) - 7000
           |        + CASE WHEN f*spf + j = 0 THEN spike ELSE 0 END))
           |      for j in range(0, spf)])
           |      for f in range(0, 57)] AS en
           |  FROM a_d),
           |a_fp AS (SELECT doc_id, CAST(list_sum(
           |    [CASE WHEN en[f+2] > en[f+1] THEN 1::BIGINT << f ELSE 0::BIGINT END
           |     for f in range(0, 56)]) AS BIGINT) AS fp
           |  FROM a_e),
           |a_chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM a_fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |a_p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS aud_ham
           |  FROM a_chunks a JOIN a_chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
           |v_d AS (SELECT doc_id,
           |    doc_id // 4 + CASE WHEN doc_id % 3 = 2 THEN 1000000 ELSE 0 END AS gid,
           |    doc_id % 7 AS bright,
           |    CASE WHEN doc_id % 5 = 0 THEN 40 ELSE 0 END AS spot,
           |    (doc_id // 4) % 9 + 6 AS w, (doc_id // 4) % 5 + 8 AS h,
           |    (doc_id // 4) % 3 + 1 AS m
           |  FROM documents),
           |v_k AS (SELECT v_d.*, kf FROM v_d, (SELECT unnest([0, 1, 2, 3, 4, 5, 6, 7]) AS kf)),
           |v_g AS (SELECT doc_id, kf,
           |    [[ ( ((gid + 3) * ((gx*w//8) + 1) * ((gy*h//8) + 2) + 5 * (gx*w//8) * (gx*w//8)
           |          + 11 * (kf*m) * ((gx*w//8) + (gy*h//8) + 1)) % 199
           |       + ((gid + 7) * ((gx*w//8) + 2) * ((gy*h//8) + 1) + 3 * (gy*h//8) * (gy*h//8)
           |          + 13 * (kf*m) * ((gy*h//8) + 1)) % 199
           |       + ((2*gid + 1) * ((gx*w//8) * (gy*h//8) + (gx*w//8) + (gy*h//8))
           |          + 17 * (kf*m) * (kf*m)) % 199
           |       + 3 * bright
           |       + CASE WHEN gx*w//8 = 0 AND gy*h//8 = 0 AND kf = 0 THEN 3 * spot ELSE 0 END ) // 3
           |      for gx in range(0, 8)] for gy in range(0, 8)] AS gg
           |  FROM v_k),
           |v_dh AS (SELECT doc_id, kf, CAST(list_sum(flatten(
           |    [[CASE WHEN gg[gy+1][gx+2] > gg[gy+1][gx+1]
           |           THEN 1::BIGINT << (gy*7+gx) ELSE 0::BIGINT END
           |      for gx in range(0, 7)] for gy in range(0, 8)])) AS BIGINT) AS dh
           |  FROM v_g),
           |v_fp AS (SELECT doc_id, CAST(bit_xor(
           |      ((dh & ((1::BIGINT << (56 - 7*kf)) - 1)) << (7*kf)) | (dh >> (56 - 7*kf))
           |    ) AS BIGINT) AS fp
           |  FROM v_dh GROUP BY doc_id),
           |v_chunks AS (SELECT doc_id, fp, c AS chunk_idx, (fp >> (c * 14)) & 16383 AS chunk
           |  FROM v_fp, (SELECT unnest([0, 1, 2, 3]) AS c)),
           |v_p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS vid_ham
           |  FROM v_chunks a JOIN v_chunks b
           |    ON a.chunk_idx = b.chunk_idx AND a.chunk = b.chunk AND a.doc_id < b.doc_id
           |  WHERE bit_count(xor(a.fp, b.fp)) <= 3),
           |fused AS (SELECT doc_a, doc_b, img_ham, aud_ham, vid_ham,
           |    CAST((img_ham IS NOT NULL)::INTEGER + (aud_ham IS NOT NULL)::INTEGER
           |         + (vid_ham IS NOT NULL)::INTEGER AS INTEGER) AS votes
           |  FROM i_p
           |  FULL JOIN a_p USING (doc_a, doc_b)
           |  FULL JOIN v_p USING (doc_a, doc_b))
           |SELECT doc_a, doc_b,
           |  CAST(coalesce(img_ham, -1) AS INTEGER) AS img_ham,
           |  CAST(coalesce(aud_ham, -1) AS INTEGER) AS aud_ham,
           |  CAST(coalesce(vid_ham, -1) AS INTEGER) AS vid_ham,
           |  votes
           |FROM fused WHERE votes >= 2
           |ORDER BY doc_a, doc_b""".stripMargin),
    "fused multimodal near-dup: per-modality pigeonhole fingerprints (image dHash, audio energy hash, video keyframe fold) joined by 2-of-3 cross-modal vote — re-dubbed and re-cut renditions demote to 2, dual-twist pairs drop (LLM-pipeline op)")

  /** The full per-source CUSUM computation in DuckDB — shared by d64 and
    * s45 (the streaming monitor's monoid state composes to EXACTLY the
    * batch statistic, so the oracle is the batch SQL verbatim — the s43
    * shape, for a non-commutative-but-associative monoid). All arithmetic
    * is INTEGER (the reference level k is the floor global mean), so both
    * engines agree bit-for-bit; the window `sum` is cast to BIGINT at the
    * source (DuckDB promotes integer window sums to HUGEINT — the d60
    * lesson, applied before it bites). */
  private[queries] def cusumOracleSql(withPeak: Boolean): String = {
    val peakCol =
      if (withPeak) ",\n       |    CAST(min(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS peak_doc"
      else ""
    s"""WITH kv AS (SELECT sum(n_chars) // count(*) AS kk FROM documents),
       |p AS (SELECT source, doc_id,
       |    CAST(sum(n_chars - (SELECT kk FROM kv))
       |      OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS pp
       |  FROM documents),
       |st AS (SELECT source, doc_id, pp,
       |    pp - least(CAST(0 AS BIGINT),
       |      min(pp) OVER (PARTITION BY source ORDER BY doc_id)) AS s_up,
       |    greatest(CAST(0 AS BIGINT),
       |      max(pp) OVER (PARTITION BY source ORDER BY doc_id)) - pp AS s_dn
       |  FROM p),
       |dr AS (SELECT source, doc_id, s_up, s_dn,
       |    greatest(s_up, s_dn) AS drift,
       |    row_number() OVER (PARTITION BY source
       |      ORDER BY greatest(s_up, s_dn) DESC, doc_id) AS rn
       |  FROM st),
       |agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(max(s_up) AS BIGINT) AS cusum_up,
       |    CAST(max(s_dn) AS BIGINT) AS cusum_dn,
       |    CAST(max(drift) AS BIGINT) AS drift$peakCol
       |  FROM dr GROUP BY source),
       |g AS (SELECT max(drift) AS gm FROM agg)
       |SELECT a.*, 5 * a.drift >= 4 * (SELECT gm FROM g) AS flagged
       |FROM agg a ORDER BY source""".stripMargin
  }

  /** SEQUENTIAL DRIFT DETECTION (CUSUM) over the per-source document-length
    * series (d64) — the data-quality regression monitor a standing corpus
    * ingest needs: a source whose documents drift long (boilerplate
    * injection, template change) or short (truncation bug) shows a CUSUM
    * excursion long before a windowed mean moves. Page's statistic has a
    * CLOSED FORM over prefix sums — S⁺_i = P_i − min(0, min_{j≤i} P_j),
    * S⁻_i = max(0, max_{j≤i} P_j) − P_i with P = Σ(n_chars − k) — so the
    * whole monitor is two ordered-window scans, no iteration, and
    * distributes as one shuffle on `source`. The reference level k is the
    * floor global mean and every value is an integer, so the oracle is
    * bit-exact by construction. Sources flag when their max excursion
    * reaches 80% of the corpus-wide max (data-derived, the d49 lesson —
    * a literal threshold can sit outside the whole score range);
    * `require`s pin ≥1 flagged and ≥1 unflagged at every SF. 100 TB:
    * linear scan + per-source sequential fold; the s45 twin maintains the
    * same statistic incrementally as a 5-field monoid. */
  val d64 = QueryDef(
    "d64_cusum_drift",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val kRow = docs.agg(sum(col("n_chars")), count(lit(1))).head()
      val k = kRow.getLong(0) / kRow.getLong(1) // floor mean (exact both engines)
      val w = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val st = docs
        .withColumn("pp", sum(col("n_chars") - lit(k)).over(w))
        .withColumn("s_up", col("pp") - least(lit(0L), min(col("pp")).over(w)))
        .withColumn("s_dn", greatest(lit(0L), max(col("pp")).over(w)) - col("pp"))
        .withColumn("drift", greatest(col("s_up"), col("s_dn")))
      val wPeak = Window.partitionBy(col("source"))
        .orderBy(col("drift").desc, col("doc_id"))
      val agg = st.withColumn("rn", row_number().over(wPeak))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("s_up")).as("cusum_up"),
          max(col("s_dn")).as("cusum_dn"),
          max(col("drift")).as("drift"),
          min(when(col("rn") === 1, col("doc_id"))).as("peak_doc"))
      val out = agg
        .crossJoin(broadcast(agg.agg(max(col("drift")).as("gm"))))
        .withColumn("flagged", col("drift") * 5 >= col("gm") * 4)
        .drop("gm")
        .orderBy(col("source"))
        .localCheckpoint(true)
      val nf = out.filter(col("flagged")).count()
      require(nf >= 1 && nf < out.count(),
        s"drift gate degenerate: $nf of ${out.count()} sources flagged")
      out
    },
    Some(cusumOracleSql(withPeak = true)),
    "per-source CUSUM drift monitor over document length: closed-form prefix-min/max windows (no iteration), integer-exact, data-derived 80%-of-max flag threshold (LLM-pipeline op)")

  /** MULTI-ALARM CUSUM (d65) — d64 with the RESET semantics a production
    * monitor actually runs: when the excursion reaches h the alarm fires
    * and the statistic restarts at zero, so one source can report several
    * change points (Page's procedure proper, not just the max statistic).
    * Resets break the single-pass closed form, but the series splits into
    * EPISODES, and within each episode the d64 closed form still finds the
    * first crossing — so the computation is a loop over ALARM ROUNDS
    * (bounded by the max alarms per source, 2 on this corpus), not over
    * rows: each round computes drawup-since-episode-start via two windows
    * on the active suffixes and advances past the crossing. The oracle
    * replays the same episode recursion in one `WITH RECURSIVE` whose
    * per-round crossing is a pure list-comprehension argmin over the
    * per-source prefix-sum list (rule 11's shape: recursion over
    * EPISODES, list scan inside — never row-at-a-time). h is data-derived
    * (40% of the d64 global max drawup — probed to yield sources with 0,
    * 1 AND 2 alarms at both SFs); all arithmetic integer. `require`s pin
    * a multi-alarm source and a quiet source. */
  val d65 = QueryDef(
    "d65_cusum_alarms",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val kRow = docs.agg(sum(col("n_chars")), count(lit(1))).head()
      val k = kRow.getLong(0) / kRow.getLong(1)
      val wd = Window.partitionBy(col("source")).orderBy(col("doc_id"))
      val base = docs
        .withColumn("rn", row_number().over(wd))
        .withColumn("pg", sum(col("n_chars") - lit(k)).over(wd))
        .select(col("source"), col("doc_id"), col("rn"), col("pg"))
        .localCheckpoint(true)
      val wr = Window.partitionBy(col("source")).orderBy(col("rn"))
      val gm = base
        .withColumn("su", col("pg") - least(lit(0L), min(col("pg")).over(wr)))
        .agg(max(col("su"))).head().getLong(0)
      val h = gm * 2 / 5
      val nSrc = base.select(col("source")).distinct().count()
      var active = base.groupBy(col("source"))
        .agg(max(col("rn")).as("n"))
        .select(col("source"), lit(1).as("s"), lit(0).as("alarm_no"), col("n"))
        .localCheckpoint(true)
      var alarms: Option[org.apache.spark.sql.DataFrame] = None
      var rounds = 0
      while (active.count() > 0 && rounds < 64) {
        rounds += 1
        // pg just before the episode start (0 for a series-start episode)
        val withPrev = active
          .join(base.select(col("source"), (col("rn") + 1).as("s"),
            col("pg").as("pgPrev")), Seq("source", "s"), "left")
        val suffix = base.join(broadcast(withPrev), Seq("source"))
          .filter(col("rn") >= col("s"))
        val scored = suffix.withColumn("su",
          col("pg") - least(coalesce(col("pgPrev"), lit(0L)),
            min(col("pg")).over(wr)))
        val crossing = scored.filter(col("su") >= lit(h))
          .groupBy(col("source"), col("alarm_no"), col("n"))
          .agg(min(col("rn")).as("r"))
          .localCheckpoint(true)
        val fired = crossing
          .join(base.select(col("source"), col("rn").as("r"),
            col("doc_id").as("alarm_doc")), Seq("source", "r"))
          .select(col("source"),
            (col("alarm_no") + 1).cast("int").as("alarm_no"),
            col("alarm_doc"))
        alarms = Some(alarms.fold(fired)(_ unionByName fired))
        active = crossing.filter(col("r") < col("n"))
          .select(col("source"), (col("r") + 1).as("s"),
            (col("alarm_no") + 1).as("alarm_no"), col("n"))
          .localCheckpoint(true)
      }
      val out = alarms.get.orderBy(col("source"), col("alarm_no"))
        .localCheckpoint(true)
      val multi = out.filter(col("alarm_no") >= 2).count()
      val quiet = nSrc - out.select(col("source")).distinct().count()
      require(multi >= 1 && quiet >= 1,
        s"alarm fixture degenerate: $multi multi-alarm, $quiet quiet sources")
      out
    },
    Some(s"""WITH RECURSIVE kv AS (SELECT sum(n_chars) // count(*) AS kk FROM documents),
       |b AS MATERIALIZED (SELECT source, doc_id,
       |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS rn,
       |    CAST(sum(n_chars - (SELECT kk FROM kv))
       |      OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS pg
       |  FROM documents),
       |gmv AS (SELECT max(pg - least(CAST(0 AS BIGINT), mn)) AS gm FROM (
       |    SELECT pg, min(pg) OVER (PARTITION BY source ORDER BY rn) AS mn FROM b)),
       |hv AS (SELECT gm * 2 // 5 AS h FROM gmv),
       |l AS MATERIALIZED (SELECT source, list(pg ORDER BY rn) AS pg,
       |    list(doc_id ORDER BY rn) AS docs, CAST(count(*) AS BIGINT) AS n
       |  FROM b GROUP BY source),
       |eps AS (
       |  SELECT source, CAST(1 AS BIGINT) AS s, 0 AS alarm_no,
       |         CAST(NULL AS BIGINT) AS alarm_rn FROM l
       |  UNION ALL
       |  SELECT q.source, q.cr + 1 AS s, q.alarm_no + 1 AS alarm_no,
       |         q.cr AS alarm_rn
       |  FROM (SELECT e.source, e.alarm_no,
       |          list_min([ i for i in range(e.s, ln.n + 1)
       |            if ln.pg[i] - least(CASE WHEN e.s = 1 THEN CAST(0 AS BIGINT)
       |                                     ELSE ln.pg[e.s - 1] END,
       |                                list_min(ln.pg[e.s:i])) >= hv.h ]) AS cr
       |        FROM eps e JOIN l ln USING (source), hv) q
       |  WHERE q.cr IS NOT NULL)
       |SELECT e.source, CAST(e.alarm_no AS INTEGER) AS alarm_no,
       |       l.docs[e.alarm_rn] AS alarm_doc
       |FROM eps e JOIN l USING (source) WHERE e.alarm_rn IS NOT NULL
       |ORDER BY source, alarm_no""".stripMargin),
    "multi-alarm CUSUM (Page's procedure with resets): episode loop over alarm rounds, each round the d64 closed form on active suffixes; oracle = WITH RECURSIVE over episodes with a list-comprehension crossing argmin; data-derived h yields 0/1/2-alarm sources (LLM-pipeline op)")

  /** TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT (d66): leave-one-out distribution
    * comparison — each source's doc-length distribution against the rest of
    * the corpus — the standard "did this feed's shape change" gate a
    * training-data pipeline runs per source (complements d64/d65: CUSUM is
    * TEMPORAL mean-shift, KS is DISTRIBUTIONAL shape-shift).
    *
    * Exactness discipline: the statistic runs on a shared equi-width
    * histogram (width data-derived per rule 12: max(8, max_chars/32)), and
    * the KS numerator is the CROSS-MULTIPLIED integer form
    * `max_b |cum_s(b)·n_rest − cum_rest(b)·n_src|` — no division, so the
    * output is exact int64 both engines. The significance gate
    * D ≥ c·√((n₁+n₂)/(n₁n₂)) at α = 0.05 (c² = 1.844164) is likewise
    * cross-multiplied: `10⁶·num² ≥ 1844164·(n₁+n₂)·n₁·n₂`, computed in
    * decimal128 (Spark decimal(38,0) ≡ DuckDB HUGEINT — num² overflows
    * int64 past ~55k docs/source, and intermediates never reach the output
    * schema so the d60 type-width rule is safe). A PLANTED shift — src0's
    * lengths halved, the v33 constructive-fixture lesson — is `require`d
    * flagged, so a dead gate turns the row red rather than green-vacuous.
    *
    * Scale: one map-side-combinable groupBy builds the histogram (cells are
    * an additive monoid — mergeable across shards/batches); everything
    * after runs on the |sources|×|bins| grid, which is vocabulary-sized,
    * not corpus-sized. */
  /** d66's statistic from already-binned histogram cells (source, b, c) —
    * shared with the streaming twin s48, which maintains the same cells
    * incrementally (they are an additive monoid). `plantName`: treat that
    * source as an EXTERNAL sample (its background = the full organic
    * corpus); organic sources get leave-one-out. */
  private[queries] def ksStats(binned: DataFrame, nOrg: Long,
                               plantName: Option[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isPlant = plantName.map(col("source") === _).getOrElse(lit(false))
    val organic = plantName.map(col("source") =!= _).getOrElse(lit(true))
    val tot = binned.filter(organic)
      .groupBy(col("b")).agg(sum(col("c")).as("tc"))
    val ns = binned.groupBy(col("source")).agg(sum(col("c")).as("n_src"))
    val grid = binned.select(col("source")).distinct()
      .crossJoin(binned.select(col("b")).distinct()) // |sources|×|bins| — bounded
      .join(binned, Seq("source", "b"), "left")
      .join(tot, Seq("b"), "left")
      .select(col("source"), col("b"), coalesce(col("c"), lit(0L)).as("c"),
        (coalesce(col("tc"), lit(0L)) -
          when(isPlant, lit(0L)).otherwise(coalesce(col("c"), lit(0L)))).as("rc"))
    val cumW = Window.partitionBy(col("source")).orderBy(col("b"))
    val stat = grid
      .select(col("source"), col("b"),
        sum(col("c")).over(cumW).as("cs"), sum(col("rc")).over(cumW).as("cr"))
      .join(ns, "source")
      .withColumn("n_rest",
        when(isPlant, lit(nOrg)).otherwise(lit(nOrg) - col("n_src")))
      .withColumn("dnum",
        abs(col("cs") * col("n_rest") - col("cr") * col("n_src")))
    val dec = (c: Column) => c.cast("decimal(38,0)")
    stat
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("dnum").desc, col("b").asc)))
      .filter(col("rn") === 1)
      .select(col("source"), col("n_src"), col("n_rest"),
        col("dnum").as("ks_num"), col("b").as("ks_bin"),
        (dec(lit(1000000L)) * dec(col("dnum")) * dec(col("dnum")) >=
          dec(lit(1844164L)) * dec(col("n_src") + col("n_rest")) *
            dec(col("n_src")) * dec(col("n_rest"))).as("drifted"))
  }

  /** The d66/s48 oracle: KS over the shared histogram in DuckDB, with or
    * without the planted external sample. Kept one text (s-interpolated —
    * rule 10) so both rows verify against the SAME statistic. */
  private[queries] def ksOracleSql(withPlant: Boolean): String = {
    val allr =
      if (withPlant)
        """plant AS (SELECT '__shifted__' AS source, n_chars // 2 AS n_chars
          |          FROM doc WHERE source = (SELECT min(source) FROM doc)),
          |allr AS (SELECT * FROM doc UNION ALL SELECT * FROM plant),""".stripMargin
      else "allr AS (SELECT * FROM doc),"
    s"""WITH doc AS (SELECT source, n_chars FROM documents),
       |wv AS (SELECT greatest(8, max(n_chars) // 32) AS w FROM doc),
       |$allr
       |binned AS (SELECT source, n_chars // (SELECT w FROM wv) AS b,
       |                  count(*) AS c
       |           FROM allr GROUP BY 1, 2),
       |tot AS (SELECT b, sum(c) AS tc FROM binned
       |        WHERE source <> '__shifted__' GROUP BY 1),
       |n_org AS (SELECT sum(c) AS n FROM binned WHERE source <> '__shifted__'),
       |ns AS (SELECT source, sum(c) AS n_src FROM binned GROUP BY 1),
       |grid AS (
       |  SELECT s.source, bb.b, coalesce(x.c, 0) AS c,
       |         coalesce(t.tc, 0) - CASE WHEN s.source = '__shifted__'
       |           THEN 0 ELSE coalesce(x.c, 0) END AS rc
       |  FROM (SELECT DISTINCT source FROM binned) s
       |  CROSS JOIN (SELECT DISTINCT b FROM binned) bb
       |  LEFT JOIN binned x ON x.source = s.source AND x.b = bb.b
       |  LEFT JOIN tot t ON t.b = bb.b),
       |cum AS (
       |  SELECT source, b,
       |         sum(c) OVER (PARTITION BY source ORDER BY b) AS cs,
       |         sum(rc) OVER (PARTITION BY source ORDER BY b) AS cr
       |  FROM grid),
       |stat AS (
       |  SELECT c.source, c.b, s.n_src,
       |         CASE WHEN c.source = '__shifted__' THEN (SELECT n FROM n_org)
       |              ELSE (SELECT n FROM n_org) - s.n_src END AS n_rest,
       |         abs(c.cs * (CASE WHEN c.source = '__shifted__'
       |               THEN (SELECT n FROM n_org)
       |               ELSE (SELECT n FROM n_org) - s.n_src END)
       |             - c.cr * s.n_src) AS dnum
       |  FROM cum c JOIN ns s USING (source)),
       |best AS (
       |  SELECT source, n_src, n_rest, dnum, b
       |  FROM stat
       |  QUALIFY row_number() OVER (PARTITION BY source
       |    ORDER BY dnum DESC, b ASC) = 1)
       |SELECT source, CAST(n_src AS BIGINT) AS n_src,
       |       CAST(n_rest AS BIGINT) AS n_rest,
       |       CAST(dnum AS BIGINT) AS ks_num, CAST(b AS BIGINT) AS ks_bin,
       |       (CAST(1000000 AS HUGEINT) * dnum * dnum
       |          >= CAST(1844164 AS HUGEINT) * (n_src + n_rest) * n_src * n_rest)
       |         AS drifted
       |FROM best ORDER BY source""".stripMargin
  }

  val d66 = QueryDef(
    "d66_ks_drift",
    (spark, dir) => {
      import org.apache.spark.sql.expressions.Window
      val doc = Tables.documents(spark, dir).select(col("source"), col("n_chars"))
      val wBin = math.max(8L, doc.agg(max(col("n_chars"))).head().getLong(0) / 32L)
      val nOrg = doc.count()
      // the planted source is DATA-DERIVED (rule 12): a literal 'src0' is
      // empty on the replica world's renamed sources — the dead-gate
      // require caught exactly that at sf1, constructively
      val plantSrc = doc.agg(min(col("source"))).head().getString(0)
      val plantName = "__shifted__"
      val plant = doc.filter(col("source") === plantSrc)
        .select(lit(plantName).as("source"), expr("n_chars div 2").as("n_chars"))
      val binned = doc.unionByName(plant)
        .groupBy(col("source"), expr(s"n_chars div $wBin").as("b"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true) // consumed 5× below (grid, tot, ns, dims)
      val best = ksStats(binned, nOrg, Some(plantName)).localCheckpoint(true)
      require(best.filter(col("source") === plantName && col("drifted"))
        .count() == 1L,
        "planted length shift must be KS-flagged at every SF (dead-gate guard)")
      best.orderBy(col("source"))
    },
    Some(ksOracleSql(withPlant = true)),
    "two-sample KS drift per source vs corpus on a shared mergeable histogram: cross-multiplied integer statistic (exact int64), significance gate in decimal128, planted half-length shift required flagged (LLM-pipeline op)")

  def defs: Seq[QueryDef] =
    Seq(d01, d02, d03, d04, d05, d06, d07, d08, d09, d10, d11, d12, d13, d14,
      d15, d16, d17, d18, d19, d20, d21, d22, d23, d24, d25, d26, d27, d28, d29,
      d30, d31, d32, d33, d34, d35, d36, d37, d38, d39, d40, d41, d42, d43, d44,
      d45, d46, d47, d48, d49, d50, d50b, d51, d52, d53, d54, d55, d56, d57, d58, d59,
      d60, d61, d62, d63, d64, d65, d66,
      m01, m02, m03, m04, m05, m06, m07, m08, m09, m10, m11, m12, m13, m14,
      m15, m16, m17)
}
