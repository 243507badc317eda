package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline operators (dedup / similarity search /
  * text analysis / multimodal) exposed as driver-checkable queries over
  * the documents and embeddings tables. SQL-expressible ops carry DuckDB
  * oracles; the LSH/UDF-based ops are rows-only with semantics pinned by
  * PipelineSpec. */
object PipelineQueries {

  type Q = (SparkSession, String) => DataFrame

  /** p01: exact dedup — duplicate groups by 256-bit content hash. */
  val p01DedupExact: Q = (spark, dir) => {
    Dedup.exactGroups(Tables.load(spark, dir, "documents"), "text", "doc_id")
      .select(col("content_hash"), col("keeper_id"), col("n_copies"))
      .orderBy("keeper_id")
  }

  val p01Sql: String =
    """SELECT sha256(text) AS content_hash, min(doc_id) AS keeper_id,
      |       count(*) AS n_copies
      |FROM documents
      |GROUP BY sha256(text)
      |ORDER BY keeper_id""".stripMargin

  // MinHash candidate pairs shared by p02/p04: the banding machinery is
  // identical for both, only the est_jaccard threshold differs — compute
  // once per dir at the loosest threshold and filter downstream
  private val candsCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def minhashCandsFor(spark: SparkSession, dir: String): DataFrame =
    candsCache.getOrElseUpdate(dir, {
      val c = Dedup.minHashCandidates(Tables.load(spark, dir, "documents"),
        "text", "doc_id", minEstJaccard = 0.1).cache()
      c.count()
      c
    })

  /** p02: MinHash+LSH near-dup candidate pairs (rows-only: the candidate
    * set is algorithm-defined, pinned by PipelineSpec recall tests). */
  val p02MinHashLsh: Q = (spark, dir) => {
    minhashCandsFor(spark, dir)
      .filter(col("est_jaccard") >= 0.2)
      .select(col("id0"), col("id1"), round(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy("id0", "id1")
  }

  /** p03: SimHash near-dup pairs within Hamming distance 6. */
  val p03SimHash: Q = (spark, dir) => {
    Dedup.simHashPairs(Tables.load(spark, dir, "documents"),
      "text", "doc_id", maxHamming = 6)
      .orderBy("id0", "id1")
  }

  /** p04: exact n-gram Jaccard verification over LSH candidates. */
  val p04NgramJaccard: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    Dedup.ngramJaccard(docs, minhashCandsFor(spark, dir), "text", "doc_id",
      minJaccard = 0.2)
      .select(col("id0"), col("id1"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id0", "id1")
  }

  /** p05: embedding-cosine near-dup pairs via hyperplane LSH buckets.
    * The synthetic embeddings have no planted near-dup clusters (max
    * pairwise cosine ≈ 0.5–0.6 across SFs), so the production-shaped
    * default (minCosine 0.95, 16-bit chunks) correctly finds nothing —
    * this key probes the moderate-similarity tail instead: 8-bit chunks
    * raise the per-chunk collision probability to ~(1-θ/π)^8 so pairs at
    * cosine ≥ 0.4 actually collide, and the driver-level signal is
    * non-empty at every SF. */
  val p05CosineNearDup: Q = (spark, dir) => {
    SimilaritySearch.cosineNearDupPairs(
      Tables.load(spark, dir, "embeddings"), "embedding", "vec_id",
      minCosine = 0.4, chunks = 8)
      .select(col("id0"), col("id1"), round(col("cosine"), 6).as("cosine"))
      .orderBy("id0", "id1")
  }

  /** p14: exact n-gram Jaccard over a DETERMINISTIC candidate set — all
    * pairs among the 50 lowest doc_ids (with ≥ shingleSize tokens, so no
    * empty gram sets reach the division) — which makes the exact-verify
    * kernel ANSI-expressible end-to-end: DuckDB rebuilds the same word
    * 3-gram sets and Jaccard, and the driver hash-compares. p04 keeps the
    * production shape (LSH candidates); this key proves the verify math. */
  val p14NgramJaccardExact: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    val ids = docs.filter(col("doc_id") <= 50)
      .filter(size(split(trim(lower(col("text"))), "\\s+")) >= 3)
      .select(col("doc_id").as("id"))
    val cands = ids.select(col("id").as("id0"))
      .crossJoin(ids.select(col("id").as("id1")))
      .filter(col("id0") < col("id1"))
    Dedup.ngramJaccard(docs, cands, "text", "doc_id", minJaccard = 0.0)
      .select(col("id0"), col("id1"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id0", "id1")
  }

  val p14Sql: String =
    """WITH d AS (
      |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS tk
      |  FROM documents WHERE doc_id <= 50),
      |g AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
      |           i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS grams
      |  FROM d WHERE len(tk) >= 3)
      |SELECT a.doc_id AS id0, b.doc_id AS id1,
      |       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
      |             len(list_distinct(list_concat(a.grams, b.grams))), 6) AS jaccard
      |FROM g a JOIN g b ON a.doc_id < b.doc_id
      |ORDER BY id0, id1""".stripMargin

  /** p06: brute-force cosine top-k neighbors of vec_id 0 — exact ANN
    * baseline, DuckDB-oracled. */
  val p06AnnTopK: Q = (spark, dir) => {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    SimilaritySearch.bruteForceTopK(emb, "embedding", "vec_id", q, 10)
      .select(col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  val p06Sql: String =
    """SELECT e.vec_id AS neighbor_id,
      |       round(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 6) AS cosine
      |FROM embeddings e,
      |     (SELECT embedding FROM embeddings WHERE vec_id = 0) q
      |ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) DESC,
      |         neighbor_id ASC
      |LIMIT 10""".stripMargin

  // IVF index fitted once per scale-factor dir (k-means is the build
  // cost; queries only probe cells)
  private val ivfCache =
    scala.collection.concurrent.TrieMap.empty[String, SimilaritySearch.IvfIndex]

  def ivfIndexFor(spark: org.apache.spark.sql.SparkSession, dir: String): SimilaritySearch.IvfIndex =
    ivfCache.getOrElseUpdate(dir, {
      val idx = SimilaritySearch.ivfIndex(
        Tables.load(spark, dir, "embeddings"), "embedding", "vec_id")
      idx.copy(cells = idx.cells.cache())
      })

  /** p07: IVF pruned ANN — k-means coarse quantizer (MLlib k-means||),
    * probe the nearest cells only (rows-only; recall vs p06 brute force
    * asserted in PipelineSpec). */
  val p07AnnIvf: Q = (spark, dir) => {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    SimilaritySearch.ivfTopK(ivfIndexFor(spark, dir), q, 10, nProbe = 4)
      .select(col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** p15: IVF with every cell probed — exhaustive probing makes the
    * two-stage search EXACTLY the brute-force answer (same scan set, same
    * ranking), so the whole IVF machinery (quantizer fit, NearestCentroid
    * cell routing, probe pruning, re-rank) sits behind the DuckDB oracle:
    * if cell assignment dropped or misrouted one vector, the top-k would
    * differ. p07 keeps the production shape (pruned probes, recall-pinned
    * vs p06 in PipelineSpec); this key proves the index is lossless. */
  val p15AnnIvfExact: Q = (spark, dir) => {
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val idx = ivfIndexFor(spark, dir)
    SimilaritySearch.ivfTopK(idx, q, 10, nProbe = idx.centroids.length)
      .select(col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** p16: BPE-ish subword counting — word pieces split at every
    * alnum/non-alnum boundary (digits and punctuation as their own
    * tokens), the cheap deterministic stand-in for a real BPE vocabulary.
    * DuckDB lacks lookaround regex, so the oracle counts the equivalent
    * closed form: maximal alnum runs + non-alnum non-space characters
    * (Spark-side `trim` strips only spaces, so tabs/newlines count as
    * pieces on both sides). */
  val p16SubwordCount: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
      col("doc_id"),
      TextAnalysis.subwordCount(col("text")).cast("long").as("n_subwords"))
      .orderBy("doc_id")
  }

  val p16Sql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+'))
      |       + length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) AS BIGINT)
      |    AS n_subwords
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** p08: token counting (whitespace + subword), DuckDB-oracled. */
  val p08TokenCount: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    docs.select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .orderBy("doc_id")
  }

  val p08Sql: String =
    """SELECT doc_id,
      |  CAST(CASE WHEN trim(text) = '' THEN 0
      |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** p09: quality metrics, DuckDB-oracled end to end (including the
    * composite score formula). */
  val p09Quality: Q = (spark, dir) => {
    TextAnalysis.qualityMetrics(Tables.load(spark, dir, "documents"), "text")
      .select(col("doc_id"), col("n_chars_m"), col("n_tokens"),
        round(col("punct_ratio"), 6).as("punct_ratio"),
        round(col("stopword_ratio"), 6).as("stopword_ratio"),
        round(col("mean_word_len"), 6).as("mean_word_len"),
        col("quality_score"))
      .orderBy("doc_id")
  }

  val p09Sql: String =
    """WITH m AS (
      |  SELECT doc_id,
      |    CAST(length(text) AS BIGINT) AS n_chars_m,
      |    CAST(CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
      |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
      |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
      |      x -> list_contains(['the','a','an','and','or','of','to','in','is','are',
      |                          'was','were','it','that','this','with','for','on','as','at'], x)))
      |      AS n_stop,
      |    length(regexp_replace(trim(text), '\s+', '', 'g')) AS n_wordchars
      |  FROM documents),
      |r AS (
      |  SELECT doc_id, n_chars_m, n_tokens,
      |    CASE WHEN n_chars_m = 0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars_m END AS punct_ratio_raw,
      |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop::DOUBLE / n_tokens END AS stopword_ratio_raw,
      |    CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_wordchars::DOUBLE / n_tokens END AS mean_word_len_raw
      |  FROM m)
      |SELECT doc_id, n_chars_m, n_tokens,
      |  round(punct_ratio_raw, 6) AS punct_ratio,
      |  round(stopword_ratio_raw, 6) AS stopword_ratio,
      |  round(mean_word_len_raw, 6) AS mean_word_len,
      |  round(greatest(0.0, least(1.0,
      |    0.5 + 0.5 * least(stopword_ratio_raw * 2.5, 1.0)
      |        - 0.5 * punct_ratio_raw
      |        - CASE WHEN mean_word_len_raw < 2.0 OR mean_word_len_raw > 12.0
      |               THEN 0.25 ELSE 0.0 END)), 6) AS quality_score
      |FROM r
      |ORDER BY doc_id""".stripMargin

  /** p10: language-ID heuristic vs the labeled lang column — confusion
    * counts (rows-only; the heuristic is ours, labels are synthetic).
    * No `spread()` here: languageId is pure whole-stage-codegen native
    * expressions feeding a tiny groupBy — a pre-repartition would round-
    * trip the full text column through a shuffle for nothing (spread is
    * for per-row JVM-UDF stages like p11/p12, where single-file parquet
    * = one partition serializes the work). */
  val p10LangId: Q = (spark, dir) => {
    // tokenize once into a real column: the five language scores share
    // the token array instead of re-splitting the text per score
    Tables.load(spark, dir, "documents")
      .withColumn("__tk", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("pred_lang", TextAnalysis.languageIdFrom(col("__tk"), col("text")))
      .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n"))
      .orderBy("lang", "pred_lang")
  }

  /** p11: winnowing document fingerprints (rows-only, deterministic). */
  val p11Fingerprint: Q = (spark, dir) => {
    Dedup.spread(Tables.load(spark, dir, "documents"))
      .select(col("doc_id"),
        TextAnalysis.fingerprint()(col("text")).as("fingerprint"))
      .orderBy("doc_id")
  }

  // synthetic PNG payloads fabricated once per dir — the p12/p13 queries
  // measure the decode/sample operators, not test-data encoding
  private val mediaCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def mediaFor(spark: SparkSession, dir: String): DataFrame =
    mediaCache.getOrElseUpdate(dir, {
      // bounded media fixture: real payloads scale with the corpus; the
      // fabricated PNGs cap at 5k so fixture encoding stays a fixture.
      // Repartition first — the docs parquet is a single file/partition
      // and per-row codec work must spread across cores.
      val docs = Tables.load(spark, dir, "documents").filter(col("doc_id") <= 5000)
        .repartition(spark.sparkContext.defaultParallelism)
      val m = Multimodal.syntheticMedia(docs).cache()
      m.count()
      m
    })

  /** Prime the synthetic-media fixture (PNG fabrication is test-data
    * encoding, not the decode/sample operators p12/p13 measure). */
  def warmMedia(spark: SparkSession, dir: String): Unit = { mediaFor(spark, dir); () }

  /** Bench hook: drop the per-dir operator-algorithm caches (MinHash
    * candidates, IVF index, one-slot signature table) so a second bench
    * pass measures COLD algorithm cost — the caches are the measured
    * work, and a warm second pass both understated the recorded min and
    * tripped the >3x suspect flag every round. The media fixture stays:
    * it is shared setup, not measured work. */
  def resetOperatorCaches(): Unit = {
    candsCache.values.foreach(_.unpersist(blocking = false))
    candsCache.clear()
    ivfCache.values.foreach(_.cells.unpersist(blocking = false))
    ivfCache.clear()
    Dedup.resetCaches()
  }

  /** p12: multimodal decode/features — REAL PNG decode via javax.imageio
    * over binary payloads (row-local; bytes never shuffle). */
  val p12MultimodalFeatures: Q = (spark, dir) => {
    Multimodal.extractFeatures(mediaFor(spark, dir), "doc_id", "media").toDF()
      .select(col("doc_id"), col("width"), col("height"), col("n_bytes"),
        round(col("mean_byte"), 6).as("mean_byte"))
      .orderBy("doc_id")
  }

  /** p13: frame sampling (1-in-4 fixed-size frames) over binary payloads. */
  val p13MultimodalFrames: Q = (spark, dir) => {
    Multimodal.sampleFrames(mediaFor(spark, dir), "doc_id", "media").toDF()
      .orderBy("doc_id", "frame_no")
  }

  val queries: Map[String, Q] = Map(
    "p01_dedup_exact" -> p01DedupExact,
    "p02_minhash_lsh" -> p02MinHashLsh,
    "p03_simhash" -> p03SimHash,
    "p04_ngram_jaccard" -> p04NgramJaccard,
    "p05_cosine_near_dup" -> p05CosineNearDup,
    "p06_ann_topk" -> p06AnnTopK,
    "p07_ann_ivf" -> p07AnnIvf,
    "p08_token_count" -> p08TokenCount,
    "p09_quality" -> p09Quality,
    "p10_lang_id" -> p10LangId,
    "p11_fingerprint" -> p11Fingerprint,
    "p12_multimodal_features" -> p12MultimodalFeatures,
    "p13_multimodal_frames" -> p13MultimodalFrames,
    "p14_ngram_jaccard_exact" -> p14NgramJaccardExact,
    "p15_ann_ivf_exact" -> p15AnnIvfExact,
    "p16_subword_count" -> p16SubwordCount)

  /** p10 oracle: same lexicons, same scoring, same tie-break. Spark's
    * array_max over struct(score, lang) resolves score ties by the
    * lexicographically greatest lang, so the CASE tests langs in
    * descending name order. The CJK override uses the common Han block
    * (both engines' regex classes agree on the fixture corpus). */
  val p10Sql: String = {
    val langs = TextAnalysis.LangMarkers.map(_._1)
    val scoreCols = TextAnalysis.LangMarkers.map { case (lang, markers) =>
      val set = markers.map(m => s"'$m'").mkString(", ")
      s"len(list_filter(tk, w -> w IN ($set)))::DOUBLE / n AS s_$lang"
    }.mkString(",\n         ")
    val best = s"greatest(${langs.map("s_" + _).mkString(", ")})"
    val byNameDesc = langs.sorted.reverse
    val tieBreak = byNameDesc.init.map(l =>
      s"WHEN s_$l = best THEN '$l'").mkString(" ") + s" ELSE '${byNameDesc.last}'"
    s"""WITH t AS (
       |  SELECT lang,
       |         string_split_regex(trim(lower(text)), '\\s+') AS tk,
       |         greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)::DOUBLE AS n,
       |         regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') AS cjk
       |  FROM documents),
       |s AS (
       |  SELECT lang, cjk,
       |         $scoreCols
       |  FROM t),
       |b AS (
       |  SELECT lang, cjk, $best AS best, * FROM s),
       |p AS (
       |  SELECT lang,
       |    CASE WHEN cjk THEN 'zh'
       |         WHEN best = 0 THEN 'und'
       |         ELSE (CASE $tieBreak END)
       |    END AS pred_lang
       |  FROM b)
       |SELECT lang, pred_lang, CAST(count(*) AS BIGINT) AS n
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "p01_dedup_exact" -> p01Sql,
    "p06_ann_topk" -> p06Sql,
    "p08_token_count" -> p08Sql,
    "p09_quality" -> p09Sql,
    "p10_lang_id" -> p10Sql,
    "p14_ngram_jaccard_exact" -> p14Sql,
    "p15_ann_ivf_exact" -> p06Sql,
    "p16_subword_count" -> p16Sql)
}
