package graft.streaming

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Driver-checkable Structured Streaming keys: the documents table
  * replayed as a BOUNDED file stream through the streaming operators,
  * drained to a memory sink, and compared — via the DuckDB oracle —
  * against the equivalent batch SQL. A bounded deterministic source
  * plus an order-independent projection of the sink make the streaming
  * result exactly the batch answer, so the STREAMING paths (watermark,
  * stateful aggregation, dedup state, mapGroupsWithState) are
  * themselves oracle-verified, not just spec-pinned.
  *
  *  - st01: event-time windowed (minute, language) rollup — windowed
  *    stateful aggregation.
  *  - st02: watermarked exact dedup — dropDuplicatesWithinWatermark
  *    state; the surviving DISTINCT hash set is order-independent.
  *  - st03: per-source Welford quality profile — custom keyed state via
  *    mapGroupsWithState; the final (count, mean) per source is the
  *    batch GROUP BY answer.
  */
object StreamingQueries {

  type Q = (SparkSession, String) => DataFrame

  private val runCounter = new java.util.concurrent.atomic.AtomicInteger(0)

  // deterministic synthetic event time: 2026-01-01T00:00:00Z + (doc_id*37
  // mod 600) seconds — ~10 one-minute windows over any scale factor
  private val EpochBase = 1767225600L

  /** The streaming analogue of [[graft.operators.Dedup.spread]] for the
    * bounded replay sources: a single-file landing dir gives every
    * micro-batch ONE input partition, which serializes the heavy
    * row-local kernels (MinHash signatures, image decode, LM scoring,
    * PII scan) on one core BEFORE the stateful shuffle — the map side
    * of each batch was running at 1/cores utilization.
    *
    * GUARDED (r19; r18 shipped an unconditional
    * `repartition(defaultParallelism)`, which inserts a round-robin
    * exchange of the raw payload into EVERY micro-batch no matter how
    * the source arrives — a permanent per-batch corpus shuffle at
    * scale, and measurably slower than no exchange at the driver's 32
    * cores on KB-scale batches). The guard lists the landing dir ONCE
    * at plan-build time: a pre-split source (file count ≥ the
    * size-derived width) gains no exchange at all, and when the
    * exchange is needed its width is one partition per
    * [[streamSpreadBytes]] of input, capped at defaultParallelism —
    * the same byte-proportional rule as batch spread (guide §2.5,
    * unsplittable-input repartition; §2 scale-adaptive partitioning). */
  private[graft] def spreadStream(df: DataFrame, dir: String, glob: String,
      perTaskBytes: Long = streamSpreadBytes): DataFrame = {
    val sc = df.sparkSession.sparkContext
    val want = sc.defaultParallelism
    val (nFiles, bytes) =
      try {
        val p = new org.apache.hadoop.fs.Path(dir, glob)
        val st = Option(p.getFileSystem(sc.hadoopConfiguration).globStatus(p))
          .map(_.toSeq).getOrElse(Seq.empty)
        (st.length, st.map(_.getLen).sum)
      } catch { case _: Throwable => (0, 0L) }
    if (nFiles == 0 || nFiles >= want) return df
    val width = graft.operators.Dedup.spreadWidthFor(nFiles, bytes, want,
      perTaskBytes)
    if (nFiles >= width) df else df.repartition(width)
  }

  /** Per-task byte budget for the stream-source spread — the per-batch
    * map kernels these sources feed (MinHash signatures, LM scoring,
    * PII regex scan) sit between the batch light/heavy classes. */
  private def streamSpreadBytes: Long =
    sys.env.get("SPARK_GRAFT_STREAM_SPREAD_BYTES").map(_.trim.toLong)
      .filter(_ > 0L).getOrElse(64L * 1024)

  /** The documents table as a bounded file stream with the synthetic
    * event-time column. The streaming file source needs a DIRECTORY base
    * path; the testdata table is a single file, so glob-filter it from
    * its parent. */
  private def boundedDocStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.load(spark, dir, "documents").schema
    spreadStream(spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir), dir, "documents.parquet")
      .withColumn("ts",
        timestamp_seconds(lit(EpochBase) + (col("doc_id") * 37) % 600))
  }

  /** Start `w` against a fresh memory sink, drain the bounded source,
    * stop, and return the sink table. The streaming state store opens
    * one provider per shuffle partition and these rollups hold ~tens of
    * keys — a handful of partitions is the right state layout (the conf
    * is read at query START, so the scope-and-restore only affects this
    * query; at real corpus scale the caller sizes this knob to its key
    * cardinality). */
  /** Final state-store row count per streaming key, captured from the
    * last progress record of the most recent drain — the bench persists
    * these so "state stays bounded" is a driver-record claim, not only
    * a unit-test one. */
  val lastStateRows = scala.collection.concurrent.TrieMap.empty[String, Long]

  private def drainToMemory(spark: SparkSession, key: String,
      w: DataStreamWriter[Row]): DataFrame = {
    val sink = s"graft_${key}_${runCounter.incrementAndGet()}"
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    // the knob the doc above promises the caller: at testdata scale 4
    // state partitions are right (tens of keys per provider); a scale
    // probe over 10^7 events raises it so the stateful stage is not
    // serialized 4-ways
    val raw = sys.env.getOrElse("SPARK_GRAFT_STREAM_SHUFFLE", "4")
    // fail at the knob, not with an opaque planner error mid-query
    val stateParts = scala.util.Try(raw.trim.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"SPARK_GRAFT_STREAM_SHUFFLE must be a positive integer, got '$raw'"))
    require(stateParts > 0,
      s"SPARK_GRAFT_STREAM_SHUFFLE must be a positive integer, got '$raw'")
    // stream-stream join state format v3 (r19): ONE RocksDB store per
    // partition holding virtual column families instead of FOUR stores
    // (2 sides × keyToNumValues/keyWithIndexToValue) — st11 profiled
    // its per-batch cost as 16 store instances' snapshot/fsync commits;
    // v3 quarters the instance count at ANY scale. RocksDB-only by
    // Spark's own contract, so it is set exactly when the session runs
    // the documented RocksDB production pairing (the in-memory spec
    // provider keeps the default format). Env-overridable; the conf is
    // read at query start, so the scope-and-restore stays per-drain.
    val joinV3 = spark.conf.getOption(
        "spark.sql.streaming.stateStore.providerClass")
      .exists(_.contains("RocksDB"))
    val joinFmtKey = "spark.sql.streaming.join.stateFormatVersion"
    val prevJoinFmt = spark.conf.getOption(joinFmtKey)
    val q =
      try {
        spark.conf.set("spark.sql.shuffle.partitions", stateParts.toString)
        if (joinV3) spark.conf.set(joinFmtKey,
          sys.env.getOrElse("SPARK_GRAFT_JOIN_STATE_FORMAT", "3"))
        // sessionWindow.merge.sessions.in.local.partition measured and
        // NOT adopted (r19 A/B at 32 cpus: st06 2.7→3.9 s, st07
        // 2.9→3.3 s warm) — these streams' sessions are mostly
        // single-event, so the pre-shuffle local sort+merge is pure
        // overhead; it pays only when many batch rows share a session
        w.format("memory").queryName(sink).start()
      } finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        prevJoinFmt match {
          case Some(v) => spark.conf.set(joinFmtKey, v)
          case None => spark.conf.unset(joinFmtKey)
        }
      }
    try q.processAllAvailable() finally {
      (Option(q.lastProgress).toSeq ++ q.recentProgress.reverseIterator)
        .find(p => p != null && p.stateOperators.nonEmpty)
        .foreach(p => lastStateRows(key) =
          p.stateOperators.map(_.numRowsTotal).sum)
      q.stop()
    }
    spark.table(sink)
  }

  /** st01: windowed (event-time minute, language) doc counts + mean
    * quality over the replayed stream. */
  val st01WindowedLang: Q = (spark, dir) => {
    val stats = StreamPipeline.windowedLangStats(
      boundedDocStream(spark, dir), "text", "ts",
      windowLength = "1 minute", watermark = "5 minutes")
    drainToMemory(spark, "st01", stats.writeStream.outputMode("complete"))
      .select(col("window_start"), col("lang"), col("n_docs"),
        round(col("mean_quality"), 6).as("mean_quality"))
      .orderBy("window_start", "lang")
  }

  /** st02: watermarked exact streaming dedup. Which row of a duplicate
    * set survives depends on arrival order, but the SET of surviving
    * content hashes does not — project that, and the streaming answer
    * is DISTINCT sha256(text). */
  val st02StreamDedup: Q = (spark, dir) => {
    val kept = StreamPipeline.dedupExact(
      boundedDocStream(spark, dir), "text", "ts", watermark = "10 minutes")
    drainToMemory(spark, "st02", kept.writeStream.outputMode("append"))
      .select(col("content_hash"))
      .orderBy("content_hash")
  }

  /** st03: per-source lifetime quality profile through the
    * mapGroupsWithState Welford kernel. Each micro-batch emits the
    * running (count, mean) per source; the final state — selected
    * order-independently as the row with the maximal count — is the
    * batch GROUP BY (count, avg) answer (Welford's mean is exact up to
    * float rounding; both sides round to 6). */
  val st03SourceProfile: Q = (spark, dir) => {
    val prof = StreamPipeline.sourceQualityProfile(
      boundedDocStream(spark, dir), "text", "source")
    drainToMemory(spark, "st03", prof.writeStream.outputMode("update"))
      .groupBy(col("source"))
      .agg(max(col("nTotal")).as("n_total"),
        max_by(col("meanQuality"), col("nTotal")).as("mq"))
      .select(col("source"), col("n_total"),
        round(col("mq"), 6).as("mean_quality"))
      .orderBy("source")
  }

  /** Shared oracle fragment: per-doc quality (the p09 formula, rounded
    * to 6 as the Spark expression does) and language scores (the p10
    * lexicons) as CTEs `m` and `q` over `documents`. */
  private val docPrelude: String = {
    // shared fragment builders (PipelineQueries) — one generator for the
    // lexicons/stopwords across the p10/p30/st01/st03 oracles
    val stopwords = graft.operators.PipelineQueries.stopwordsSql
    val scoreCols =
      graft.operators.PipelineQueries.langScoreColsSql("nn", ",\n         ")
    s"""m AS (
       |  SELECT doc_id, source,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(CASE WHEN trim(text) = '' THEN 0
       |         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens,
       |    length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_punct,
       |    len(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      x -> list_contains([$stopwords], x))) AS n_stop,
       |    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_wordchars,
       |    string_split_regex(trim(lower(text)), '\\s+') AS tk,
       |    greatest(len(string_split_regex(trim(lower(text)), '\\s+')), 1)::DOUBLE AS nn,
       |    regexp_matches(text, '[\\x{4E00}-\\x{9FFF}]') AS cjk
       |  FROM (SELECT * REPLACE (coalesce(text, '') AS text) FROM documents)),
       |q AS (
       |  SELECT doc_id, source, cjk, tk, nn,
       |    round(greatest(0.0, least(1.0,
       |      0.5 + 0.5 * least((CASE WHEN n_tokens = 0 THEN 0.0
       |                         ELSE n_stop::DOUBLE / n_tokens END) * 2.5, 1.0)
       |          - 0.5 * (CASE WHEN n_chars = 0 THEN 0.0
       |                   ELSE n_punct::DOUBLE / n_chars END)
       |          - CASE WHEN (CASE WHEN n_tokens = 0 THEN 0.0
       |                       ELSE n_wordchars::DOUBLE / n_tokens END) < 2.0
       |                   OR (CASE WHEN n_tokens = 0 THEN 0.0
       |                       ELSE n_wordchars::DOUBLE / n_tokens END) > 12.0
       |                 THEN 0.25 ELSE 0.0 END)), 6) AS quality_score,
       |    $scoreCols
       |  FROM m)""".stripMargin
  }

  /** The st01 batch-SQL oracle: per-doc quality + language id (lexicon
    * tie-break), rolled up by the same minute window. */
  val st01Sql: String = {
    val best = graft.operators.PipelineQueries.langBestSql
    val tieBreak = graft.operators.PipelineQueries.langTieBreakSql
    s"""WITH $docPrelude,
       |b AS (SELECT *, $best AS best FROM q),
       |p AS (
       |  SELECT doc_id, quality_score,
       |    CASE WHEN cjk THEN 'zh'
       |         WHEN best = 0 THEN 'und'
       |         ELSE (CASE $tieBreak END)
       |    END AS lang,
       |    epoch_ms((${EpochBase}000 + ((doc_id * 37) % 600) * 1000)::BIGINT) AS ts
       |  FROM b)
       |SELECT date_trunc('minute', ts) AS window_start, lang,
       |       count(*)::BIGINT AS n_docs,
       |       round(avg(quality_score), 6) AS mean_quality
       |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  val st02Sql: String =
    "SELECT DISTINCT sha256(text) AS content_hash FROM documents ORDER BY 1"

  val st03Sql: String =
    s"""WITH $docPrelude
       |SELECT source, count(*)::BIGINT AS n_total,
       |       round(avg(quality_score), 6) AS mean_quality
       |FROM q GROUP BY 1 ORDER BY 1""".stripMargin

  /** st04: streaming near-dup collision buckets — each doc keys into its
    * 32 MinHash band slices under the fixed-width (band, bucket_hash)
    * key (see [[graft.functions.BandBucketHash]]), custom keyed state
    * folds (min id, count) per bucket with event-time-bounded lifetime,
    * and the final per-bucket state (selected via max count, min keeper
    * — both order-independent folds) for buckets of size ≥ 2 equals the
    * batch GROUP BY over the banding expansion (the 30-minute
    * suppression horizon exceeds the 10-minute synthetic event span, so
    * no bucket is evicted mid-replay). */
  val st04NearDupBuckets: Q = (spark, dir) => {
    // minEmit = 2: the drained rollup filters n_docs >= 2, so the
    // singleton-bucket updates (the bulk of the stream) never need to
    // reach the sink — results are identical, the update volume is the
    // collision set
    val nd = StreamPipeline.nearDupBuckets(
      boundedDocStream(spark, dir), "text", "doc_id", "ts", minEmit = 2L)
    drainToMemory(spark, "st04", nd.writeStream.outputMode("update"))
      .groupBy(col("band"), col("bucket_hash"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        max(col("n_docs")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("band"), col("bucket_hash"), col("keeper_id"), col("n_docs"))
      .orderBy("band", "bucket_hash")
  }

  /** st04 oracle: the p02 signature/banding chain (bit-exact MinHash in
    * DuckDB) regrouped per band bucket under the BandBucketHash key —
    * the FNV-1a 64 fold of (band, slice values) splitmix64-finalized,
    * reproduced in UBIGINT limb arithmetic (the same stage machinery as
    * the p02/p03/p11 oracles) and converted back to two's-complement
    * for the signed JVM long. */
  val st04Sql: String = {
    val p02 = graft.operators.PipelineQueries.p02Sql
    val prefix = p02.substring(0, p02.indexOf("cand AS ("))
    val fnvStep = "(acc, c) -> CAST(((CAST((xor(acc, c)) & 4294967295 AS HUGEINT) * 1099511628211) + ((CAST((xor(acc, c)) >> 32 AS HUGEINT) * 1099511628211) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT)"
    prefix + s"""h0 AS (
      |  SELECT doc_id, t,
      |    list_reduce(
      |      list_prepend(CAST(14695981039346656037 AS UBIGINT),
      |        list_prepend(CAST(t AS UBIGINT), bs)),
      |      $fnvStep) AS z
      |  FROM bands),
      |g1 AS (SELECT doc_id, t, CAST((CAST(z AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM h0),
      |g2 AS (SELECT doc_id, t, xor(z, z >> 30) AS z FROM g1),
      |g3 AS (SELECT doc_id, t, CAST(((CAST((z) & 4294967295 AS HUGEINT) * 13787848793156543929) + ((CAST((z) >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM g2),
      |g4 AS (SELECT doc_id, t, xor(z, z >> 27) AS z FROM g3),
      |g5 AS (SELECT doc_id, t, CAST(((CAST((z) & 4294967295 AS HUGEINT) * 10723151780598845931) + ((CAST((z) >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM g4),
      |g6 AS (SELECT doc_id, t, xor(z, z >> 31) AS z FROM g5),
      |buck AS (
      |  SELECT doc_id, t AS band,
      |    CAST(CASE WHEN z >= 9223372036854775808
      |              THEN CAST(z AS HUGEINT) - 18446744073709551616
      |              ELSE CAST(z AS HUGEINT) END AS BIGINT) AS bucket_hash
      |  FROM g6)
      |SELECT band, bucket_hash, min(doc_id)::BIGINT AS keeper_id,
      |       count(*)::BIGINT AS n_docs
      |FROM buck GROUP BY band, bucket_hash HAVING count(*) >= 2
      |ORDER BY band, bucket_hash""".stripMargin
  }

  /** The embeddings table as a bounded vector stream with the same
    * synthetic event-time treatment as [[boundedDocStream]]. */
  private def boundedVecStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = graft.Tables.load(spark, dir, "embeddings").schema
    spreadStream(spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(dir), dir, "embeddings.parquet")
      .withColumn("ts",
        timestamp_seconds(lit(EpochBase) + (col("vec_id") * 37) % 600))
  }

  /** st05: streaming EMBEDDING near-dup collision buckets — each vector
    * keys into the 4 disjoint 16-bit chunks of its hyperplane-LSH
    * signature (the batch p05 bucketing), the shared keyed state folds
    * (min id, count) per (chunk, value) with horizon-bounded lifetime,
    * and the final per-bucket state for buckets of size ≥ 2 equals the
    * batch GROUP BY over the chunk expansion. */
  val st05EmbedNearDup: Q = (spark, dir) => {
    val nd = StreamPipeline.embedNearDupBuckets(
      boundedVecStream(spark, dir), "embedding", "vec_id", "ts", minEmit = 2L)
    drainToMemory(spark, "st05", nd.writeStream.outputMode("update"))
      .groupBy(col("band"), col("bucket_hash"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        max(col("n_docs")).as("n_vecs"))
      .filter(col("n_vecs") >= 2)
      .select(col("band"), col("bucket_hash"), col("keeper_id"), col("n_vecs"))
      .orderBy("band", "bucket_hash")
  }

  /** st05 oracle: the p05 signature chain (bit-exact hyperplane LSH in
    * DuckDB) regrouped per 16-bit signature chunk — logical shift on
    * UBIGINT matches shiftrightunsigned on the signed JVM long, and the
    * 16-bit chunk values fit BIGINT directly. */
  val st05Sql: String = {
    // the 64-bit signature prelude (p05 itself moved to a 128-bit
    // multi-probe layout in r13; the streaming bucket key stays on the
    // production-default 4×16-bit chunks of the 64-bit signature)
    val prefix = graft.operators.PipelineQueries.hyperplaneSig64Sql + "\n"
    prefix + """chunked AS (
      |  SELECT s.vec_id, CAST(c.c AS INTEGER) AS band,
      |         CAST((s.sig >> CAST(16*c.c AS INTEGER)) & 65535 AS BIGINT) AS bucket_hash
      |  FROM sigs s, unnest(range(0, 4)) AS c(c))
      |SELECT band, bucket_hash, min(vec_id)::BIGINT AS keeper_id,
      |       count(*)::BIGINT AS n_vecs
      |FROM chunked GROUP BY band, bucket_hash HAVING count(*) >= 2
      |ORDER BY band, bucket_hash""".stripMargin
  }

  /** st29: streaming k-means cluster routing — fresh embeddings routed
    * into the clusters of a model trained BATCH-side against the static
    * table ([[graft.operators.SimilaritySearch.kmeansFit]] — the frozen-
    * quantizer discipline p83's `ivfAdd` established: a live stream
    * must not move the model). Assignment is the row-local
    * [[graft.functions.NearestCentroid]] codegen kernel per micro-batch
    * (media/vectors never reach state); the per-cluster rollup is a
    * STANDARD streaming aggregation whose state is ≤ k rows at any
    * stream length. Drained counts (max per cluster = latest cumulative
    * update; first_vec monotonically non-increasing under min) equal
    * the batch corpus assignment — the oracle RETRAINS the whole model
    * in DuckDB (the p91 chain) and restates the assignment rollup. */
  val st29StreamKmeansRoute: Q = (spark, dir) => {
    val fit = graft.operators.PipelineQueries.kmeansFitFor(spark, dir)
    val routed = boundedVecStream(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), _.cast("double")).as("v"))
      .filter(col("v").isNotNull && size(col("v")) > 0)
      .select(col("vec_id"),
        graft.functions.NearestCentroid(col("v"),
          fit.centroids.map(_.toSeq).toSeq).as("cluster"))
      .filter(col("cluster").isNotNull)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_vecs"), min(col("vec_id")).as("first_vec"))
    drainToMemory(spark, "st29", routed.writeStream.outputMode("update"))
      .groupBy(col("cluster").cast("long").as("cluster"))
      .agg(max(col("n_vecs")).as("n_vecs"), min(col("first_vec")).as("first_vec"))
      .orderBy("cluster")
  }

  /** st29 oracle: the p91 retrain chain's corpus assignment (`ca`)
    * rolled up per cluster. */
  val st29Sql: String = graft.operators.PipelineQueries.p91ChainSql(
    """|SELECT ca.c AS cluster, CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(min(ca.id) AS BIGINT) AS first_vec
       |FROM ca GROUP BY ca.c ORDER BY cluster""".stripMargin)

  /** st30: streaming CCNet quality gate — the DEPLOYMENT shape of the
    * per-language percentile filter: the bigram LM trains once on the
    * static reference slice and SHIPS to executors as a scoring model
    * ([[graft.operators.TextAnalysis.lmModelFor]] /
    * [[graft.functions.LmDocScore]] — one row-local codegen pass per
    * document, no stream-static join per token), the per-language
    * cutoff TUPLES (score, id at ranks ⌊n/3⌋ and ⌊2n/3⌋) freeze from
    * the batch fit and broadcast, and each arriving document buckets
    * by tuple comparison — head iff (score, id) sorts at-or-before the
    * rank-⌊n/3⌋ cutoff in (score DESC, id ASC) order, which for
    * replayed documents reproduces the batch rank semantics EXACTLY,
    * and for genuinely new documents is the production frozen-cutoff
    * gate. Stateless append projection + stream-static broadcast join:
    * zero state rows. The kernel's tokenization, lp arithmetic, and
    * fold are bit-parity with the batch join pipeline (spec-pinned),
    * so the oracle IS p92's. */
  val st30StreamCcnetGate: Q = (spark, dir) => {
    val docs = Tables.load(spark, dir, "documents")
    val refCond = pmod(col("doc_id"), lit(5)) === 0
    val model = TextAnalysis.lmModelFor(docs, "text", refCond)
    val buckets = TextAnalysis.ccnetLangBuckets(docs, "text", "doc_id", refCond,
      model = Some(model))
    def negTuple = struct((-col("lm_logprob")).as("ns"), col("doc_id").as("cid"))
    val c1 = buckets.filter(col("bucket") === "head")
      .groupBy("pred_lang").agg(max(negTuple).as("c1"))
    val c2 = buckets.filter(col("bucket").isin("head", "middle"))
      .groupBy("pred_lang").agg(max(negTuple).as("c2"))
    val rules = c1.join(c2, Seq("pred_lang"), "full")
    val scored = boundedDocStream(spark, dir)
      .select(col("doc_id"),
        TextAnalysis.languageId(col("text")).as("pred_lang"),
        graft.functions.LmDocScore(col("text"), model).as("__s"))
      .select(col("doc_id"), col("pred_lang"),
        coalesce(element_at(col("__s"), 1).cast("long"), lit(0L)).as("n_bigrams"),
        element_at(col("__s"), 2).as("lm_logprob"))
    val my = struct((-col("lm_logprob")).as("ns"), col("doc_id").as("cid"))
    val out = scored.join(broadcast(rules), Seq("pred_lang"), "left")
      .select(col("doc_id"), col("pred_lang"), col("n_bigrams"),
        col("lm_logprob"),
        when(col("lm_logprob").isNull, "na")
          .when(my <= col("c1"), "head")
          .when(my <= col("c2"), "middle")
          .otherwise("tail").as("bucket"))
    drainToMemory(spark, "st30", out.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st30 oracle: p92's — the streaming gate must reproduce the batch
    * per-language thirds document for document. */
  def st30Sql: String = graft.operators.PipelineQueries.p92Sql

  /** The events table as a bounded stream. Schema comes from the raw
    * parquet footer (micros-NTZ in current testdata generations) and ts
    * normalizes with the same UTC-pinned cast `Tables.load` applies; a
    * future nanos-encoded generation would fail loudly at schema
    * inference here and route through the batch loader's legacy flag. */
  private def boundedEventStream(spark: SparkSession, dir: String): DataFrame = {
    val raw = spark.read.parquet(s"$dir/events.parquet").schema
    spark.readStream.schema(raw)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
  }

  /** st06: streaming sessionization — Structured Streaming's native
    * `session_window` (gap-merged event-time windows, state merged by
    * the engine) over the events stream, per user. The session
    * assignment matches batch q18 exactly, INCLUDING the boundary: a
    * gap of exactly the 30-minute threshold still merges (Spark merges
    * windows that touch, split requires gap > threshold — pinned by
    * StreamingSpec's boundary case). */
  val st06StreamSessionize: Q = (spark, dir) => {
    // Skew hardening (mirrors batch q18's two-phase): the session state
    // key carries a coarse DAY salt, so a pathological single entity (a
    // bot, a null user id) never funnels a whole stream's sort/merge
    // into one state partition's task — the engine merges sessions
    // within (user, day), and the tiny boundary set (sessions touching
    // midnight) merges in the post-pass below. Day-crossing sessions
    // split in state and re-join downstream; the oracle hash-match
    // plus StreamingSpec's midnight-crossing case pin the equivalence.
    val sessions = boundedEventStream(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), date_trunc("day", col("ts")).as("day_salt"),
        session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))
    // session windows support append (emit once the watermark passes) or
    // complete; the bounded drain uses complete so TRAILING sessions —
    // those the final watermark never passes — still emit for the oracle
    // compare. Production pairs append mode with a live watermark; state
    // is bounded either way by the engine's session-window eviction.
    mergeTouchingSessions(
      drainToMemory(spark, "st06", sessions.writeStream.outputMode("complete")))
      .orderBy("user_id", "session_start")
  }

  /** The salted append-mode sessionization plan over any stream with
    * (user_id, ts): session_window state keyed by (user_id, tz-free day
    * bucket), so a pathological hot entity — a bot, a null user id —
    * fragments across day keys instead of funneling every event through
    * one ever-growing state row in one state partition (the same skew
    * treatment batch q18 and st06 carry). The day bucket is
    * floor(epoch_us / 86 400 000 000) computed as EXACT long floor
    * division ((us - pmod(us, d)) div d — `div` alone truncates toward
    * zero and `/` on longs is double division, which rounds across
    * bucket boundaries past 2^53 µs): pure integer time arithmetic,
    * immune to session-timezone and DST drift, bit-equal to the
    * oracle's `//` for every epoch including pre-1970. A fragment
    * emits once, when the watermark
    * passes its end; [[mergeTouchingSessions]] on the EMITTED stream
    * re-joins day-crossing fragments downstream. */
  private[graft] def saltedAppendSessions(events: DataFrame,
      watermark: String = "1 hour", gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"),
        expr("(unix_micros(ts) - pmod(unix_micros(ts), 86400000000)) div 86400000000")
          .as("day_salt"),
        session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

  /** st07: streaming sessionization in APPEND mode — the production
    * path: a fragment emits exactly once, when the watermark passes its
    * end (no more in-gap events can arrive), instead of complete-mode's
    * full re-emission per batch; r13 composes the day salt into this
    * path too (the r12 version carried the single-hot-entity state key
    * st06 had just retired). Truncation semantics near the horizon are
    * salt-aware and the oracle states them explicitly: a day FRAGMENT
    * emits iff its end (last event in the (user, day) group + gap) is
    * <= the final watermark (max event time − 1 h; the inclusive
    * boundary is Spark's rule, pinned by StreamingSpec's
    * end==watermark case), and only emitted fragments interval-merge —
    * a session whose later-day fragment is still in state surfaces as
    * its emitted prefix, exactly as a live deployment would see it. */
  val st07SessionizeAppend: Q = (spark, dir) => {
    val sessions = saltedAppendSessions(boundedEventStream(spark, dir))
    mergeTouchingSessions(
      drainToMemory(spark, "st07", sessions.writeStream.outputMode("append")),
      dedupFragments = false)
      .orderBy("user_id", "session_start")
  }

  /** Interval-merge of salted session fragments: per user in start
    * order, a fragment whose start is ≤ the running max end touches (or
    * overlaps) its predecessor — same boundary rule as session_window
    * itself (touch merges, split needs a real gap). Input is SESSIONS
    * (≤ ~day/gap per entity-day), so the user_id window here cannot
    * recreate the event-level skew the salt removed. In production this
    * runs as the batch compaction over the append-mode sink. */
  private[graft] def mergeTouchingSessions(fragments: DataFrame,
      dedupFragments: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_start")
    val prevEnd = max(col("session_end"))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    // dedupFragments = false skips the re-emission rollup (one whole
    // exchange of the fragment set): APPEND-mode sinks (st07) emit each
    // fragment exactly once — distinct (user, day) windows cannot share
    // a session_start — so the rollup is an identity there; only
    // complete-mode drains (st06), which re-emit every batch, need it
    val deduped =
      if (dedupFragments) fragments
        .groupBy("user_id", "session_start")
        .agg(max("session_end").as("session_end"),
          max("n_events").as("n_events"))
      else fragments
        .select("user_id", "session_start", "session_end", "n_events")
    deduped
      .withColumn("new_grp",
        when(prevEnd.isNull || col("session_start") > prevEnd, 1L).otherwise(0L))
      .withColumn("grp",
        sum("new_grp").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "grp")
      .agg(min("session_start").as("session_start"),
        max("session_end").as("session_end"),
        sum("n_events").cast("long").as("n_events"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
  }

  /** st06 oracle: the q18 session assignment (strict > split, matching
    * session_window's touch-merges boundary) with the streaming window
    * end = last event + gap. */
  val st06Sql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g)
      |SELECT user_id, min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*)::BIGINT AS n_events
      |FROM s GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin

  /** st08: streaming decontamination — the document stream scanned
    * against a STATIC benchmark print set (the stream-static semi-join
    * pattern: reference data joined into a live stream without
    * restarting it). The benchmark side is the batch-computed distinct
    * winnowing-print set (broadcast-sized — benchmarks are MBs); each
    * streamed doc explodes to its prints row-locally, semi-joins the
    * static set, and the per-doc match count folds in update mode
    * (max-folded across re-emissions like st04, order-independent).
    * State is one row per CONTAMINATED doc — in production this pairs
    * with a TTL or downstream compaction; the bounded replay keeps it
    * finite here. Matches the batch p20 exactly, so the p20 oracle IS
    * the st08 oracle. */
  val st08StreamContamination: Q = (spark, dir) => {
    import graft.operators.TextAnalysis
    val docsStatic = graft.operators.Dedup.spread(
      Tables.load(spark, dir, "documents"))
    val fp = TextAnalysis.fingerprintSet()
    val refPrints = docsStatic.filter(col("doc_id") % 10 === 0)
      .select(explode(fp(col("text"))).as("print")).distinct()
    val streamPrints = boundedDocStream(spark, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), fp(col("text")).as("prints"))
      .filter(col("prints").isNotNull)
      .select(col("doc_id"), size(col("prints")).as("n_prints"),
        explode(col("prints")).as("print"))
    val matched = streamPrints
      .join(refPrints, Seq("print"), "left_semi")
      .groupBy("doc_id", "n_prints")
      .agg(count(lit(1)).as("n_matched"))
    drainToMemory(spark, "st08", matched.writeStream.outputMode("update"))
      .groupBy("doc_id")
      .agg(max("n_prints").as("np"), max("n_matched").as("n_matched"))
      .select(col("doc_id"), col("n_matched"),
        col("np").cast("long").as("n_prints"),
        round(col("n_matched").cast("double") / col("np"), 6).as("contamination"))
      .orderBy("doc_id")
  }

  /** st09: streaming PII scrub profile — the p25 kernel in the live
    * path: the doc stream plants the same deterministic PII fixture,
    * `PiiScan` runs as a STATELESS codegen'd projection inside each
    * micro-batch (redaction happens in-flight; nothing PII-shaped needs
    * to reach state), and a running per-source aggregate tracks doc and
    * match counts. Complete-mode totals equal the batch group-by, which
    * the oracle restates over the same planted corpus. */
  val st09StreamPii: Q = (spark, dir) => {
    val aug = boundedDocStream(spark, dir)
      .select(col("source"),
        graft.operators.PipelineQueries.piiFixtureText.as("t"))
    val stats = graft.operators.TextAnalysis.piiStats(aug, "t")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_emails").as("n_emails"),
        sum("n_phones").as("n_phones"),
        sum("n_ipv4").as("n_ipv4"))
    drainToMemory(spark, "st09", stats.writeStream.outputMode("complete"))
      .orderBy("source")
  }

  /** st09 oracle: the shared planted-PII fixture + the p25 patterns,
    * aggregated per source. */
  val st09Sql: String = {
    val e = graft.functions.PiiScan.EmailPattern
    val p = graft.functions.PiiScan.PhonePattern
    val i = graft.functions.PiiScan.Ipv4Pattern
    s"""WITH aug AS (
       |  SELECT source, ${graft.operators.PipelineQueries.piiAugSqlExpr} AS t
       |  FROM documents)
       |SELECT source,
       |  count(*)::BIGINT AS n_docs,
       |  CAST(sum(len(regexp_extract_all(t, '$e'))) AS BIGINT) AS n_emails,
       |  CAST(sum(len(regexp_extract_all(t, '$p'))) AS BIGINT) AS n_phones,
       |  CAST(sum(len(regexp_extract_all(t, '$i'))) AS BIGINT) AS n_ipv4
       |FROM aug GROUP BY source
       |ORDER BY source""".stripMargin
  }

  /** st10: streaming dedup against a HISTORICAL corpus — the "new
    * crawl vs existing training set" pass: the historical side reduces
    * to distinct content hashes (32 bytes/doc — broadcastable at real
    * benchmark-to-corpus ratios) and the live stream drops already-seen
    * content through a STATELESS stream-static LEFT ANTI join — no
    * state store at all, unlike st02's within-stream dedup (which keeps
    * watermarked seen-hash state). The one streaming join pattern the
    * matrix lacked after st08's semi-join. Every tenth doc plays the
    * historical corpus; the rest stream. The raw corpus has no
    * cross-boundary duplicates at oracle scale, so the key PLANTS them
    * (the anti-join must demonstrably drop): every doc_id ≡ 1 (mod 10)
    * streams a shared payload text that the %50 historical docs also
    * carry — those 10 % of the stream must vanish. */
  val st10StreamDedupHistorical: Q = (spark, dir) => {
    // payload indices cycle through all 5 values on both sides (div
    // before mod — doc_id % 5 would be constant on each residue class)
    def payload(idx: org.apache.spark.sql.Column) =
      concat(lit("shared duplicate payload "), idx.cast("string"))
    val historical = graft.Tables.load(spark, dir, "documents")
      .filter(col("doc_id") % 10 === 0)
      .withColumn("t", when(col("doc_id") % 50 === 0,
        payload(expr("(doc_id div 50) % 5"))).otherwise(col("text")))
      .select(sha2(col("t").cast("binary"), 256).as("content_hash"))
      .distinct()
    val fresh = boundedDocStream(spark, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .withColumn("t", when(col("doc_id") % 10 === 1,
        payload(expr("(doc_id div 10) % 5"))).otherwise(col("text")))
      .withColumn("content_hash", sha2(col("t").cast("binary"), 256))
      .join(historical, Seq("content_hash"), "left_anti")
      .select(col("doc_id"))
    drainToMemory(spark, "st10", fresh.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st10 oracle: content-hash anti-membership against the historical
    * tenth, with the planted shared payloads restated on both sides
    * (// is DuckDB integer division ≡ Spark `div` on nonneg ids). */
  val st10Sql: String =
    """WITH hist AS (
      |  SELECT DISTINCT sha256(CASE WHEN doc_id % 50 = 0
      |    THEN 'shared duplicate payload ' || CAST((doc_id // 50) % 5 AS VARCHAR)
      |    ELSE text END) AS content_hash
      |  FROM documents WHERE doc_id % 10 = 0),
      |fresh AS (
      |  SELECT doc_id, sha256(CASE WHEN doc_id % 10 = 1
      |    THEN 'shared duplicate payload ' || CAST((doc_id // 10) % 5 AS VARCHAR)
      |    ELSE text END) AS content_hash
      |  FROM documents WHERE doc_id % 10 <> 0)
      |SELECT f.doc_id
      |FROM fresh f
      |WHERE NOT EXISTS (SELECT 1 FROM hist h WHERE h.content_hash = f.content_hash)
      |ORDER BY f.doc_id""".stripMargin

  /** st11: stream-stream event-time INTERVAL join — attribution (which
    * click led to this purchase?), the last join pattern the streaming
    * matrix lacked: st08 joins a stream to STATIC reference data, st10
    * anti-joins it; here BOTH sides are live streams and the engine
    * must buffer each in keyed state until the other side's watermark
    * passes the interval. Purchases match same-user clicks from the
    * preceding 12 hours (boundaries inclusive on both ends — pinned by
    * StreamingSpec).
    *
    * Scale shape: state is bounded by the watermark delay + interval
    * width — each side retains O(rate × (delay + 12 h)) rows keyed and
    * hash-partitioned by user_id, evicted as the opposite watermark
    * advances; nothing grows with total stream length. An inner join
    * emits in append mode as soon as both rows have arrived, so results
    * stream out continuously rather than at window close. */
  val st11StreamStreamJoin: Q = (spark, dir) => {
    // Measured and NOT adopted (r19): deriving both sides from ONE
    // boundedEventStream instance (a streaming self-join) did not share
    // the batch scan (numInputRows stayed 2×) and the self-join
    // de-ambiguation made the key consistently SLOWER (warm 4.3–4.6 s
    // vs 3.7 s) — the two-source form stands.
    val purchases = boundedEventStream(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "1 hour")
    val clicks = boundedEventStream(spark, dir)
      .filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      // the click side's watermark can lag the full lookback: a click
      // must stay joinable until purchase-time watermark passes
      // click-time + 12 h (the engine derives the eviction bound from
      // this condition)
      .withWatermark("c_ts", "1 hour")
    drainToMemory(spark, "st11",
      attributionJoin(purchases, clicks).writeStream.outputMode("append"))
      .orderBy("purchase_id", "click_id")
  }

  /** The st11 join core, factored so StreamingSpec can drive the
    * boundary cases through MemoryStreams: purchases(purchase_id,
    * user_id, p_ts) ⋈ clicks(click_id, c_user, c_ts) on same user and
    * c_ts ∈ [p_ts − 12 h, p_ts], both ends inclusive. */
  private[graft] def attributionJoin(purchases: DataFrame,
      clicks: DataFrame): DataFrame =
    purchases.join(clicks,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 12 HOURS") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))

  /** st11 oracle: the same interval self-join in batch SQL — timestamp
    * arithmetic is exact microseconds in both engines. */
  val st11Sql: String =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |       p.user_id
      |FROM events p JOIN events c
      |  ON p.user_id = c.user_id
      | AND p.event_type = 'purchase' AND c.event_type = 'click'
      | AND c.ts >= p.ts - INTERVAL 12 HOUR AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  /** The st12 core, factored so StreamingSpec can drive fixtures
    * through a MemoryStream: per incoming doc, n_windows `width`-token
    * sliding windows (the p33 construction, row-local) and how many of
    * them appear in `histHashes` — a static (h: bigint) table of the
    * historical span set's 64-bit window hashes.
    *
    * Shape: windows explode to (id, ts, win) rows (posexplode_outer,
    * so a shorter-than-width doc keeps its zero row), membership is a
    * stream-static BROADCAST HASH left join on the window hash — O(1)
    * probe per window; an earlier draft used a broadcast ARRAY +
    * array_contains, whose O(|hist|) LINEAR scan per window the 100×
    * probe exposed as quadratic (47 windows × 2.35 M-entry array per
    * doc) — and the per-doc stats re-assemble in ONE watermarked
    * event-time aggregation (append mode; state = docs in flight
    * inside the watermark horizon, not corpus history). CONTRACT: the
    * historical set must be broadcast-sized — the benchmark/eval-
    * corpus contamination regime (p20's contract); for corpus-vs-
    * corpus span overlap use the batch p33 path, whose df join
    * shuffles both sides. */
  private[graft] def spanOverlapStats(stream: DataFrame, histHashes: DataFrame,
      textCol: String, idCol: String, tsCol: String, width: Int,
      watermark: String = "5 minutes"): DataFrame = {
    val tk = split(trim(lower(col(textCol))), "\\s+")
    // bindArray: an unbound `tk` inside the window lambda re-splits the
    // whole document once per window — O(tokens²) per row
    val wins = graft.functions.BindOnce.bindArray(tk, tks =>
      when(size(tks) >= width,
        transform(sequence(lit(0), size(tks) - width),
          i => array_join(slice(tks, i + 1, lit(width)), " "))).otherwise(array()))
    stream
      .select(col(idCol), col(tsCol),
        posexplode_outer(wins).as(Seq("pos", "win")))
      .join(broadcast(histHashes.withColumn("__hit", lit(1))),
        xxhash64(col("win")) === col("h"), "left_outer")
      .withWatermark(tsCol, watermark)
      .groupBy(col(idCol), col(tsCol))
      .agg(count(col("win")).as("n_windows"),
        sum(coalesce(col("__hit"), lit(0))).cast("long").as("n_overlap_windows"))
      .select(col(idCol), col("n_windows"), col("n_overlap_windows"))
  }

  /** st12: streaming span-level contamination audit against a
    * HISTORICAL corpus — the span-granular companion to st10's
    * whole-document anti-join (a fresh crawl rarely repeats a whole
    * doc; it repeats PASSAGES): every tenth doc plays the historical
    * corpus, the rest stream, and each streamed doc reports how many
    * of its 8-token windows the historical span set already contains.
    * The corpus has no cross-slice shared spans at oracle scale, so
    * the key PLANTS them: historical docs ≡ 0 (mod 50) and streamed
    * docs ≡ 1 (mod 10) share a 12-token passage → exactly 5 pure-
    * passage windows per planted streamed doc must light up. APPEND
    * mode with the real emission horizon: a doc's row emits once the
    * event-time watermark passes its ts, so docs inside the final
    * 5-minute watermark window stay in state at drain end — the oracle
    * restates the horizon ((doc_id·37) % 600 ≤ max − 300, inclusive —
    * Spark's rule, pinned by StreamingSpec's st07 end==watermark case)
    * rather than pretending complete-mode emission. */
  val st12StreamSpanAudit: Q = (spark, dir) => {
    val passage = " shared passage tokens alpha beta gamma delta epsilon zeta eta theta iota"
    val hist = graft.operators.Dedup.spread(
        graft.Tables.load(spark, dir, "documents"))
      .filter(col("doc_id") % 10 === 0)
      .withColumn("t", when(col("doc_id") % 50 === 0,
        concat(col("text"), lit(passage))).otherwise(col("text")))
    val tk = split(trim(lower(col("t"))), "\\s+")
    val histHashes = hist
      .select(explode(graft.functions.BindOnce.bindArray(tk, tks =>
        when(size(tks) >= 8,
          transform(sequence(lit(0), size(tks) - 8),
            i => array_join(slice(tks, i + 1, lit(8)), " "))).otherwise(array())))
        .as("win"))
      .select(xxhash64(col("win")).as("h")).distinct()
    val stream = boundedDocStream(spark, dir)
      .filter(col("doc_id") % 10 =!= 0)
      .withColumn("t", when(col("doc_id") % 10 === 1,
        concat(col("text"), lit(passage))).otherwise(col("text")))
    val out = spanOverlapStats(stream, histHashes, "t", "doc_id", "ts", width = 8)
    drainToMemory(spark, "st12", out.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st12 oracle: window construction on both slices (string-keyed —
    * the hash-free restatement), overlap via a LEFT membership join,
    * zero-window docs intact through the final left join, and the
    * append emission horizon restated over the synthetic ts. */
  val st12Sql: String =
    """WITH hist AS (
      |  SELECT CASE WHEN doc_id % 50 = 0
      |    THEN text || ' shared passage tokens alpha beta gamma delta epsilon zeta eta theta iota'
      |    ELSE text END AS t
      |  FROM documents WHERE doc_id % 10 = 0),
      |htk AS (SELECT string_split_regex(trim(lower(t)), '\s+') AS tk FROM hist),
      |hw AS (SELECT DISTINCT array_to_string(tk[i:i+7], ' ') AS win
      |       FROM htk, unnest(range(1, len(tk) - 6)) r(i)),
      |s AS (
      |  SELECT doc_id, CASE WHEN doc_id % 10 = 1
      |    THEN text || ' shared passage tokens alpha beta gamma delta epsilon zeta eta theta iota'
      |    ELSE text END AS t
      |  FROM documents WHERE doc_id % 10 <> 0),
      |stk AS (SELECT doc_id, string_split_regex(trim(lower(t)), '\s+') AS tk FROM s),
      |sw AS (SELECT doc_id, array_to_string(tk[i:i+7], ' ') AS win
      |       FROM stk, unnest(range(1, len(tk) - 6)) r(i)),
      |m AS (
      |  SELECT sw.doc_id, count(*) AS n_windows,
      |         sum(CASE WHEN hw.win IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
      |  FROM sw LEFT JOIN hw USING (win)
      |  GROUP BY sw.doc_id),
      |mx AS (SELECT max((doc_id * 37) % 600) AS mts FROM s)
      |SELECT s.doc_id,
      |  CAST(coalesce(m.n_windows, 0) AS BIGINT) AS n_windows,
      |  CAST(coalesce(m.n_overlap, 0) AS BIGINT) AS n_overlap_windows
      |FROM s LEFT JOIN m USING (doc_id), mx
      |WHERE (s.doc_id * 37) % 600 <= mx.mts - 300
      |ORDER BY s.doc_id""".stripMargin

  /** The media fixture replayed as a bounded stream (36 real PNG
    * payloads with stored pattern-derived dHash expectations), same
    * synthetic event-time treatment as [[boundedDocStream]]. */
  private def boundedMediaStream(spark: SparkSession): DataFrame = {
    val path = graft.operators.PipelineQueries.MediaFixturePath
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
      .withColumn("ts",
        timestamp_seconds(lit(EpochBase) + (col("doc_id") * 37) % 600))
  }

  /** st14: streaming IMAGE near-dup collision buckets — the multimodal
    * rung of the streaming dedup family (st04 text MinHash bands, st05
    * embedding signature chunks, here decoded-image dHash chunks
    * through [[StreamPipeline.imageNearDupBuckets]]): decode + hash are
    * row-local per micro-batch (media bytes never reach state), the
    * pigeonhole chunks key the shared keeper/count fold, and the final
    * per-bucket state for buckets of size ≥ 2 equals the batch GROUP BY
    * over the fixture's STORED pattern-derived hashes. */
  val st14ImageNearDup: Q = (spark, dir) => {
    val nd = StreamPipeline.imageNearDupBuckets(
      boundedMediaStream(spark), "media", "doc_id", "ts", maxHamming = 2,
      minEmit = 2L)
    drainToMemory(spark, "st14", nd.writeStream.outputMode("update"))
      .groupBy(col("band"), col("bucket_hash"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        max(col("n_docs")).as("n_imgs"))
      .filter(col("n_imgs") >= 2)
      .select(col("band"), col("bucket_hash"), col("keeper_id"), col("n_imgs"))
      .orderBy("band", "bucket_hash")
  }

  /** st14 oracle: the chunk expansion over the STORED analytic hashes —
    * the unsigned reinterpretation (dhash < 0 ⇒ +2⁶⁴ in HUGEINT) makes
    * DuckDB's division/modulo match shiftrightunsigned on the signed
    * JVM long; 3 chunks of 21 bits (bit 63 uncovered, exactly like the
    * kernel — it can only merge buckets it never splits). */
  val st14Sql: String = {
    val path = graft.operators.PipelineQueries.MediaFixturePath
    s"""WITH h AS (
       |  SELECT doc_id, dhash FROM read_parquet('$path/*.parquet')
       |  WHERE dhash_defined),
       |uh AS (
       |  SELECT doc_id,
       |    CASE WHEN dhash < 0 THEN CAST(dhash AS HUGEINT) + 18446744073709551616
       |         ELSE CAST(dhash AS HUGEINT) END AS u
       |  FROM h),
       |chunked AS (
       |  SELECT doc_id, 0 AS band, CAST(u % 2097152 AS BIGINT) AS bucket_hash FROM uh
       |  UNION ALL
       |  SELECT doc_id, 1, CAST((u // 2097152) % 2097152 AS BIGINT) FROM uh
       |  UNION ALL
       |  SELECT doc_id, 2, CAST((u // 4398046511104) % 2097152 AS BIGINT) FROM uh)
       |SELECT band, bucket_hash, min(doc_id) AS keeper_id,
       |       CAST(count(*) AS BIGINT) AS n_imgs
       |FROM chunked
       |GROUP BY band, bucket_hash
       |HAVING count(*) >= 2
       |ORDER BY band, bucket_hash""".stripMargin
  }

  /** The audio fixture replayed as a bounded stream (14 real WAV
    * payloads with stored analytic fingerprint expectations), same
    * synthetic event-time treatment as [[boundedDocStream]]. */
  private def boundedAudioStream(spark: SparkSession): DataFrame = {
    val path = graft.operators.PipelineQueries.AudioFixturePath
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).parquet(path)
      .withColumn("ts",
        timestamp_seconds(lit(EpochBase) + (col("doc_id") * 37) % 600))
  }

  /** st16: streaming AUDIO near-dup collision buckets — the audio rung
    * of the streaming dedup family
    * ([[StreamPipeline.audioNearDupBuckets]]): the spectral
    * fingerprint is a native row-local expression per micro-batch
    * (audio bytes never reach state), its 2×32-bit pigeonhole chunks
    * key the shared keeper/count fold, and the final per-bucket state
    * for buckets of size ≥ 2 equals the batch GROUP BY over the
    * fixture's STORED analytic fingerprints. */
  val st16AudioNearDup: Q = (spark, dir) => {
    val nd = StreamPipeline.audioNearDupBuckets(
      boundedAudioStream(spark), "media", "doc_id", "ts", maxHamming = 1,
      minEmit = 2L)
    drainToMemory(spark, "st16", nd.writeStream.outputMode("update"))
      .groupBy(col("band"), col("bucket_hash"))
      .agg(min(col("keeper_id")).as("keeper_id"),
        max(col("n_docs")).as("n_audio"))
      .filter(col("n_audio") >= 2)
      .select(col("band"), col("bucket_hash"), col("keeper_id"), col("n_audio"))
      .orderBy("band", "bucket_hash")
  }

  /** st16 oracle: the 2-chunk expansion over the STORED analytic
    * fingerprints (st14's unsigned-reinterpretation discipline — 32-bit
    * chunks cover all 64 bits exactly like the kernel). */
  val st16Sql: String = {
    val path = graft.operators.PipelineQueries.AudioFixturePath
    s"""WITH h AS (
       |  SELECT doc_id, fp FROM read_parquet('$path/*.parquet')
       |  WHERE fp_defined),
       |uh AS (
       |  SELECT doc_id,
       |    CASE WHEN fp < 0 THEN CAST(fp AS HUGEINT) + 18446744073709551616
       |         ELSE CAST(fp AS HUGEINT) END AS u
       |  FROM h),
       |chunked AS (
       |  SELECT doc_id, 0 AS band, CAST(u % 4294967296 AS BIGINT) AS bucket_hash FROM uh
       |  UNION ALL
       |  SELECT doc_id, 1, CAST((u // 4294967296) % 4294967296 AS BIGINT) FROM uh)
       |SELECT band, bucket_hash, min(doc_id) AS keeper_id,
       |       CAST(count(*) AS BIGINT) AS n_audio
       |FROM chunked
       |GROUP BY band, bucket_hash
       |HAVING count(*) >= 2
       |ORDER BY band, bucket_hash""".stripMargin
  }

  /** st13: streaming per-source token-budget admission
    * ([[StreamPipeline.tokenBudgetAdmit]] — the live analogue of p39:
    * stop admitting a source the moment its token budget is reached,
    * state = ONE long per source). Budget 500 bites at every SF
    * (sources carry ~1.4 k tokens at sf0.001/0.01). Update mode emits
    * each document's verdict once, in its batch. */
  val st13TokenBudget: Q = (spark, dir) => {
    val out = StreamPipeline.tokenBudgetAdmit(
      boundedDocStream(spark, dir), "text", "source", "doc_id", "ts",
      budget = 500L)
    drainToMemory(spark, "st13", out.writeStream.outputMode("update"))
      .select(col("doc_id"), col("source"), col("n_tokens"), col("admitted"))
      .orderBy("doc_id")
  }

  /** st13 oracle: the (event-time, doc_id) admission order restated
    * over the synthetic ts, with the all-prior cumulative form —
    * provably the same verdicts as the engine's admitted-only total,
    * because the two sums agree up to the budget crossing and both
    * stay ≥ budget after it. */
  val st13Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens,
      |    (doc_id * 37) % 600 AS tkey
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, source, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY tkey, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM d)
      |SELECT doc_id, source, n_tokens, (cum < 500) AS admitted
      |FROM c ORDER BY doc_id""".stripMargin

  /** st15: streaming JSONL ingest audit — the landing-zone form of
    * p60: the checked-in fixture streams through the audited JSON file
    * source ([[graft.sources.Jsonl.readAuditedStream]] — the parse is
    * STATELESS, so this key holds zero state-store rows), one audit
    * row per line lands in the sink, and the per-source rollup of the
    * drained sink must equal DuckDB's independent batch read of the
    * same file. NULL source is a real group (doc 110), not a drop. */
  val st15JsonlIngest: Q = (spark, _) => {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("source", StringType),
      StructField("text", StringType)))
    val fixture = new java.io.File(graft.operators.PipelineQueries.JsonlFixturePath)
    val audited = graft.sources.Jsonl.readAuditedStream(
      spark, fixture.getParent, fixture.getName, schema)
    val rows = audited.select(col("doc_id"), col("source"), col("ok"),
      TextAnalysis.tokenCount(coalesce(col("text"), lit("")))
        .cast("long").as("n_tokens"))
    drainToMemory(spark, "st15", rows.writeStream.outputMode("append"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("ok"), 1)).as("n_ok"),
        sum(col("n_tokens")).as("n_tokens"))
      .orderBy("source")
  }

  /** st15 oracle: DuckDB's batch read_json over the same file,
    * regrouped per source (every fixture line is valid JSON, so n_ok
    * = n_docs — the malformed-line path is JsonlSpec-pinned, since no
    * SQL engine can parse a corrupt line to compare against). */
  val st15Sql: String =
    s"""SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_ok,
      |  CAST(sum(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
      |       ELSE len(regexp_split_to_array(trim(coalesce(text, '')), '\\s+'))
      |       END) AS BIGINT) AS n_tokens
      |FROM read_json('${graft.operators.PipelineQueries.JsonlFixturePath}',
      |     format = 'newline_delimited',
      |     columns = {doc_id: 'BIGINT', source: 'VARCHAR', text: 'VARCHAR'})
      |GROUP BY source ORDER BY source""".stripMargin

  /** st17: streaming C4 cleaning gate — the live-ingest form of p68
    * ([[TextAnalysis.c4LineFilter]]): every micro-batch's documents
    * are line-cleaned and verdicted ROW-LOCALLY (a pure append-mode
    * projection — no watermark, no aggregation, ZERO state-store
    * rows), which is exactly how a landing-zone cleaner runs in front
    * of a streaming ingest at scale. Same planted fixture as p68, so
    * the drained sink must equal the batch answer verbatim and the
    * oracle IS p68's (the st08 → p20Sql discipline). */
  val st17StreamC4: Q = (spark, dir) => {
    val docs = boundedDocStream(spark, dir)
      .select(col("doc_id"),
        graft.operators.PipelineQueries.p68FixtureText.as("t"))
    val cleaned = TextAnalysis.c4LineFilter(docs, "t", "doc_id")
    drainToMemory(spark, "st17", cleaned.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st18: streaming Gopher repetition filter — the live-ingest form
    * of p67 ([[TextAnalysis.gopherRepetition]]): the 13-fraction
    * battery + verdict per micro-batch, stateless append projection
    * (zero state rows), same planted fixture, oracle IS p67's. */
  val st18StreamRepetition: Q = (spark, dir) => {
    val docs = boundedDocStream(spark, dir)
      .select(col("doc_id"),
        graft.operators.PipelineQueries.p67FixtureText.as("t"))
    val rep = TextAnalysis.gopherRepetition(docs, "t", "doc_id")
    drainToMemory(spark, "st18", rep.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st19: streaming Bloom decontamination gate — the live-ingest form
    * of p75 ([[TextAnalysis.bloomDecontaminate]]): the 8 KB filter
    * builds ONCE from the STATIC reference slice (the
    * ship-a-benchmark-filter-to-the-ingest pattern), embeds in the
    * probe expression as a plan reference object, and every
    * micro-batch's documents test it ROW-LOCALLY — a pure append-mode
    * projection: no stream-static join (st08's exact-path shape), no
    * watermark, ZERO state-store rows. Same fixture and params as p75,
    * so the drained sink equals the batch answer and the oracle IS
    * p75's. */
  val st19BloomGate: Q = (spark, dir) => {
    val bits = TextAnalysis.bloomBuild(
      Tables.load(spark, dir, "documents")
        .filter(pmod(col("doc_id"), lit(10)) === 0),
      "text", shingle = 5, mBits = 65536, probes = 4)
    val gated = TextAnalysis.bloomProbe(boundedDocStream(spark, dir),
      "text", "doc_id", bits, shingle = 5, probes = 4)
    drainToMemory(spark, "st19", gated.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st20: streaming blocklist gate — the live-ingest form of p77
    * ([[TextAnalysis.blocklistFilter]]): the Aho–Corasick automaton
    * builds ONCE from the bounded blocklist, embeds in the scan
    * expression as a plan reference object, and every micro-batch's
    * documents are verdicted ROW-LOCALLY — a pure append-mode
    * projection: no join, no watermark, ZERO state-store rows. Same
    * planted fixture and pattern list as p77, so the drained sink
    * equals the batch answer and the oracle IS p77's. */
  val st20BlocklistGate: Q = (spark, dir) => {
    val docs = boundedDocStream(spark, dir)
      .select(col("doc_id"),
        graft.operators.PipelineQueries.p77FixtureText.as("text"))
    val gated = TextAnalysis.blocklistFilter(docs, "text", "doc_id",
      graft.operators.PipelineQueries.P77Patterns)
    drainToMemory(spark, "st20", gated.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st21: streaming sequence packing — the live-ingest form of p23
    * ([[StreamPipeline.streamPackBins]]): 4 seeded-fold packing
    * streams cut at a 500-token budget as documents arrive, state =
    * ONE long per shard. Budget 500 closes multiple bins per shard at
    * every SF (shards carry ~7k tokens at sf0.001/0.01). Update mode
    * emits each document's placement once, in its batch; the oracle
    * restates the (event-time, doc_id) arrival order as an exact
    * integer window cumsum per shard. */
  val st21StreamPack: Q = (spark, dir) => {
    val out = StreamPipeline.streamPackBins(
      boundedDocStream(spark, dir), "text", "doc_id", "ts",
      budgetTokens = 500L, shards = 4, seed = 23L)
    drainToMemory(spark, "st21", out.writeStream.outputMode("update"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("bin"), col("bin_offset"))
      .orderBy("doc_id")
  }

  /** st21 oracle: the shared SplitMix64 fold chain for the shard, the
    * whitespace token count, and the packing cumsum in the synthetic
    * (event-time, doc_id) arrival order — exact integer division, the
    * p23 discipline. */
  val st21Sql: String =
    graft.operators.PipelineQueries.mixChainSqlPublic(
      "SELECT doc_id, text, (doc_id * 37) % 600 AS tkey, xor(CAST(doc_id AS UBIGINT), CAST(23 AS UBIGINT)) AS z FROM documents") + """
      |d AS (
      |  SELECT doc_id, tkey, CAST(z % 4 AS BIGINT) AS shard,
      |    CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
      |         ELSE len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) END AS BIGINT) AS n_tokens
      |  FROM h),
      |c AS (
      |  SELECT doc_id, shard, n_tokens,
      |    coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY tkey, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
      |  FROM d)
      |SELECT doc_id, shard, n_tokens,
      |  CAST(cum // 500 AS BIGINT) AS bin,
      |  CAST(cum % 500 AS BIGINT) AS bin_offset
      |FROM c ORDER BY doc_id""".stripMargin

  /** st22: streaming HLL distinct-URL estimate — the live form of p76
    * ([[StreamPipeline.streamHllDistinct]]): per-source register
    * arrays as keyed state (256 ints per source — constant in stream
    * length, unlike a streaming COUNT(DISTINCT) whose state is the
    * distinct-key set), refreshed estimates per micro-batch. Same URL
    * fixture as p76 at p = 8; with the bounded single-file replay the
    * drained sink is one update per source, equal to the batch sketch,
    * and the oracle restates registers and estimate bit-exactly. */
  val st22StreamHll: Q = (spark, dir) => {
    val docs = boundedDocStream(spark, dir)
      .select(col("source"),
        graft.operators.PipelineQueries.p43FixtureUrlPublic.as("url"))
    val out = StreamPipeline.streamHllDistinct(docs, "source", "url", p = 8)
    drainToMemory(spark, "st22", out.writeStream.outputMode("update"))
      .select(col("source"), col("m"), col("v_zero"),
        round(col("raw_estimate"), 6).as("raw_estimate"),
        round(col("estimate"), 6).as("estimate"))
      .orderBy("source")
  }

  /** st22 oracle: the p76 restatement narrowed to per-source rows at
    * p = 8 — registers from the shared FNV/splitmix chain, bin()-length
    * rho, the exact HUGEINT harmonic sum, and the same literal
    * arithmetic for alpha and the correction branch. */
  val st22Sql: String =
    """|WITH aug AS (
      |  SELECT doc_id, source,
      |    CASE doc_id % 3
      |      WHEN 0 THEN 'HTTPS://Example' || CAST(doc_id % 5 AS VARCHAR) || '.COM/Path/' || CAST(doc_id % 7 AS VARCHAR) || '?utm_source=feed&id=' || CAST(doc_id % 13 AS VARCHAR) || '&utm_campaign=x#sec'
      |      WHEN 1 THEN 'http://EXAMPLE' || CAST(doc_id % 5 AS VARCHAR) || '.com/Path/' || CAST(doc_id % 7 AS VARCHAR) || '?ref=tw&z=9&a=1&refresh=1'
      |      ELSE 'https://cdn.Example' || CAST(doc_id % 5 AS VARCHAR) || '.net/x?b=2&a=' || CAST(doc_id % 11 AS VARCHAR) || '&fbclid=abc'
      |    END AS url
      |  FROM documents),
      |f0 AS (
      |  SELECT source,
      |    list_reduce(
      |      list_prepend(CAST(14695981039346656037 AS UBIGINT),
      |        list_transform(range(1, length(url) + 1),
      |          j -> CAST(ascii(substr(url, CAST(j AS INTEGER), 1)) AS UBIGINT))),
      |      (acc, c) -> CAST(((CAST((xor(acc, c)) & 4294967295 AS HUGEINT) * 1099511628211) + ((CAST((xor(acc, c)) >> 32 AS HUGEINT) * 1099511628211) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT)) AS z
      |  FROM aug),
      |t1 AS (SELECT source, CAST((CAST(z AS HUGEINT) + 11400714819323198485) % 18446744073709551616 AS UBIGINT) AS z FROM f0),
      |t2 AS (SELECT source, xor(z, z >> 30) AS z FROM t1),
      |t3 AS (SELECT source, CAST(((CAST((z) & 4294967295 AS HUGEINT) * 13787848793156543929) + ((CAST((z) >> 32 AS HUGEINT) * 13787848793156543929) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM t2),
      |t4 AS (SELECT source, xor(z, z >> 27) AS z FROM t3),
      |t5 AS (SELECT source, CAST(((CAST((z) & 4294967295 AS HUGEINT) * 10723151780598845931) + ((CAST((z) >> 32 AS HUGEINT) * 10723151780598845931) % 4294967296) * 4294967296) % 18446744073709551616 AS UBIGINT) AS z FROM t4),
      |t6 AS (SELECT source, xor(z, z >> 31) AS z FROM t5),
      |rr AS (
      |  SELECT source, CAST(z >> 56 AS BIGINT) AS reg,
      |    z & 72057594037927935 AS rest
      |  FROM t6),
      |rho AS (
      |  SELECT source, reg,
      |    CASE WHEN rest = 0 THEN 57 ELSE 57 - length(bin(rest)) END AS rho
      |  FROM rr),
      |mx AS (SELECT source, reg, max(rho) AS mrho FROM rho GROUP BY source, reg),
      |agg AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS nreg,
      |    sum(CAST(1 AS HUGEINT) << CAST(61 - mrho AS INTEGER)) AS sp
      |  FROM mx GROUP BY source),
      |est AS (
      |  SELECT source,
      |    CAST(256 AS BIGINT) - nreg AS v_zero,
      |    (0.7213 / (1.0 + 1.079 / 256.0))
      |      * CAST(256 * 256 AS DOUBLE) * 2305843009213693952.0
      |      / CAST(sp + CAST(CAST(256 AS BIGINT) - nreg AS HUGEINT) * (CAST(1 AS HUGEINT) << 61) AS DOUBLE) AS raw
      |  FROM agg)
      |SELECT source, CAST(256 AS BIGINT) AS m, v_zero,
      |  round(raw, 6) AS raw_estimate,
      |  round(CASE WHEN raw <= 640.0 AND v_zero > 0
      |        THEN 256 * ln(CAST(256 AS DOUBLE) / v_zero) ELSE raw END, 6) AS estimate
      |FROM est ORDER BY source""".stripMargin

  /** st23: streaming Count–Min build — the heavy-hitter dashboard's
    * ingest half: the d×w cell counters accumulate as a STANDARD
    * streaming aggregation (update mode — no custom state; the state
    * store holds only touched cells, ≤ 2048 rows regardless of stream
    * length, and counters are SUMS, so the result is batching- and
    * order-independent, stronger than the st13/st21 order contracts).
    * The drained cell table (latest update per cell = max, since
    * update-mode counts are cumulative) is then point-queried
    * batch-side exactly as p79 — so the oracle IS p79's. */
  val st23StreamCms: Q = (spark, dir) => {
    val toks = graft.operators.PipelineQueries
      .corpusTokens(boundedDocStream(spark, dir))
    val cellsStream = graft.operators.Sketches
      .cmsBuild(toks, "token", d = 4, w = 512)
    val drained = drainToMemory(spark, "st23",
      cellsStream.writeStream.outputMode("update"))
    val cells = drained.groupBy("r", "cell").agg(max(col("n")).as("n"))
    graft.operators.PipelineQueries.cmsProbe(cells,
      graft.operators.PipelineQueries.cmsQueriesFor(spark, dir))
  }

  /** st24: streaming robots frontier gate — the live form of p81
    * ([[TextAnalysis.robotsGate]] run on a streaming URL frame): the
    * bounded domain table parses once and the verdict join is
    * STREAM-STATIC (stateless — zero state-store rows), which is how
    * a crawl frontier filters fetch candidates as they are
    * discovered. Same fixture and agent as p81, so the oracle IS
    * p81's. */
  val st24RobotsGate: Q = (spark, dir) => {
    val d = col("doc_id")
    val urls = boundedDocStream(spark, dir).select(d,
      concat(lit("example"), pmod(d, lit(5)).cast("string"), lit(".com"))
        .as("host"),
      when(pmod(d, lit(3)) === 0,
        concat(lit("/path/"), pmod(d, lit(7)).cast("string")))
        .when(pmod(d, lit(3)) === 1,
          concat(lit("/x/"), pmod(d, lit(11)).cast("string")))
        .otherwise(lit("/")).as("path"))
    val robots = graft.operators.PipelineQueries.p81RobotsFixture(spark)
    val gated = TextAnalysis.robotsGate(urls, "doc_id", "host", "path",
      robots, "host", "rules", agent = "graftcrawler")
    drainToMemory(spark, "st24", gated.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st25: streaming NFC normalization — the live-ingest form of p84
    * ([[graft.functions.NfcNormalize]]): every micro-batch's text
    * normalizes ROW-LOCALLY (stateless append projection, zero
    * state-store rows, isNormalized fast path), which is where a
    * landing zone normalizes — before hashing/dedup ever sees the
    * bytes. Same planted fixture as p84, so the oracle IS p84's. */
  val st25NfcGate: Q = (spark, dir) => {
    val d = col("doc_id")
    val docs = boundedDocStream(spark, dir)
      .select(d, graft.operators.PipelineQueries.p84FixtureText.as("__t"))
      .select(d, col("__t"),
        graft.functions.NfcNormalize(col("__t")).as("normalized"))
      .select(d,
        (col("normalized") =!= col("__t")).as("changed"),
        length(col("__t")).as("n_chars_before"),
        length(col("normalized")).as("n_chars_after"),
        col("normalized"))
    drainToMemory(spark, "st25", docs.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st27: streaming NFKC normalization — the live-ingest form of p85
    * ([[graft.functions.NfkcNormalize]]): compatibility folds
    * (ligatures, widths, superscripts) per micro-batch, ROW-LOCALLY
    * (stateless append projection, zero state-store rows, isNormalized
    * fast path). Same planted fixture as p85, so the oracle IS p85's. */
  val st27NfkcGate: Q = (spark, dir) => {
    val d = col("doc_id")
    val docs = boundedDocStream(spark, dir)
      .select(d, graft.operators.PipelineQueries.p85FixtureText.as("__t"))
      .select(d, col("__t"),
        graft.functions.NfkcNormalize(col("__t")).as("normalized"))
      .select(d,
        (col("normalized") =!= col("__t")).as("changed"),
        length(col("__t")).as("n_chars_before"),
        length(col("normalized")).as("n_chars_after"),
        col("normalized"))
    drainToMemory(spark, "st27", docs.writeStream.outputMode("append"))
      .orderBy("doc_id")
  }

  /** st28: streaming quantile sketch — the live form of p87
    * ([[StreamPipeline.streamSampleQuantiles]]): per-source
    * token-length p50/p90/p99 from a deterministic bottom-k sample
    * (k=16 triples of state per source — constant in stream length),
    * refreshed per micro-batch. Bottom-k is order-independent, so the
    * bounded replay's drained answer restates as a row_number ≤ k in
    * DuckDB — the st22/st23 sketch discipline extended to ranks. */
  val st28QuantileSketch: Q = (spark, dir) => {
    val docs = boundedDocStream(spark, dir)
      .select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(coalesce(col("text"), lit("")))
          .cast("long").as("v"))
    val out = StreamPipeline.streamSampleQuantiles(docs, "source", "doc_id",
      "v", k = 16, seed = 87L,
      qs = Seq(("p50", 0.5), ("p90", 0.9), ("p99", 0.99)))
    drainToMemory(spark, "st28", out.writeStream.outputMode("update"))
      .orderBy("source", "quantile")
  }

  /** st28 oracle: the shared SplitMix64 chain for the (z, doc_id)
    * order, bottom-k via row_number ≤ 16, then the p87 discrete-
    * quantile rank selection. */
  val st28Sql: String =
    graft.operators.PipelineQueries.mixChainSqlPublic(
      """SELECT doc_id, source,
        |    CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
        |         ELSE len(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) END AS BIGINT) AS v,
        |    xor(CAST(doc_id AS UBIGINT), CAST(87 AS UBIGINT)) AS z FROM documents""".stripMargin) + """
      |cnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM h GROUP BY source),
      |bk AS (SELECT source, v,
      |         row_number() OVER (PARTITION BY source ORDER BY z, doc_id) AS rk
      |       FROM h),
      |samp AS (SELECT source, v FROM bk WHERE rk <= 16),
      |sm AS (SELECT source, CAST(count(*) AS BIGINT) AS m FROM samp GROUP BY source),
      |r AS (SELECT source, v,
      |        row_number() OVER (PARTITION BY source ORDER BY v) AS rk2
      |      FROM samp),
      |q(label, q) AS (VALUES ('p50', 0.5), ('p90', 0.9), ('p99', 0.99))
      |SELECT r.source, cnt.n AS n_rows, sm.m AS n_sampled,
      |  q.label AS quantile, r.v AS est_tokens
      |FROM r JOIN sm USING (source) JOIN cnt USING (source) JOIN q
      |  ON r.rk2 = least(sm.m - 1, CAST(floor(q.q * sm.m) AS BIGINT)) + 1
      |ORDER BY source, quantile""".stripMargin

  /** st26: streaming WARC landing zone — the crawl head as a live
    * ingest ([[graft.sources.Warc.readAuditedStream]]): `.warc.gz`
    * files stream through the binaryFile file source, each file
    * lazily parsed to audit rows (one record live at a time — the
    * batch p70 memory contract holds per micro-batch task), stateless
    * append projection with ZERO state-store rows. Same checked-in
    * fixture as p70, so the drained sink must equal the batch answer
    * verbatim and the oracle IS p70's (the independently constructed
    * expectations parquet). */
  val st26WarcIngest: Q = (spark, _) => {
    val audited = graft.sources.Warc.readAuditedStream(spark,
      graft.operators.PipelineQueries.WarcFixtureDir, "*.warc.gz")
      .select(col("file"), col("rec_idx"), col("ok"), col("warc_type"),
        col("record_id"), col("target_uri"), col("content_length"),
        sha2(col("payload"), 256).as("payload_sha256"))
    drainToMemory(spark, "st26", audited.writeStream.outputMode("append"))
      .orderBy("file", "rec_idx")
  }

  val queries: Map[String, Q] = Map(
    "st28_stream_quantile" -> st28QuantileSketch,
    "st27_stream_nfkc" -> st27NfkcGate,
    "st26_stream_warc_ingest" -> st26WarcIngest,
    "st25_stream_nfc" -> st25NfcGate,
    "st24_stream_robots_gate" -> st24RobotsGate,
    "st23_stream_cms" -> st23StreamCms,
    "st22_stream_hll" -> st22StreamHll,
    "st21_stream_pack" -> st21StreamPack,
    "st20_stream_blocklist_gate" -> st20BlocklistGate,
    "st19_stream_bloom_gate" -> st19BloomGate,
    "st17_stream_c4_clean" -> st17StreamC4,
    "st18_stream_repetition_filter" -> st18StreamRepetition,
    "st15_stream_jsonl_ingest" -> st15JsonlIngest,
    "st12_stream_span_audit" -> st12StreamSpanAudit,
    "st13_stream_token_budget" -> st13TokenBudget,
    "st14_stream_image_near_dup" -> st14ImageNearDup,
    "st16_stream_audio_near_dup" -> st16AudioNearDup,
    "st11_stream_stream_join" -> st11StreamStreamJoin,
    "st08_stream_contamination" -> st08StreamContamination,
    "st09_stream_pii" -> st09StreamPii,
    "st10_stream_dedup_historical" -> st10StreamDedupHistorical,
    "st06_stream_sessionize" -> st06StreamSessionize,
    "st07_sessionize_append" -> st07SessionizeAppend,
    "st01_stream_windowed_lang" -> st01WindowedLang,
    "st02_stream_dedup" -> st02StreamDedup,
    "st03_stream_source_profile" -> st03SourceProfile,
    "st04_stream_near_dup" -> st04NearDupBuckets,
    "st05_stream_embed_near_dup" -> st05EmbedNearDup,
    "st29_stream_kmeans_route" -> st29StreamKmeansRoute,
    "st30_stream_ccnet_gate" -> st30StreamCcnetGate)

  /** st07 oracle: the salted append path restated — day FRAGMENTS
    * (session construction within (user, floor(epoch_us/86 400 000 000))
    * with strict > gap split, fragment end = last event in the fragment
    * + gap), the append emission horizon per FRAGMENT (end <= max event
    * time − 1 h, inclusive — Spark's rule, pinned by StreamingSpec's
    * end==watermark case), then the interval merge over emitted
    * fragments only (touching — start <= running max end — merges,
    * matching session_window's own boundary rule). */
  val st07Sql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    epoch_us(ts) // 86400000000 AS day,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, epoch_us(ts) // 86400000000
      |               ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, day, ts,
      |    sum(new_sess) OVER (PARTITION BY user_id, day ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |frag AS (
      |  SELECT user_id, min(ts) AS fs,
      |    max(ts) + INTERVAL 30 MINUTE AS fe,
      |    count(*)::BIGINT AS n
      |  FROM s GROUP BY user_id, day, sid),
      |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM events),
      |emitted AS (SELECT f.user_id, f.fs, f.fe, f.n FROM frag f, wm WHERE f.fe <= wm.w),
      |m AS (
      |  SELECT user_id, fs, fe, n,
      |    CASE WHEN max(fe) OVER (PARTITION BY user_id ORDER BY fs
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |         OR fs > max(fe) OVER (PARTITION BY user_id ORDER BY fs
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |         THEN 1 ELSE 0 END AS ng
      |  FROM emitted),
      |mm AS (
      |  SELECT user_id, fs, fe, n,
      |    sum(ng) OVER (PARTITION BY user_id ORDER BY fs
      |      ROWS UNBOUNDED PRECEDING) AS grp
      |  FROM m)
      |SELECT user_id, min(fs) AS session_start, max(fe) AS session_end,
      |  sum(n)::BIGINT AS n_events
      |FROM mm GROUP BY user_id, grp
      |ORDER BY user_id, session_start""".stripMargin

  val oracles: Map[String, String] = Map(
    // identical computation to batch p70 — the streaming path is a
    // stateless append-mode parse of the same fixture files
    "st26_stream_warc_ingest" -> graft.operators.PipelineQueries.p70Sql,
    "st27_stream_nfkc" -> graft.operators.PipelineQueries.p85SqlPublic,
    "st28_stream_quantile" -> st28Sql,
    // identical computation to batch p68/p67 — the streaming path is a
    // stateless append-mode projection over the same planted fixture
    "st17_stream_c4_clean" -> graft.operators.PipelineQueries.p68Sql,
    // identical computation to batch p75 — the filter builds from the
    // static reference and the streaming probe is a stateless
    // append-mode projection
    "st19_stream_bloom_gate" -> graft.operators.PipelineQueries.p75Sql,
    "st20_stream_blocklist_gate" -> graft.operators.PipelineQueries.p77Sql,
    "st21_stream_pack" -> st21Sql,
    "st22_stream_hll" -> st22Sql,
    "st23_stream_cms" -> graft.operators.PipelineQueries.p79SqlPublic,
    "st24_stream_robots_gate" -> graft.operators.PipelineQueries.p81SqlPublic,
    "st25_stream_nfc" -> graft.operators.PipelineQueries.p84SqlPublic,
    "st18_stream_repetition_filter" -> graft.operators.PipelineQueries.p67Sql,
    "st12_stream_span_audit" -> st12Sql,
    "st13_stream_token_budget" -> st13Sql,
    "st14_stream_image_near_dup" -> st14Sql,
    "st16_stream_audio_near_dup" -> st16Sql,
    "st15_stream_jsonl_ingest" -> st15Sql,
    "st11_stream_stream_join" -> st11Sql,
    // identical computation to batch p20 — the streaming path is the
    // stream-static semi-join + update-mode fold
    "st08_stream_contamination" -> graft.operators.PipelineQueries.p20Sql,
    "st09_stream_pii" -> st09Sql,
    "st10_stream_dedup_historical" -> st10Sql,
    "st07_sessionize_append" -> st07Sql,
    "st06_stream_sessionize" -> st06Sql,
    "st01_stream_windowed_lang" -> st01Sql,
    "st02_stream_dedup" -> st02Sql,
    "st03_stream_source_profile" -> st03Sql,
    "st04_stream_near_dup" -> st04Sql,
    "st05_stream_embed_near_dup" -> st05Sql,
    "st29_stream_kmeans_route" -> st29Sql,
    "st30_stream_ccnet_gate" -> st30Sql)
}
