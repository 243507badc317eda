package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Structured Streaming forms of the training-data pipeline operators —
  * an engine extension (the reference is a batch library; SURVEY §2.6
  * notes no streaming surface exists there). The same column expressions
  * that power the batch operators (TextAnalysis, content hashing) run
  * unchanged inside streaming micro-batches; this module adds the
  * streaming-only concerns: watermarks bounding dedup state and
  * event-time windowed aggregation.
  *
  * Scale notes: streaming dedup state is keyed by the 32-byte content
  * hash (never the document text) and expired by the watermark; the
  * windowed rollup is a standard partial-aggregate shuffle on
  * (window, lang).
  */
object StreamPipeline {

  /** Exact streaming dedup: keep the first document per content hash.
    * State is bounded by the event-time watermark — late duplicates past
    * `watermark` may reappear (the standard trade-off). Input needs
    * (tsCol: timestamp, textCol: string). */
  def dedupExact(stream: DataFrame, textCol: String, tsCol: String,
      watermark: String = "10 minutes"): DataFrame =
    stream
      .withColumn("content_hash", sha2(col(textCol).cast("binary"), 256))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Streaming quality gate: score each document with the batch quality
    * expressions and keep rows above `minScore`. Stateless — pure
    * row-local projection + filter. */
  def qualityFilter(stream: DataFrame, textCol: String,
      minScore: Double = 0.5): DataFrame =
    TextAnalysis.qualityMetrics(stream, textCol)
      .filter(col("quality_score") >= minScore)

  /** Event-time windowed corpus statistics: per (window, language),
    * document count + mean quality score. */
  def windowedLangStats(stream: DataFrame, textCol: String, tsCol: String,
      windowLength: String = "1 minute",
      watermark: String = "5 minutes"): DataFrame =
    TextAnalysis.qualityMetrics(stream, textCol)
      .withColumn("lang", TextAnalysis.languageId(col(textCol)))
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLength), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("quality_score")).as("mean_quality"))
      .select(col("window.start").as("window_start"), col("lang"),
        col("n_docs"), col("mean_quality"))

  /** Per-source running quality profile (count + Welford mean/variance)
    * with drift flagging — custom keyed state via mapGroupsWithState:
    * each micro-batch folds its documents into the source's persistent
    * state; the emitted row carries the lifetime profile and whether the
    * batch's mean quality drifted more than `driftSigma` standard
    * deviations from the running mean. State is O(1) per source. */
  final case class SourceProfile(
      n: Long, mean: Double, m2: Double) extends Serializable

  final case class SourceUpdate(
      source: String, nTotal: Long, meanQuality: Double,
      batchMean: Double, drifted: Boolean)

  def sourceQualityProfile(stream: DataFrame, textCol: String,
      sourceCol: String, driftSigma: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.streaming.GroupStateTimeout
    import org.apache.spark.sql.streaming.GroupState
    val spark = stream.sparkSession
    import spark.implicits._
    val scored = TextAnalysis.qualityMetrics(stream, textCol)
      .select(col(sourceCol).cast("string").as("source"),
        col("quality_score").cast("double").as("q"))
      .as[(String, Double)]
    scored.groupByKey(_._1)
      .mapGroupsWithState[SourceProfile, SourceUpdate](
        GroupStateTimeout.NoTimeout) {
        case (source, rows, state: GroupState[SourceProfile]) =>
          val qs = rows.map(_._2).toSeq
          val batchMean = if (qs.isEmpty) 0.0 else qs.sum / qs.length
          var st = state.getOption.getOrElse(SourceProfile(0L, 0.0, 0.0))
          // drift test against the state BEFORE folding this batch in
          val priorSd = if (st.n > 1) math.sqrt(st.m2 / (st.n - 1)) else 0.0
          val drifted = st.n > 10 && priorSd > 0 &&
            math.abs(batchMean - st.mean) > driftSigma * priorSd
          qs.foreach { q =>
            val n1 = st.n + 1
            val d = q - st.mean
            val mean1 = st.mean + d / n1
            st = SourceProfile(n1, mean1, st.m2 + d * (q - mean1))
          }
          state.update(st)
          SourceUpdate(source, st.n, st.mean, batchMean, drifted)
      }.toDF()
  }

  /** Streaming near-duplicate collision buckets by MinHash banding: each
    * document keys into its 32 band slices (the same one-permutation
    * signature expression the batch LSH path uses, stateless inside the
    * micro-batch), and custom keyed state per bucket tracks the keeper
    * (min doc id) and the cluster size. The per-bucket (keeper, count)
    * is ORDER-INDEPENDENT — min and count are commutative folds — so the
    * replayed stream's final state equals the batch GROUP BY answer no
    * matter how micro-batches split, for buckets whose occurrences all
    * fall within one suppression horizon.
    *
    * Scale design (the part that must survive an unbounded stream):
    *  - State LIFETIME is bounded by `suppressionHorizon`: the state key
    *    carries an event-time timeout (`GroupStateTimeout.EventTimeTimeout`,
    *    re-armed to max-event-time + horizon on every update) and is
    *    REMOVED once the watermark passes it. A duplicate arriving after
    *    the horizon starts a fresh cluster — the standard streaming-dedup
    *    trade-off, identical to st02's `dropDuplicatesWithinWatermark`
    *    contract. Without this, distinct band-buckets grow linearly with
    *    corpus size and the state store OOMs.
    *  - State KEY is the fixed-width (band: int, bucket_hash: long)
    *    struct via [[graft.functions.BandBucketHash]], not a rendered
    *    string — 12 bytes vs 40–80, and the signature (1 KB) never
    *    enters state; the value is 16 bytes of (minId, n).
    *  - Production runs should pair this with the RocksDB state store
    *    (`spark.sql.streaming.stateStore.providerClass` =
    *    `org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider`)
    *    so live state spills off-heap; the default HDFS-backed provider
    *    holds the working set in executor memory. */
  final case class BucketState(minId: Long, n: Long) extends Serializable

  final case class BucketUpdate(band: Int, bucket_hash: Long,
      keeper_id: Long, n_docs: Long)

  def nearDupBuckets(stream: DataFrame, textCol: String, idCol: String,
      tsCol: String, suppressionHorizon: String = "30 minutes",
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3,
      seed: Long = 42L, minEmit: Long = 1L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val horizonMs = parseHorizonMs(suppressionHorizon)
    val rowsPerBand = numHashes / bands
    val keyed = stream
      .withWatermark(tsCol, suppressionHorizon)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        graft.functions.MinHashSignature(col(textCol), numHashes, shingleSize, seed)
          .as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("ts"), posexplode(array((0 until bands).map(b =>
        slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)): _*))
        .as(Seq("band", "bslice")))
      .select(col("id"), col("ts"), col("band"),
        graft.functions.BandBucketHash(col("band"), col("bslice")).as("bh"))
      .as[(Long, java.sql.Timestamp, Int, Long)]
    bucketStateFold(keyed, horizonMs, minEmit)
  }

  /** Streaming near-duplicate collision buckets for an EMBEDDING stream:
    * the batch p05 bucketing — a 64-bit random-hyperplane signature
    * split into `chunks` disjoint bit-chunks (cosine-close vectors agree
    * on whole chunks with high probability) — keyed into the same
    * keeper/count state fold with the same horizon-bounded lifetime as
    * the text path. The chunk value is already a fixed-width state key,
    * so no extra hashing is needed. */
  def embedNearDupBuckets(stream: DataFrame, vecCol: String, idCol: String,
      tsCol: String, suppressionHorizon: String = "30 minutes",
      chunks: Int = 4, seed: Long = 42L, minEmit: Long = 1L): DataFrame = {
    require(64 % chunks == 0, s"chunks must divide 64, got $chunks")
    sigNearDupBuckets(stream,
      graft.functions.HyperplaneSignature64(col(vecCol), seed),
      idCol, tsCol, suppressionHorizon, chunks, minEmit)
  }

  /** The shared signature near-dup kernel the embedding/image/audio
    * paths all instantiate (ONE definition — this family's chunk-mask
    * arithmetic diverged per copy once already): signature expression →
    * watermark → non-null filter → pigeonhole chunk explode
    * ([[graft.operators.Dedup.sigChunkValues]], the batch-shared
    * slices) → the keyed keeper/count fold. Only the signature column
    * differs between modalities. */
  private def sigNearDupBuckets(stream: DataFrame, sig: Column,
      idCol: String, tsCol: String, suppressionHorizon: String,
      chunks: Int, minEmit: Long = 1L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    val horizonMs = parseHorizonMs(suppressionHorizon)
    val keyed = stream
      .withWatermark(tsCol, suppressionHorizon)
      .select(col(idCol).cast("long").as("id"), col(tsCol).as("ts"),
        sig.as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("id"), col("ts"),
        posexplode(array(
          graft.operators.Dedup.sigChunkValues(col("sig"), chunks): _*))
          .as(Seq("band", "bh")))
      .as[(Long, java.sql.Timestamp, Int, Long)]
    bucketStateFold(keyed, horizonMs, minEmit)
  }

  /** Streaming IMAGE near-duplicate collision buckets: dHash of each
    * decoded payload ([[graft.operators.Multimodal.dHash64]] — the
    * decode is row-local per micro-batch, media bytes never reach
    * state) split into (maxHamming+1) disjoint bit-chunks (pigeonhole:
    * images within the Hamming radius agree on some chunk), keyed into
    * the same keeper/count state fold with the same horizon-bounded
    * lifetime as the text/embedding paths. Sub-grid or undecodable
    * payloads have no hash and flow past the near-dup state untouched. */
  def imageNearDupBuckets(stream: DataFrame, binCol: String, idCol: String,
      tsCol: String, suppressionHorizon: String = "30 minutes",
      maxHamming: Int = 2, minEmit: Long = 1L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming < 64, "need 0 <= maxHamming < 64")
    val dh = udf((b: Array[Byte]) =>
      if (b == null) None else graft.operators.Multimodal.dHash64(b))
    sigNearDupBuckets(stream, dh(col(binCol)), idCol, tsCol,
      suppressionHorizon, maxHamming + 1, minEmit)
  }

  /** Streaming AUDIO near-dup collision buckets — the audio rung of
    * the streaming dedup family (st04 text bands, st05 embedding
    * chunks, st14 image dHash chunks, here WAV spectral fingerprints):
    * unlike the image path the fingerprint
    * ([[graft.functions.AudioSpectralHash]]) is a NATIVE codegen'd
    * expression, so the per-micro-batch projection stays in
    * whole-stage codegen and the audio bytes never reach state — only
    * (band, chunk) keys and the 16-byte keeper/count fold do. */
  def audioNearDupBuckets(stream: DataFrame, binCol: String, idCol: String,
      tsCol: String, suppressionHorizon: String = "30 minutes",
      maxHamming: Int = 1, minEmit: Long = 1L): DataFrame = {
    val spark = stream.sparkSession
    import spark.implicits._
    require(maxHamming >= 0 && maxHamming < 64, "need 0 <= maxHamming < 64")
    // undefined payloads carry fp = 0 in the struct; map them to a
    // NULL signature so the shared kernel's non-null filter drops them
    // (the same flow-past-state contract as an undecodable image)
    val a = graft.functions.AudioSpectralHash(
      coalesce(col(binCol), lit(Array.emptyByteArray)))
    sigNearDupBuckets(stream, when(a.getField("defined"), a.getField("fp")),
      idCol, tsCol, suppressionHorizon, maxHamming + 1, minEmit)
  }

  /** Parse with the same interval grammar withWatermark uses, so every
    * delay string the watermark accepts (e.g. "1 hour 30 minutes") is
    * also a valid horizon; month units have no fixed millisecond length. */
  private def parseHorizonMs(suppressionHorizon: String): Long = {
    val iv =
      try org.apache.spark.sql.catalyst.util.IntervalUtils.stringToInterval(
        org.apache.spark.unsafe.types.UTF8String.fromString(suppressionHorizon))
      catch { case e: IllegalArgumentException =>
        throw new IllegalArgumentException(
          s"suppressionHorizon '$suppressionHorizon': ${e.getMessage}", e)
      }
    require(iv != null && iv.months == 0,
      s"suppressionHorizon must be a day-time interval, got '$suppressionHorizon'")
    iv.days * 86400000L + iv.microseconds / 1000L
  }

  /** The shared keyed keeper/count fold: `keyed` is (id, ts, band,
    * bucket_hash); state per (band, bucket_hash) is the 16-byte
    * (minId, n) with the event-time timeout re-armed to max-event-time
    * + horizon — see the scale-design notes on [[nearDupBuckets]]. */
  private def bucketStateFold(
      keyed: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp, Int, Long)],
      horizonMs: Long, minEmit: Long = 1L): DataFrame = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = keyed.sparkSession
    import spark.implicits._
    keyed.groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[BucketState, BucketUpdate](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bh), docs, state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            // watermark passed the bucket's horizon: evict — the bucket's
            // suppression window is over and its state must not outlive it
            state.remove()
            Iterator.empty
          } else {
            var st = state.getOption.getOrElse(BucketState(Long.MaxValue, 0L))
            var maxTs = Long.MinValue
            docs.foreach { case (id, ts, _, _) =>
              st = BucketState(math.min(st.minId, id), st.n + 1)
              maxTs = math.max(maxTs, ts.getTime)
            }
            state.update(st)
            // re-arm: live until the watermark passes the last occurrence
            // plus the horizon (must stay strictly above the watermark)
            state.setTimeoutTimestamp(
              math.max(maxTs + horizonMs, state.getCurrentWatermarkMs() + 1))
            // minEmit > 1 suppresses sub-threshold updates: state still
            // folds and times out identically, but singleton buckets
            // (the vast majority of a near-dup stream) never reach the
            // sink — the update volume drops to the collision set. n is
            // monotone and the keeper non-increasing, so the LAST
            // emission per bucket carries the final (keeper, n) and any
            // >= minEmit rollup over the emitted stream equals the
            // unsuppressed one.
            if (st.n >= minEmit)
              Iterator.single(BucketUpdate(band, bh, st.minId, st.n))
            else Iterator.empty
          }
      }.toDF()
  }

  final case class AdmitOut(
    doc_id: Long, source: String, n_tokens: Long, admitted: Boolean)

  final case class HllUpdate(source: String, m: Long, v_zero: Long,
    raw_estimate: Double, estimate: Double)

  /** Streaming HyperLogLog distinct-count — the live form of the p76
    * sketch ([[graft.operators.Sketches]]): each micro-batch folds its
    * key observations into a per-group register array (custom keyed
    * state: 2^p ints per group — CONSTANT in the stream length, the
    * whole point vs streaming COUNT(DISTINCT), whose state is the
    * distinct-key set itself) and emits the group's refreshed estimate.
    * Update mode, no timeout (a cardinality dashboard has no horizon).
    * The estimate arithmetic is the exact-integer-harmonic-sum
    * discipline of [[graft.operators.Sketches.hllEstimate]] scalar-form
    * (BigInt 2^(61-rho) sum, ONE double rounding), so a drained stream
    * equals the batch sketch bit-for-bit and the oracle restates it. */
  def streamHllDistinct(stream: DataFrame, grpCol: String, keyCol: String,
      p: Int): DataFrame = {
    require(p >= 4 && p <= 16, s"HLL precision must be in [4, 16], got $p")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val m = 1 << p
    val rows = stream.select(col(grpCol).cast("string"),
        graft.functions.HllRegRho(col(keyCol), p).as("pk"))
      .filter(col("pk").isNotNull)
      .as[(String, Int)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[Array[Int], HllUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (src, it, state: GroupState[Array[Int]]) =>
          val regs = state.getOption.getOrElse(new Array[Int](m))
          it.foreach { case (_, pk) =>
            val r = pk >>> 8
            val rho = pk & 255
            if (rho > regs(r)) regs(r) = rho
          }
          state.update(regs)
          var v0 = 0L
          var sum = BigInt(0)
          regs.foreach { rho =>
            if (rho == 0) v0 += 1L
            sum += BigInt(1) << (61 - rho)
          }
          val alpha =
            if (m == 16) 0.673
            else if (m == 32) 0.697
            else if (m == 64) 0.709
            else 0.7213 / (1.0 + 1.079 / m.toDouble)
          val raw = alpha * (m.toDouble * m.toDouble) *
            (1L << 61).toDouble / sum.toDouble
          val est =
            if (raw <= 2.5 * m && v0 > 0) m.toDouble * math.log(m.toDouble / v0)
            else raw
          Iterator.single(HllUpdate(src, m.toLong, v0, raw, est))
      }.toDF()
  }

  final case class QuantOut(source: String, n_rows: Long, n_sampled: Long,
    quantile: String, est_tokens: Long)
  final case class QuantState(n: Long, keep: Seq[(Long, Long, Long)])

  /** Streaming per-group quantile sketch — the live form of
    * [[graft.operators.Sketches.sampleQuantiles]], with the sample rule
    * adapted to arrival semantics: batch mode can two-pass a count and
    * threshold, a stream cannot know its final n, so the state is the
    * DETERMINISTIC BOTTOM-K — the k rows smallest in (hash63(id, seed),
    * id) order seen so far. Bottom-k is order-independent (the same set
    * regardless of arrival or merge order — the property reservoir
    * sampling by RNG does NOT have), so the drained answer is a pure
    * function of (ids, seed) and an independent SQL engine restates it
    * as a row_number ≤ k. State per group: k (z, id, value) triples
    * plus one count — nothing grows with the stream. Each micro-batch
    * re-emits the group's refreshed quantile rows (update mode). */
  def streamSampleQuantiles(stream: DataFrame, grpCol: String, idCol: String,
      valCol: String, k: Int, seed: Long,
      qs: Seq[(String, Double)]): DataFrame = {
    require(k > 0, "k must be positive")
    require(qs.nonEmpty && qs.forall { case (_, q) => q >= 0.0 && q < 1.0 },
      "quantiles must lie in [0, 1)")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    val rows = stream.select(col(grpCol).cast("string"),
        graft.operators.Sampling.hash63(col(idCol), seed),
        col(idCol).cast("long"), col(valCol).cast("long"))
      .as[(String, Long, Long, Long)]
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[QuantState, QuantOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (src, it, state: GroupState[QuantState]) =>
          val prev = state.getOption.getOrElse(QuantState(0L, Nil))
          var n = prev.n
          val buf = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
          buf ++= prev.keep
          it.foreach { case (_, z, id, v) => n += 1; buf += ((z, id, v)) }
          val keep = buf.sortBy(t => (t._1, t._2)).take(k).toSeq
          state.update(QuantState(n, keep))
          val vs = keep.map(_._3).sorted
          val m = vs.length
          qs.iterator.map { case (label, q) =>
            QuantOut(src, n, m.toLong, label,
              vs(math.min(m - 1, (q * m).toInt)))
          }
      }.toDF()
  }

  final case class PackOut(
    doc_id: Long, shard: Long, n_tokens: Long, bin: Long, bin_offset: Long)

  /** Streaming greedy sequence packing — the LIVE-ingest analogue of
    * [[graft.operators.Sampling.packBins]]: as documents arrive, each
    * shard's packing stream assigns (bin, bin_offset) by cutting the
    * running token total at `budgetTokens`, so training sequences fill
    * while the crawl is still running. Custom keyed state via
    * flatMapGroupsWithState: ONE long per shard (the cumulative token
    * total — nothing grows with the stream), update mode, no timeout
    * (a packing run has no horizon).
    *
    * Packing order — the determinism contract, st13's: the shard is a
    * pure seeded fold of the id; within a micro-batch a shard's
    * documents pack in (event-time, doc_id) order (the batch's rows
    * sort in the fold — per-(shard, batch) memory); across batches,
    * batch order. With the bounded single-file replay the composite
    * order is the global (event-time, doc_id) order, which the oracle
    * restates as a window cumsum. Unlike the batch form's hash order,
    * arrival order is the HONEST streaming semantic: a bin must close
    * when the budget fills, not wait for hash-earlier stragglers. */
  def streamPackBins(stream: DataFrame, textCol: String, idCol: String,
      tsCol: String, budgetTokens: Long, shards: Int, seed: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shards > 0, "shards must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    // NULL text ≡ blank (the p47 contract every other key applies):
    // the pre-r18 loud guard here diverged from the oracle's silent
    // NULL n_tokens — an engine/oracle failure-mode mismatch waiting
    // for the first NULL-text testdata generation
    val nTok = TextAnalysis.tokenCount(coalesce(col(textCol), lit("")))
      .cast("long")
    val rows = stream.select(col(idCol).cast("long"),
        graft.operators.Sampling.fold(col(idCol), seed, shards),
        col(tsCol).cast("timestamp"),
        nTok)
      .as[(Long, Long, java.sql.Timestamp, Long)]
    rows.groupByKey(_._2)
      .flatMapGroupsWithState[Long, PackOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (shard, it, state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(r => (r._3.getTime, r._1)).map { r =>
            val rec = PackOut(r._1, shard, r._4,
              cum / budgetTokens, cum % budgetTokens)
            cum += r._4
            rec
          }
          state.update(cum)
          out.iterator
      }.toDF()
  }

  /** Streaming per-source token-budget admission — the LIVE-ingest
    * analogue of [[graft.operators.Sampling.tokenBudgetSample]]: a
    * training-mix recipe says "take `budget` tokens of each source",
    * and the ingest must stop admitting a source's documents the
    * moment its budget is reached — while the crawl is still running,
    * not in a post-pass. Custom keyed state via flatMapGroupsWithState:
    * ONE long per source (the admitted-token total — nothing grows
    * with the stream), update mode, no timeout (a mix budget has no
    * horizon).
    *
    * Admission order — the contract that makes the result
    * deterministic: within a micro-batch a source's documents admit in
    * (event-time, doc_id) order (the batch's rows are sorted in the
    * fold — per-(source, batch) memory, the same bound every keyed
    * fold here has); across batches, in batch order. A document is
    * admitted iff the source's admitted-token total BEFORE it is
    * < budget — the budget-crossing document is included and admission
    * never resumes after crossing (the frozen total stays ≥ budget).
    * With the bounded single-file replay the composite order is the
    * global (event-time, doc_id) order, which is what the oracle
    * restates. */
  def tokenBudgetAdmit(stream: DataFrame, textCol: String,
      sourceCol: String, idCol: String, tsCol: String,
      budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val spark = stream.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // a NULL text would make the token count NULL, which the tuple
    // encoder rejects with an opaque NPE mid-stream — fail loudly at
    // the same contract p39's batch form states (broken upstream)
    import org.apache.spark.sql.functions.{lit, raise_error, when}
    val nTok = when(col(textCol).isNotNull,
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .otherwise(raise_error(lit(
        "graft tokenBudgetAdmit: NULL text — broken upstream ingest?"))
        .cast("long"))
    val rows = stream.select(col(idCol).cast("long"),
        col(sourceCol).cast("string"),
        col(tsCol).cast("timestamp"),
        nTok)
      .as[(Long, String, java.sql.Timestamp, Long)]
    rows.groupByKey(_._2)
      .flatMapGroupsWithState[Long, AdmitOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (src, it, state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val out = it.toSeq.sortBy(r => (r._3.getTime, r._1)).map { r =>
            val admitted = cum < budget
            if (admitted) cum += r._4
            AdmitOut(r._1, src, r._4, admitted)
          }
          state.update(cum)
          out.iterator
      }.toDF()
  }
}
