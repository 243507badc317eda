package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and splitting operators for training-data
  * pipelines — engine extensions beyond the reference surface.
  *
  * Everything here is a pure function of (key, seed): re-running the
  * pipeline, re-partitioning the input, adding executors, or retrying a
  * task can never move a row between folds — the property a train/test
  * split must have at 100 TB, where `rand()`-based splits silently
  * reshuffle on every retry. No UDFs: the hash is native column
  * arithmetic (Java wrapping multiply = Spark long multiply), so the
  * whole assignment stays inside whole-stage codegen and the DuckDB
  * oracle can restate it limb-for-limb.
  */
object Sampling {

  /** SplitMix64 finalizer over a long column — bit-equal to
    * [[DetRngHash.mix]] (spec-pinned). A native Catalyst expression
    * ([[graft.functions.Mix64]]): ANSI mode rejects the wrapping
    * multiplies as column arithmetic, and the expression stays inside
    * whole-stage codegen. */
  def mix64(c: Column): Column = graft.functions.Mix64(c)

  /** Seeded hash of a long key, shifted into [0, 2^63) so that signed
    * (JVM) and unsigned (DuckDB UBIGINT) arithmetic agree on order and
    * modulus. NUMERIC keys only: under ANSI mode a non-castable key
    * (string, …) makes the cast THROW — fail-loudly, never a silent
    * NULL order. Callers with non-numeric keys use [[orderHash63]],
    * which dispatches here only for numeric key columns. */
  def hash63(key: Column, seed: Long): Column =
    shiftrightunsigned(mix64(key.cast("long").bitwiseXOR(lit(seed))), 1)

  /** Seeded [0, 2^63) order hash for ANY key type: numeric keys use
    * [[hash63]] (the DuckDB-restateable mix64 limb arithmetic every
    * oracle-backed split/cap key relies on); everything else uses a
    * seeded xxhash64 — deterministic in (key, seed) and partition-
    * independent like the numeric path, just not SQL-restateable
    * (non-numeric-key callers are not oracle-backed). */
  private[graft] def orderHash63(df: DataFrame, keyCol: String, seed: Long): Column =
    if (df.schema(keyCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
      hash63(col(keyCol), seed)
    else shiftrightunsigned(xxhash64(col(keyCol), lit(seed)), 1)

  /** Deterministic fold assignment in [0, folds): the train/val/test
    * primitive. Split by the DOCUMENT key for an iid split, or by a
    * GROUP key (source id, cluster keeper id from
    * [[Dedup.connectedComponents]]) to keep near-duplicates and
    * same-origin documents in one fold — the leakage-safe form. */
  def fold(key: Column, seed: Long, folds: Int): Column = {
    require(folds > 0, "folds must be positive")
    pmod(hash63(key, seed), lit(folds.toLong))
  }

  /** Weighted split assignment: 0-based index of the cumulative-weight
    * interval the key's seeded hash lands in — `splitByWeights(k, s,
    * Seq(8, 1, 1))` is the 80/10/10 train/val/test split as ONE
    * expression (the [[fold]]+thresholds composition p21 spells out,
    * closed over arbitrary weights). Boundaries are
    * floor(cum_i/total · 2⁶³) — the cum/total quotient rounds once per
    * boundary identically on every engine, and the 2⁶³ multiply is a
    * pure exponent shift (exact; the long cast saturates at 2⁶³−1 if a
    * quotient rounds to exactly 1.0, which only makes that degenerate
    * boundary unreachable). Deterministic in (key, seed): rerun-,
    * retry-, and repartition-stable, like everything in this module.
    * Also SQL-exposed as `graft_split` (spec-pinned bit-equal). */
  def splitByWeights(key: Column, seed: Long, weights: Seq[Double]): Column = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.forall(w => w > 0 && !w.isInfinite && !w.isNaN),
      "weights must be positive and finite")
    val bounds = splitBounds(weights)
    val u = hash63(key, seed)
    bounds.zipWithIndex.foldRight(lit(weights.length - 1): Column) {
      case ((b, i), rest) => when(u < b, lit(i)).otherwise(rest)
    }
  }

  /** Shared boundary arithmetic for [[splitByWeights]] and the
    * `graft_split` SQL registration — one derivation, so the two
    * surfaces cannot drift. Returns the n−1 interior boundaries. */
  private[graft] def splitBounds(weights: Seq[Double]): Seq[Long] = {
    val total = weights.sum
    weights.scanLeft(0.0)(_ + _).tail.init
      .map(c => ((c / total) * 9223372036854775808.0).toLong)
  }

  /** Greedy sequence packing — the pretraining step between filtering
    * and the tokenizer: concatenate documents in a deterministic order
    * and cut at a fixed token budget, so each `bin` is one training
    * sequence's worth of text. A document's bin is where its first
    * token lands (splitting an over-long document across bin boundaries
    * is the tokenizer's job downstream).
    *
    * Scale shape: packing is inherently sequential, so the corpus first
    * shards by a seeded hash of the key — `shards` independent packing
    * streams, each a window cumsum over its own hash order. ONE shuffle
    * on the shard key; shard sizes are hash-balanced; nothing global.
    * Deterministic: (key, seed) fixes the shard, the order, and the
    * cumulative offsets, so retries and repartitions cannot move a
    * document between bins.
    *
    * Returns the input plus (shard, bin, bin_offset) — bin_offset is
    * the document's starting token offset within its bin. */
  def packBins(df: DataFrame, idCol: String, tokenCol: String,
      budgetTokens: Long, shards: Int, seed: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hash63(col(idCol), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("shard", fold(col(idCol), seed, shards))
      .withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      // integral division, not double: a shard's cumulative token count
      // passes 2^53 well inside the 100 TB design point, where the
      // double quotient can round across a bin boundary (and diverge
      // from the oracle's exact `//`)
      .withColumn("bin", expr(s"__cum div ${budgetTokens}L"))
      .withColumn("bin_offset", pmod(col("__cum"), lit(budgetTokens)))
      .drop("__cum")
  }

  /** Token-EXACT sequence packing — the concat-and-cut form a GPT-class
    * trainer actually consumes: documents concatenate in the seeded
    * deterministic order and CUT at every multiple of `budgetTokens`,
    * so a long document SPLITS across bins and every bin except each
    * shard's last holds exactly the budget (no padding waste —
    * [[packBins]] assigns whole documents and leaves ragged bins; this
    * emits the per-piece layout). One row per (document, piece):
    * (id, shard, tokens, piece_no, bin, start_offset, piece_tokens),
    * with Σ piece_tokens = the document's token count and pieces after
    * the first starting at offset 0 by construction. Zero-token
    * documents keep one empty piece row (the p47 contract).
    *
    * Scale shape: [[packBins]]'s — ONE shuffle on the seeded shard
    * key, a window cumsum per shard, then a row-local explode over
    * each document's crossed bin boundaries (rows out = docs + cuts,
    * linear in corpus tokens / budget). All arithmetic is exact
    * integer, so the layout restates relationally at any scale. */
  def packSplit(df: DataFrame, idCol: String, tokenCol: String,
      budgetTokens: Long, shards: Int, seed: Long): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(shards > 0, "shards must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(hash63(col(idCol), seed), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val b = budgetTokens
    val first = expr(s"__cum div ${b}L")
    val last = greatest(first,
      expr(s"(__cum + $tokenCol - 1) div ${b}L"))
    df.withColumn("shard", fold(col(idCol), seed, shards))
      .withColumn("__cum", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("__first", first)
      .withColumn("bin", explode(sequence(col("__first"), last)))
      .withColumn("__pstart", greatest(col("__cum"), col("bin") * b))
      .withColumn("__pend",
        least(col("__cum") + col(tokenCol), (col("bin") + 1) * b))
      .select(col(idCol), col("shard"), col(tokenCol),
        (col("bin") - col("__first")).as("piece_no"), col("bin"),
        (col("__pstart") - col("bin") * b).as("start_offset"),
        (col("__pend") - col("__pstart")).as("piece_tokens"))
  }

  /** Weighted source mixing: deterministic up/down-sampling by a
    * per-row weight w ≥ 0 — the epoch-mixing step after [[fold]]/
    * [[stratifiedSample]] (e.g. repeat wiki 3.2×, subsample crawl to
    * 0.6×). Each row emits floor(w) copies plus one more iff
    * hash63(key, seed) < frac(w)·2⁶³ — a pure function of (key, seed),
    * so the realized mix is rerun-, retry-, and repartition-stable and
    * E[copies] = w exactly. Output adds `copy_no` (0-based) so
    * downstream shuffling can salt on (key, copy_no).
    *
    * Scale shape: row-local arithmetic + a generator explode — no
    * shuffle, no driver state; weights arrive as a Column (a literal
    * CASE over sources, or a broadcast-joined dimension). Weights are
    * per-source repetition factors — single digits in practice; the
    * explode materializes floor(w) copies per row, so a runaway weight
    * (10⁶+) is a row-explosion bug at the call site, not something this
    * operator caps silently.
    *
    * The fractional threshold floor(frac·2⁶³) is exact arithmetic on
    * both engines: multiplying a double by 2⁶³ (a power of two) only
    * shifts the exponent, so the product is EXACT and bounded by
    * (1 − 2⁻⁵³)·2⁶³ < 2⁶³ — the long cast can never overflow (ANSI
    * mode would throw) and the comparison against the [0, 2⁶³) hash is
    * bit-identical in the JVM and DuckDB. */
  def weightedMix(df: DataFrame, keyCol: String, weight: Column,
      seed: Long): DataFrame = {
    // a NULL weight (a broadcast-joined weights dimension missing this
    // row's source) must FAIL, not silently drop the row — a dropped
    // source would be indistinguishable from a deliberate 0× weight
    val w = when(weight.isNotNull, weight.cast("double"))
      .otherwise(raise_error(lit(
        "graft weightedMix: NULL weight — missing key in the weights dimension?"))
        .cast("double"))
    val base = floor(w).cast("long")
    val frac = w - floor(w)
    val thresh = floor(frac * lit(math.pow(2, 63))).cast("long")
    val extra = when(hash63(col(keyCol), seed) < thresh, 1L).otherwise(0L)
    df.withColumn("__n_copies", base + extra)
      .filter(col("__n_copies") >= 1)
      .withColumn("copy_no",
        explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** Deterministic stratified sample: exactly min(n, |stratum|) rows
    * per stratum, selected by seeded hash order (ties broken by key so
    * the selection is total even under hash collisions).
    *
    * Scale shape: ONE hash-partitioned window on the stratum column.
    * Rank-k selection inside each stratum streams through the window
    * sort; nothing is collected. A heavily skewed stratum bounds at its
    * own sort — for per-stratum quotas at extreme skew, pre-filter with
    * an approximate threshold first (the quota semantics here are
    * exact-k, which no sampling shortcut preserves). */
  def stratifiedSample(df: DataFrame, strataCol: String, keyCol: String,
      n: Int, seed: Long): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(col(strataCol))
      .orderBy(orderHash63(df, keyCol, seed), col(keyCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= n)
      .drop("__rk")
  }

  /** Skew-safe per-group cap: keep the `cap` rows of each group that
    * are smallest in the total order (hash63(key, seed), key) — the
    * same semantics as [[stratifiedSample]], but built for the
    * per-DOMAIN cap of a web corpus, where group sizes are Zipfian and
    * one hot group (a crawler-heavy domain holding 5–10 % of all rows)
    * would serialize a single-window sort on one reducer.
    *
    * Two-phase rank: rows first shuffle on (group, cell) — `cells`
    * deterministic sub-buckets of the key hash — and each cell keeps
    * its own top-`cap`, bounding every sort at |group|/cells expected
    * rows; the ≤ cap·cells survivors per group then take the exact
    * global top-`cap` in a second, trivially small window. The result
    * is IDENTICAL to the one-window form for every `cells` ≥ 1: a row's
    * rank within any cell is ≤ its rank within the whole group, so no
    * group-wide top-`cap` row can be dropped in phase one, and phase
    * two applies the exact total order. Deterministic in (key, seed)
    * like everything in this module — `cells` and the physical
    * partitioning cannot move a row in or out of the cap.
    *
    * NULL groups form one (capped) group, as in any window — callers
    * that want NULL-group rows UNGATED (e.g. documents with no URL in a
    * domain cap) should split them out before calling. */
  /** Cell id for [[capPerGroup]]'s phase-one sub-bucketing: a generic
    * 64-bit hash (xxhash64) of the key, NOT the cast-to-long mix64 the
    * ordering hash uses — a cast of a non-numeric key yields NULL,
    * which would silently put every row of a group in ONE cell and
    * reintroduce the single-reducer sort the two-phase design exists
    * to avoid. xxhash64 hashes any type. Correctness never depends on
    * cell assignment (phase two applies the exact total order), so
    * this needs no oracle restatement. */
  private[graft] def cellOf(keyCol: Column, seed: Long, cells: Int): Column =
    pmod(shiftrightunsigned(xxhash64(keyCol, lit(seed)), 17), lit(cells.toLong))

  /** Exact deterministic token-budget sampling — "take `budget` tokens'
    * worth of each source", the step that realizes a training-mix
    * recipe ("300 B tokens of crawl, 30 B of code") once
    * [[weightedMix]] has chosen the ratios. A document is kept iff the
    * total token count of the documents BEFORE it in the seeded
    * per-group order (hash63(key, seed), key) is < `budget`: the kept
    * set is a prefix of the hash order, the budget-crossing document is
    * included, and the realized token count is the smallest prefix sum
    * ≥ budget (the whole group when it is smaller). Pure function of
    * (key, seed): retries, repartitions, and cluster layout cannot move
    * a document in or out of the sample.
    *
    * Scale shape — an exact prefix WITHOUT a per-group corpus sort.
    * A window cumsum over a Zipfian source would serialize the hot
    * group on one reducer; but because the order IS the hash, the kept
    * set is a hash-threshold set, and the threshold is found the way
    * [[graft.operators.TextAnalysis.lengthQuantileFilter]] finds its
    * quantiles — on a bounded histogram, never the corpus: rows reduce
    * to a (group, bucket) token histogram over the top `bucketBits`
    * hash bits (map-side combined; the exchange carries ≤ 2^bucketBits
    * rows per group), the cumsum runs over that bounded histogram, and
    * each group gets at most ONE boundary bucket with
    * cum_start < budget ≤ cum_end. Rows join the histogram back on
    * (group, bucket) (build side bounded; broadcast- or co-partition-
    * able): below-boundary buckets are kept row-locally, above-boundary
    * dropped row-locally, and only the boundary bucket's expected
    * |group|/2^bucketBits rows pay an exact per-row prefix window.
    * Identical to the one-window form for every bucketBits by prefix
    * decomposition (`cum_start + prefix-within-bucket` IS the global
    * prefix; the strict/inclusive split keeps zero-token documents
    * exact at the boundary: full buckets need cum_end < budget, so
    * every member's prefix is < budget even when its own count is 0).
    *
    * Returns the input plus `kept`. NULL token counts raise (a missing
    * count is a broken upstream, not a 0-token document). */
  def tokenBudgetSample(df: DataFrame, groupCol: String, keyCol: String,
      tokenCol: String, budget: Long, seed: Long,
      bucketBits: Int = 16): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(bucketBits >= 0 && bucketBits <= 32, "bucketBits must be in [0, 32]")
    val tok = when(col(tokenCol).isNotNull, col(tokenCol).cast("long"))
      .otherwise(raise_error(lit(
        "graft tokenBudgetSample: NULL token count — broken upstream tokenization?"))
        .cast("long"))
    val base = df
      .withColumn("__h", orderHash63(df, keyCol, seed))
      .withColumn("__tok", tok)
      .withColumn("__b", shiftright(col("__h"), 63 - bucketBits))
    val wB = Window.partitionBy(col(groupCol)).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = base.groupBy(col(groupCol), col("__b"))
      .agg(sum(col("__tok")).as("__btok"))
      .withColumn("__cum_end", sum(col("__btok")).over(wB))
      .withColumn("__cum_start", col("__cum_end") - col("__btok"))
      .select(col(groupCol), col("__b"), col("__cum_start"), col("__cum_end"))
    val joined = base.join(cum, Seq(groupCol, "__b"))
    val wRow = Window.partitionBy(col(groupCol))
      .orderBy(col("__h"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val full = joined.filter(col("__cum_end") < budget)
      .withColumn("kept", lit(true))
    val dropped = joined.filter(col("__cum_start") >= budget)
      .withColumn("kept", lit(false))
    // at most one bucket per group lands here, so the window partition
    // is the boundary slice only — expected |group|/2^bucketBits rows
    val boundary = joined
      .filter(col("__cum_start") < budget && col("__cum_end") >= budget)
      .withColumn("kept",
        col("__cum_start") + coalesce(sum(col("__tok")).over(wRow), lit(0L))
          < budget)
    full.unionByName(dropped).unionByName(boundary)
      .drop("__h", "__tok", "__b", "__cum_start", "__cum_end")
  }

  def capPerGroup(df: DataFrame, groupCol: String, keyCol: String,
      cap: Int, seed: Long, cells: Int = 64): DataFrame = {
    require(cap > 0, "cap must be positive")
    require(cells > 0, "cells must be positive")
    val h = orderHash63(df, keyCol, seed)
    val cell = cellOf(col(keyCol), seed, cells)
    val w1 = Window.partitionBy(col(groupCol), col("__cell"))
      .orderBy(h, col(keyCol))
    val w2 = Window.partitionBy(col(groupCol))
      .orderBy(h, col(keyCol))
    df.withColumn("__cell", cell)
      .withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= cap)
      .withColumn("__rk", row_number().over(w2))
      .filter(col("__rk") <= cap)
      .drop("__cell", "__r1", "__rk")
  }
}
