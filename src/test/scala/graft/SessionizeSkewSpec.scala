package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The q18/st06 skew hardening: a pathological single entity (one user
  * = 50 % of all events) must not serialize the whole sessionization
  * into one task. The two-phase plan salts phase 1 by (user, time
  * bucket) and merges boundary-touching sessions from the tiny
  * session list — this spec pins value-equality against the
  * single-pass plan on exactly that fixture, the probe's path choice,
  * and the balance claim (no phase-1 group exceeds one entity-bucket). */
class SessionizeSkewSpec extends AnyFunSuite {
  import TestSpark._
  import graft.operators.Relational

  private val GapUs = 1800L * 1000000L
  private val DayUs = 86400L * 1000000L

  /** 10k events, half of them one bot user, spread over ~6 days with
    * gaps straddling the 30-min threshold so sessions split, merge,
    * and cross day boundaries. Deterministic. */
  private lazy val skewed: DataFrame = {
    import spark.implicits._
    val rng = new scala.util.Random(1234)
    val t0 = 1700000000000000L // 2023-11-14 22:13:20 UTC, in micros
    var ts = t0
    val hot = (0 until 5000).map { i =>
      // mostly short gaps, occasional > 30 min silences, a few exact
      // boundary gaps (exactly 30 min = same session in q18 semantics)
      val gap = rng.nextInt(100) match {
        case n if n < 80 => rng.nextInt(120) * 1000000L        // ≤ 2 min
        case n if n < 95 => (31 + rng.nextInt(240)) * 60000000L // > 30 min
        case _ => GapUs                                         // exact 30 min
      }
      ts += gap
      (999L, 1000000L + i, ts)
    }
    val cold = (0 until 50).flatMap { u =>
      var cts = t0 + rng.nextInt(1000000) * 1000L
      (0 until 100).map { i =>
        cts += rng.nextInt(3600) * 1000000L
        (u.toLong, u * 10000L + i, cts)
      }
    }
    (hot ++ cold).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
  }

  private def canon(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)
      .sortBy(r => (r.head.asInstanceOf[Long], r(1).asInstanceOf[Long]))

  test("two-phase sessionization equals the single-pass plan on a 50%-skewed fixture") {
    val single = canon(Relational.sessionizeSinglePass(skewed, GapUs))
    val two = canon(Relational.sessionizeTwoPhase(skewed, GapUs, DayUs))
    assert(two == single)
    // sanity on the fixture itself: the hot user really did produce
    // multi-session, day-crossing structure
    val hotSessions = single.count(_.head == 999L)
    assert(hotSessions > 100, s"fixture degenerated: $hotSessions hot sessions")
  }

  test("two-phase also agrees at a coarser bucket and a tiny bucket") {
    // bucket size must not affect values — only the split points that
    // the merge pass re-joins; a 1-hour bucket forces MANY more
    // boundary merges and still agrees
    val single = canon(Relational.sessionizeSinglePass(skewed, GapUs))
    assert(canon(Relational.sessionizeTwoPhase(skewed, GapUs, 3600L * 1000000L)) == single)
    assert(canon(Relational.sessionizeTwoPhase(skewed, GapUs, 7L * DayUs)) == single)
  }

  test("the probe routes a skewed corpus to two-phase and a uniform one to single-pass") {
    // skewed fixture under a small per-task bound → two-phase numbers
    // must still flow through the public entrypoint
    val routed = canon(Relational.sessionize(skewed, GapUs, DayUs,
      maxEntityRowsPerTask = 1000L))
    assert(routed == canon(Relational.sessionizeSinglePass(skewed, GapUs)))
    // the plan actually chosen differs: two-phase windows over
    // (user_id, bucket); single-pass over user_id alone
    val twoPlan = Relational.sessionize(skewed, GapUs, DayUs, 1000L)
      .queryExecution.executedPlan.toString
    assert(twoPlan.contains("bucket"), s"expected the salted plan:\n$twoPlan")
    val singlePlan = Relational.sessionize(skewed, GapUs, DayUs, 1000000L)
      .queryExecution.executedPlan.toString
    assert(!singlePlan.contains("bucket"), s"expected the single-pass plan:\n$singlePlan")
  }

  test("phase-1 salting actually balances: no group exceeds one entity-bucket") {
    // the serialization unit of a window is its partition-key group;
    // with the day salt the hot user's 5000 events split into ~6
    // day-groups, so the largest group is a small fraction of the
    // entity — the property that keeps one bot from owning a task
    val groups = skewed
      .withColumn("bucket",
        floor(unix_micros(col("ts")) / lit(DayUs)).cast("long"))
      .groupBy("user_id", "bucket").count()
      .agg(max("count")).collect().head.getLong(0)
    val hotTotal = skewed.filter(col("user_id") === 999L).count()
    assert(groups < hotTotal / 2,
      s"largest salted group $groups vs hot entity $hotTotal — salt ineffective")
  }

  test("bucket-boundary micro-edges: exact gap across midnight merges, 1µs more splits") {
    import spark.implicits._
    // hand-pinned rows, not fixture luck: day boundary at us=86400e6·k.
    // user 1: last event 1s before midnight, next exactly gap later
    // (single-pass semantics: strictly > splits, == merges) — the
    // two-phase path must merge across the bucket seam. user 2: one
    // microsecond beyond the gap — must split. user 3: an event ON the
    // boundary itself.
    val B = DayUs * 20000L // some midnight well inside range
    val rows = Seq(
      (1L, 10L, B - 1000000L),
      (1L, 11L, B - 1000000L + GapUs),
      (2L, 20L, B - 1000000L),
      (2L, 21L, B - 1000000L + GapUs + 1L),
      (3L, 30L, B),
      (3L, 31L, B + 1L))
      .toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    def run(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    val single = run(Relational.sessionizeSinglePass(rows, GapUs))
    val two = run(Relational.sessionizeTwoPhase(rows, GapUs, DayUs))
    assert(two == single)
    val expected = Seq(
      (1L, 1L, 2L, GapUs),   // merged across the seam, duration == gap
      (2L, 1L, 1L, 0L),      // split: two singleton sessions
      (2L, 2L, 1L, 0L),
      (3L, 1L, 2L, 1L))      // boundary event groups with its successor
    assert(single == expected, s"got $single")
  }

  test("plan equivalence holds across random corpora, including null users") {
    import spark.implicits._
    // property-style: 3 seeds × 2 bucket sizes over random gap
    // structure, with a null-user slice (the classic skew entity —
    // nulls group as ONE user in a window partition, both plans must
    // agree on that too)
    for (seed <- Seq(1, 2, 3)) {
      val rng = new scala.util.Random(seed)
      val t0 = 1700000000000000L
      val rows = (0 until 3000).map { i =>
        val u: java.lang.Long =
          if (rng.nextInt(10) == 0) null else java.lang.Long.valueOf(rng.nextInt(20).toLong)
        (u, i.toLong, t0 + rng.nextInt(6 * 86400) * 1000000L)
      }.toDF("user_id", "event_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      // hash compare (Verify.canonicalHash) — the null user sorts
      // ambiguously against user 0 under a tuple sort, the canonical
      // hash's null-tagged rendering doesn't
      val single = Verify.canonicalHash(Relational.sessionizeSinglePass(rows, GapUs))
      for (bucket <- Seq(3600L * 1000000L, DayUs)) {
        val two = Verify.canonicalHash(Relational.sessionizeTwoPhase(rows, GapUs, bucket))
        assert(two == single, s"seed=$seed bucket=$bucket")
      }
    }
  }

  test("degenerate inputs: empty and single-event corpora") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long, Long)].toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    assert(Relational.sessionizeSinglePass(empty, GapUs).count() == 0L)
    assert(Relational.sessionizeTwoPhase(empty, GapUs, DayUs).count() == 0L)
    assert(Relational.sessionize(empty, GapUs, DayUs).count() == 0L)
    val one = Seq((7L, 1L, 1700000000000000L)).toDF("user_id", "event_id", "us")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
    for (df <- Seq(Relational.sessionizeSinglePass(one, GapUs),
        Relational.sessionizeTwoPhase(one, GapUs, DayUs))) {
      val r = df.collect()
      assert(r.length == 1 && r.head.getLong(0) == 7L &&
        r.head.getLong(1) == 1L && r.head.getLong(2) == 1L &&
        r.head.getLong(4) == 0L)
    }
  }

  test("streaming fragment merge: touch merges, gap splits, counts sum") {
    import spark.implicits._
    def t(us: Long) = new java.sql.Timestamp(us / 1000L)
    // fragments as the salted session_window state would emit them:
    // A: two touching fragments across midnight (end == next start),
    // B: overlap (end > next start), C: real gap (no merge)
    val frags = Seq(
      (1L, t(1000L * 1000000L), t(2000L * 1000000L), 5L),
      (1L, t(2000L * 1000000L), t(2500L * 1000000L), 3L),
      (2L, t(1000L * 1000000L), t(2200L * 1000000L), 4L),
      (2L, t(2000L * 1000000L), t(3000L * 1000000L), 6L),
      (3L, t(1000L * 1000000L), t(1500L * 1000000L), 2L),
      (3L, t(1501L * 1000000L), t(2000L * 1000000L), 7L))
      .toDF("user_id", "session_start", "session_end", "n_events")
    val merged = graft.streaming.StreamingQueries.mergeTouchingSessions(frags)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
    assert(merged.toSeq == Seq(
      (1L, 1000L * 1000, 2500L * 1000, 8L),
      (2L, 1000L * 1000, 3000L * 1000, 10L),
      (3L, 1000L * 1000, 1500L * 1000, 2L),
      (3L, 1501L * 1000, 2000L * 1000, 7L)))
    // dedupFragments = false (st07's append-mode shortcut: each
    // fragment emitted exactly once, so the re-emission rollup is an
    // identity) must yield the same merge on unique-fragment input
    val mergedNoDedup = graft.streaming.StreamingQueries
      .mergeTouchingSessions(frags, dedupFragments = false)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime,
        r.getTimestamp(2).getTime, r.getLong(3)))
    assert(mergedNoDedup.toSeq == merged.toSeq)
  }
}
