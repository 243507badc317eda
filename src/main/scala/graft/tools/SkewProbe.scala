package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Empirical probe for the r12 sessionization skew hardening: a 10 M-row
  * events corpus where ONE user owns half the rows (the bot-account /
  * null-user shape), timed through the single-shuffle plan (hot entity
  * serializes into one window task) and the two-phase plan (day-salted
  * phase 1, session-list merge). Also shows the auto entrypoint routing
  * to two-phase via its max-rows-per-user probe.
  *
  *   sbt "runMain graft.tools.SkewProbe /tmp/graft_scale100 /tmp/graft_skew"
  *
  * Expects the 100× events dir from ScaleProbe (or builds one 10× if
  * absent). The skewed copy remaps half the user ids to one hot id —
  * timestamps keep their 30-day span, so the day salt splits the hot
  * entity ~30 ways.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/tmp/graft_scale100"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_skew"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = s"$srcDir/events.parquet"
    require(new java.io.File(src).exists(), s"run ScaleProbe first: $src missing")
    val skewed = s"$outDir/events.parquet"
    if (!new java.io.File(skewed).exists()) {
      new java.io.File(outDir).mkdirs()
      // half the corpus becomes ONE user; keep multiple files so the
      // scan parallelizes (the skew must come from the window, not IO)
      spark.read.parquet(src)
        .withColumn("user_id",
          when(col("user_id") % 2 === 0, lit(999999999L)).otherwise(col("user_id")))
        .repartition(32)
        .write.mode("overwrite").parquet(skewed)
      println(s"[skew] built $skewed")
    }
    val events = spark.read.parquet(skewed)
    val total = events.count()
    val hot = events.filter(col("user_id") === 999999999L).count()
    println(f"[skew] events=$total hot-user rows=$hot (${hot * 100.0 / total}%.1f%%)")
    def sample(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // warmup
    spark.range(1000000).selectExpr("sum(id)").collect()
    val gap = 1800L * 1000000L
    val day = 86400L * 1000000L
    // two alternating passes, min per path — page-cache/JIT warmth then
    // affects both paths equally instead of whichever ran second
    val paths: Seq[(String, () => Long)] = Seq(
      "single-pass" -> (() =>
        graft.operators.Relational.sessionizeSinglePass(events, gap).count()),
      "two-phase" -> (() =>
        graft.operators.Relational.sessionizeTwoPhase(events, gap, day).count()),
      "auto(probe)" -> (() =>
        graft.operators.Relational.sessionize(events, gap, day).count()))
    val runs = (1 to 2).flatMap(_ => paths.map { case (l, f) =>
      val (t, n) = sample(f())
      (l, t, n)
    })
    paths.foreach { case (l, _) =>
      val mine = runs.filter(_._1 == l)
      println(f"[skew] $l%-14s min=${mine.map(_._2).min}%8.2f s  " +
        f"samples=${mine.map(t => f"${t._2}%.2f").mkString(",")}  rows=${mine.head._3}")
    }
    require(runs.map(_._3).distinct.size == 1, "paths disagree on session count")
    spark.stop()
  }
}
