package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: reproduce the pass-2 slowdown of model-estimator keys.
  * Times the given keys, then (optionally) runs the whole suite once,
  * then times the keys again — isolates cross-key pollution.
  *
  *   sbt "runMain graft.tools.BenchProbe /root/testdata/sf0.01 full b12_bql_predictive_relevance b13_bql_variables"
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1) // "full" = run whole suite between passes; "solo" = nothing between
    val keys = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(k: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(k)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    // "cold" = reset the operator-algorithm caches between passes, the
    // way Bench does — steady-state COLD cost, not warm-cache reuse
    def reset(): Unit =
      if (mode == "cold") graft.operators.PipelineQueries.resetOperatorCaches()
    val p1 = keys.map(k => k -> time(k))
    if (mode == "full")
      graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (k, fn) =>
        try fn(spark, sfDir).count() catch { case _: Throwable => () }
      }
    reset()
    val p2 = keys.map(k => k -> time(k))
    reset()
    val p3 = keys.map(k => k -> time(k))
    println("[probe] pass1 " + p1.map { case (k, t) => f"$k=$t%.2f" }.mkString(" "))
    println("[probe] pass2 " + p2.map { case (k, t) => f"$k=$t%.2f" }.mkString(" "))
    println("[probe] pass3 " + p3.map { case (k, t) => f"$k=$t%.2f" }.mkString(" "))
    spark.stop()
  }
}
