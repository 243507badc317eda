package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry key against a testdata dir and write its
  * result parquet (same shape the driver's Verify dump uses), so a new
  * key can be DuckDB-compared locally without running all keys.
  *
  *   sbt "runMain graft.tools.RunOne b26_theta_correlated /root/testdata/sf0.01 /tmp/out"
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(key, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries.getOrElse(key,
      sys.error(s"no such key: $key; known = ${graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val t0 = System.nanoTime()
    fn(spark, sfDir).coalesce(1).write.mode("overwrite").parquet(s"$outDir/$key")
    println(f"[runone] $key done in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
