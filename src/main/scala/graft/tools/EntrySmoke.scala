package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: smoke-check the driver contract's flagship entry —
  * `SparkEntry.entry(spark)` on sf0.001 must return rows > 0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows = $n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
