package graft.tools

import org.apache.spark.sql.SparkSession

/** One-key dump for the p67 oracle loop: writes the engine result and
  * the oracle SQL so the DuckDB side can be diffed offline.
  *
  *   sbt "runMain graft.tools.P67Check /root/testdata/sf0.001 /tmp/p67"
  */
object P67Check {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = graft.operators.PipelineQueries.p67GopherRepetition(spark, args(0))
    df.write.mode("overwrite").parquet(args(1) + "/p67.parquet")
    val w = new java.io.PrintWriter(args(1) + "/p67.sql")
    w.write(graft.operators.PipelineQueries.p67Sql)
    w.close()
    spark.stop()
  }
}
