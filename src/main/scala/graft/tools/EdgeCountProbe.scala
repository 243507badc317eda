package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: how many LSH pair edges does the p18 component
  * closure see at a given dir? Decides the driver union-find bound
  * (edges ≤ bound → O(E·α) single-collect path; beyond → the
  * distributed label-prop loop).
  *
  *   sbt "runMain graft.tools.EdgeCountProbe /tmp/graft_scale100_r15"
  */
object EdgeCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val pairs = graft.operators.PipelineQueries
      .minhashCandsForProbe(spark, dir)
      .filter(col("est_jaccard") >= 0.2)
    val n = pairs.count()
    println(f"[edgecount] $dir: $n edges in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    spark.stop()
  }
}
