package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev scratch: print the executed plan of one SparkEntry key. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val Array(key, sfDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(key)(spark, sfDir)
    df.explain("formatted")
    spark.stop()
  }
}
