package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: how many times does the generated projection code call
  * the GopherRepetition kernel per row, and what does each evaluation
  * strategy cost on the 100x corpus? */
object KernelCountProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100_r17"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.load(spark, dir, "documents")
    val rep = graft.operators.TextAnalysis.gopherRepetition(docs, "text", "doc_id")
    // generated code: count kernel call sites
    val code = org.apache.spark.sql.execution.debug.codegenString(rep.queryExecution.executedPlan)
    val calls = "GopherRepetition\\.kernel".r.findAllIn(code).size
    println(s"[probe] kernel call sites in generated code: $calls")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    time("full battery (all 14 cols, xxhash-forced)") {
      rep.select(xxhash64(rep.columns.map(col): _*).as("h"))
        .agg(count(lit(1)), max(col("h"))).head().getLong(0)
    }
    time("single fraction only") {
      rep.select(col("dup_5gram_char_frac"))
        .agg(count(lit(1)), max(col("dup_5gram_char_frac"))).head().getLong(0)
    }
    spark.stop()
  }
}
