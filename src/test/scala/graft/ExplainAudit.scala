package graft

import org.apache.spark.sql.DataFrame

/** Plan auditor (dev tool): prints `explain("formatted")` for the
  * scale-critical queries so pushdown / broadcast / whole-stage-codegen
  * shapes can be reviewed. Run:
  *   sbt "Test/runMain graft.ExplainAudit [sfDir] [key ...]"
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val keys = if (args.length > 1) args.tail.toSeq
      else Seq("q01_agg", "q03_join_topk", "q14_star_join", "b01_bql_select",
        "b02_bql_join", "b03_bql_subquery", "b17_bql_exists",
        "p01_dedup_exact", "p02_minhash_lsh", "p06_ann_topk")
    val spark = TestSpark.spark
    keys.foreach { k =>
      println(s"\n========== $k ==========")
      val df: DataFrame = SparkEntry.queries(k)(spark, sfDir)
      df.explain("formatted")
    }
    spark.stop()
  }
}
