package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad (not part of the driver contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dept = Seq((1L, "eng"), (2L, "ops"), (3L, "empty")).toDF("dk", "dname")
    val emp = Seq((1L, "ann", 100.0), (1L, "bob", 150.0), (2L, "cid", 90.0),
      (2L, "dee", 120.0), (2L, "eve", 80.0)).toDF("edk", "ename", "sal")

    // depth-2 outer reference: innermost exists references dk (2 frames up)
    // attempt: chained .outer()
    try {
      val innermost = emp.as("e2")
        .where(col("e2.edk") === col("dk").outer().outer() && col("e2.sal") > lit(100))
      val mid = emp.as("e")
        .where(col("e.edk") === col("dk").outer() && innermost.exists())
      val out = dept.where(mid.exists()).orderBy("dname")
      println("CHAINED OUTER OK: " + out.collect().map(_.getString(1)).mkString(","))
    } catch { case e: Throwable => println("CHAINED OUTER FAIL: " + e.toString.take(300)) }

    // attempt: single .outer() on the depth-2 ref (transitive resolution?)
    try {
      val innermost = emp.as("e2")
        .where(col("e2.edk") === col("dk").outer() && col("e2.sal") > lit(100))
      val mid = emp.as("e")
        .where(col("e.edk") === col("dk").outer() && innermost.exists())
      val out = dept.where(mid.exists()).orderBy("dname")
      println("SINGLE OUTER OK: " + out.collect().map(_.getString(1)).mkString(","))
    } catch { case e: Throwable => println("SINGLE OUTER FAIL: " + e.toString.take(300)) }

    spark.stop()
  }
}
