package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Dev scratch: per-Spark-job wall attribution inside a SparkEntry key —
  * runs each key twice (pass 2 = warm codegen, the bench's min-pass
  * regime) with a listener recording every job's duration and first
  * stage name, so a key's wall time decomposes into its actual jobs.
  *
  *   runMain graft.tools.JobProfile <sfDir> <key>[,<key>...]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String, Int)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(e.stageInfos.lastOption.map(_.name.split("\n")(0)))
          .getOrElse("?")
        jobs.put(e.jobId, (e.time, desc, e.stageInfos.map(_.numTasks).sum))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(e.jobId)).foreach { case (t0, d, nt) =>
          done.add((e.jobId, e.time - t0, d, nt))
        }
      }
    })
    keys.foreach { key =>
      for (pass <- 1 to 2) {
        graft.operators.PipelineQueries.resetOperatorCaches()
        done.clear()
        val t0 = System.nanoTime()
        val n = graft.SparkEntry.queries(key)(spark, sfDir).count()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        import scala.jdk.CollectionConverters._
        val ds = done.asScala.toSeq.sortBy(_._1)
        println(f"[jp] === $key pass=$pass total=$dt%.2f s rows=$n jobs=${ds.size} jobMsSum=${ds.map(_._2).sum}")
        ds.foreach { case (id, ms, d, nt) =>
          println(f"[jp]   job=$id%-4d ${ms}%6d ms tasks=$nt%-4d ${d.take(110)}")
        }
      }
    }
    spark.stop()
  }
}
