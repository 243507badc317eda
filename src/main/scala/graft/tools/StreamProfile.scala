package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev scratch: per-micro-batch duration breakdown for streaming keys —
  * registers a StreamingQueryListener and dumps each progress record's
  * durationMs map (addBatch, getBatch, latestOffset, queryPlanning,
  * walCommit, commitOffsets) plus state-operator commit times, so the
  * streaming family's fixed overhead is attributable to a phase instead
  * of a key.
  *
  *   runMain graft.tools.StreamProfile <sfDir> <key>[,<key>...]
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        sys.env.getOrElse("SPARK_GRAFT_ROCKSDB_CHANGELOG", "false"))
      .config("spark.sql.codegen.cache.maxEntries", "8192")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val lock = new Object
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit =
        lock.synchronized { println(s"[sp] started ${e.name}") }
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
        lock.synchronized {
          val p = e.progress
          val dur = p.durationMs
          println(s"[sp] batch=${p.batchId} rows=${p.numInputRows} " +
            s"durations=${dur}")
          p.stateOperators.foreach { so =>
            println(s"[sp]   state op=${so.operatorName} rowsTotal=${so.numRowsTotal} " +
              s"commitMs=${so.commitTimeMs} metrics=${so.customMetrics}")
          }
        }
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        lock.synchronized { println(s"[sp] terminated") }
    })
    (keys ++ keys).foreach { key =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(key)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      // give async listener events a moment to flush in order
      Thread.sleep(500)
      println(f"[sp] === $key total=$dt%.2f s rows=$n")
    }
    spark.stop()
  }
}
