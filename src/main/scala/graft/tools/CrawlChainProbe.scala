package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** End-to-end crawl-chain scale probe (p86): replicate the fixture
  * warcs N× into a scratch landing dir (distinct names — file = task)
  * and run the WHOLE chain — robots gate → WARC parse → extraction →
  * NFC → C4 × Gopher filters → recrawl dedup → host-keyed split →
  * train-fold packing — timing the full report. Record keys derive
  * from a hash of the replicated file name (unique per copy), so the
  * dedup/split/pack stages run on the true replicated cardinality;
  * the recrawl stage sees every copy's kept page as an exact dup.
  *
  *   sbt "runMain graft.tools.CrawlChainProbe 100"
  */
object CrawlChainProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.length > 0) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = new java.io.File(graft.operators.PipelineQueries.WarcFixtureDir)
    val dst = java.nio.file.Files.createTempDirectory("graft_crawl_chain").toFile
    val files = src.listFiles().filter(_.getName.endsWith(".warc.gz"))
    for (c <- 0 until copies; f <- files)
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dst, s"c$c-${f.getName}").toPath)
    // 43-bit name hash × 100 keeps doc_key < 2^50, far under the
    // 2^60 recrawl snapshot offset
    val fileKey = shiftrightunsigned(xxhash64(col("file")), 21).cast("long")
    val t0 = System.nanoTime()
    // truncateLineage=false: the probe must exercise the full lineage a
    // cluster-scale plan carries; an in-memory checkpoint of a 100×
    // corpus is the wrong trade (a real ingest writes parquet between
    // stages)
    val report = graft.operators.PipelineQueries
      .crawlChain(spark, dst.getAbsolutePath, fileKey,
        truncateLineage = false)
      .filter(col("host") === "*").collect()
    val dt = (System.nanoTime() - t0) / 1e9
    val r = report.head
    println(f"[crawl-chain-probe] ${copies * files.length} files in $dt%.2f s: " +
      s"responses=${r.getLong(1)} allowed=${r.getLong(2)} kept=${r.getLong(3)} " +
      s"recrawl_dup=${r.getLong(4)} train_docs=${r.getLong(6)} " +
      s"train_tokens=${r.getLong(7)} bins=${r.getLong(8)}")
    dst.listFiles().foreach(_.delete())
    dst.delete()
    spark.stop()
  }
}
