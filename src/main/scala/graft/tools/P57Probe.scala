package graft.tools

import graft.Tables
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dup-heavy keeper-gate probe: times BOTH branches of
  * [[Dedup.qualityKeeper]]'s measured broadcast/SMJ gate on a corpus
  * where ≥40 % of documents are clustered — the RefinedWeb/CCNet raw-
  * crawl regime, where near-dup clusters cover 30–50 % of pages and the
  * old unconditional broadcast was an executor-OOM scale-killer.
  *
  *   sbt "runMain graft.tools.P57Probe /root/testdata/sf0.1 /tmp/graft_p57_100x 100"
  *
  * Builds `factor`× documents (ScaleProbe's copy replication), declares
  * a component table covering 40 % of docs (4-member clusters — every
  * doc_id with doc_id%10<4 clusters with its decade), then times the
  * keeper with the gate open (cluster table broadcasts) and forced shut
  * (maxBroadcastRows=0 → hash-co-partitioned SortMergeJoin). The two
  * walls bound the gate's cost: the SMJ branch must stay within a small
  * factor of the broadcast branch at a cluster table the broadcast can
  * still absorb, because above the threshold SMJ is the ONLY safe shape. */
object P57Probe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_p57_100x"
    val factor = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val marker = new java.io.File(s"$outDir/_factor")
    if (marker.exists()) {
      val prev = new String(java.nio.file.Files.readAllBytes(marker.toPath),
        "UTF-8").trim
      require(prev == factor.toString,
        s"$outDir was built at factor $prev, not $factor — use a fresh dir")
    } else {
      new java.io.File(outDir).mkdirs()
      java.nio.file.Files.write(marker.toPath, factor.toString.getBytes("UTF-8"))
    }
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"[p57] building ${factor}x documents at $outDir")
      ScaleProbe.build(spark, srcDir, outDir, factor, Set("documents"))
    } else println(s"[p57] reusing $outDir")

    val docs = Tables.load(spark, outDir, "documents")
    val qual = TextAnalysis.qualityMetrics(docs, "text")
      .select(col("doc_id"), col("quality_score"))
    // 40% of docs clustered, 4-member components keyed by decade base
    val comp = docs.select(col("doc_id"))
      .filter(pmod(col("doc_id"), lit(10)) < 4)
      .withColumn("component", col("doc_id") - pmod(col("doc_id"), lit(10)))
    val nDocs = docs.count()
    val nClustered = comp.count()
    println(f"[p57] $nDocs%d docs, $nClustered%d clustered (${100.0 * nClustered / nDocs}%.1f%%)")

    def time(label: String, thresh: Long): Unit = {
      val t0 = System.nanoTime()
      val out = Dedup.qualityKeeper(qual, "quality_score", comp, "doc_id",
        maxBroadcastRows = thresh)
      val kept = out.filter(col("kept")).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[p57] $label%-22s $wall%8.2f s  ($kept%d keepers)")
    }
    // warmup JIT/codegen on the small source dir first
    Dedup.qualityKeeper(
      TextAnalysis.qualityMetrics(Tables.load(spark, srcDir, "documents"), "text")
        .select(col("doc_id"), col("quality_score")),
      "quality_score",
      Tables.load(spark, srcDir, "documents").select(col("doc_id"))
        .filter(pmod(col("doc_id"), lit(10)) < 4)
        .withColumn("component", col("doc_id") - pmod(col("doc_id"), lit(10))),
      "doc_id").count()
    time("broadcast branch", Long.MaxValue)
    time("smj branch (gate=0)", 0L)
    spark.stop()
  }
}
