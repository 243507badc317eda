package graft.tools

import graft.Tables
import graft.operators.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Bloom-gate scale probe: times [[TextAnalysis.bloomDecontaminate]]'s
  * probe pass against the EXACT broadcast-join path
  * ([[TextAnalysis.ngramContainment]], the p45 machinery) on a
  * `factor`× corpus, both screening against the same fixed
  * benchmark-sized reference (the source dir's doc_id%10=0 slice —
  * a decontamination reference does NOT grow with the corpus).
  *
  *   sbt "runMain graft.tools.P75Probe /root/testdata/sf0.1 /tmp/graft_p75_100x 100"
  *
  * The point at scale: the Bloom probe is a zero-exchange row-local
  * projection over an 8 KB plan-embedded bitset, while the exact path
  * broadcasts the full distinct (ref_id, gram) set and pays a join +
  * pair aggregate. Both are corpus-linear; the probe row quantifies
  * the constant. */
object P75Probe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_p75_100x"
    val factor = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (!new java.io.File(s"$outDir/documents.parquet").exists()) {
      println(s"[p75] building ${factor}x documents at $outDir")
      ScaleProbe.build(spark, srcDir, outDir, factor, Set("documents"))
    } else println(s"[p75] reusing $outDir")

    val ref = Tables.load(spark, srcDir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    val corpus = Tables.load(spark, outDir, "documents")
    println(s"[p75] corpus=${corpus.count()} ref=${ref.count()}")

    // size m to the reference (the production sizing discipline the
    // operator scaladoc states): ~21 bits/gram + 4 probes ≈ 5e-6 FP
    // per gram — here 2^21 bits = 256 KB for ~25k reference grams
    val mBits = 1 << 21
    // warmup on the small dir
    TextAnalysis.bloomProbe(Tables.load(spark, srcDir, "documents"),
      "text", "doc_id",
      TextAnalysis.bloomBuild(ref, "text", 5, mBits, 4), 5, 4)
      .filter(col("flagged")).count()

    val tb0 = System.nanoTime()
    val bits = TextAnalysis.bloomBuild(ref, "text", 5, mBits, 4)
    val buildWall = (System.nanoTime() - tb0) / 1e9
    val tp0 = System.nanoTime()
    val nBloom = TextAnalysis.bloomProbe(corpus, "text", "doc_id", bits, 5, 4)
      .filter(col("flagged")).count()
    val probeWall = (System.nanoTime() - tp0) / 1e9
    println(f"[p75] bloom  build $buildWall%6.2f s, probe $probeWall%6.2f s ($nBloom%d flagged)")

    val te0 = System.nanoTime()
    val nExact = TextAnalysis.ngramContainment(corpus, ref,
        "text", "doc_id", "doc_id", n = 5, minContainment = 0.0,
        sameIdSpace = false)
      .select(col("doc_id")).distinct().count()
    val exactWall = (System.nanoTime() - te0) / 1e9
    println(f"[p75] exact  join  $exactWall%6.2f s ($nExact%d flagged incl. self)")
    spark.stop()
  }
}
