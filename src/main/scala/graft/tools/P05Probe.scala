package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** p05's 1000× evidence, split into the two claims that are actually
  * 1000×-sensitive (closing the r13 verdict's item #6):
  *
  *  1. BUCKET OCCUPANCY — the r12 scale-killer was the 2,048-bucket key
  *     space saturating linearly with the corpus. The audit builds the
  *     exact bucket table `cosineNearDupPairs` joins on (shared
  *     `hyperplaneBuckets` code path, 128-bit/8-chunk/multi-probe
  *     config) over the 1000× rotation-replicated corpus (exact copies
  *     would measure the duplicate regime, not key-space health; note
  *     the recorded STATUS run predates ScaleProbe's sign-flip
  *     composition, so its corpus had ~dim rotation classes — ~32 k
  *     distinct vectors in 500 k rows, not fully distinct; a fresh
  *     ROTATE=1 build is distinct per replica)
  *     and prints rows / distinct buckets / mean / p99 / max
  *     occupancy and the fraction of members in over-cap buckets.
  *  2. WALL vs OUTPUT — the full pipeline at the production threshold
  *     (0.95): the Hamming prefilter (128·acos(.95)/π + 2√128 ≈ 35.5)
  *     prunes the ~64-bit-distant random mass, so wall tracks the true
  *     near-dup output. At the p05 key's exploratory threshold (0.4)
  *     the prefilter's +4σ slack (69.8 bits) ADMITS most random pairs
  *     by design — a 500k-corpus run at 0.4 is a ~10⁸-pair
  *     emission whose wall and spill track output quadratically (the
  *     100× copy-corpus row in STATUS.md already pins the output-bound
  *     wall); it is not a bucket-table question.
  *
  *   sbt "runMain graft.tools.P05Probe /tmp/graft_scale1000rot [srcDir]"
  *   (build the corpus first: SPARK_GRAFT_PROBE_ROTATE=1 ScaleProbe
  *    <src> <dir> 1000 p05_cosine_near_dup — kill after "building" ends,
  *    or let its 0.4-key timing run if disk allows)
  */
object P05Probe {
  def main(args: Array[String]): Unit = {
    val bigDir = args.headOption.getOrElse("/tmp/graft_scale1000rot")
    val srcDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def occupancy(dir: String, label: String): Unit = {
      val emb = Tables.load(spark, dir, "embeddings")
      val signed = emb.select(col("vec_id").as("id"),
          graft.functions.HyperplaneSignatures(col("embedding"), 42L, 128).as("sig"))
        .filter(col("sig").isNotNull)
      val buckets = graft.operators.SimilaritySearch
        .hyperplaneBuckets(signed, chunks = 8, chunkBits = 16, probeHamming = 1)
        .groupBy("chunk", "chunk_val").agg(count(lit(1)).as("n"))
      val stats = buckets.agg(
        sum("n").as("rows"), count(lit(1)).as("buckets"),
        avg("n").as("mean"), expr("percentile_approx(n, 0.99)").as("p99"),
        max("n").as("max"),
        sum(when(col("n") > 4096, col("n")).otherwise(0L)).as("overcap_members"))
        .head()
      println(f"[p05probe] occupancy $label: bucket_rows=${stats.getLong(0)} " +
        f"distinct_buckets=${stats.getLong(1)} mean=${stats.getDouble(2)}%.1f " +
        f"p99=${stats.get(3)} max=${stats.getLong(4)} overcap_members=${stats.getLong(5)}")
    }

    def pipeline(dir: String, label: String): Unit = {
      val emb = Tables.load(spark, dir, "embeddings")
      val t0 = System.nanoTime()
      val n = graft.operators.SimilaritySearch.cosineNearDupPairs(
        emb, "embedding", "vec_id",
        minCosine = 0.95, chunks = 8, seed = 42L, bits = 128, probeHamming = 1)
        .count()
      println(f"[p05probe] production-threshold pipeline $label: " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.1f s pairs_out=$n")
    }

    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    occupancy(srcDir, "1x")
    occupancy(bigDir, "1000x")
    pipeline(srcDir, "1x")
    pipeline(bigDir, "1000x")
    spark.stop()
  }
}
