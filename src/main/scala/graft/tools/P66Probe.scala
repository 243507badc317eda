package graft.tools

import graft.Tables
import graft.operators.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Distinct-corpus scaling probe for the incremental embedding dedup
  * (p66): on a ROTATED 100× embeddings dir (decorrelated replicas —
  * the regime where coincidental chunk matches, not true near-dups,
  * dominate the bucket join) the DEFAULT 128-bit/16-bit-chunk
  * parameterization floods: ~27M bucket rows land in a 2^16-per-chunk
  * key space, and at cosine 0.4 the ±4σ signature prefilter
  * (~70/128 bits) barely prunes the coincidental pairs. The scale
  * lever is the one p05's notes prescribe — WIDEN the signature so the
  * bucket key space outgrows the corpus: bits=256 gives 32-bit chunk
  * values, collapsing coincidental occupancy. This probe times that
  * parameterization, which is what a 100-TB deployment runs.
  *
  *   sbt "runMain graft.tools.P66Probe /tmp/graft_scale100_rot17"
  */
object P66Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100_rot17"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    val prior = emb.filter(pmod(col("vec_id"), lit(4)) =!= 1)
    val t0 = System.nanoTime()
    val out = SimilaritySearch.incrementalEmbedDedup(
      prior, emb, "embedding", "vec_id", minCosine = 0.4,
      chunks = 8, bits = 256, probeHamming = 1)
    val counts = out.groupBy("verdict").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    println(f"[p66] $dir bits=256 chunks=8: ${(System.nanoTime() - t0) / 1e9}%.1f s  $counts")
    spark.stop()
  }
}
