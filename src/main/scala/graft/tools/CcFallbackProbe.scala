package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deliberate above-the-bound probe of the distributed
  * connected-components fallback: build the 100×-replica LSH pair
  * graph (~1.5M edges, EdgeCountProbe r16), materialize it once, then
  * close it twice — driver union-find (the default path) and the
  * large-star/small-star contraction FORCED via driverMaxEdges=0 — and
  * compare walls and label multisets. At real crawl dup rates the
  * fallback IS the hot path, so it must sit within a small factor of
  * the union-find wall at this size, not the 101–212 s the r16
  * label-prop loop recorded.
  *
  *   sbt "runMain graft.tools.CcFallbackProbe /tmp/graft_scale100_r15"
  */
object CcFallbackProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100_r15"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val pairs = graft.operators.PipelineQueries
      .minhashCandsForProbe(spark, dir)
      .filter(col("est_jaccard") >= 0.2)
      .select(col("id0"), col("id1"))
      .cache()
    val nEdges = pairs.count()
    println(f"[cc] $nEdges%d edges")
    def time(label: String, bound: Long): Long = {
      val t0 = System.nanoTime()
      val comp = graft.operators.Dedup.connectedComponents(
        pairs, "id0", "id1", driverMaxEdges = bound)
      val sig = comp.agg(count(lit(1)), countDistinct(col("component")),
        sum(col("component"))).head()
      println(f"[cc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  " +
        f"nodes=${sig.getLong(0)}%d comps=${sig.getLong(1)}%d sum=${sig.getLong(2)}%d")
      sig.getLong(0) ^ sig.getLong(1) ^ sig.getLong(2)
    }
    val a = time("driver union-find", 1L << 22)
    val b = time("star contraction (forced)", 0L)
    require(a == b, "paths disagree on the label signature")
    println("[cc] signatures agree")
    spark.stop()
  }
}
