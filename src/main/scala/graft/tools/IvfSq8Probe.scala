package graft.tools

import graft.Tables
import graft.operators.SimilaritySearch
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF-SQ8 scan-volume probe: on the 100× embeddings dir, fit the
  * composite index once, then run the same top-10 query at increasing
  * nProbe and print the CODE ROWS SCANNED next to the wall — the claim
  * under test is that scan volume scales with nProbe, not the corpus.
  *
  *   sbt "runMain graft.tools.IvfSq8Probe /tmp/graft_scale100_r15"
  */
object IvfSq8Probe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_scale100_r15"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = Tables.load(spark, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble)
    val t0 = System.nanoTime()
    val ivf = SimilaritySearch.ivfIndex(emb, "embedding", "vec_id")
    val params = SimilaritySearch.sq8Params(emb, "embedding")
    val idx0 = SimilaritySearch.ivfSq8Index(emb, "embedding", "vec_id", ivf, params)
    val idx = idx0.copy(cells = idx0.cells.cache())
    val total = idx.cells.count()
    println(f"[ivfsq8] index built in ${(System.nanoTime() - t0) / 1e9}%.1f s; " +
      f"$total%d code rows, ${ivf.centroids.length}%d cells")
    for (nProbe <- Seq(1, 2, 4, 8, 16)) {
      val t1 = System.nanoTime()
      val res = SimilaritySearch.ivfSq8TopK(idx, emb, "embedding", "vec_id",
        q, 10, nProbe).collect()
      val wall = (System.nanoTime() - t1) / 1e9
      // scanned = rows in the probed cells (the code scan's input)
      val probed = idx.cells.filter(col("cell").isin(
        SimilaritySearch.probeCellsFor(idx, q, nProbe): _*)).count()
      println(f"[ivfsq8] nProbe=$nProbe%2d  scanned=$probed%9d (${100.0 * probed / total}%5.1f%%)  " +
        f"wall=$wall%6.2f s  top1=${res.head.getLong(0)}%d")
    }
    spark.stop()
  }
}
