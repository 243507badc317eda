package graft.tools

import org.apache.spark.sql.SparkSession

/** WARC ingest throughput probe: replicate the fixture warcs N× into a
  * scratch dir (distinct file names — file = task is the parallelism
  * unit) and time a full audited parse. The claim under test is that
  * the source scales with FILE COUNT: per-file work is a single
  * streaming decompress+parse, so wall ≈ files / cores once files ≫
  * cores.
  *
  *   sbt "runMain graft.tools.WarcScaleProbe 200"
  */
object WarcScaleProbe {
  def main(args: Array[String]): Unit = {
    val copies = if (args.length > 0) args(0).toInt else 200
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val src = new java.io.File(graft.operators.PipelineQueries.WarcFixtureDir)
    val dst = java.nio.file.Files.createTempDirectory("graft_warc_scale").toFile
    val files = src.listFiles().filter(_.getName.endsWith(".warc.gz"))
    for (c <- 0 until copies; f <- files)
      java.nio.file.Files.copy(f.toPath,
        new java.io.File(dst, s"c$c-${f.getName}").toPath)
    val t0 = System.nanoTime()
    val n = graft.sources.Warc.readAudited(spark, dst.getAbsolutePath, "*.warc.gz")
      .count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[warc-probe] ${copies * files.length} files, $n records in $dt%.2f s")
    dst.listFiles().foreach(_.delete())
    dst.delete()
    spark.stop()
  }
}
