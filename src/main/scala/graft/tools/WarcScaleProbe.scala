package graft.tools

import org.apache.spark.sql.SparkSession

/** WARC ingest scale probes.
  *
  * Throughput mode (`runMain graft.tools.WarcScaleProbe 200`): replicate
  * the fixture warcs N× into a scratch dir (distinct file names — file =
  * task is the parallelism unit) and time a full audited parse. The
  * claim under test is that the source scales with FILE COUNT: per-file
  * work is a single streaming decompress+parse, so wall ≈ files / cores
  * once files ≫ cores.
  *
  * Memory mode (`SPARK_DRIVER_MEM=2g sbt "runMain
  * graft.tools.WarcScaleProbe mem 32768 256"`): build ONE warc whose
  * decompressed size (records × payloadKiB) far exceeds the JVM heap
  * (zero-filled payloads so the compressed bytes stay tiny), then drain
  * `parseFile`'s iterator single-threaded. A streaming parse holds one
  * record live and completes; the pre-r18 buffer-the-file parse would
  * need the full decompressed size on heap and OOM. 32768 × 256 KiB =
  * 8 GiB decompressed through a 2 GiB heap is the standard row —
  * ~5000× the fixture's records-per-file, per-task memory flat. */
object WarcScaleProbe {
  def main(args: Array[String]): Unit = {
    if (args.nonEmpty && args(0) == "mem") memProbe(args) else fileProbe(args)
  }

  private def memProbe(args: Array[String]): Unit = {
    val records = if (args.length > 1) args(1).toInt else 32768
    val payloadKiB = if (args.length > 2) args(2).toInt else 256
    val payload = new Array[Byte](payloadKiB * 1024) // zeros: compress ~1000:1
    val header = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:mem>\r\n" +
      "WARC-Target-URI: http://mem.test/\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(header); gz.write(payload); gz.write("\r\n\r\n".getBytes("UTF-8"))
    gz.close()
    val member = bos.toByteArray // members are byte-identical: compress once
    val rawLen = member.length.toLong * records
    require(rawLen <= Int.MaxValue - 8,
      s"compressed archive would be $rawLen bytes — over the JVM array " +
        "limit; lower records or payloadKiB")
    val raw = new Array[Byte](rawLen.toInt)
    var i = 0
    while (i < records) {
      System.arraycopy(member, 0, raw, i * member.length, member.length); i += 1
    }
    val rt = Runtime.getRuntime
    val heapGiB = rt.maxMemory() / (1024.0 * 1024 * 1024)
    val decompGiB = records.toLong * payload.length / (1024.0 * 1024 * 1024)
    val t0 = System.nanoTime()
    var n = 0L; var bytes = 0L
    val it = graft.sources.Warc.parseFile("/mem/probe.warc.gz", raw)
    while (it.hasNext) { val r = it.next(); n += 1; bytes += r.content_length }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[warc-mem-probe] $n records ($decompGiB%.1f GiB decompressed, " +
      f"${raw.length / 1024 / 1024} MiB compressed) drained through a " +
      f"$heapGiB%.1f GiB heap in $dt%.1f s (${decompGiB / dt}%.2f GiB/s)" +
      (if (decompGiB > heapGiB) " - per-task memory flat, records never buffered"
       else " - WARNING: decompressed fits the heap, probe proves nothing"))
    require(bytes == records.toLong * payload.length, "byte count mismatch")
  }

  private def fileProbe(args: Array[String]): Unit = {
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
