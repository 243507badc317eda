package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Binary token-shard export (p78): byte layout pinned against
  * hand-written expectations, round-trip equality, and the corrupt-file
  * named errors. */
class TokenBinSpec extends AnyFunSuite {
  import TestSpark._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_tokenbin_").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  test("byte layout: u32 LE ids in doc order, 12-byte idx records, shard split by seeded fold") {
    import spark.implicits._
    val docs = Seq(
      (1L, Seq(0, 1, 258)),
      (2L, Seq(65536)),
      (3L, Seq.empty[Int])).toDF("doc_id", "ids")
    val dir = freshDir()
    // nShards = 1 puts everything in shard 0 deterministically
    graft.sources.TokenBin.write(docs, "doc_id", "ids", dir, 1, seed = 7L)
    val bin = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shard-00000.bin"))
    val idx = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/shard-00000.idx"))
    def u32le(v: Int) = Array[Byte](
      (v & 0xff).toByte, ((v >>> 8) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 24) & 0xff).toByte)
    def u64le(v: Long) = u32le(v.toInt) ++ u32le((v >>> 32).toInt)
    assert(bin.toSeq ===
      (u32le(0) ++ u32le(1) ++ u32le(258) ++ u32le(65536)).toSeq)
    assert(idx.toSeq ===
      (u64le(1L) ++ u32le(3) ++ u64le(2L) ++ u32le(1) ++
       u64le(3L) ++ u32le(0)).toSeq)
  }

  test("round trip: readDocs returns exactly what was written, across shards") {
    import spark.implicits._
    val docs = (0L until 64L).map(i =>
      (i, (0 until (i % 5).toInt).map(j => (i * 10 + j).toInt)))
      .toDF("doc_id", "ids")
    val dir = freshDir()
    graft.sources.TokenBin.write(docs, "doc_id", "ids", dir, 8, seed = 42L)
    val back = graft.sources.TokenBin.readDocs(spark, dir)
      .select("doc_id", "ids").as[(Long, Seq[Int])].collect().toMap
    val in = docs.as[(Long, Seq[Int])].collect().toMap
    assert(back === in)
    // shard assignment matches Sampling.fold
    val shards = graft.sources.TokenBin.readDocs(spark, dir)
      .select(col("doc_id"), col("shard")).as[(Long, Long)].collect().toMap
    val expected = docs.select(col("doc_id"),
        graft.operators.Sampling.fold(col("doc_id"), 42L, 8).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(shards === expected)
  }

  test("manifest certifies the files: widths, counts, and re-export overwrite drops stale shards") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, Seq(i.toInt, i.toInt + 1)))
      .toDF("doc_id", "ids")
    val dir = freshDir()
    graft.sources.TokenBin.write(docs, "doc_id", "ids", dir, 4, seed = 1L)
    val m = graft.sources.TokenBin.readManifest(spark, dir).collect()
    assert(m.map(_.getLong(1)).sum === 40L)
    assert(m.map(_.getLong(2)).sum === 80L)
    m.foreach { r =>
      assert(r.getLong(3) === 4L * r.getLong(2), "bin bytes = 4 * tokens")
      assert(r.getLong(4) === 12L * r.getLong(1), "idx bytes = 12 * docs")
    }
    // re-export with ONE shard must not leave shard-00001..3 behind
    graft.sources.TokenBin.write(docs, "doc_id", "ids", dir, 1, seed = 1L)
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("shard-00000.bin", "shard-00000.idx"))
  }

  test("named errors: negative id, truncated bin, trailing bin bytes, ragged idx") {
    import spark.implicits._
    val dir = freshDir()
    val bad = Seq((1L, Seq(-5))).toDF("doc_id", "ids")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.TokenBin.write(bad, "doc_id", "ids", dir, 1, seed = 1L)
    }
    assert(e.getCause != null &&
      String.valueOf(e.getCause.getMessage).contains("negative"))

    val ok = Seq((1L, Seq(7, 8))).toDF("doc_id", "ids")
    graft.sources.TokenBin.write(ok, "doc_id", "ids", dir, 1, seed = 1L)
    val binPath = java.nio.file.Paths.get(s"$dir/shard-00000.bin")
    val orig = java.nio.file.Files.readAllBytes(binPath)
    java.nio.file.Files.write(binPath, orig.dropRight(4)) // truncate
    val e2 = intercept[Exception] {
      graft.sources.TokenBin.readManifest(spark, dir).collect()
    }
    assert(e2.getMessage.contains("tokens but the bin has") ||
      (e2.getCause != null &&
        String.valueOf(e2.getCause.getMessage).contains("tokens but the bin has")))
    java.nio.file.Files.write(binPath, orig ++ Array[Byte](1, 2, 3, 4))
    val e3 = intercept[Exception] {
      graft.sources.TokenBin.readManifest(spark, dir).collect()
    }
    assert(e3.getMessage.contains("trailing bytes") ||
      (e3.getCause != null &&
        String.valueOf(e3.getCause.getMessage).contains("trailing bytes")))
    java.nio.file.Files.write(binPath, orig) // restore
    val idxPath = java.nio.file.Paths.get(s"$dir/shard-00000.idx")
    java.nio.file.Files.write(idxPath,
      java.nio.file.Files.readAllBytes(idxPath) ++ Array[Byte](0))
    val e4 = intercept[Exception] {
      graft.sources.TokenBin.readManifest(spark, dir).collect()
    }
    assert(e4.getMessage.contains("12-byte records") ||
      (e4.getCause != null &&
        String.valueOf(e4.getCause.getMessage).contains("12-byte records")))
  }

  test("orphaned shard file: a .bin or .idx with no counterpart is a named error, not a vanished shard") {
    import spark.implicits._
    val dir = freshDir()
    val docs = Seq((1L, Seq(7)), (2L, Seq(8)), (3L, Seq(9)),
      (4L, Seq(10))).toDF("doc_id", "ids")
    graft.sources.TokenBin.write(docs, "doc_id", "ids", dir, 2, seed = 1L)
    // delete one side of one pair: the read must FAIL naming the
    // orphan, not silently drop the shard from the manifest
    val victims = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".idx")).sortBy(_.getName)
    assert(victims.nonEmpty)
    victims.head.delete()
    def msg(t: Throwable): String = {
      var c = t; var m = String.valueOf(t.getMessage)
      while (c.getCause != null) { c = c.getCause; m += " | " + c.getMessage }
      m
    }
    val e = intercept[Exception] {
      graft.sources.TokenBin.readManifest(spark, dir).collect()
    }
    assert(msg(e).contains("no .idx"), msg(e))
    val e2 = intercept[Exception] {
      graft.sources.TokenBin.readDocs(spark, dir).collect()
    }
    assert(msg(e2).contains("no .idx"), msg(e2))
  }

  test("p78 token ids: empty/NULL docs keep a row with an empty sequence") {
    val out = graft.operators.PipelineQueries
      .p78TokenBinExport(spark, "/root/testdata/sf0.001").collect()
    assert(out.length === 8, "all 8 shards non-empty at this corpus size")
    assert(out.map(_.getLong(1)).sum === 500L, "every doc lands in a shard")
  }
}
