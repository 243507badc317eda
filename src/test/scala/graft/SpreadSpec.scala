package graft

import graft.operators.Dedup
import org.scalatest.funsuite.AnyFunSuite

/** Pins for the r19 size-derived spread rule (guide §2.5 unsplittable-
  * input repartition, §2 scale-adaptive partitioning): the exchange
  * width derives from input BYTES, not the core count, and a source
  * that is already split at least that wide gains no exchange at all —
  * batch and streaming share one width rule. r18's unconditional
  * `repartition(defaultParallelism)` is what the r18 verdict flagged:
  * a permanent per-batch payload shuffle at scale and a measured loss
  * at 32 local cores. */
class SpreadSpec extends AnyFunSuite {
  import TestSpark._

  test("spreadWidthFor is byte-proportional, capped at the cluster width") {
    // one partition per perTaskBytes, rounded up
    assert(Dedup.spreadWidthFor(1, 100, 32, 64) == 2)
    assert(Dedup.spreadWidthFor(1, 64, 32, 64) == 1)
    assert(Dedup.spreadWidthFor(1, 65, 32, 64) == 2)
    // capped at want — idle cores never inflate the exchange
    assert(Dedup.spreadWidthFor(1, 1L << 40, 32, 64 * 1024) == 32)
    // never zero, even for an empty source
    assert(Dedup.spreadWidthFor(1, 0, 32, 64) == 1)
  }

  test("light spread is a no-op on a small single-file scan") {
    // 65 KB of parquet is far below the 4 MB/task light budget: the
    // round-robin exchange would cost more than the parallelism returns
    val docs = Tables.load(spark, sf, "documents")
    assert(Dedup.spread(docs) eq docs)
  }

  test("heavy spread fans a >64KB single-file scan out, byte-proportionally") {
    val li = Tables.load(spark, sf, "lineitem") // ~117 KB at sf0.001
    val spreadDf = Dedup.spreadHeavy(li)
    assert(spreadDf ne li)
    // ceil(117 KB / 64 KB) = 2 — size-derived, NOT defaultParallelism (4)
    assert(spreadDf.rdd.getNumPartitions == 2)
  }

  test("spread is a no-op on in-memory and cache-backed frames") {
    import spark.implicits._
    val mem = Seq((1L, "a"), (2L, "b")).toDF("id", "t")
    assert(Dedup.spread(mem) eq mem)
    assert(Dedup.spreadHeavy(mem) eq mem)
    // a lineage through a cached stage is already as wide as the
    // exchange that built the cache — no re-spread on top of it
    val cached = Tables.load(spark, sf, "lineitem").cache()
    try assert(Dedup.spreadHeavy(cached) eq cached)
    finally cached.unpersist()
  }

  test("a pre-split streaming source gains NO repartition exchange") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_spread_stream")
      .toFile.getAbsolutePath
    import spark.implicits._
    (0 until 8).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .repartition(4).write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(tmp)
    // 4 part files ≥ defaultParallelism (4): guard must return df as-is
    val out = graft.streaming.StreamingQueries.spreadStream(
      src, tmp, "*.parquet", perTaskBytes = 1L)
    assert(out eq src)
    // a single-file landing dir DOES spread, at the byte-derived width
    val one = java.nio.file.Files.createTempDirectory("graft_spread_one")
      .toFile.getAbsolutePath
    (0 until 8).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(one)
    val src1 = spark.readStream.schema(schema)
      .option("pathGlobFilter", "*.parquet").parquet(one)
    val bytes = new java.io.File(one).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val spread1 = graft.streaming.StreamingQueries.spreadStream(
      src1, one, "*.parquet", perTaskBytes = (bytes / 2) + 1)
    val reparts = spread1.queryExecution.logical.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.Repartition => r
    }
    assert(reparts.map(_.numPartitions) == Seq(2))
  }
}
