package graft.sources

import graft.operators.{DetRngHash, Sampling}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenized BINARY shard export — the format a pretraining job
  * actually memory-maps (the Megatron/GPT-NeoX `.bin`+`.idx`
  * convention): after tokenization (p56) and mix selection, the token
  * ids land as fixed-width binary shards, not parquet — the trainer
  * reads offsets, never decodes columns. Reference has no analogue;
  * this completes the export surface next to [[ShardedSink]]'s
  * parquet path.
  *
  * Layout per shard (all little-endian):
  *   shard-NNNNN.bin — every document's token ids as u32, documents
  *                     concatenated in ascending doc_id order
  *   shard-NNNNN.idx — one {doc_id: u64, n_tokens: u32} record per
  *                     document, same order (offsets are the running
  *                     sum — the loader's index)
  *
  * Shard assignment is a pure function of the id ([[Sampling.fold]]'s
  * seeded SplitMix64 — the p21/p63 discipline), and files are written
  * from (shard, id)-sorted partitions, so the export is byte-identical
  * on any cluster layout or retry. Writers stream one row at a time
  * through a buffered stream — O(1) memory regardless of shard size.
  *
  * The manifest is computed from the READ-BACK files, never the input
  * frame (the p63 contract: certify what landed on disk): per shard,
  * doc/token counts, actual file sizes (which pin the 4-byte and
  * 12-byte record widths against n_tokens/n_docs), and an
  * order-insensitive content checksum — Σ mix(fnvIds(ids) XOR doc_id)
  * mod 2^64 over the corpus-standard limb chain, so the DuckDB oracle
  * restates it from the retrained vocabulary without replaying file
  * byte order. Read-back parallelism is one task per shard file —
  * exactly the training loader's unit. */
object TokenBin {

  /** Write `docs` (idCol: long, idsCol: array<int>) as `nShards`
    * deterministic binary shards under `outDir`. NULL id arrays write
    * as empty documents (the p47 keep-the-row contract); a negative id
    * is a named error — silently wrapping it into u32 range would
    * corrupt the corpus undetectably (non-negative Ints always fit). */
  def write(docs: DataFrame, idCol: String, idsCol: String, outDir: String,
      nShards: Int, seed: Long): Unit = {
    require(nShards > 0, "nShards must be positive")
    val dirF = new java.io.File(outDir)
    dirF.mkdirs()
    // overwrite semantics: drop prior shard files so a re-export with
    // fewer shards cannot leave stale high-numbered shards behind
    Option(dirF.listFiles()).toSeq.flatten
      .filter(f => f.getName.matches("shard-\\d{5}\\.(bin|idx)"))
      .foreach(_.delete())
    docs.select(col(idCol).cast("long").as("doc_id"),
        coalesce(col(idsCol), array().cast("array<int>")).as("ids"),
        Sampling.fold(col(idCol), seed, nShards).as("shard"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        var cur = -1L
        var bin: java.io.BufferedOutputStream = null
        var idx: java.io.BufferedOutputStream = null
        def close(): Unit = { if (bin != null) { bin.close(); idx.close() } }
        def u32(o: java.io.OutputStream, v: Int): Unit = {
          o.write(v & 0xff); o.write((v >>> 8) & 0xff)
          o.write((v >>> 16) & 0xff); o.write((v >>> 24) & 0xff)
        }
        def u64(o: java.io.OutputStream, v: Long): Unit = {
          u32(o, v.toInt); u32(o, (v >>> 32).toInt)
        }
        it.foreach { row =>
          val shard = row.getLong(2)
          if (shard != cur) {
            close()
            val base = f"$outDir/shard-$shard%05d"
            bin = new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(base + ".bin"))
            idx = new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(base + ".idx"))
            cur = shard
          }
          val docId = row.getLong(0)
          val ids = row.getSeq[Int](1)
          u64(idx, docId); u32(idx, ids.length)
          ids.foreach { id =>
            if (id < 0) throw new IllegalArgumentException(
              s"token id $id in doc $docId is negative — not a u32")
            u32(bin, id)
          }
        }
        close()
      }
  }

  private def filesBy(spark: SparkSession, dir: String, ext: String) =
    spark.read.format("binaryFile").load(s"$dir/shard-*.$ext")
      .select(regexp_extract(col("path"), "shard-(\\d+)\\." + ext + "$", 1)
        .cast("long").as("shard"), col("content"))

  /** The .bin and .idx listings FULL-OUTER joined by shard: a shard
    * with a missing or orphaned counterpart file is a NAMED error, not
    * a silently vanished row — parseShard's fail-loud contract covers
    * corruption WITHIN a pair; this covers a lost file of the pair. */
  private def pairedShards(spark: SparkSession, dir: String) = {
    import spark.implicits._
    filesBy(spark, dir, "bin").withColumnRenamed("content", "bin")
      .join(filesBy(spark, dir, "idx").withColumnRenamed("content", "idx"),
        Seq("shard"), "full_outer")
      .select(col("shard"),
        when(col("bin").isNull, raise_error(concat(
            lit("token-bin export shard "), col("shard"),
            lit(" has an .idx but no .bin — orphaned/truncated export")))
          .cast("binary")).otherwise(col("bin")).as("bin"),
        when(col("idx").isNull, raise_error(concat(
            lit("token-bin export shard "), col("shard"),
            lit(" has a .bin but no .idx — orphaned/truncated export")))
          .cast("binary")).otherwise(col("idx")).as("idx"))
      .as[(Long, Array[Byte], Array[Byte])]
  }

  /** Parse one shard's idx+bin into (doc_id, ids) tuples; a length
    * mismatch between the two files is a named error (a truncated or
    * interleaved export must fail loudly, the WARC abandon
    * discipline). */
  private def parseShard(shard: Long, idxB: Array[Byte],
      binB: Array[Byte]): Iterator[(Long, Array[Int])] = {
    require(idxB.length % 12 == 0,
      s"shard $shard idx is ${idxB.length} bytes — not a whole number of 12-byte records")
    val ib = java.nio.ByteBuffer.wrap(idxB)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val bb = java.nio.ByteBuffer.wrap(binB)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = Iterator.continually {
      if (!ib.hasRemaining) null
      else {
        val docId = ib.getLong
        val n = ib.getInt
        require(n >= 0 && bb.remaining >= n * 4,
          s"shard $shard doc $docId claims $n tokens but the bin has ${bb.remaining} bytes left")
        val ids = new Array[Int](n)
        var i = 0
        while (i < n) { ids(i) = bb.getInt; i += 1 }
        (docId, ids)
      }
    }.takeWhile(_ != null).toList
    require(!bb.hasRemaining,
      s"shard $shard bin has ${bb.remaining} trailing bytes the idx does not cover")
    out.iterator
  }

  /** Per-shard manifest from the WRITTEN files: (shard, n_docs,
    * n_tokens, n_bytes_bin, n_bytes_idx, checksum) where checksum =
    * Σ mix(fnvIds(ids) XOR doc_id) mod 2^64 rendered as an unsigned
    * decimal string. Empty shards (no file) have no row, matching the
    * oracle's GROUP BY. */
  def readManifest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pairedShards(spark, dir)
      .map { case (shard, binB, idxB) =>
        var nDocs = 0L
        var nTokens = 0L
        var sum = 0L
        parseShard(shard, idxB, binB).foreach { case (docId, ids) =>
          nDocs += 1L
          nTokens += ids.length.toLong
          var h = 0xcbf29ce484222325L
          ids.foreach { id => h = (h ^ id.toLong) * 0x100000001b3L }
          sum += DetRngHash.mix(h ^ docId)
        }
        (shard, nDocs, nTokens, binB.length.toLong, idxB.length.toLong,
          java.lang.Long.toUnsignedString(sum))
      }
      .toDF("shard", "n_docs", "n_tokens", "n_bytes_bin", "n_bytes_idx",
        "checksum")
  }

  /** Full round-trip read: every (doc_id, ids) across all shards. */
  def readDocs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    pairedShards(spark, dir)
      .flatMap { case (shard, binB, idxB) =>
        parseShard(shard, idxB, binB).map { case (d, ids) => (shard, d, ids) }
      }
      .toDF("shard", "doc_id", "ids")
  }
}
