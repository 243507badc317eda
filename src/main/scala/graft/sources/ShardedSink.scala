package graft.sources

import graft.operators.{Sampling, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sharded training-mix EXPORT — the write side the ingest surface
  * (CSV, parquet, JSONL) lacked: once a mix is selected/packed
  * (p23/p27/p31/p39), the training job consumes it as N deterministic
  * shards with a verifiable per-shard manifest. The reference has no
  * analogue (its .bdb save is catalog persistence — cf. b42); this is
  * the corpus-export step every large-scale pipeline ends with.
  *
  * Shard assignment is a PURE FUNCTION of the document id
  * ([[Sampling.fold]]'s seeded SplitMix64 — the oracle-restatable
  * discipline every split/cap key already rides), so re-running the
  * export on any cluster layout lands every document in the same
  * shard. The manifest (one row per shard: docs, tokens, bytes, and a
  * sha256 over the comma-joined ascending id list) is computed from
  * the READ-BACK files, not the input frame — it certifies what
  * actually landed on disk.
  *
  * Scale shape: ONE repartition on the shard key co-locates each
  * shard (writers then emit one file per shard, sorted by id for
  * deterministic file bytes), and the manifest is one groupBy over
  * the shard column of the written files. The id digest needs each
  * shard's sorted id list in one aggregate buffer — ids only, ~8
  * bytes/doc: size `nShards` so docs/shard stays executor-sized
  * (10^5-shard exports keep a 10^10-doc corpus at ~10^5 ids/shard),
  * the standard shard-count discipline, not a hidden collect. */
object ShardedSink {

  /** Write `docs` as `nShards` deterministic shards under `outDir`
    * (parquet, partitioned by `shard`) and return the read-back
    * manifest: (shard, n_docs, n_tokens, n_bytes, ids_sha256). */
  def write(docs: DataFrame, textCol: String, idCol: String,
      outDir: String, nShards: Int, seed: Long): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    docs.select(col(idCol), col(textCol),
        Sampling.fold(col(idCol), seed, nShards).as("shard"))
      .repartition(nShards, col("shard"))
      // shard FIRST: partitionBy requires task rows ordered by the
      // partition column — sorting by id alone would make the writer
      // insert its own shard-only sort (double sort, and the id order
      // inside each file would rest on that sort's tie stability)
      .sortWithinPartitions(col("shard"), col(idCol))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    manifest(docs.sparkSession.read.parquet(outDir), textCol, idCol)
  }

  /** The per-shard manifest of an already-written shard dir (or any
    * frame carrying a `shard` column): token counting is the corpus
    * whitespace convention, bytes are UTF-8 octets, and the id digest
    * is sha256 over the comma-joined ASCENDING id list — sorted as
    * longs, not strings (lexicographic "10" < "9" would silently
    * reorder the digest input). */
  def manifest(sharded: DataFrame, textCol: String, idCol: String): DataFrame =
    sharded.groupBy(col("shard").cast("long").as("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(coalesce(col(textCol), lit("")))
          .cast("long")).as("n_tokens"),
        sum(coalesce(octet_length(col(textCol)), lit(0)).cast("long"))
          .as("n_bytes"),
        sha2(concat_ws(",",
          transform(sort_array(collect_list(col(idCol).cast("long"))),
            _.cast("string"))), 256).as("ids_sha256"))
}
