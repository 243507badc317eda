package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSONL (newline-delimited JSON) ingest — the interchange format
  * training-data pipelines actually exchange corpora in (the CSV
  * ingest in `BayesDB.readCsv` mirrors the reference's surface,
  * bayeslite src/read_csv.py; JSONL is the extension a modern corpus
  * engine owes on top).
  *
  * Schema is EXPLICIT, never inferred: inference is a second pass over
  * the data and makes the resulting types a function of which rows a
  * sample touched — at 100 TB that is both a wasted scan and a
  * nondeterminism source. Missing fields are NULL (the JSON-ingest
  * convention), extra fields are ignored, key order is irrelevant.
  *
  * Two modes, mirroring the reference's CSV strictness posture:
  *  - [[read]]: FAILFAST — any malformed line fails the job with a
  *    named error (a corrupt corpus should be loud);
  *  - [[readAudited]]: PERMISSIVE — every line lands, malformed ones
  *    with all schema fields NULL, the raw line preserved in
  *    `bad_line`, and `ok = false`, so the drop set is auditable (the
  *    p52/p55 verdict discipline applied to ingest).
  * Both are single-scan distributed reads (Spark's JSON datasource
  * splits newline-delimited files by range like any text source). */
object Jsonl {

  private val Corrupt = "__graft_corrupt"

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    try {
      val df = spark.read
        .schema(schema)
        .option("mode", "FAILFAST")
        .json(path)
      // FAILFAST surfaces lazily at first action; callers get the
      // dataframe and Spark's named SparkException on materialization
      df
    } catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalArgumentException(
        s"jsonl read of $path failed: ${e.getMessage}", e)
    }

  /** The audited parse as a FILE STREAM over a landing directory — the
    * continuous-ingest form (new JSONL drops are picked up per
    * micro-batch; the parse itself is stateless, so no state store).
    * Same verdict columns as [[readAudited]]. */
  def readAuditedStream(spark: SparkSession, dir: String, glob: String,
      schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema may not claim the reserved corrupt-record column $Corrupt")
    val withCorrupt = schema.add(Corrupt, "string")
    spark.readStream
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .option("pathGlobFilter", glob)
      .json(dir)
      .withColumn("ok", col(Corrupt).isNull)
      .withColumnRenamed(Corrupt, "bad_line")
  }

  def readAudited(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(Corrupt),
      s"schema may not claim the reserved corrupt-record column $Corrupt")
    val withCorrupt = schema.add(Corrupt, "string")
    spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", Corrupt)
      .json(path)
      .withColumn("ok", col(Corrupt).isNull)
      .withColumnRenamed(Corrupt, "bad_line")
  }
}
