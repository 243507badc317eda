package graft.sources

import java.io.{ByteArrayInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container format a crawl
  * pipeline actually STARTS from (Common Crawl ships responses as
  * `.warc.gz`, one gzip member per record, members concatenated). The
  * JSONL/CSV sources cover interchange; this covers the raw-crawl
  * head of the funnel.
  *
  * Parse contract (the subset every WARC consumer relies on):
  *  - a record is `WARC/1.0` or `WARC/1.1`, CRLF header lines
  *    (`Name: value`, names case-insensitive), a blank line, then
  *    EXACTLY `Content-Length` payload bytes — length-delimited, so
  *    payloads containing `\r\n\r\n` (every HTTP response body) can
  *    never split a record; the two CRLFs between records are
  *    consumed when present;
  *  - `WARC-Type`, `WARC-Record-ID`, `WARC-Target-URI` are surfaced
  *    (Target-URI is legitimately absent on warcinfo records — NULL,
  *    still `ok`);
  *  - a malformed record (bad version line, missing/invalid
  *    Content-Length, truncated payload) emits ONE `ok = false` row
  *    with the error and ABANDONS the rest of that file: past a
  *    corrupt header there is no in-band record boundary to resync on
  *    (the gzip member boundaries that would allow it are hidden by
  *    the decompression layer), and a silent resync guess would
  *    misattribute payload bytes. The audit row makes the drop set
  *    visible, the p52/p55/p60 verdict discipline.
  *
  * Scale shape: ONE task per warc file — gzip is not splittable, and
  * the ~1 GiB-per-file convention exists exactly so that file = task
  * parallelizes a crawl (100 TB ≈ 10⁵ files ≫ any executor count).
  * Record iteration STREAMS over the decompressing input (single
  * GZIPInputStream handles the concatenated members); only the
  * current record's payload is ever materialized. The file bytes
  * themselves arrive via Spark's binaryFile source (its 2 GiB-per-file
  * cap sits above the WARC convention; a larger archive belongs
  * re-sharded anyway). */
object Warc {

  /** One audit row per parsed (or abandoned-at) record. */
  case class WarcRow(file: String, rec_idx: Long, ok: Boolean, err: String,
      warc_type: String, record_id: String, target_uri: String,
      content_length: java.lang.Long, payload: Array[Byte])

  /** Audited read of every `glob`-matching warc in `dir`: one row per
    * record, `ok = false` + `err` on the first malformed record of a
    * file (rest of that file abandoned, see the parse contract). */
  def readAudited(spark: SparkSession, dir: String, glob: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF()
  }

  /** The audited parse as a FILE STREAM over a crawl landing zone —
    * `.warc.gz` drops are consumed as they arrive (one micro-batch
    * entry per new file, one streaming parse per file — the same
    * file = unit-of-work shape as the batch read), with the same
    * audit-row contract. The parse is STATELESS: no watermark, no
    * aggregation, zero state-store rows — downstream decides what to
    * aggregate. The st15 JSONL landing-zone discipline applied to the
    * crawl head itself. */
  def readAuditedStream(spark: SparkSession, dir: String, glob: String): DataFrame = {
    import spark.implicits._
    // the file-stream planner demands an explicit schema; binaryFile's
    // is FIXED (path, modificationTime, length, content) and the format
    // verifies the passed schema matches it
    val binaryFileSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.BinaryType)))
    spark.readStream.format("binaryFile")
      .schema(binaryFileSchema)
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => parseFile(path, bytes) }
      .toDF()
  }

  /** Parse one warc file's raw (gzipped) bytes into a LAZY iterator of
    * audit rows — only the record currently being pulled is ever
    * materialized, so rows stream straight to the shuffle/writer as
    * they parse and per-task heap stays O(one record), not O(file).
    * (The compressed bytes themselves still arrive whole via
    * binaryFile; the multi-GiB decompressed payloads never do.) The
    * basename is kept as `file` so fixtures and oracles are
    * path-independent. */
  private[graft] def parseFile(path: String, raw: Array[Byte]): Iterator[WarcRow] =
    parseRaw(path.substring(path.lastIndexOf('/') + 1),
      new ByteArrayInputStream(raw))

  /** Iterator core over a raw (still-compressed) stream; split out so
    * WarcSpec can wrap the input in a byte-counting stream and prove
    * laziness (a take(1) must not consume later records' bytes). */
  private[graft] def parseRaw(file: String, rawIn: InputStream): Iterator[WarcRow] = {
    val in: InputStream =
      try new GZIPInputStream(rawIn)
      catch { case e: java.io.IOException =>
        return Iterator.single(WarcRow(file, 0L, ok = false,
          s"not a gzip stream: ${e.getMessage}", null, null, null, null, null))
      }
    // a consumer may abandon the iterator mid-file (a limit/take(1)
    // short-circuits the flatMap) — close the inflater at task end so
    // the native Inflater state never waits on GC; direct (driver-side
    // test) callers have no task and fall back to exhaustion-close
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    new Iterator[WarcRow] {
      private var idx = 0L
      private var finished = false       // no more records after `pending`
      private var pending: WarcRow = null
      private def fetch(): Unit = {
        if (finished || pending != null) return
        // mid-stream gzip corruption (a truncated upload, a bad tail
        // member) surfaces as an IOException from read() — that is an
        // audit row like any other malformed record, never a task
        // failure that kills the whole ingest job over one file
        val parsed =
          try parseRecord(in)
          catch { case e: java.io.IOException =>
            Left(s"gzip stream error: ${e.getMessage}")
          }
        parsed match {
          case null => // clean EOF between records
            finished = true
            in.close()
          case Right((headers, payload)) =>
            pending = WarcRow(file, idx, ok = true, null,
              headers.getOrElse("warc-type", null),
              headers.getOrElse("warc-record-id", null),
              headers.getOrElse("warc-target-uri", null),
              java.lang.Long.valueOf(payload.length.toLong), payload)
            idx += 1
          case Left(err) =>
            pending = WarcRow(file, idx, ok = false, err,
              null, null, null, null, null)
            finished = true // no in-band boundary to resync on
            in.close()
        }
      }
      override def hasNext: Boolean = { fetch(); pending != null }
      override def next(): WarcRow = {
        fetch()
        if (pending == null)
          throw new NoSuchElementException("WARC record iterator exhausted")
        val r = pending
        pending = null
        r
      }
    }
  }

  /** Hard caps: a "header line" of megabytes of non-LF bytes, or a
    * Content-Length near 2³¹, are corrupt-or-hostile input — audit
    * them instead of buffering unbounded (the line cap) or allocating
    * the claim up front (the record cap; 256 MiB sits far above any
    * real response record while keeping a lying length harmless). */
  private val MaxHeaderLine = 64 * 1024
  private val MaxRecordBytes = 256 * 1024 * 1024

  /** One record: Right((headers, payload)), Left(error), or null at a
    * clean end-of-stream. */
  private def parseRecord(in: InputStream)
      : Either[String, (Map[String, String], Array[Byte])] = {
    val first = readLine(in)
    if (first == null) return null
    // tolerate the inter-record CRLF CRLF not yet consumed
    val version =
      if (first.isEmpty) {
        val next = readLine(in)
        if (next == null) return null
        if (next.isEmpty) {
          val afterSep = readLine(in)
          if (afterSep == null) return null else afterSep
        } else next
      } else first
    if (version != "WARC/1.0" && version != "WARC/1.1")
      return Left(s"bad version line: '$version'")
    var headers = Map.empty[String, String]
    var line = readLine(in)
    while (line != null && line.nonEmpty) {
      val c = line.indexOf(':')
      if (c <= 0) return Left(s"malformed header line: '$line'")
      headers += (line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        -> line.substring(c + 1).trim)
      line = readLine(in)
    }
    if (line == null) return Left("EOF inside header block")
    val len = headers.get("content-length") match {
      case None => return Left("missing Content-Length")
      case Some(v) => try {
        val n = java.lang.Long.parseLong(v)
        if (n < 0) return Left(s"invalid Content-Length: $v")
        if (n > MaxRecordBytes)
          return Left(s"record exceeds $MaxRecordBytes bytes: $v")
        n.toInt
      } catch { case _: NumberFormatException =>
        return Left(s"invalid Content-Length: '$v'")
      }
    }
    val payload = new Array[Byte](len)
    var got = 0
    while (got < len) {
      val r = in.read(payload, got, len - got)
      if (r < 0) return Left(s"truncated payload: $got of $len bytes")
      got += r
    }
    Right((headers, payload))
  }

  /** Read one CRLF-terminated ASCII header line; null at EOF before
    * any byte. A bare LF terminates too (lenient, like real parsers);
    * the CR is stripped. Throws (caught by the record loop's audit
    * wrapper) past [[MaxHeaderLine]] bytes — binary garbage where a
    * header should be must not buffer unbounded. */
  private def readLine(in: InputStream): String = {
    val sb = new java.lang.StringBuilder()
    var b = in.read()
    if (b < 0) return null
    while (b >= 0 && b != '\n') {
      if (sb.length() >= MaxHeaderLine)
        throw new java.io.IOException(
          s"header line exceeds $MaxHeaderLine bytes")
      sb.append(b.toChar)
      b = in.read()
    }
    if (sb.length() > 0 && sb.charAt(sb.length() - 1) == '\r')
      sb.setLength(sb.length() - 1)
    sb.toString
  }
}
