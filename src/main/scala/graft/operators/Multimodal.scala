package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-local batches (the Scala
  * analogue of mapInPandas). The container ships no image/audio codecs,
  * so the decode kernel is a clearly-marked deterministic STUB — the
  * Spark-side contract (schema, partitioning, batch shape, null
  * handling) is real and tested, and a real codec drops into
  * `decodeKernel` without touching the plan.
  */
object Multimodal {

  /** Typed decoded-media record: binary in → metadata + features out. */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      mean_byte: Double,
      byte_hist4: Seq[Long]) // 4-bucket byte histogram as a cheap feature

  /** STUB decode kernel — stands in for an image decoder. Reads a fake
    * header (width/height derived from leading bytes) and computes
    * deterministic byte statistics as "features". Replace the body with
    * e.g. javax.imageio / ffmpeg bindings in a full deployment; the
    * signature (bytes → MediaFeatures) is the real contract.
    */
  private def decodeKernel(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val w = 16 + (math.abs(bytes.headOption.getOrElse(0: Byte).toInt) % 64)
    val h = 16 + (math.abs(bytes.lift(1).getOrElse(0: Byte).toInt) % 64)
    var sum = 0L
    val hist = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      sum += b
      hist(b >> 6) += 1
      i += 1
    }
    MediaFeatures(id, w, h, bytes.length.toLong,
      if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, hist.toSeq)
  }

  /** Decode + feature-extract a binary media column, batch-wise per
    * partition. Input df needs (idCol: long, binCol: binary). The media
    * bytes never shuffle: this is a row-local map over the scan. */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // partition-local batch loop — codec state (if any) would be
        // initialized once here, amortized over the batch
        rows.collect { case (id, bytes) if bytes != null => decodeKernel(id, bytes) }
      }
  }

  /** Frame-sampling stub for video-like payloads: split the payload into
    * `frameSize`-byte frames and keep every `stride`-th — demonstrates
    * the explode-side shape (one row in, many typed rows out). */
  final case class Frame(doc_id: Long, frame_no: Int, n_bytes: Int, checksum: Long)

  def sampleFrames(df: DataFrame, idCol: String, binCol: String,
      frameSize: Int = 256, stride: Int = 4): Dataset[Frame] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (bytes == null) Iterator.empty
        else bytes.grouped(frameSize).zipWithIndex
          .filter(_._2 % stride == 0)
          .map { case (chunk, i) => Frame(id, i, chunk.length, DetRngHash.xx(chunk)) }
      }
  }

  /** Deterministic fake media payloads from the documents table (the
    * testdata ships no real binaries): text bytes stand in for an
    * encoded image. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), col(textCol).cast("binary").as("media"),
      struct(lit("image/fake").as("mime"), length(col(textCol)).as("n_bytes"))
        .as("media_meta"))
}
