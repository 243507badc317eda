package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed in partition-local batches (the Scala
  * analogue of mapInPandas). The decode kernel is REAL for image
  * payloads — javax.imageio ships with the JDK (PNG/JPEG/GIF/BMP):
  * width/height/pixel statistics come from the decoded raster. Non-image
  * payloads fall back to raw byte statistics so arbitrary binaries still
  * flow through the same typed pipeline.
  *
  * Scale shape: media bytes never shuffle — decoding is a row-local map
  * over the scan; only the small typed feature records move.
  */
object Multimodal {

  /** Typed decoded-media record: binary in → metadata + features out. */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Long,
      mean_byte: Double,       // image: mean luminance (0-255); else mean raw byte
      byte_hist4: Seq[Long],   // 4-bucket luminance/byte histogram
      decoded: Boolean)        // true when a real image codec handled it

  /** Decode one payload. Image formats decode through javax.imageio;
    * anything else yields byte-level statistics with decoded=false. */
  private[graft] def decodeKernel(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img match {
      case Some(im) =>
        val w = im.getWidth
        val h = im.getHeight
        var sum = 0L
        val hist = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            sum += lum
            hist(lum >> 6) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        MediaFeatures(id, w, h, bytes.length.toLong,
          if (n == 0) 0.0 else sum.toDouble / n, hist.toSeq, decoded = true)
      case None =>
        var sum = 0L
        val hist = new Array[Long](4)
        var i = 0
        while (i < bytes.length) {
          val b = bytes(i) & 0xff
          sum += b
          hist(b >> 6) += 1
          i += 1
        }
        MediaFeatures(id, 0, 0, bytes.length.toLong,
          if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length, hist.toSeq,
          decoded = false)
    }
  }

  /** Decode + feature-extract a binary media column, batch-wise per
    * partition. Input df needs (idCol: long, binCol: binary). */
  def extractFeatures(df: DataFrame, idCol: String, binCol: String): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        // partition-local batch loop — ImageIO readers are cached per JVM
        rows.collect { case (id, bytes) if bytes != null => decodeKernel(id, bytes) }
      }
  }

  /** Frame sampling for video-like payloads: split the payload into
    * `frameSize`-byte frames and keep every `stride`-th — the explode-
    * side shape (one row in, many typed rows out). */
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

  /** Encode a deterministic tiny PNG per row (the testdata ships no real
    * binaries): an (8+id%24)×(8+len%24) image whose pixels derive from a
    * rolling hash of the text — a REAL encoded image, so the decode path
    * above exercises an actual codec end-to-end. Row-local UDF. */
  private val encodePng = udf { (id: Long, text: String) =>
    val t = if (text == null) "" else text
    val w = 8 + (id % 24).toInt
    val h = 8 + (t.length % 24)
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var seed = DetRngHash.mix(id ^ t.length.toLong)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        seed = DetRngHash.mix(seed)
        im.setRGB(x, y, (seed & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** Deterministic media payloads from the documents table: real PNG
    * bytes with typed metadata. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol), encodePng(col(idCol), col(textCol)).as("media"),
      struct(lit("image/png").as("mime"), length(col(textCol)).as("n_chars"))
        .as("media_meta"))
}
