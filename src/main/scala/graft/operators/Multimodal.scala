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

  /** Direct PNG decode for the common subset — 8-bit gray/RGB/RGBA,
    * non-interlaced (what encoders emit for photographic/synthetic
    * content): chunk walk, one Inflater pass over the IDAT stream, and
    * the five scanline unfilters, accumulating luminance stats straight
    * from the filtered bytes. ImageIO allocates a stream + reader +
    * BufferedImage and converts color per getRGB call, which dominates
    * small images; this path is ~an order of magnitude cheaper per
    * payload and bit-identical (pinned against the ImageIO path by
    * PipelineSpec). Returns None for any other format/subset — the
    * caller falls back to the general codec. */
  private[graft] def decodePngFast(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Long])] = {
    if (bytes.length < 45) return None
    val Sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { if ((bytes(i) & 0xff) != Sig(i)) return None; i += 1 }
    def be32(o: Int): Int =
      ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    // IHDR is the first chunk by spec
    if (be32(8) != 13 || be32(12) != 0x49484452) return None
    val w = be32(16); val h = be32(20)
    val bitDepth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    if (w <= 0 || h <= 0 || bitDepth != 8 || interlace != 0) return None
    val bpp = colorType match {
      case 2 => 3  // rgb
      case 6 => 4  // rgba
      // gray (0) stays on the general codec: ImageIO's getRGB runs the
      // CS_GRAY->sRGB transform there, so sample-as-luminance here would
      // silently change which numbers a gray PNG produces; palette and
      // gray+alpha likewise
      case _ => return None
    }
    // concatenate IDAT payloads and inflate to h * (1 + w*bpp)
    val inf = new java.util.zip.Inflater()
    val stride = 1 + w * bpp
    val raw = new Array[Byte](h * stride)
    var rawOff = 0
    var off = 33  // first chunk after IHDR
    var done = false
    while (!done && off + 8 <= bytes.length) {
      val len = be32(off)
      // a crafted/corrupt 32-bit length (negative as an Int, or past the
      // buffer) would otherwise stall or reverse the walk — bail to the
      // general codec, which handles arbitrary bytes safely
      if (len < 0 || len > bytes.length - off - 12) { inf.end(); return None }
      val typ = be32(off + 4)
      if (typ == 0x49444154) {  // IDAT
        inf.setInput(bytes, off + 8, len)
        var k = 1
        while (k > 0 && rawOff < raw.length) {
          k = inf.inflate(raw, rawOff, raw.length - rawOff)
          rawOff += k
        }
      } else if (typ == 0x49454e44) done = true  // IEND
      off += 12 + len
    }
    inf.end()
    if (rawOff != raw.length) return None
    // unfilter in place + accumulate stats in one pass
    var sum = 0L
    val hist = new Array[Long](4)
    var y = 0
    while (y < h) {
      val rs = y * stride
      val filter = raw(rs) & 0xff
      var x = 1
      while (x < stride) {
        val left = if (x > bpp) raw(rs + x - bpp) & 0xff else 0
        val up = if (y > 0) raw(rs + x - stride) & 0xff else 0
        val ul = if (y > 0 && x > bpp) raw(rs + x - bpp - stride) & 0xff else 0
        val recon = filter match {
          case 0 => raw(rs + x) & 0xff
          case 1 => ((raw(rs + x) & 0xff) + left) & 0xff
          case 2 => ((raw(rs + x) & 0xff) + up) & 0xff
          case 3 => ((raw(rs + x) & 0xff) + ((left + up) >> 1)) & 0xff
          case 4 =>
            val p = left + up - ul
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - ul)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else ul
            ((raw(rs + x) & 0xff) + pred) & 0xff
          case _ => return None
        }
        raw(rs + x) = recon.toByte
        // luminance at each pixel boundary (same integer formula as the
        // ImageIO path; gray reduces to the sample value exactly)
        if ((x - 1) % bpp == bpp - 1) {
          val px = rs + x - bpp + 1
          val lum =
            if (bpp == 1) recon
            else ((raw(px) & 0xff) * 299 + (raw(px + 1) & 0xff) * 587 +
              (raw(px + 2) & 0xff) * 114) / 1000
          sum += lum
          hist(lum >> 6) += 1
        }
        x += 1
      }
      y += 1
    }
    Some((w, h, sum, hist))
  }

  /** Decode one payload. PNGs in the 8-bit non-interlaced subset take
    * the direct path above; other image formats decode through
    * javax.imageio; anything else yields byte-level statistics with
    * decoded=false. */
  private[graft] def decodeKernel(id: Long, bytes: Array[Byte]): MediaFeatures = {
    val fast =
      try decodePngFast(bytes)
      catch { case _: Exception => None }
    fast match {
      case Some((w, h, sum, hist)) =>
        val n = w.toLong * h
        return MediaFeatures(id, w, h, bytes.length.toLong,
          if (n == 0) 0.0 else sum.toDouble / n, hist.toSeq, decoded = true)
      case None => ()
    }
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

  /** Perceptual difference hash (dHash) of an image payload — the
    * image-dedup analogue of SimHash: average-pool the decoded
    * luminance onto a 9×8 grid (pixel (x, y) maps to cell
    * (x·9 / W, y·8 / H) by integer division) and set bit (cy·8 + cx)
    * iff the cell's mean luminance exceeds its right neighbor's. The
    * comparison is EXACT integer cross-multiplication
    * (sumₐ·n_b > sum_b·nₐ — never a float mean), so the hash is
    * deterministic for any image size. Near-duplicate images (resizes,
    * light recompression, small edits) land within a small Hamming
    * distance; bucketing pairs by the pigeonhole machinery is
    * [[Dedup.simHashPairs]]'s existing shape applied to this column.
    * Images narrower than 9 px or shorter than 8 px have empty grid
    * cells — undefined, None. Non-image payloads: None. */
  private[graft] def dHash64(bytes: Array[Byte]): Option[Long] = {
    val img =
      try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
      catch { case _: Exception => None }
    img.flatMap { im =>
      val w = im.getWidth; val h = im.getHeight
      if (w < 9 || h < 8) None
      else {
        val sum = Array.ofDim[Long](8, 9)
        val cnt = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val cy = y * 8 / h
          var x = 0
          while (x < w) {
            val rgb = im.getRGB(x, y)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            val cx = x * 9 / w
            sum(cy)(cx) += lum
            cnt(cy)(cx) += 1
            x += 1
          }
          y += 1
        }
        var bits = 0L
        var cy = 0
        while (cy < 8) {
          var cx = 0
          while (cx < 8) {
            if (sum(cy)(cx) * cnt(cy)(cx + 1) > sum(cy)(cx + 1) * cnt(cy)(cx))
              bits |= 1L << (cy * 8 + cx)
            cx += 1
          }
          cy += 1
        }
        Some(bits)
      }
    }
  }

  /** Typed perceptual-hash record; `defined` = false (with dhash 0)
    * for NULL, undecodable, or sub-grid payloads — a sentinel-free encoding
    * (an all-bits hash is a legal value, so NULL/−1 could collide). */
  final case class PerceptualHash(doc_id: Long, defined: Boolean, dhash: Long)

  /** dHash over a binary media column — row-local map, media bytes
    * never shuffle (same scale shape as [[extractFeatures]]). */
  def perceptualHashes(df: DataFrame, idCol: String, binCol: String): Dataset[PerceptualHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, bytes) =>
          if (bytes == null) PerceptualHash(id, defined = false, 0L)
          else dHash64(bytes) match {
            case Some(v) => PerceptualHash(id, defined = true, v)
            case None => PerceptualHash(id, defined = false, 0L)
          }
        }
      }
  }

  /** Audio spectral fingerprints over WAV/PCM binary payloads — the
    * audio rung of the media ladder ([[graft.functions.AudioSpectralHash]];
    * see its scaladoc for the RIFF-parse/Goertzel/floored-bit kernel).
    * Unlike the image path this is a NATIVE codegen'd expression, not
    * mapPartitions — the parse is pure JVM byte math, no codec library.
    * NULL payloads keep an auditable defined=false row (the p50
    * contract). Returns (idCol, defined, fp). */
  def audioFingerprints(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol),
        graft.functions.AudioSpectralHash(
          coalesce(col(binCol), lit(Array.emptyByteArray))).as("__a"))
      .select(col(idCol), col("__a.defined").as("defined"), col("__a.fp").as("fp"))

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

  // ------------------------------------------------------------ video

  /** One perceptual hash per container frame; `frame_idx = -1` with
    * defined = false is a CONTAINER-level failure (bad magic / null),
    * a defined = false row at a real index is that frame failing to
    * decode or the container truncating there (parse stops — past a
    * corrupt length field there is no boundary to resync on, the WARC
    * discipline). */
  final case class VideoFrameHash(video_id: Long, frame_idx: Int,
      defined: Boolean, dhash: Long)

  /** Maximum frames per container the near-dup composite key encodes
    * (video_id · 1024 + frame_idx); [[parseGvid]] audits past it. */
  private[graft] val MaxVideoFrames = 1024

  /** Walk a GVID container: magic "GVID", u32be frame count, then per
    * frame u32be length + PNG bytes. The minimalist deterministic
    * stand-in for a real video container — the SPARK-side plumbing
    * (schema, explode shape, per-frame hashing, near-dup composition)
    * is the thing under test; a production codec slots into the same
    * walk. */
  private[graft] def parseGvid(id: Long, bytes: Array[Byte]): Seq[VideoFrameHash] = {
    if (bytes == null || bytes.length < 8 || bytes(0) != 'G' ||
        bytes(1) != 'V' || bytes(2) != 'I' || bytes(3) != 'D')
      return Seq(VideoFrameHash(id, -1, defined = false, 0L))
    def be32(o: Int): Long =
      ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
        ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    val n = be32(4)
    if (n > MaxVideoFrames)
      return Seq(VideoFrameHash(id, -1, defined = false, 0L))
    val out = scala.collection.mutable.ArrayBuffer.empty[VideoFrameHash]
    var off = 8L
    var i = 0
    while (i < n) {
      if (off + 4 > bytes.length) {
        out += VideoFrameHash(id, i, defined = false, 0L)
        return out.toSeq
      }
      val len = be32(off.toInt)
      if (off + 4 + len > bytes.length) {
        out += VideoFrameHash(id, i, defined = false, 0L)
        return out.toSeq
      }
      val frame = java.util.Arrays.copyOfRange(
        bytes, (off + 4).toInt, (off + 4 + len).toInt)
      out += (dHash64(frame) match {
        case Some(v) => VideoFrameHash(id, i, defined = true, v)
        case None => VideoFrameHash(id, i, defined = false, 0L)
      })
      off += 4 + len
      i += 1
    }
    out.toSeq
  }

  /** Per-frame perceptual hashes over a video (GVID) binary column —
    * the video rung of the media ladder. Row-local flatMap (media
    * bytes never shuffle; one row in, ≤ frames rows out — the
    * [[sampleFrames]] explode shape with the image path's decode). */
  def videoFrameHashes(df: DataFrame, idCol: String, binCol: String): Dataset[VideoFrameHash] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) => parseGvid(id, bytes) }
  }

  /** Video near-duplicate pairs: two videos match when ≥ `minMatches`
    * DISTINCT FRAMES ON EACH SIDE participate in frame pairs within
    * Hamming `maxHamming` — alignment-free, so a trimmed or re-cut
    * video still pairs with its source (the frame-level analogue of
    * document n-gram containment). Requiring distinct frames on BOTH
    * sides (not just k matched pairs) is what keeps one degenerate
    * low-texture frame — every flat/solid frame pools to the same
    * dHash — from gaming the threshold by matching k copies of
    * itself. Returns (video0, video1, n_matched, n_frames0,
    * n_frames1), video0 < video1, n_framesX = distinct matched frames
    * of videoX.
    *
    * Scale shape: frames ride [[graft.operators.Dedup.hammingPairs]]'
    * pigeonhole buckets on a composite (video·1024 + frame) key — the
    * only corpus-wide exchanges carry 16-byte (key, hash) rows, never
    * media bytes, and nothing quadratic materializes; the final count
    * is one map-side-combinable aggregate on the surviving pairs. */
  def videoNearDupPairs(hashes: Dataset[VideoFrameHash],
      minMatches: Int, maxHamming: Int = 1): DataFrame = {
    require(minMatches >= 1, "minMatches must be >= 1")
    val frames = hashes.toDF()
      .filter(col("defined"))
      .select((col("video_id") * MaxVideoFrames + col("frame_idx")).as("fid"),
        col("dhash"))
    val pairs = graft.operators.Dedup.hammingPairs(
      frames, "fid", "dhash", maxHamming)
    val k = lit(MaxVideoFrames.toLong)
    pairs
      .withColumn("v0", floor(col("id0") / k).cast("long"))
      .withColumn("v1", floor(col("id1") / k).cast("long"))
      .filter(col("v0") =!= col("v1"))
      // normalize so fa always belongs to the LESSER video
      .select(least(col("v0"), col("v1")).as("video0"),
        greatest(col("v0"), col("v1")).as("video1"),
        when(col("v0") <= col("v1"), col("id0")).otherwise(col("id1")).as("fa"),
        when(col("v0") <= col("v1"), col("id1")).otherwise(col("id0")).as("fb"))
      .groupBy("video0", "video1")
      .agg(count(lit(1)).as("n_matched"),
        countDistinct(col("fa")).as("n_frames0"),
        countDistinct(col("fb")).as("n_frames1"))
      .filter(least(col("n_frames0"), col("n_frames1")) >= minMatches)
      .select(col("video0"), col("video1"),
        col("n_matched").cast("long").as("n_matched"),
        col("n_frames0").cast("long").as("n_frames0"),
        col("n_frames1").cast("long").as("n_frames1"))
  }
}
