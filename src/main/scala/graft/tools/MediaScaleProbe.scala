package graft.tools

import graft.operators.{Dedup, Multimodal}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Scale probe for the IMAGE-dedup path (r15 verdict #6): p50/p51/st14
  * gate correctness over the 36-image analytic fixture, so their
  * decode-side and pair-side throughput at scale was inherited from
  * the text probes, not measured. This probe fabricates an N×-bigger
  * REAL-PNG corpus (diverse solids / checkerboards / gradients, colors
  * and sizes varied per index so dHashes are spread, not degenerate)
  * and times the two scale-relevant legs separately:
  *
  *   1. decode + dHash map ([[Multimodal.perceptualHashes]]) — the
  *      row-local leg whose cost is per-byte decode work;
  *   2. Hamming-bucket pair emission ([[Dedup.hammingPairs]], ≤2 bits)
  *      over the hashes — the shuffle leg whose cost is bucket-join
  *      work on 16-byte rows.
  *
  *   sbt "runMain graft.tools.MediaScaleProbe 100"
  *
  * Prints 1× (36 images, the fixture size) vs N× timings with output
  * row counts, decode-side MB, and pair counts.
  */
object MediaScaleProbe {

  private def png(w: Int, h: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { im.setRGB(x, y, pixel(x, y)); x += 1 }
      y += 1
    }
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }

  /** n diverse real PNGs: pattern by i%3, colors/sizes/phases a
    * deterministic function of i (sizes cycle 16..47 × 8..39 — all
    * dHash-defined). Patterns are phase-shifted per index so hashes
    * SPREAD (a solid/fixed-gradient corpus collapses to a handful of
    * identical hashes and the pair count degenerates to complete
    * graphs — measuring output size, not join work). */
  def corpus(n: Int): Seq[(Long, Array[Byte])] =
    (0 until n).map { i =>
      val w = 16 + (i * 7) % 32
      val h = 8 + (i * 11) % 32
      val c1 = ((i * 2654435761L) & 0xffffff).toInt
      val c2 = (~c1) & 0xffffff
      val bytes = (i % 3) match {
        case 0 => // vertical two-tone, split position varies with i
          val sx = 2 + (i * 5) % (w - 4)
          png(w, h)((x, _) => if (x < sx) c1 else c2)
        case 1 => // checkerboard, period varies with i
          val p = 1 + (i / 3) % 4
          png(w, h)((x, y) => if ((x / p + y / p) % 2 == 0) c1 else c2)
        case _ => // gray gradient with per-index phase shift
          png(w, h)((x, _) => {
            val g = (x * 255 / (w - 1) + i * 13) % 256
            (g << 16) | (g << 8) | g
          })
      }
      (i.toLong, bytes)
    }

  def main(args: Array[String]): Unit = {
    val factor = if (args.nonEmpty) args(0).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    for (n <- Seq(36, 36 * factor)) {
      val rows = corpus(n)
      val mb = rows.map(_._2.length.toLong).sum / 1e6
      val df = rows.toDF("doc_id", "media")
        .repartition(spark.sparkContext.defaultParallelism)
        .cache()
      df.count()
      val t0 = System.nanoTime()
      val hashes = Multimodal.perceptualHashes(df, "doc_id", "media").toDF().cache()
      val nh = hashes.count()
      val tDecode = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val pairs = Dedup.hammingPairs(hashes.filter(col("defined")),
        "doc_id", "dhash", maxHamming = 2).count()
      val tPairs = (System.nanoTime() - t1) / 1e9
      println(f"[mediaprobe] n=$n%5d (${mb}%.1f MB png) decode+dhash=$tDecode%.2f s " +
        f"($nh hashes) hamming_pairs=$tPairs%.2f s ($pairs pairs)")
      hashes.unpersist(); df.unpersist()
    }
    spark.stop()
  }
}
