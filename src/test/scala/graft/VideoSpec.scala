package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.VideoFrameHash
import org.scalatest.funsuite.AnyFunSuite

/** Video container + near-dup contracts, pinned on inputs BUILT IN THE
  * TEST — independent of the fixture generator. */
class VideoSpec extends AnyFunSuite {
  import TestSpark._

  private def be32(v: Int): Array[Byte] =
    Array(((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
      ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def png(w: Int, h: Int)(gray: (Int, Int) => Int): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val g = gray(x, y)
      im.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "png", out)
    out.toByteArray
  }

  private def gvid(magic: String, frames: Array[Byte]*): Array[Byte] =
    magic.getBytes("US-ASCII") ++ be32(frames.size) ++
      frames.flatMap(f => be32(f.length) ++ f)

  test("container walk: frame count, per-frame decode, sub-grid frame audited") {
    val a = png(18, 8)((x, _) => x * 14)       // horizontal gradient
    val tiny = png(8, 5)((x, y) => x + y)      // sub-grid -> undefined
    val rows = Multimodal.parseGvid(7L, gvid("GVID", a, tiny, a))
    assert(rows.size == 3)
    assert(rows(0).ok7)
    assert(rows(1) == VideoFrameHash(7L, 1, defined = false, 0L))
    assert(rows(2).defined && rows(2).dhash == rows(0).dhash,
      "identical frames must hash identically")
  }

  private implicit class RowOps(r: VideoFrameHash) {
    def ok7: Boolean = r.video_id == 7L && r.defined
  }

  test("bad magic and truncated containers audit instead of throwing") {
    val a = png(18, 8)((x, _) => x * 14)
    assert(Multimodal.parseGvid(1L, gvid("GVIX", a)) ==
      Seq(VideoFrameHash(1L, -1, defined = false, 0L)))
    assert(Multimodal.parseGvid(2L, null) ==
      Seq(VideoFrameHash(2L, -1, defined = false, 0L)))
    // length field claims past the end: frame 0 parses, frame 1 audits
    val good = gvid("GVID", a)
    val lying = good.take(4) ++ be32(2) ++ good.drop(8) ++ be32(100000) ++
      Array[Byte](1, 2, 3)
    val rows = Multimodal.parseGvid(3L, lying)
    assert(rows.size == 2 && rows(0).defined && !rows(1).defined)
    assert(rows(1).frame_idx == 1)
  }

  test("near-dup distinct-frame floor: one degenerate frame cannot game the threshold") {
    import spark.implicits._
    // v0/v1: 4 genuinely matching distinct frames -> pair at k=4;
    // v2: ONE frame whose hash matches all four of v3's identical
    // frames -> 4 matched pairs but only 1 distinct v2 frame -> no pair
    val hashes = Seq(
      (0L, 0, true, 0x11L), (0L, 1, true, 0x22L), (0L, 2, true, 0x44L), (0L, 3, true, 0x88L),
      (1L, 0, true, 0x11L), (1L, 1, true, 0x22L), (1L, 2, true, 0x44L), (1L, 3, true, 0x88L),
      (2L, 0, true, 0xF0L),
      (3L, 0, true, 0xF0L), (3L, 1, true, 0xF0L), (3L, 2, true, 0xF0L), (3L, 3, true, 0xF0L)
    ).map(t => VideoFrameHash(t._1, t._2, t._3, t._4)).toDS()
    val got = Multimodal.videoNearDupPairs(hashes, minMatches = 4, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((0L, 1L, 4L)),
      s"only the 4-distinct-frame pair may survive, got $got")
  }
}
