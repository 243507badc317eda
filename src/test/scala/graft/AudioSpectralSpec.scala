package graft

import graft.functions.AudioSpectralHash
import graft.tools.AudioFixture
import org.scalatest.funsuite.AnyFunSuite

/** The audio fingerprint kernel's contract, pinned by HAND-computed
  * expectations (independent of the fixture generator): probe bins,
  * the relative floor's dust suppression, amplitude/channel
  * invariance, harmonic structure, and the malformed-payload ladder. */
class AudioSpectralSpec extends AnyFunSuite {

  private val N = 4096
  private def sine(bin: Int, amp: Double = 19660.0): Array[Double] =
    Array.tabulate(N)(i =>
      math.round(amp * math.sin(2.0 * math.Pi * (bin / 256.0) * i)).toDouble)

  test("a pure tone on probe bin b fingerprints to exactly 1 << (b-1), at any amplitude") {
    // bin 32 = normalized frequency 32/256 = probe index 31
    assert(AudioSpectralHash.fingerprintFromSamples(sine(32)) == (true, 1L << 31))
    assert(AudioSpectralHash.fingerprintFromSamples(sine(32, 983.0)) == (true, 1L << 31),
      "the relative floor must make the fingerprint amplitude-invariant")
    assert(AudioSpectralHash.fingerprintFromSamples(sine(64)) == (true, 1L << 63))
    assert(AudioSpectralHash.fingerprintFromSamples(sine(1)) == (true, 1L << 0))
  }

  test("silence is defined and fingerprints to 0; short/garbage inputs are undefined") {
    assert(AudioSpectralHash.fingerprintFromSamples(new Array[Double](N)) == (true, 0L))
    assert(AudioSpectralHash.fingerprintFromSamples(new Array[Double](100)) == (false, 0L))
    assert(AudioSpectralHash.kernel(null) == (false, 0L))
    assert(AudioSpectralHash.kernel(Array[Byte](1, 2, 3)) == (false, 0L))
  }

  test("sawtooth period 64 sets exactly its harmonic bins 4, 8, ..., 64") {
    val saw = Array.tabulate(N)(i =>
      math.round(19660.0 * (2.0 * (i % 64) / 64 - 1.0)).toDouble)
    val expected = (0 until 16).map(m => 1L << (4 * m + 3)).reduce(_ | _)
    assert(AudioSpectralHash.fingerprintFromSamples(saw) == (true, expected))
    assert(expected == 0x8888888888888888L)
  }

  test("byte round-trip: the fixture's WAV payloads parse back to the expected fingerprints") {
    // drives the RIFF writer+parser pair end-to-end WITHOUT Spark —
    // channel averaging (stereo row), chunk walk, little-endian int16
    AudioFixture.rows().foreach { r =>
      val (d, f) = AudioSpectralHash.kernel(r.media)
      assert(d == r.fp_defined, s"${r.kind}: defined $d != ${r.fp_defined}")
      assert(f == r.fp, f"${r.kind}: fp 0x$f%016x != 0x${r.fp}%016x")
    }
  }

  test("sub-floor noise and stereo encoding cannot move a tone's fingerprint") {
    val rows = AudioFixture.rows().map(r => r.kind -> r.fp).toMap
    assert(rows("sine_bin32") == rows("sine_bin32_half_amp"))
    assert(rows("sine_bin32") == rows("sine_bin32_noisy"))
    assert(rows("sine_bin32") == rows("sine_bin32_stereo"))
    assert(rows("sine_bin32") != rows("sine_bin64"))
    assert(rows("square_p16") != rows("two_tone_24_56"),
      "square's 3rd harmonic (bin 48) must differ from the 24+56 two-tone")
  }
}
