package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** 64-bit spectral fingerprint of a WAV/PCM payload — the audio rung of
  * the multimodal near-dup ladder (images have dHash, p50; audio gets
  * the spectral analogue). Completely row-local and JVM-pure (RIFF
  * parse + Goertzel — no codec library), so unlike the image decode it
  * runs as a native codegen'd expression, not mapPartitions.
  *
  * Kernel: parse the RIFF/WAVE container (16-bit PCM only, any channel
  * count — frames average to mono in double), window the first 4096
  * samples, take Goertzel energies at the 65 normalized probe
  * frequencies (k+1)/256 cycles/sample, zero every energy below 1e-6 of
  * the maximum (the relative floor that makes bits compare CONTENT, not
  * spectral-leakage/quantization dust — a pure tone's fingerprint is
  * then exactly its bin bit at ANY amplitude, and adding sub-floor
  * noise cannot flip a bit), and set bit k iff energy(k) > energy(k+1)
  * — the dHash gradient convention in frequency. Silence fingerprints
  * to 0 (defined, like a solid image). Returns
  * struct(defined: boolean, fp: bigint); defined=false for anything
  * unparseable (bad magic, non-PCM, non-16-bit, truncated data chunk)
  * or shorter than 256 mono frames — auditable rows, never drops. */
case class AudioSpectralHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a binary input, got ${other.simpleString}")
  }
  override def dataType: DataType = AudioSpectralHash.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_audio_spectral_hash"

  override protected def nullSafeEval(v: Any): Any =
    AudioSpectralHash.kernelRow(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"${ev.value} = graft.functions.AudioSpectralHash.kernelRow($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object AudioSpectralHash {
  val schema: StructType = StructType(Seq(
    StructField("defined", BooleanType, nullable = false),
    StructField("fp", LongType, nullable = false)))

  /** Probe bins: normalized frequencies (k+1)/256 cycles/sample. */
  val Bins = 65
  /** Analysis window (prefix) in mono frames. */
  val MaxWindow = 4096
  /** Fewer frames than this has no stable spectrum — defined=false. */
  val MinSamples = 256
  /** Relative energy floor: bins below Floor × max are zeroed. */
  val Floor = 1e-6

  def kernelRow(bytes: Array[Byte]): InternalRow = {
    val (d, f) = kernel(bytes)
    new GenericInternalRow(Array[Any](d, f))
  }

  def kernel(bytes: Array[Byte]): (Boolean, Long) =
    if (bytes == null) (false, 0L)
    else fingerprintFromSamples(parseWavMono(bytes))

  /** Goertzel energy at normalized frequency `f` (cycles/sample). */
  def goertzel(x: Array[Double], n: Int, f: Double): Double = {
    val w = 2.0 * math.Pi * f
    val coeff = 2.0 * math.cos(w)
    var s1 = 0.0
    var s2 = 0.0
    var i = 0
    while (i < n) {
      val s0 = x(i) + coeff * s1 - s2
      s2 = s1
      s1 = s0
      i += 1
    }
    s1 * s1 + s2 * s2 - coeff * s1 * s2
  }

  /** The fingerprint over already-decoded mono samples — shared with
    * the fixture generator (graft.tools.AudioFixture computes expected
    * values from the samples it synthesized; the byte-level RIFF
    * encode/parse round-trip is what the p64 gate then checks, the p50
    * analytic-expectation discipline). */
  def fingerprintFromSamples(x: Array[Double]): (Boolean, Long) = {
    if (x == null || x.length < MinSamples) return (false, 0L)
    val n = math.min(x.length, MaxWindow)
    val e = new Array[Double](Bins)
    var k = 0
    while (k < Bins) {
      e(k) = goertzel(x, n, (k + 1) / 256.0)
      k += 1
    }
    var mx = 0.0
    k = 0
    while (k < Bins) { if (e(k) > mx) mx = e(k); k += 1 }
    val floor = mx * Floor
    k = 0
    while (k < Bins) { if (e(k) <= floor) e(k) = 0.0; k += 1 }
    var fp = 0L
    k = 0
    while (k < 64) {
      if (e(k) > e(k + 1)) fp |= (1L << k)
      k += 1
    }
    (true, fp)
  }

  /** RIFF/WAVE → mono double samples (channel-averaged); null for
    * anything that is not well-formed 16-bit PCM. */
  def parseWavMono(b: Array[Byte]): Array[Double] = {
    if (b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    // the chunk walk is LONG arithmetic throughout: a crafted size
    // field near Int.MaxValue would overflow an Int offset negative,
    // turning the documented defined=false contract into an
    // ArrayIndexOutOfBounds task failure
    var off = 12L
    var fmt = -1
    var channels = -1
    var bits = -1
    var dataOff = -1
    var dataLen = 0L
    while (off + 8 <= b.length) {
      val o = off.toInt
      val size = u32(o + 4)
      val body = off + 8
      if (b(o) == 'f' && b(o + 1) == 'm' && b(o + 2) == 't' && b(o + 3) == ' ') {
        if (body + 16 > b.length) return null
        fmt = u16(body.toInt)
        channels = u16(body.toInt + 2)
        bits = u16(body.toInt + 14)
      } else if (b(o) == 'd' && b(o + 1) == 'a' && b(o + 2) == 't' && b(o + 3) == 'a') {
        dataOff = body.toInt
        dataLen = size
      }
      // chunks are word-aligned
      off = body + size + (size & 1L)
    }
    if (fmt != 1 || bits != 16 || channels < 1) return null
    if (dataOff < 0 || dataOff + dataLen > b.length) return null
    val frameBytes = 2L * channels
    val nFrames = (dataLen / frameBytes).toInt
    val out = new Array[Double](nFrames)
    var i = 0
    while (i < nFrames) {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val o = dataOff + i * frameBytes.toInt + 2 * c
        acc += (((b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)).toShort).toDouble
        c += 1
      }
      out(i) = acc / channels
      i += 1
    }
    out
  }

  def apply(bytes: Column): Column =
    ColumnBridge.column(AudioSpectralHash(ColumnBridge.expression(bytes)))
}
