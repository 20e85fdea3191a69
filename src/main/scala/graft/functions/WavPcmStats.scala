package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, IntegerType, LongType, StructField, StructType}

/** PCM-16 waveform statistics straight from WAV bytes — the first REAL
  * sample-decoding rung of the multimodal story (one step past the
  * header-only [[MediaHeaderMeta]], still far short of the
  * sandbox-stubbed perceptual codec in
  * [[graft.ext.BinaryOps.extractFeaturesStub]]): silence detection,
  * clipping audit, and level normalization all key off count / peak /
  * energy, and all three are exact-integer facts of the bytes — no DSP
  * library, no float accumulation until the final rms division.
  *
  * Contract:
  *  - input must be RIFF/WAVE with a `fmt ` chunk declaring
  *    uncompressed PCM (audioFormat 1) at 16 bits/sample and a `data`
  *    chunk — anything else (non-WAV magic, float/ADPCM/24-bit audio,
  *    missing chunks, malformed sizes) yields a NULL struct: "not
  *    statable", never an exception (every read bounds-checked, chunk
  *    walk monotone, the [[MediaHeaderMeta]] fuzz discipline);
  *  - samples are signed little-endian i16, counted ACROSS channels
  *    (interleaved frames are level-equivalent for energy/peak); the
  *    usable payload is `min(declared data size, bytes present)` —
  *    a truncated capture still audits — and an odd trailing byte is
  *    ignored;
  *  - output `struct(n_samples INT, peak INT, sum_sq BIGINT,
  *    rms DOUBLE)`: peak = max |s| (|−32768| = 32768 fits INT),
  *    sum_sq = Σ s² exact in a LONG (≤ 2³⁰ per sample — overflow
  *    would need a 2-exabyte data chunk), rms = sqrt(sum_sq / n) —
  *    ONE IEEE division and one correctly-rounded sqrt, so the oracle
  *    reproduces it bit-for-bit from the same integers. An EMPTY data
  *    chunk reports (0, NULL, 0, NULL): present, silent of samples. */
case class WavPcmStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("n_samples", IntegerType),
    StructField("peak", IntegerType),
    StructField("sum_sq", LongType),
    StructField("rms", DoubleType)))
  override def nullable: Boolean = true
  override def prettyName: String = "graft_wav_stats"

  import WavPcmStats._

  def compute(bytes: Array[Byte]): InternalRow = {
    if (!matches(bytes, 0, Riff) || !matches(bytes, 8, Wave)) return null
    var pos = 12
    var pcm16 = false
    var seenFmt = false
    var dataOff = -1
    var dataLen = -1
    while (pos + 8 <= bytes.length && (dataOff < 0 || !seenFmt)) {
      val size = le32(bytes, pos + 4)
      if (size < 0) return null
      if (matches(bytes, pos, FmtId)) {
        seenFmt = true
        // fmt payload: audioFormat(2) channels(2) rate(4) byteRate(4)
        // blockAlign(2) bitsPerSample(2)
        if (size < 16 || pos + 24 > bytes.length) return null
        pcm16 = le16(bytes, pos + 8) == 1 && le16(bytes, pos + 22) == 16
      } else if (matches(bytes, pos, DataId)) {
        dataOff = pos + 8
        dataLen = size
      }
      val step = 8L + size + (size & 1) // chunks are word-aligned
      if (pos + step > Int.MaxValue) return null
      pos += step.toInt
    }
    if (!seenFmt || !pcm16 || dataOff < 0) return null
    // truncated captures still audit: clamp to the bytes present
    val avail = math.max(0, math.min(dataLen.toLong,
      (bytes.length - dataOff).toLong)).toInt
    val n = avail / 2
    if (n == 0) return InternalRow(Int.box(0), null, Long.box(0L), null)
    var peak = 0
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = ((bytes(dataOff + 2 * i + 1) << 8) |
        (bytes(dataOff + 2 * i) & 0xFF)) // sign-extends via the high byte
      val a = math.abs(s)
      if (a > peak) peak = a
      sumSq += s.toLong * s.toLong
      i += 1
    }
    InternalRow(Int.box(n), Int.box(peak), Long.box(sumSq),
      Double.box(math.sqrt(sumSq.toDouble / n)))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("wavStatsKernel", this,
      classOf[WavPcmStats].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): WavPcmStats =
    copy(child = newChild)
}

object WavPcmStats {
  private val Riff = "RIFF".getBytes("US-ASCII")
  private val Wave = "WAVE".getBytes("US-ASCII")
  private val FmtId = "fmt ".getBytes("US-ASCII")
  private val DataId = "data".getBytes("US-ASCII")

  private def matches(bytes: Array[Byte], off: Int, sig: Array[Byte]): Boolean = {
    if (bytes == null || bytes.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if (bytes(off + i) != sig(i)) return false
      i += 1
    }
    true
  }

  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xFF) << 24) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
}
