package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, UnaryExpression, Expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Decode-free media metadata from HEADER bytes — the real half of the
  * multimodal story next to the sandbox-stubbed codec
  * ([[graft.ext.BinaryOps.extractFeaturesStub]]): container format,
  * image dimensions, and audio geometry are all declared in the first
  * few hundred bytes of the file, so a 100 TB blob corpus gets its
  * schema/routing metadata from a pure projection that never shuffles,
  * never decodes a pixel, and — with parquet column pruning — reads
  * only the blob column it sniffs.
  *
  * Recognized containers, by magic number:
  *  - PNG  (`89 50 4E 47 0D 0A 1A 0A` + IHDR): width/height = the two
  *    big-endian u32s at offsets 16/20.
  *  - GIF  (`GIF87a`/`GIF89a`): width/height = little-endian u16s at 6/8.
  *  - BMP  (`BM`, BITMAPINFOHEADER): width/height = little-endian i32s
  *    at 18/22; a NEGATIVE height encodes top-down row order and is
  *    reported as its magnitude.
  *  - JPEG (`FF D8 FF`): segment walk to the first SOF marker
  *    (C0–CF minus C4/C8/CC); height/width = big-endian u16s at
  *    payload offsets 3/5. Standalone markers (01, D0–D7) have no
  *    length field and are stepped over.
  *  - WAV  (`RIFF` …… `WAVE`): chunk walk to `fmt `; channels =
  *    little-endian u16 at +2, sample_rate = little-endian u32 at +4.
  *    Chunks are word-aligned (odd sizes pad one byte).
  *  - MP4  (ISO BMFF, `ftyp` as the first box): top-level box walk to
  *    the `moov` container, inner walk to `mvhd`; duration_ms =
  *    duration·1000/timescale with version-0 (u32) and version-1 (u64)
  *    field layouts both handled. The VIDEO leg of the routing pass.
  *
  * Output: `struct(format STRING, width INT, height INT, channels INT,
  * sample_rate INT, duration_ms INT)` — dimensions for images,
  * geometry for audio, duration for video containers, the
  * rest NULL. An unrecognized magic yields a non-NULL struct with every
  * field NULL; a recognized magic whose header is TRUNCATED or whose
  * declared fields cannot be read keeps `format` and NULLs the metrics
  * (the row is routable, its geometry unknown). NULL blob → NULL
  * struct. Malformed input can never throw: every read is
  * bounds-checked, segment walks are monotone, and dimension fields
  * that overflow a signed int report NULL.
  */
case class MediaHeaderMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("duration_ms", IntegerType)))
  override def prettyName: String = "graft_media_meta"

  import MediaHeaderMeta._

  def compute(bytes: Array[Byte]): InternalRow = {
    if (matches(bytes, 0, PngMagic)) {
      // IHDR must be the first chunk: length at 8, type "IHDR" at 12
      if (bytes.length >= 24 && matches(bytes, 12, Ihdr)) {
        val w = be32(bytes, 16); val h = be32(bytes, 20)
        row("png", dim(w), dim(h), null, null)
      } else row("png", null, null, null, null)
    } else if (matches(bytes, 0, Gif87) || matches(bytes, 0, Gif89)) {
      if (bytes.length >= 10)
        row("gif", dim(le16(bytes, 6)), dim(le16(bytes, 8)), null, null)
      else row("gif", null, null, null, null)
    } else if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') {
      if (bytes.length >= 26) {
        val w = le32(bytes, 18); val h = le32(bytes, 22)
        // negative height = top-down DIB; Int.MinValue has no magnitude
        val hAbs = if (h == Int.MinValue) null else dim(math.abs(h))
        row("bmp", dim(w), hAbs, null, null)
      } else row("bmp", null, null, null, null)
    } else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
        (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) {
      jpegSof(bytes)
    } else if (matches(bytes, 0, Riff) && matches(bytes, 8, Wave)) {
      wavFmt(bytes)
    } else if (bytes.length >= 8 && matches(bytes, 4, Ftyp)) {
      mp4Mvhd(bytes)
    } else row(null, null, null, null, null)
  }

  private def mp4Mvhd(bytes: Array[Byte]): InternalRow = {
    var pos = 0
    while (pos + 8 <= bytes.length) {
      val size = be32(bytes, pos)
      val isMoov = matches(bytes, pos + 4, Moov)
      if (size < 8) return row("mp4", null, null, null, null)
      if (isMoov) {
        val end = math.min(pos + size, bytes.length.toLong)
        var p = pos + 8
        while (p + 8 <= end) {
          val s = be32(bytes, p)
          if (s < 8) return row("mp4", null, null, null, null)
          if (matches(bytes, p + 4, Mvhd)) {
            val v = if (p + 8 < bytes.length) bytes(p + 8) & 0xFF else -1
            // v0: ver/flags(4) ctime(4) mtime(4) timescale(4) dur(4)
            // v1: ver/flags(4) ctime(8) mtime(8) timescale(4) dur(8)
            if (v == 0 && p + 28 <= bytes.length) {
              val ts = be32(bytes, p + 20); val dur = be32(bytes, p + 24)
              return row("mp4", null, null, null, null,
                durMs(dur, ts))
            } else if (v == 1 && p + 40 <= bytes.length) {
              val ts = be32(bytes, p + 28)
              val dur = (be32(bytes, p + 32) << 32) | be32(bytes, p + 36)
              return row("mp4", null, null, null, null, durMs(dur, ts))
            } else return row("mp4", null, null, null, null)
          }
          if (p + s > end) return row("mp4", null, null, null, null)
          p += s.toInt
        }
        return row("mp4", null, null, null, null)
      }
      if (pos + size > Int.MaxValue) return row("mp4", null, null, null, null)
      pos += size.toInt
    }
    row("mp4", null, null, null, null)
  }

  private def jpegSof(bytes: Array[Byte]): InternalRow = {
    var pos = 2
    while (pos + 1 < bytes.length && (bytes(pos) & 0xFF) == 0xFF) {
      val marker = bytes(pos + 1) & 0xFF
      if (marker == 0xFF) pos += 1 // fill byte, resync
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7))
        pos += 2 // standalone, no length field
      else if (marker >= 0xC0 && marker <= 0xCF &&
          marker != 0xC4 && marker != 0xC8 && marker != 0xCC) {
        // SOFn payload: len(2) precision(1) height(2) width(2)
        return if (pos + 8 < bytes.length)
          row("jpeg", dim(be16(bytes, pos + 7)), dim(be16(bytes, pos + 5)),
            null, null)
        else row("jpeg", null, null, null, null)
      } else {
        if (pos + 3 >= bytes.length) return row("jpeg", null, null, null, null)
        val len = be16(bytes, pos + 2)
        if (len < 2) return row("jpeg", null, null, null, null)
        pos += 2 + len
      }
    }
    row("jpeg", null, null, null, null)
  }

  private def wavFmt(bytes: Array[Byte]): InternalRow = {
    var pos = 12
    while (pos + 8 <= bytes.length) {
      val size = le32(bytes, pos + 4)
      if (size < 0) return row("wav", null, null, null, null)
      if (matches(bytes, pos, FmtId)) {
        // fmt payload: audioFormat(2) channels(2) sampleRate(4)
        return if (size >= 8 && pos + 16 <= bytes.length)
          row("wav", null, null, dim(le16(bytes, pos + 10)),
            dim(le32(bytes, pos + 12)))
        else row("wav", null, null, null, null)
      }
      val step = 8L + size + (size & 1) // chunks are word-aligned
      if (pos + step > Int.MaxValue) return row("wav", null, null, null, null)
      pos += step.toInt
    }
    row("wav", null, null, null, null)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("mediaMetaKernel", this,
      classOf[MediaHeaderMeta].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): MediaHeaderMeta =
    copy(child = newChild)
}

object MediaHeaderMeta {
  private val PngMagic = Array[Byte](0x89.toByte, 'P', 'N', 'G',
    0x0D, 0x0A, 0x1A, 0x0A)
  private val Ihdr = "IHDR".getBytes("US-ASCII")
  private val Gif87 = "GIF87a".getBytes("US-ASCII")
  private val Gif89 = "GIF89a".getBytes("US-ASCII")
  private val Riff = "RIFF".getBytes("US-ASCII")
  private val Wave = "WAVE".getBytes("US-ASCII")
  private val FmtId = "fmt ".getBytes("US-ASCII")
  private val Ftyp = "ftyp".getBytes("US-ASCII")
  private val Moov = "moov".getBytes("US-ASCII")
  private val Mvhd = "mvhd".getBytes("US-ASCII")

  private def matches(bytes: Array[Byte], off: Int, sig: Array[Byte]): Boolean = {
    if (bytes.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if (bytes(off + i) != sig(i)) return false
      i += 1
    }
    true
  }

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def le16(b: Array[Byte], o: Int): Int =
    ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def le32(b: Array[Byte], o: Int): Int =
    ((b(o + 3) & 0xFF) << 24) | ((b(o + 2) & 0xFF) << 16) |
      ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)

  /** u32 (or non-negative i32) dimension → boxed Int, NULL on overflow
    * or non-positive values (a 0×0 image has no geometry). */
  private def dim(v: Long): Any =
    if (v > 0 && v <= Int.MaxValue) Int.box(v.toInt) else null
  private def dim(v: Int): Any = if (v > 0) Int.box(v) else null

  /** duration·1000/timescale as a boxed Int ms, NULL on degenerate
    * timescale or int overflow. */
  private def durMs(duration: Long, timescale: Long): Any =
    if (timescale <= 0 || duration < 0 ||
      duration > Long.MaxValue / 1000L) null
    else {
      val ms = duration * 1000L / timescale
      if (ms > Int.MaxValue) null else Int.box(ms.toInt)
    }

  private def row(format: String, w: Any, h: Any, ch: Any, sr: Any,
      dur: Any = null): InternalRow =
    InternalRow(
      if (format == null) null else UTF8String.fromString(format),
      w, h, ch, sr, dur)
}
