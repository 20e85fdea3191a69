package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** ZIP central-directory listing straight from archive bytes — the
  * container-routing pass for corpora that arrive as archive shards
  * (the [[MediaHeaderMeta]] story for archives): which members exist,
  * how big they are, and where their local records start, WITHOUT
  * decompressing anything — the manifest that decides which members a
  * real extractor ever touches.
  *
  * Parse (the PKWARE appnote layout):
  *  1. find the End-Of-Central-Directory record (`PK\x05\x06`) by
  *     scanning BACKWARD from the tail (≤ 65 557 bytes — the max
  *     comment leaves the signature at least that close to the end);
  *  2. read entry count + central-directory offset from the EOCD;
  *  3. walk the central entries (`PK\x01\x02`): compressed and
  *     uncompressed sizes, name length, extra/comment lengths, local
  *     header offset, and the name bytes (decoded as UTF-8 — the
  *     modern convention; legacy CP437 names decode as garbage, not
  *     an error).
  *
  * Output: `array<struct<name, compressed, uncompressed,
  * local_offset>>` in central-directory order. Anything unreadable —
  * no EOCD, truncated entries, counts disagreeing with the walk,
  * ZIP64 markers (0xFFFFFFFF fields) — yields NULL: "not listable",
  * never a throw (every read bounds-checked, the walk monotone —
  * fuzz-pinned with the media kernels). NULL blob → NULL. */
case class ZipEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("compressed", LongType, nullable = false),
    StructField("uncompressed", LongType, nullable = false),
    StructField("local_offset", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_entries"

  import ZipEntries._

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    // EOCD is 22 bytes + comment; scan back at most 65557 bytes
    val lo = math.max(0, n - 22 - 65535)
    var e = n - 22
    var eocd = -1
    while (e >= lo && eocd < 0) {
      if (u32(bytes, e) == 0x06054b50L) eocd = e
      e -= 1
    }
    if (eocd < 0) return null
    val count = u16(bytes, eocd + 10)
    val cdOff = u32(bytes, eocd + 16)
    if (cdOff == 0xFFFFFFFFL || count == 0xFFFF) return null // ZIP64
    if (cdOff > Int.MaxValue || cdOff > n) return null
    val out = new Array[Any](count)
    var pos = cdOff.toInt
    var i = 0
    while (i < count) {
      if (pos + 46 > n || u32(bytes, pos) != 0x02014b50L) return null
      val comp = u32(bytes, pos + 20)
      val uncomp = u32(bytes, pos + 24)
      val nameLen = u16(bytes, pos + 28)
      val extraLen = u16(bytes, pos + 30)
      val commentLen = u16(bytes, pos + 32)
      val localOff = u32(bytes, pos + 42)
      if (comp == 0xFFFFFFFFL || uncomp == 0xFFFFFFFFL ||
        localOff == 0xFFFFFFFFL) return null // ZIP64
      if (pos + 46 + nameLen > n) return null
      val name = UTF8String.fromBytes(bytes, pos + 46, nameLen)
      out(i) = InternalRow(name, Long.box(comp), Long.box(uncomp),
        Long.box(localOff))
      val step = 46L + nameLen + extraLen + commentLen
      if (pos + step > Int.MaxValue) return null
      pos += step.toInt
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("zipKernel", this,
      classOf[ZipEntries].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

object ZipEntries {
  private def u16(b: Array[Byte], o: Int): Int =
    if (o + 2 > b.length) -1
    else ((b(o + 1) & 0xFF) << 8) | (b(o) & 0xFF)
  private def u32(b: Array[Byte], o: Int): Long =
    if (o + 4 > b.length) -1L
    else ((b(o + 3) & 0xFFL) << 24) | ((b(o + 2) & 0xFFL) << 16) |
      ((b(o + 1) & 0xFFL) << 8) | (b(o) & 0xFFL)
}
