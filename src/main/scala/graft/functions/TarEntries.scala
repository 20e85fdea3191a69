package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** USTAR (POSIX tar) member listing straight from archive bytes — the
  * third container-routing kernel next to [[ZipEntries]] and
  * [[WarcRecords]]: which members exist, how big they are, what kind
  * they are, and where their headers sit, WITHOUT extracting anything.
  * Research corpora ship as tarballs at least as often as zips (HF
  * dataset dumps, ImageNet shards, arXiv bulk data).
  *
  * Parse (the POSIX.1-1988 ustar layout, 512-byte blocks):
  *  1. each member is one header block: NUL-terminated `name` at 0
  *     (100 bytes), OCTAL-ASCII `size` at 124 (12 bytes, NUL/space
  *     terminated), `typeflag` at 156 (NUL normalizes to '0' — both
  *     mean regular file, the pre-POSIX convention), `magic` "ustar"
  *     at 257 — the validity check this kernel pins on. The header
  *     CHECKSUM is deliberately NOT validated: the magic identifies a
  *     header as confidently for a LISTING, and skipping it keeps the
  *     synthetic builders pure column expressions (documented trade;
  *     an extractor should verify checksums, a router needn't);
  *  2. the member's data occupies ⌈size/512⌉ blocks; the walk steps
  *     header + data to the next header;
  *  3. an all-zero block ends the archive (the spec says two; one is
  *     accepted — truncated-terminator tars are everywhere). Running
  *     exactly off the end without a terminator is also accepted.
  *
  * Output: `array<struct<name, size, typeflag, offset>>` in archive
  * order, `offset` = the member's HEADER byte offset. Anything
  * unreadable — bad magic, non-octal size, a step past the end —
  * yields NULL: "not listable", never a throw (every read
  * bounds-checked, the walk monotone — the [[MediaHeaderMeta]]
  * discipline, fuzz-pinned). NULL blob → NULL.
  */
case class TarEntries(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("typeflag", StringType, nullable = false),
    StructField("offset", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_tar_entries"

  import TarEntries._

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos + 512 <= n) {
      if (allZero(bytes, pos)) return new GenericArrayData(buf.toArray)
      // magic "ustar" at 257 (ustar\0 POSIX or "ustar " GNU — first
      // five bytes agree)
      if (bytes(pos + 257) != 'u' || bytes(pos + 258) != 's' ||
        bytes(pos + 259) != 't' || bytes(pos + 260) != 'a' ||
        bytes(pos + 261) != 'r') return null
      var nameEnd = pos
      val nameMax = pos + 100
      while (nameEnd < nameMax && bytes(nameEnd) != 0) nameEnd += 1
      if (nameEnd == pos) return null // empty name on a non-zero block
      val size = parseOctal(bytes, pos + 124, 12)
      if (size < 0) return null
      val flagByte = bytes(pos + 156)
      val flag = if (flagByte == 0) "0" else String.valueOf(flagByte.toChar)
      buf += InternalRow(
        UTF8String.fromBytes(bytes, pos, nameEnd - pos),
        Long.box(size), UTF8String.fromString(flag), Long.box(pos.toLong))
      val dataBlocks = (size + 511L) / 512L
      val step = 512L + dataBlocks * 512L
      if (pos + step > n) return null // data runs past the archive
      pos = (pos + step).toInt
    }
    if (pos != n) return null // trailing partial block
    new GenericArrayData(buf.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("tarKernel", this,
      classOf[TarEntries].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): TarEntries =
    copy(child = newChild)
}

object TarEntries {
  private def allZero(b: Array[Byte], o: Int): Boolean = {
    var i = o
    val e = o + 512
    while (i < e) { if (b(i) != 0) return false; i += 1 }
    true
  }

  /** Octal field: optional leading spaces, digits 0-7, terminated by
    * NUL or space (or field end). Anything else → -1. */
  private def parseOctal(b: Array[Byte], o: Int, len: Int): Long = {
    var i = o
    val e = o + len
    while (i < e && b(i) == ' ') i += 1
    var v = 0L
    var digits = 0
    while (i < e && b(i) != 0 && b(i) != ' ') {
      val c = b(i)
      if (c < '0' || c > '7') return -1L
      v = v * 8 + (c - '0')
      digits += 1
      i += 1
    }
    if (digits == 0) -1L else v
  }
}
