package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** WARC record listing from UNCOMPRESSED archive bytes — the Common
  * Crawl container itself (ISO 28500): record types, target URIs,
  * payload lengths, and byte offsets, without touching a payload —
  * the shard manifest that routes records to extraction
  * ([[graft.ext.TextOps.htmlExtract]] is the next stage for
  * `response` payloads). Per-record-gzipped `.warc.gz` members need a
  * codec first (the documented environment seam, like the media
  * decode stub); THIS kernel is the plain `.warc` walk.
  *
  * Walk: each record is `WARC/…\r\n`, header lines to the first blank
  * `\r\n\r\n`, `Content-Length` bytes of payload, then the mandatory
  * `\r\n\r\n` separator. Parsed per record: `WARC-Type`,
  * `WARC-Target-URI` (absent on warcinfo records → NULL field, not an
  * error), `Content-Length` (required), and the record's byte offset.
  * Header names match ASCII case-insensitively (the canonical
  * spellings vary in the wild); values trim surrounding spaces/CR.
  *
  * Malformed input — no `WARC/` magic where a record must start, an
  * unterminated header block, a missing/negative Content-Length, a
  * payload running past the buffer, a missing separator — yields NULL
  * ("not listable"), never a throw: every read bounds-checked, the
  * walk monotone, headers capped at 64 KiB (fuzz-pinned with the
  * other binary kernels). NULL blob → NULL; empty blob → empty list. */
case class WarcRecords(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("rec_type", StringType, nullable = true),
    StructField("target_uri", StringType, nullable = true),
    StructField("content_length", LongType, nullable = false),
    StructField("offset", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_warc_records"

  import WarcRecords._

  def compute(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var pos = 0
    while (pos < n) {
      val offset = pos
      if (!startsWith(bytes, pos, Magic)) return null
      // header block: lines until the blank line, capped at 64 KiB
      val headerEnd = findBlank(bytes, pos, math.min(n, pos + 65536))
      if (headerEnd < 0) return null
      var recType: UTF8String = null
      var uri: UTF8String = null
      var contentLength = -1L
      var lineStart = pos
      while (lineStart < headerEnd) {
        var lineEnd = lineStart
        while (lineEnd + 1 < headerEnd + 2 &&
          !(bytes(lineEnd) == '\r' && bytes(lineEnd + 1) == '\n'))
          lineEnd += 1
        val colon = indexOf(bytes, lineStart, lineEnd, ':')
        if (colon > lineStart) {
          if (eqIgnoreCase(bytes, lineStart, colon, "warc-type"))
            recType = trimmed(bytes, colon + 1, lineEnd)
          else if (eqIgnoreCase(bytes, lineStart, colon, "warc-target-uri"))
            uri = trimmed(bytes, colon + 1, lineEnd)
          else if (eqIgnoreCase(bytes, lineStart, colon, "content-length")) {
            val s = trimmed(bytes, colon + 1, lineEnd).toString
            contentLength =
              try java.lang.Long.parseLong(s) catch { case _: Exception => -1L }
          }
        }
        lineStart = lineEnd + 2
      }
      if (contentLength < 0) return null
      val payloadEnd = headerEnd.toLong + 4L + contentLength
      // the record separator after the payload is mandatory
      if (payloadEnd + 4 > n) return null
      val sep = payloadEnd.toInt
      if (!(bytes(sep) == '\r' && bytes(sep + 1) == '\n' &&
        bytes(sep + 2) == '\r' && bytes(sep + 3) == '\n')) return null
      out += InternalRow(recType, uri, Long.box(contentLength),
        Long.box(offset.toLong))
      pos = sep + 4
    }
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("warcKernel", this,
      classOf[WarcRecords].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $self.compute($c);
      ${ev.isNull} = ${ev.value} == null;""")
  }

  override protected def withNewChildInternal(newChild: Expression): WarcRecords =
    copy(child = newChild)
}

object WarcRecords {
  private val Magic = "WARC/".getBytes("US-ASCII")

  private def startsWith(b: Array[Byte], off: Int, sig: Array[Byte]): Boolean = {
    if (b.length < off + sig.length) return false
    var i = 0
    while (i < sig.length) {
      if (b(off + i) != sig(i)) return false
      i += 1
    }
    true
  }

  /** Index just past the header block's final line, i.e. the position
    * of the `\r\n\r\n`'s first byte; -1 when absent before `limit`. */
  private def findBlank(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    while (i + 3 < limit) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' &&
        b(i + 3) == '\n') return i
      i += 1
    }
    -1
  }

  private def indexOf(b: Array[Byte], from: Int, to: Int, c: Char): Int = {
    var i = from
    while (i < to) {
      if (b(i) == c) return i
      i += 1
    }
    -1
  }

  private def eqIgnoreCase(
      b: Array[Byte], from: Int, to: Int, name: String): Boolean = {
    if (to - from != name.length) return false
    var i = 0
    while (i < name.length) {
      val c = b(from + i) & 0xFF
      val lower = if (c >= 'A' && c <= 'Z') c + 32 else c
      if (lower != name.charAt(i)) return false
      i += 1
    }
    true
  }

  private def trimmed(b: Array[Byte], from: Int, to: Int): UTF8String = {
    var s = from; var e = to
    while (s < e && (b(s) == ' ' || b(s) == '\t')) s += 1
    while (e > s && (b(e - 1) == ' ' || b(e - 1) == '\t' ||
      b(e - 1) == '\r')) e -= 1
    UTF8String.fromBytes(b, s, e - s)
  }
}
