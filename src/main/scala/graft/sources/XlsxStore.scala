package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.parsers.DocumentBuilderFactory
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Directory of `.xlsx` workbooks, one object per file — the reference's
  * Excel backend (`bubbles/backends/xls/objects.py`, an xlrd sheet read)
  * re-expressed for the modern format. Implemented JDK-only: an xlsx file
  * is a zip of XML parts, so `java.util.zip` + `javax.xml.parsers` cover
  * both directions without a spreadsheet dependency.
  *
  * Scope mirrors the reference: first worksheet, first row = header,
  * shared and inline strings, numeric/boolean cells. Parsing is
  * driver-side by design — a spreadsheet is a small-data interchange
  * format (the zip central directory AND the row XML must be read
  * sequentially; there is no record-level split point), so the honest
  * scale story is "parse on the driver, parallelize the rows", exactly
  * like the reference's single-process read. Anything large arrives as
  * parquet/CSV/JDBC instead.
  *
  * Column types: each column becomes `long` if every non-empty cell is an
  * integral number, `double` if every non-empty cell is numeric, else
  * `string` — deterministic two-pass inference like the CSV store's
  * `infer_fields`, with blanks as nulls. */
final case class XlsxStore(spark: SparkSession, dir: String) extends DataStore {
  private def path(name: String) = s"$dir/$name.xlsx"

  def objectNames: Seq[String] = {
    val d = new File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".xlsx")).map(_.stripSuffix(".xlsx")).sorted
  }
  override def exists(name: String): Boolean = new File(path(name)).exists()

  def getObject(name: String): DataFrame = {
    val cells = XlsxStore.readSheet(path(name))
    if (cells.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), StructType(Nil))
    // sanitize header names: blanks get positional names (the CSV `_cN`
    // convention) and duplicates a numeric suffix — either would
    // otherwise make every by-name reference on the frame ambiguous
    val raw = cells.head.map(_.getOrElse(""))
    val seen = mutable.Set.empty[String]
    val header = raw.zipWithIndex.map { case (h0, i) =>
      val base = if (h0.trim.isEmpty) s"_c$i" else h0
      // probe suffixes until unique: a plain occurrence counter could
      // still collide with a LITERAL later header (["a","a","a_1"])
      var candidate = base
      var n = 1
      while (seen(candidate)) { candidate = s"${base}_$n"; n += 1 }
      seen += candidate
      candidate
    }
    val width = header.length
    val body = cells.tail.map(r => r.padTo(width, None).take(width))
    val fields = (0 until width).map { c =>
      val vals = body.flatMap(_(c))
      val dt =
        if (vals.nonEmpty && vals.forall(v => XlsxStore.asLong(v).isDefined))
          LongType
        else if (vals.nonEmpty && vals.forall(v => XlsxStore.asDouble(v).isDefined))
          DoubleType
        else StringType
      StructField(header(c), dt, nullable = true)
    }
    val rows = body.map { r =>
      Row.fromSeq((0 until width).map { c =>
        r(c) match {
          case None => null
          case Some(v) => fields(c).dataType match {
            case LongType => XlsxStore.asLong(v).get
            case DoubleType => XlsxStore.asDouble(v).get
            case _ => v
          }
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), StructType(fields))
  }

  /** Writes header + rows as one worksheet with inline strings — a
    * driver-side collect, appropriate for what a spreadsheet is: a
    * small-report interchange target, not a data lake format. */
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit = {
    val f = new File(path(name))
    if (f.exists() && !replace)
      throw new IllegalStateException(s"xlsx object $name already exists")
    new File(dir).mkdirs()
    XlsxStore.writeSheet(f, from.columns.toSeq,
      from.collect().toSeq.map(_.toSeq))
  }

  def appendInto(name: String, rows: DataFrame): Unit = {
    val merged =
      if (exists(name)) getObject(name).unionByName(rows, allowMissingColumns = false)
      else rows
    // snapshot before overwriting the file the plan reads from
    val materialized = merged.collect().toSeq
    XlsxStore.writeSheet(new File(path(name)), merged.columns.toSeq,
      materialized.map(_.toSeq))
  }
}

object XlsxStore {
  private[sources] def asLong(s: String): Option[Long] =
    // integral-valued numerics only (excel stores 3 as "3")
    try { Some(java.lang.Long.parseLong(s)) } catch { case _: Exception => None }
  private[sources] def asDouble(s: String): Option[Double] =
    try { Some(java.lang.Double.parseDouble(s)) } catch { case _: Exception => None }

  /** Cell grid of the first worksheet: per row, per column position,
    * Some(text) or None for blanks (absent `<c>` entries included). */
  private[sources] def readSheet(file: String): Vector[Vector[Option[String]]] = {
    val zip = new ZipFile(file)
    try {
      def parse(entryName: String): Option[org.w3c.dom.Document] =
        Option(zip.getEntry(entryName)).map { e =>
          val b = DocumentBuilderFactory.newInstance().newDocumentBuilder()
          val in = zip.getInputStream(e)
          try b.parse(in) finally in.close()
        }
      val shared: Vector[String] = parse("xl/sharedStrings.xml").map { doc =>
        val sis = doc.getElementsByTagName("si")
        (0 until sis.getLength).map { i =>
          // concatenate all <t> descendants (rich text splits runs)
          val ts = sis.item(i).asInstanceOf[org.w3c.dom.Element]
            .getElementsByTagName("t")
          (0 until ts.getLength).map(j => ts.item(j).getTextContent).mkString
        }.toVector
      }.getOrElse(Vector.empty)
      // resolve the FIRST sheet through the workbook relationships —
      // sheet deletion/reordering in Excel leaves the surviving first
      // sheet stored as sheetN.xml for arbitrary N, so a hardcoded
      // sheet1.xml would miss it or read the wrong part
      val firstSheetPart: String = (for {
        wb <- parse("xl/workbook.xml")
        sheets = wb.getElementsByTagName("sheet")
        if sheets.getLength > 0
        rid = sheets.item(0).asInstanceOf[org.w3c.dom.Element]
          .getAttribute("r:id")
        rels <- parse("xl/_rels/workbook.xml.rels")
        rs = rels.getElementsByTagName("Relationship")
        target <- (0 until rs.getLength)
          .map(i => rs.item(i).asInstanceOf[org.w3c.dom.Element])
          .find(_.getAttribute("Id") == rid).map(_.getAttribute("Target"))
      } yield if (target.startsWith("/")) target.stripPrefix("/")
        else s"xl/$target").getOrElse("xl/worksheets/sheet1.xml")
      val sheet = parse(firstSheetPart).getOrElse(
        throw new IllegalArgumentException(s"$file: no $firstSheetPart"))
      val rowNodes = sheet.getElementsByTagName("row")
      (0 until rowNodes.getLength).map { r =>
        val row = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
        val cellNodes = row.getElementsByTagName("c")
        val byCol = mutable.SortedMap.empty[Int, String]
        // cells without an r= reference (legal xlsx; several producers
        // omit it) occupy the next column after the previous cell
        var lastCol = -1
        (0 until cellNodes.getLength).foreach { ci =>
          val c = cellNodes.item(ci).asInstanceOf[org.w3c.dom.Element]
          val ref = c.getAttribute("r")
          val colIdx = if (ref.isEmpty || !ref.head.isLetter) lastCol + 1
            else colIndex(ref)
          lastCol = colIdx
          val t = c.getAttribute("t")
          val text: Option[String] = t match {
            case "inlineStr" =>
              val ts = c.getElementsByTagName("t")
              Some((0 until ts.getLength)
                .map(j => ts.item(j).getTextContent).mkString)
            case "s" =>
              firstTag(c, "v").map(v => shared(v.trim.toInt))
            case "b" =>
              firstTag(c, "v").map(v => if (v.trim == "1") "true" else "false")
            case _ => firstTag(c, "v")
          }
          text.foreach(byCol(colIdx) = _)
        }
        val width = if (byCol.isEmpty) 0 else byCol.lastKey + 1
        Vector.tabulate(width)(i => byCol.get(i))
      }.toVector
    } finally zip.close()
  }

  private def firstTag(e: org.w3c.dom.Element, tag: String): Option[String] = {
    val ns = e.getElementsByTagName(tag)
    if (ns.getLength == 0) None else Some(ns.item(0).getTextContent)
  }

  /** "BC7" -> 54: base-26 column letters of an A1 cell reference. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i) - 'A' + 1); i += 1
    }
    acc - 1
  }

  private[sources] def colRef(idx: Int): String = {
    var n = idx + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Minimal valid workbook: content types, relationships, one sheet.
    * Numbers (and booleans, as 0/1-free TRUE/FALSE strings) write as
    * typed cells; everything else as inline strings. */
  private[sources] def writeSheet(
      file: File, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    def cell(ref: String, v: Any): String = v match {
      case null => ""
      case n: Long => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Double => s"""<c r="$ref"><v>$n</v></c>"""
      case n: Float => s"""<c r="$ref"><v>$n</v></c>"""
      case n: java.math.BigDecimal => s"""<c r="$ref"><v>${n.toPlainString}</v></c>"""
      case b: Boolean => s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>"""
      // everything else (dates, timestamps, ...) writes its canonical
      // string form — xlsx cells have no richer type system than
      // number/bool/string without a style table, so a round-trip
      // re-infers long/double/string; this store is a small-report
      // interchange sink, not a schema-preserving format
      case other =>
        s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${xmlEscape(other.toString)}</t></is></c>"""
    }
    val allRows = header +: rows
    val rowXml = allRows.zipWithIndex.map { case (r, i) =>
      val cells = r.zipWithIndex
        .map { case (v, c) => cell(s"${colRef(c)}${i + 1}", v) }.mkString
      s"""<row r="${i + 1}">$cells</row>"""
    }.mkString
    val sheet =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$rowXml</sheetData></worksheet>"""
    val workbook =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>"""
    val workbookRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>"""
    val out = new ZipOutputStream(new FileOutputStream(file))
    try {
      for ((name, content) <- Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> workbookRels,
        "xl/worksheets/sheet1.xml" -> sheet)) {
        out.putNextEntry(new ZipEntry(name))
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.closeEntry()
      }
    } finally out.close()
  }
}
