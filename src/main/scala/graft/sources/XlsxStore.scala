package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.time.{Instant, LocalDate, LocalDateTime, ZoneOffset}
import java.util.zip.{ZipEntry, ZipFile, ZipOutputStream}
import javax.xml.XMLConstants
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
  * Scope mirrors the reference: any worksheet by name (first by
  * default — xlrd's `sheet_by_name`/`sheet_by_index`), first row =
  * header, shared and inline strings, numeric/boolean/date cells.
  * Parsing is driver-side by design — a spreadsheet is a small-data
  * interchange format (the zip central directory AND the row XML must be
  * read sequentially; there is no record-level split point), so the
  * honest scale story is "parse on the driver, parallelize the rows",
  * exactly like the reference's single-process read. Anything large
  * arrives as parquet/CSV/JDBC instead.
  *
  * Column types: a column whose every non-empty cell is a date-styled
  * numeric becomes `date` (all-integral serials) or `timestamp`;
  * otherwise `long` if every non-empty cell is an integral number,
  * `double` if every non-empty cell is numeric, else `string` —
  * deterministic two-pass inference like the CSV store's `infer_fields`,
  * with blanks as nulls. Date serials use the standard 1900 system
  * (epoch 1899-12-30) and timestamps are interpreted in UTC on both
  * read and write, so round-trips are timezone-independent. */
final case class XlsxStore(spark: SparkSession, dir: String) extends DataStore {
  private def path(name: String) = s"$dir/$name.xlsx"

  def objectNames: Seq[String] = {
    val d = new File(dir)
    Option(d.list()).map(_.toSeq).getOrElse(Nil)
      .filter(_.endsWith(".xlsx")).map(_.stripSuffix(".xlsx")).sorted
  }
  override def exists(name: String): Boolean = new File(path(name)).exists()

  /** Worksheet names of a workbook, in workbook order. */
  def sheetNames(name: String): Seq[String] = XlsxStore.sheetNames(path(name))

  def getObject(name: String): DataFrame = getObject(name, None)

  /** Read one worksheet by name (`None` = the workbook's first sheet). */
  def getObject(name: String, sheet: Option[String]): DataFrame = {
    val cells = XlsxStore.readSheet(path(name), sheet)
    if (cells.isEmpty)
      return spark.createDataFrame(
        new java.util.ArrayList[Row](), StructType(Nil))
    // sanitize header names: blanks get positional names (the CSV `_cN`
    // convention) and duplicates a numeric suffix — either would
    // otherwise make every by-name reference on the frame ambiguous
    val raw = cells.head.map(_.map(_.text).getOrElse(""))
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
        // date inference FIRST: a date serial is also a parseable number,
        // so the long/double branches would otherwise swallow it. Only an
        // all-date column maps to a temporal type — a column mixing date
        // and plain cells degrades to the raw serial text (documented).
        if (vals.nonEmpty && vals.forall(v =>
            v.date && XlsxStore.asDouble(v.text).isDefined)) {
          if (vals.forall { v =>
            val d = XlsxStore.asDouble(v.text).get; d == math.floor(d)
          }) DateType else TimestampType
        }
        else if (vals.nonEmpty && vals.forall(v => XlsxStore.asLong(v.text).isDefined))
          LongType
        else if (vals.nonEmpty && vals.forall(v => XlsxStore.asDouble(v.text).isDefined))
          DoubleType
        else StringType
      StructField(header(c), dt, nullable = true)
    }
    val rows = body.map { r =>
      Row.fromSeq((0 until width).map { c =>
        r(c) match {
          case None => null
          case Some(v) => fields(c).dataType match {
            case LongType => XlsxStore.asLong(v.text).get
            case DoubleType => XlsxStore.asDouble(v.text).get
            case DateType =>
              XlsxStore.SerialEpoch.plusDays(XlsxStore.asDouble(v.text).get.toLong)
            case TimestampType =>
              Instant.ofEpochMilli(XlsxStore.SerialEpochMillis +
                Math.round(XlsxStore.asDouble(v.text).get * 86400000.0))
            case _ => v.text
          }
        }
      })
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), StructType(fields))
  }

  /** Writes header + rows as one worksheet with inline strings — a
    * driver-side collect, appropriate for what a spreadsheet is: a
    * small-report interchange target, not a data lake format. Date and
    * timestamp columns write as date-styled serials, so a round-trip
    * re-infers them as date/timestamp rather than strings. */
  def create(name: String, from: DataFrame, replace: Boolean = false): Unit = {
    val f = new File(path(name))
    if (f.exists() && !replace)
      throw new IllegalStateException(s"xlsx object $name already exists")
    new File(dir).mkdirs()
    XlsxStore.writeSheet(f, from.columns.toSeq,
      from.collect().toSeq.map(_.toSeq))
  }

  /** Append rows into an existing workbook. The sheet's types are
    * RE-INFERRED on every read, so existing and incoming column types
    * can disagree (e.g. cells that re-infer `long` receiving `string`
    * rows); both sides are cast to the per-column join of the inference
    * lattice (`long < double < string`; `date < timestamp < string`) —
    * an EXPLICIT, deterministic coercion instead of whatever union type
    * promotion would silently pick, so repeated appends cannot drift a
    * column's type beyond the declared lattice. Disjoint column sets
    * still fail (by name, via unionByName). */
  def appendInto(name: String, rows: DataFrame): Unit = {
    val merged =
      if (exists(name)) {
        val existing = getObject(name)
        // both directions must fail loudly: a missing incoming column has
        // no values to append, and an EXTRA incoming column would
        // otherwise vanish silently when the lattice projects to the
        // sheet's columns
        val extra = rows.columns.filterNot(existing.columns.contains)
        if (extra.nonEmpty) throw new IllegalArgumentException(
          s"xlsx append into $name: incoming columns ${extra.mkString(", ")} " +
            s"do not exist in the sheet (${existing.columns.mkString(", ")})")
        val joined = existing.schema.fields.map { f =>
          rows.schema.fields.find(_.name == f.name) match {
            case Some(in) => f.name -> XlsxStore.lattice(f.dataType, in.dataType)
            case None => throw new IllegalArgumentException(
              s"xlsx append into $name: column '${f.name}' missing from " +
                s"incoming rows (${rows.columns.mkString(", ")})")
          }
        }
        def castTo(df: DataFrame) = df.select(joined.map { case (n, t) =>
          org.apache.spark.sql.functions.col(n).cast(t).as(n)
        }.toSeq: _*)
        castTo(existing).unionByName(castTo(rows), allowMissingColumns = false)
      } else rows
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

  /** 1900-system serial epoch: serial 0 = 1899-12-30 (the off-by-two that
    * absorbs Lotus 1-2-3's fictitious 1900-02-29). */
  private[sources] val SerialEpoch: LocalDate = LocalDate.of(1899, 12, 30)
  private[sources] val SerialEpochMillis: Long =
    SerialEpoch.atStartOfDay.toInstant(ZoneOffset.UTC).toEpochMilli

  /** Per-column type join for append coercion: equal types stay, the
    * numeric and temporal chains widen, anything else meets at string
    * (the top of the xlsx inference lattice — every cell HAS a string
    * form, so the cast is total and deterministic). */
  private[sources] def lattice(a: DataType, b: DataType): DataType = (a, b) match {
    case _ if a == b => a
    case (LongType, DoubleType) | (DoubleType, LongType) => DoubleType
    case (DateType, TimestampType) | (TimestampType, DateType) => TimestampType
    case _ => StringType
  }

  /** One parsed cell: raw text plus whether its style number-format is a
    * date/time format (drives date/timestamp inference). */
  private[sources] final case class RawCell(text: String, date: Boolean)

  /** Hardened XML parsing for an interchange format that routinely
    * arrives from outside: DTDs are refused outright (XXE file
    * disclosure / SSRF, billion-laughs expansion all ride on doctype
    * declarations), external entities disabled as defense in depth, and
    * secure processing caps any residual expansion. */
  private def secureBuilderFactory(): DocumentBuilderFactory = {
    val f = DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setFeature(XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }

  private def parseEntry(zip: ZipFile, entryName: String): Option[org.w3c.dom.Document] =
    Option(zip.getEntry(entryName)).map { e =>
      val b = secureBuilderFactory().newDocumentBuilder()
      val in = zip.getInputStream(e)
      try b.parse(in) finally in.close()
    }

  private def elements(doc: org.w3c.dom.Node, tag: String): Seq[org.w3c.dom.Element] = {
    val ns = doc match {
      case d: org.w3c.dom.Document => d.getElementsByTagName(tag)
      case e: org.w3c.dom.Element => e.getElementsByTagName(tag)
      case _ => return Nil
    }
    (0 until ns.getLength).map(ns.item(_).asInstanceOf[org.w3c.dom.Element])
  }

  /** Worksheet names in workbook order. */
  private[sources] def sheetNames(file: String): Seq[String] = {
    val zip = new ZipFile(file)
    try parseEntry(zip, "xl/workbook.xml").toSeq
      .flatMap(elements(_, "sheet").map(_.getAttribute("name")))
    finally zip.close()
  }

  /** Builtin date/time number formats (ECMA-376 §18.8.30): date, time,
    * datetime, elapsed, and the CJK-locale date blocks. */
  private val BuiltinDateFormats: Set[Int] =
    ((14 to 22) ++ (27 to 36) ++ (45 to 47) ++ (50 to 58)).toSet

  /** A custom format code is a date/time format if any y/m/d/h/s token
    * survives after stripping color/condition brackets, quoted literals,
    * and escaped characters ("General", numeric and text formats carry
    * none of those letters). */
  private[sources] def isDateFormatCode(code: String): Boolean = {
    val cleaned = code
      .replaceAll("\\[[^\\]]*\\]", "")
      .replaceAll("\"[^\"]*\"", "")
      .replaceAll("\\\\.", "")
    cleaned.exists(ch => "ymdhsYMDHS".indexOf(ch.toInt) >= 0)
  }

  /** Per-cellXf "is a date style" table from xl/styles.xml (index = the
    * cell's `s` attribute). Missing part → empty (no date styles). */
  private def dateStyleTable(zip: ZipFile): Vector[Boolean] =
    parseEntry(zip, "xl/styles.xml").map { doc =>
      val custom: Map[Int, String] = elements(doc, "numFmt").map { e =>
        e.getAttribute("numFmtId").toInt -> e.getAttribute("formatCode")
      }.toMap
      def isDate(numFmtId: Int): Boolean =
        BuiltinDateFormats(numFmtId) ||
          custom.get(numFmtId).exists(isDateFormatCode)
      // xf children of cellXfs ONLY (cellStyleXfs also holds xf nodes)
      elements(doc, "cellXfs").headOption.toVector
        .flatMap(elements(_, "xf"))
        .map { xf =>
          val id = xf.getAttribute("numFmtId")
          id.nonEmpty && isDate(id.toInt)
        }
    }.getOrElse(Vector.empty)

  /** Cell grid of one worksheet (`None` = first): per row, per column
    * position, Some(cell) or None for blanks (absent `<c>` entries
    * included). */
  private[sources] def readSheet(
      file: String, sheetName: Option[String] = None): Vector[Vector[Option[RawCell]]] = {
    val zip = new ZipFile(file)
    try {
      def parse(entryName: String) = parseEntry(zip, entryName)
      val shared: Vector[String] = parse("xl/sharedStrings.xml").map { doc =>
        elements(doc, "si").map { si =>
          // concatenate all <t> descendants (rich text splits runs)
          elements(si, "t").map(_.getTextContent).mkString
        }.toVector
      }.getOrElse(Vector.empty)
      val dateXfs = dateStyleTable(zip)
      // resolve the sheet through the workbook relationships — sheet
      // deletion/reordering in Excel leaves parts stored as sheetN.xml
      // for arbitrary N, so a hardcoded sheet1.xml would miss it or read
      // the wrong part
      val sheetPart: String = (for {
        wb <- parse("xl/workbook.xml")
        sheets = elements(wb, "sheet")
        chosen <- sheetName match {
          case None => sheets.headOption
          case Some(n) => Some(sheets.find(_.getAttribute("name") == n)
            .getOrElse(throw new IllegalArgumentException(
              s"$file: no worksheet named '$n' " +
                s"(has: ${sheets.map(_.getAttribute("name")).mkString(", ")})")))
        }
        rid = chosen.getAttribute("r:id")
        rels <- parse("xl/_rels/workbook.xml.rels")
        target <- elements(rels, "Relationship")
          .find(_.getAttribute("Id") == rid).map(_.getAttribute("Target"))
      } yield if (target.startsWith("/")) target.stripPrefix("/")
        else s"xl/$target").getOrElse("xl/worksheets/sheet1.xml")
      val sheet = parse(sheetPart).getOrElse(
        throw new IllegalArgumentException(s"$file: no $sheetPart"))
      val rowNodes = sheet.getElementsByTagName("row")
      (0 until rowNodes.getLength).map { r =>
        val row = rowNodes.item(r).asInstanceOf[org.w3c.dom.Element]
        val cellNodes = row.getElementsByTagName("c")
        val byCol = mutable.SortedMap.empty[Int, RawCell]
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
          val sAttr = c.getAttribute("s")
          val isDateStyled = (t.isEmpty || t == "n") && sAttr.nonEmpty &&
            dateXfs.lift(sAttr.toInt).getOrElse(false)
          val text: Option[RawCell] = t match {
            case "inlineStr" =>
              Some(RawCell(elements(c, "t").map(_.getTextContent).mkString,
                date = false))
            case "s" =>
              firstTag(c, "v").map(v => RawCell(shared(v.trim.toInt), date = false))
            case "b" =>
              firstTag(c, "v").map(v =>
                RawCell(if (v.trim == "1") "true" else "false", date = false))
            case _ => firstTag(c, "v").map(RawCell(_, isDateStyled))
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

  private def dateSerial(d: LocalDate): Long =
    java.time.temporal.ChronoUnit.DAYS.between(SerialEpoch, d)
  private def timestampSerial(i: Instant): Double =
    (i.toEpochMilli - SerialEpochMillis) / 86400000.0

  /** Minimal valid workbook: content types, relationships, styles, one
    * sheet. Numbers and booleans write as typed cells; dates and
    * timestamps as date-styled serials (styles s=1/s=2 → numFmt 14/22);
    * everything else as inline strings. */
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
      case d: java.sql.Date =>
        s"""<c r="$ref" s="1"><v>${dateSerial(d.toLocalDate)}</v></c>"""
      case d: LocalDate => s"""<c r="$ref" s="1"><v>${dateSerial(d)}</v></c>"""
      case t: java.sql.Timestamp =>
        s"""<c r="$ref" s="2"><v>${new java.math.BigDecimal(
          timestampSerial(t.toInstant)).toPlainString}</v></c>"""
      case t: Instant =>
        s"""<c r="$ref" s="2"><v>${new java.math.BigDecimal(
          timestampSerial(t)).toPlainString}</v></c>"""
      case t: LocalDateTime =>
        s"""<c r="$ref" s="2"><v>${new java.math.BigDecimal(
          timestampSerial(t.toInstant(ZoneOffset.UTC))).toPlainString}</v></c>"""
      // everything else writes its canonical string form — this store is
      // a small-report interchange sink, not a schema-preserving format
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
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/><Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/></Relationships>"""
    // cellXfs index 1 = builtin date format 14 (m/d/yy), index 2 =
    // builtin datetime format 22 (m/d/yy h:mm) — the two styles the cell
    // writer references; index 0 stays General
    val styles =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><fonts count="1"><font/></fonts><fills count="1"><fill/></fills><borders count="1"><border/></borders><cellStyleXfs count="1"><xf/></cellStyleXfs><cellXfs count="3"><xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/><xf numFmtId="22" applyNumberFormat="1"/></cellXfs></styleSheet>"""
    val rootRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>"""
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>"""
    val out = new ZipOutputStream(new FileOutputStream(file))
    try {
      for ((name, content) <- Seq(
        "[Content_Types].xml" -> contentTypes,
        "_rels/.rels" -> rootRels,
        "xl/workbook.xml" -> workbook,
        "xl/_rels/workbook.xml.rels" -> workbookRels,
        "xl/styles.xml" -> styles,
        "xl/worksheets/sheet1.xml" -> sheet)) {
        out.putNextEntry(new ZipEntry(name))
        out.write(content.getBytes(StandardCharsets.UTF_8))
        out.closeEntry()
      }
    } finally out.close()
  }
}
