package graft.io

import java.io.{BufferedOutputStream, FileOutputStream, OutputStreamWriter}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Styled-xlsx report sink — the engine-side form of the reference's
  * `DefaultExcel` generator (`/root/reference/src/pyveb/excel_client.py:42-69`):
  *   - header row with the reference's `#BFD2E2` fill, frozen panes
  *     below it (`freeze_panes(1, 0)`);
  *   - null / NaN cells are SKIPPED (left blank) — the reference writes
  *     a magic number into pandas and then skips those cells so Excel
  *     doesn't render `#NUM!` errors;
  *   - column widths sized from the header with a floor of 20 chars,
  *     scaled 1.25× (`excel_client.py:59-62`);
  *   - optional "read-only recommended" flag
  *     (`workbook.read_only_recommended()`).
  *
  * An xlsx file is a zip of OOXML parts, so this writer needs only
  * `java.util.zip` — no external dependency. Strings are written as
  * inline strings (no shared-string table): report sheets are small and
  * write-once, so the dedup table would cost a driver-side hash map for
  * nothing.
  *
  * This is a DRIVER-SIDE sink by design, like the reference (xlsx is a
  * single sequential zip stream — there is nothing to distribute). Rows
  * stream through `toLocalIterator`, so driver memory stays O(1 row),
  * but the sheet format itself caps at 1,048,575 data rows — this is a
  * report sink, not a data sink; bulk data belongs in parquet.
  */
object Excel {

  private val MaxDataRows = 1048575 // xlsx hard sheet limit minus header

  /** Write `df` to `path` as a styled xlsx workbook. Returns the row
    * count written. */
  def write(df: DataFrame, path: String, saveAsReadOnly: Boolean = false): Long = {
    val schema = df.schema
    // per-call tally of XML-illegal chars dropped by esc(): a drop
    // alters the written data, so it must be surfaced, not silent
    val droppedChars = new java.util.concurrent.atomic.LongAdder()
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    val w = new OutputStreamWriter(zos, "UTF-8")
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      w.write(body); w.flush()
      zos.closeEntry()
    }
    var nRows = 0L
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin)
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin)
      val fileSharing = if (saveAsReadOnly) "<fileSharing readOnlyRecommended=\"1\"/>" else ""
      part("xl/workbook.xml",
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
           |$fileSharing<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
           |</workbook>""".stripMargin)
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin)
      // style 1 = the reference's BFD2E2 header fill; fills 0/1 are the
      // OOXML-mandated none/gray125 slots
      part("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
          |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
          |<fills count="3"><fill><patternFill patternType="none"/></fill><fill><patternFill patternType="gray125"/></fill><fill><patternFill patternType="solid"><fgColor rgb="FFBFD2E2"/><bgColor indexed="64"/></patternFill></fill></fills>
          |<borders count="1"><border/></borders>
          |<cellStyleXfs count="1"><xf/></cellStyleXfs>
          |<cellXfs count="2"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/><xf numFmtId="0" fontId="0" fillId="2" borderId="0" applyFill="1"/></cellXfs>
          |</styleSheet>""".stripMargin)

      // sheet part is streamed: header, then rows from toLocalIterator
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""")
      w.write("""<sheetViews><sheetView workbookViewId="0"><pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/></sheetView></sheetViews>""")
      val widths = schema.fields.zipWithIndex.map { case (f, i) =>
        val cw = math.max(f.name.length, 20) * 1.25
        s"""<col min="${i + 1}" max="${i + 1}" width="$cw" customWidth="1"/>"""
      }
      w.write(widths.mkString("<cols>", "", "</cols>"))
      w.write("<sheetData>")
      w.write(schema.fields.zipWithIndex.map { case (f, i) =>
        s"""<c r="${cellRef(i, 1)}" s="1" t="inlineStr"><is>${tElem(f.name, droppedChars)}</is></c>"""
      }.mkString("""<row r="1">""", "", "</row>"))
      val it = df.toLocalIterator()
      while (it.hasNext) {
        if (nRows >= MaxDataRows)
          throw new IllegalStateException(
            s"Excel sink: more than $MaxDataRows rows — xlsx is a report format; write parquet instead")
        val row = it.next()
        val rowIdx = nRows + 2 // 1-based, after header
        val sb = new StringBuilder(s"""<row r="$rowIdx">""")
        var i = 0
        while (i < schema.fields.length) {
          cell(row, i, schema.fields(i).dataType, cellRef(i, rowIdx), droppedChars)
            .foreach(sb ++= _)
          i += 1
        }
        sb ++= "</row>"
        w.write(sb.toString)
        nRows += 1
      }
      w.write("</sheetData></worksheet>")
      w.flush()
      zos.closeEntry()
    } finally { w.flush(); zos.close() }
    if (droppedChars.sum() > 0)
      System.err.println(s"[excel] $path: dropped ${droppedChars.sum()} " +
        s"XML-illegal char(s) across $nRows data rows — written cells " +
        "differ from the frame at those positions")
    nRows
  }

  /** One cell, or None for null/NaN (blank cell, like the reference's
    * magic-number skip). */
  private def cell(row: Row, i: Int, dt: DataType, ref: String,
                   dropped: java.util.concurrent.atomic.LongAdder): Option[String] = {
    if (row.isNullAt(i)) return None
    dt match {
      case DoubleType if !java.lang.Double.isFinite(row.getDouble(i)) => None
      case FloatType if !java.lang.Float.isFinite(row.getFloat(i)) => None
      case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType |
           _: DecimalType =>
        Some(s"""<c r="$ref"><v>${row.get(i)}</v></c>""")
      case BooleanType =>
        Some(s"""<c r="$ref" t="b"><v>${if (row.getBoolean(i)) 1 else 0}</v></c>""")
      case _ => // strings, dates, timestamps, arrays… render as text
        Some(s"""<c r="$ref" t="inlineStr"><is>${tElem(String.valueOf(row.get(i)), dropped)}</is></c>""")
    }
  }

  // ---------------------------------------------------------------- reader

  /** Read the FIRST worksheet of an xlsx workbook into a DataFrame —
    * the offline half of the reference's Excel-over-HTTP source
    * (`/root/reference/src/pyveb/request_client.py:33-58`, which
    * downloads and reads the first sheet; the download leg stays an
    * egress shim, the FORMAT leg lives here). Row 1 is the header;
    * every column comes back as a nullable STRING (like a CSV read
    * without schema inference — pair with
    * [[graft.schema.SchemaOps]] casts for typed columns); blank/missing
    * cells are null. Handles inline strings (this sink's own output),
    * shared strings, and boolean/numeric `<v>` cells. Driver-side like
    * the writer: xlsx is a report format, bounded by the sheet cap.
    *
    * Dtype inference is DELIBERATELY not done (the reference's pandas
    * `read_excel` infers): xlsx cell types are whatever the producing
    * tool felt like (a "number" column may hold numeric cells, string
    * cells, and dates styled three ways), so silent inference turns
    * workbook quirks into schema drift. The engine stance is explicit
    * typing at the boundary — compose with
    * [[graft.schema.SchemaOps.applySchema]], which is exactly how
    * `q_excel_roundtrip` recovers typed parity with the reference.
    */
  def read(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val (header, rows) = readSheet(path)
    require(header.nonEmpty, s"Excel.read: $path has an empty first sheet")
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val data = rows.map { r =>
      Row.fromSeq(header.indices.map(i => r.getOrElse(i, null)))
    }
    spark.createDataFrame(new java.util.ArrayList[Row](
      scala.jdk.CollectionConverters.SeqHasAsJava(data).asJava), schema)
  }

  /** The reference's Excel-over-HTTP source, whole
    * (`basicClient.download_xls_to_df`,
    * `/root/reference/src/pyveb/request_client.py:33-58`): GET the
    * workbook, land it under a timestamped temp path, read the first
    * sheet — the download retried with the reference's quadratic
    * backoff (`retry(retries=3)`, `:12-25`). Returns
    * (localPath, firstSheetDF), like the reference's tuple. Points at
    * any HTTP endpoint; offline tests serve the bytes from a loopback
    * server. */
  def downloadToDf(spark: org.apache.spark.sql.SparkSession, url: String,
                   fileName: String, retries: Int = 3,
                   sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong))
  : (String, DataFrame) =
    graft.util.Retry.retryV2(retries, sleep = sleep) { _ =>
      val conn = new java.net.URI(url).toURL.openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      // without these a stalled endpoint hangs forever and the retry
      // wrapper never gets a chance to fire
      conn.setConnectTimeout(15000)
      conn.setReadTimeout(120000)
      val bytes =
        try {
          if (conn.getResponseCode != 200)
            throw new java.io.IOException(s"GET $url returned ${conn.getResponseCode}")
          conn.getInputStream.readAllBytes()
        } finally conn.disconnect()
      val dir = java.nio.file.Files.createTempDirectory("graft_http_xlsx")
      val path = dir.resolve(s"${System.currentTimeMillis()}_$fileName.xlsx")
      java.nio.file.Files.write(path, bytes)
      (path.toString, read(spark, path.toString))
    }

  /** First sheet as (header, data rows), each row a sparse col→value map. */
  private def readSheet(path: String): (Seq[String], Seq[Map[Int, String]]) = {
    val zf = new java.util.zip.ZipFile(path)
    try {
      val shared = Option(zf.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zf.getInputStream(e))).getOrElse(Vector.empty)
      val sheet = firstSheetEntry(zf)
      val all = parseSheet(zf.getInputStream(sheet), shared)
      if (all.isEmpty) (Nil, Nil)
      else {
        val head = all.head
        val width = if (head.isEmpty) 0 else head.keys.max + 1
        ((0 until width).map(i => head.getOrElse(i, s"_c$i")), all.tail)
      }
    } finally zf.close()
  }

  /** Resolve the workbook's first sheet via its relationship id, falling
    * back to the conventional part name. */
  private def firstSheetEntry(zf: java.util.zip.ZipFile): java.util.zip.ZipEntry = {
    val resolved = for {
      wb <- Option(zf.getEntry("xl/workbook.xml"))
      rels <- Option(zf.getEntry("xl/_rels/workbook.xml.rels"))
      rid <- firstAttr(zf.getInputStream(wb), "sheet", "id")
      target <- relTarget(zf.getInputStream(rels), rid)
      e <- Option(zf.getEntry(
        if (target.startsWith("/")) target.drop(1) else "xl/" + target.stripPrefix("./")))
    } yield e
    resolved.orElse(Option(zf.getEntry("xl/worksheets/sheet1.xml")))
      .getOrElse(throw new IllegalArgumentException("xlsx has no first worksheet part"))
  }

  private def stax(in: java.io.InputStream): javax.xml.stream.XMLStreamReader = {
    val f = javax.xml.stream.XMLInputFactory.newInstance()
    f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(javax.xml.stream.XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(in)
  }

  /** First `attrLocal` attribute (any namespace) of the first `elem`. */
  private def firstAttr(in: java.io.InputStream, elem: String, attrLocal: String): Option[String] = {
    val r = stax(in)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT
            && r.getLocalName == elem) {
          for (i <- 0 until r.getAttributeCount)
            if (r.getAttributeLocalName(i) == attrLocal)
              return Some(r.getAttributeValue(i))
        }
      }
      None
    } finally r.close()
  }

  private def relTarget(in: java.io.InputStream, rid: String): Option[String] = {
    val r = stax(in)
    try {
      while (r.hasNext) {
        if (r.next() == javax.xml.stream.XMLStreamConstants.START_ELEMENT
            && r.getLocalName == "Relationship"
            && Option(r.getAttributeValue(null, "Id")).contains(rid))
          return Option(r.getAttributeValue(null, "Target"))
      }
      None
    } finally r.close()
  }

  /** Shared-string table: each `<si>` is the concatenation of its `<t>`
    * runs (rich-text cells have several). */
  private def parseSharedStrings(in: java.io.InputStream): Vector[String] = {
    val r = stax(in)
    val out = Vector.newBuilder[String]
    var sb: StringBuilder = null
    try {
      while (r.hasNext) r.next() match {
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          sb = new StringBuilder
        case javax.xml.stream.XMLStreamConstants.START_ELEMENT
          if r.getLocalName == "t" && sb != null => sb ++= r.getElementText
        case javax.xml.stream.XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += sb.toString; sb = null
        case _ =>
      }
      out.result()
    } finally r.close()
  }

  /** Stream one worksheet part into sparse rows. */
  private def parseSheet(in: java.io.InputStream,
                         shared: Vector[String]): Vector[Map[Int, String]] = {
    import javax.xml.stream.XMLStreamConstants._
    val r = stax(in)
    val rows = Vector.newBuilder[Map[Int, String]]
    var row: scala.collection.mutable.Map[Int, String] = null
    var colIdx = -1  // from the cell ref when present, else sequential
    var cellType = ""
    var cellText: StringBuilder = null
    try {
      while (r.hasNext) r.next() match {
        case START_ELEMENT => r.getLocalName match {
          case "row" =>
            row = scala.collection.mutable.Map.empty; colIdx = -1
          case "c" if row != null =>
            colIdx = Option(r.getAttributeValue(null, "r"))
              .map(refToCol).getOrElse(colIdx + 1)
            cellType = Option(r.getAttributeValue(null, "t")).getOrElse("")
            cellText = null
          case "v" | "t" if row != null && colIdx >= 0 =>
            if (cellText == null) cellText = new StringBuilder
            cellText ++= r.getElementText
          case _ =>
        }
        case END_ELEMENT => r.getLocalName match {
          case "c" if row != null && cellText != null =>
            val raw = cellText.toString
            val value = cellType match {
              case "s" => shared.lift(raw.trim.toInt).orNull
              case _ => raw
            }
            if (value != null) row(colIdx) = value
            cellText = null
          case "row" if row != null =>
            rows += row.toMap; row = null
          case _ =>
        }
        case _ =>
      }
      rows.result()
    } finally r.close()
  }

  /** "BC12" → 0-based column index 54. */
  private[graft] def refToCol(ref: String): Int = {
    var c = 0; var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** 0-based column + 1-based row → A1 reference. */
  private[graft] def cellRef(colIdx: Int, rowIdx: Long): String = {
    var c = colIdx
    val sb = new StringBuilder
    while (c >= 0) { sb.insert(0, ('A' + c % 26).toChar); c = c / 26 - 1 }
    sb.append(rowIdx).toString
  }

  /** Drop every XML-1.0-ILLEGAL char from `s`, returning the cleaned
    * string and the number dropped. Illegal even as entities: C0
    * controls below 0x20 (except tab/LF/CR), UNPAIRED surrogates (a
    * high not followed by a low, a low not preceded by a high — a
    * malformed UTF-16 value would otherwise still render the whole
    * workbook unparseable, the exact failure the C0 filter targets;
    * r15 ADVICE #2), and the non-characters U+FFFE/U+FFFF. Properly
    * PAIRED surrogates (real astral-plane text) pass through. */
  private[graft] def dropIllegal(s: String): (String, Int) = {
    var i = 0
    var dropped = 0
    var sb: java.lang.StringBuilder = null // allocated only on first drop
    while (i < s.length) {
      val c = s.charAt(i)
      val ok =
        if (Character.isHighSurrogate(c))
          i + 1 < s.length && Character.isLowSurrogate(s.charAt(i + 1))
        else if (Character.isLowSurrogate(c))
          i > 0 && Character.isHighSurrogate(s.charAt(i - 1))
        else (c >= 0x20 || c == '\t' || c == '\n' || c == '\r') && c < 0xFFFE
      if (ok) { if (sb != null) sb.append(c) }
      else {
        if (sb == null) { sb = new java.lang.StringBuilder(s.length); sb.append(s, 0, i) }
        dropped += 1
      }
      i += 1
    }
    (if (sb == null) s else sb.toString, dropped)
  }

  /** XML-escape a cell/header value. Illegal code points are dropped
    * ([[dropIllegal]]) — the same stance as the NaN→blank cell skip —
    * but because a drop ALTERS data, every drop is counted into the
    * caller's tally and surfaced per sheet (r15 self-review: a silent
    * drop hides that the written report differs from the frame). */
  private def esc(s: String, dropped: java.util.concurrent.atomic.LongAdder): String = {
    val (legal, d) = dropIllegal(s)
    if (d > 0) dropped.add(d)
    legal.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
  }

  /** `<t>` element for an inline string: spreadsheet apps TRIM
    * leading/trailing whitespace in `<t>` unless the OOXML
    * `xml:space="preserve"` attribute is present (openpyxl emits it
    * the same way); whitespace-free values skip the attribute. */
  private def tElem(s: String, dropped: java.util.concurrent.atomic.LongAdder): String = {
    val pre = if (s.nonEmpty && (s.head.isWhitespace || s.last.isWhitespace))
      " xml:space=\"preserve\"" else ""
    s"<t$pre>${esc(s, dropped)}</t>"
  }
}
