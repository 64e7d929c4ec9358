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
        s"""<c r="${cellRef(i, 1)}" s="1" t="inlineStr"><is><t>${esc(f.name)}</t></is></c>"""
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
          cell(row, i, schema.fields(i).dataType, cellRef(i, rowIdx)).foreach(sb ++= _)
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
    nRows
  }

  /** One cell, or None for null/NaN (blank cell, like the reference's
    * magic-number skip). */
  private def cell(row: Row, i: Int, dt: DataType, ref: String): Option[String] = {
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
        Some(s"""<c r="$ref" t="inlineStr"><is><t>${esc(String.valueOf(row.get(i)))}</t></is></c>""")
    }
  }

  /** 0-based column + 1-based row → A1 reference. */
  private[graft] def cellRef(colIdx: Int, rowIdx: Long): String = {
    var c = colIdx
    val sb = new StringBuilder
    while (c >= 0) { sb.insert(0, ('A' + c % 26).toChar); c = c / 26 - 1 }
    sb.append(rowIdx).toString
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")
}
