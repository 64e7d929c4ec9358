package graft

import java.nio.file.Files
import java.util.zip.ZipFile

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.io.Excel

/** Excel sink readback: the xlsx is unzipped and its OOXML parts
  * checked cell-by-cell (binary xlsx can't be DuckDB-oracled; this is
  * the golden check the round-1 verdict asked for). Semantics under
  * test mirror the reference `DefaultExcel`
  * (`excel_client.py:42-69`): header style/freeze, NaN/null skip,
  * width rule, read-only-recommended flag.
  */
class ExcelSpec extends SparkSpec {

  private def unzip(path: String, part: String): String = {
    val zf = new ZipFile(path)
    try {
      val e = zf.getEntry(part)
      assert(e != null, s"missing zip part $part")
      new String(zf.getInputStream(e).readAllBytes(), "UTF-8")
    } finally zf.close()
  }

  private def writeFixture(readOnly: Boolean = false): String = {
    val schema = StructType(Seq(
      StructField("name", StringType), StructField("qty", LongType),
      StructField("score", DoubleType), StructField("ok", BooleanType)))
    val rows = Seq(
      Row("a<&>\"b", 7L, 1.5, true),
      Row(null, null, Double.NaN, false),
      Row("plain", 0L, -2.25, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    val path = tempDir("graft_xlsx") + "/report.xlsx"
    val n = Excel.write(df, path, saveAsReadOnly = readOnly)
    assert(n == 3)
    path
  }

  test("xlsx strings: XML-illegal control chars dropped, padded whitespace preserved (r15 review)") {
    val schema = StructType(Seq(StructField("s", StringType)))
    val rows = Seq(
      Row("bad\u0000ctl\u0007byte"), // 0x00/0x07 are illegal in XML 1.0 even escaped
      Row("  padded  "),             // apps trim <t> without xml:space="preserve"
      Row("tab\tand\nnewline ok"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = tempDir("graft_xlsx_esc") + "/r.xlsx"
    Excel.write(df, path)
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    assert(!sheet.exists(c => c < 0x20 && c != '\t' && c != '\n' && c != '\r'),
      "no XML-illegal control characters in the emitted part")
    assert(sheet.contains("""<t xml:space="preserve">  padded  </t>"""),
      s"padded value carries xml:space: $sheet")
    // a standards XML parser accepts the whole part (it would throw on
    // a raw 0x00 — the pre-fix behavior)
    val xr = javax.xml.stream.XMLInputFactory.newInstance().createXMLStreamReader(
      new java.io.ByteArrayInputStream(sheet.getBytes("UTF-8")))
    while (xr.hasNext) xr.next()
    // and our own reader round-trips the cleaned values
    val back = Excel.read(spark, path).collect().map(_.getString(0)).toSeq
    assert(back == Seq("badctlbyte", "  padded  ", "tab\tand\nnewline ok"), back.toString)
  }

  test("dropIllegal: unpaired surrogates and U+FFFE/U+FFFF dropped, paired surrogates kept, drops counted (r15 advice)") {
    // unpaired high, unpaired low, non-characters — all illegal in XML 1.0
    assert(Excel.dropIllegal("a\uD800b") == ("ab", 1))
    assert(Excel.dropIllegal("a\uDC00b") == ("ab", 1))
    assert(Excel.dropIllegal("x￾y￿z") == ("xyz", 2))
    // a PROPER pair (U+1F600) is legal astral-plane text and survives
    assert(Excel.dropIllegal("ok😀!") == ("ok😀!", 0))
    // mixed: C0 control + unpaired low + a proper pair
    assert(Excel.dropIllegal("\u0001a\uDC00😀") == ("a😀", 2))
    // clean strings come back reference-identical (no copy)
    val clean = "plain \t text\n"
    assert(Excel.dropIllegal(clean)._1 eq clean)
    // end-to-end: ROW values pass through Spark's UTF8String, which
    // already replaces unpaired surrogates — but a COLUMN NAME is a
    // raw JVM string straight into the header writer, the real path a
    // malformed value reaches the sheet on. The workbook must still
    // parse, with the surrogate dropped from the header.
    val schema = StructType(Seq(StructField("lone\uD800col", StringType)))
    val rows = Seq(Row("fine"))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = tempDir("graft_xlsx_surr") + "/r.xlsx"
    Excel.write(df, path)
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    val xr = javax.xml.stream.XMLInputFactory.newInstance().createXMLStreamReader(
      new java.io.ByteArrayInputStream(sheet.getBytes("UTF-8")))
    while (xr.hasNext) xr.next()
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq == Seq("lonecol"), back.columns.mkString(","))
    assert(back.collect().map(_.getString(0)).toSeq == Seq("fine"))
  }

  test("xlsx has all mandatory OOXML parts and a valid zip structure") {
    val path = writeFixture()
    for (part <- Seq("[Content_Types].xml", "_rels/.rels", "xl/workbook.xml",
      "xl/_rels/workbook.xml.rels", "xl/styles.xml", "xl/worksheets/sheet1.xml"))
      assert(unzip(path, part).nonEmpty)
  }

  test("header row: styled with the BFD2E2 fill, frozen pane below it") {
    val path = writeFixture()
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    val styles = unzip(path, "xl/styles.xml")
    assert(styles.contains("FFBFD2E2"))
    // header cells reference style 1 (the fill-bearing xf)
    assert(sheet.contains("""<c r="A1" s="1" t="inlineStr"><is><t>name</t></is></c>"""))
    assert(sheet.contains("""<c r="D1" s="1" t="inlineStr"><is><t>ok</t></is></c>"""))
    assert(sheet.contains("""<pane ySplit="1" topLeftCell="A2" activePane="bottomLeft" state="frozen"/>"""))
  }

  test("null and NaN cells are skipped (blank), values typed correctly, XML escaped") {
    val path = writeFixture()
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    // row 2: escaped string, long, double, boolean
    assert(sheet.contains("""<c r="A2" t="inlineStr"><is><t>a&lt;&amp;&gt;&quot;b</t></is></c>"""))
    assert(sheet.contains("""<c r="B2"><v>7</v></c>"""))
    assert(sheet.contains("""<c r="C2"><v>1.5</v></c>"""))
    assert(sheet.contains("""<c r="D2" t="b"><v>1</v></c>"""))
    // row 3: null string, null long, NaN double → all skipped; false boolean kept
    assert(!sheet.contains("""r="A3""""))
    assert(!sheet.contains("""r="B3""""))
    assert(!sheet.contains("""r="C3""""))
    assert(sheet.contains("""<c r="D3" t="b"><v>0</v></c>"""))
    // row 4: null boolean skipped
    assert(!sheet.contains("""r="D4""""))
    assert(sheet.contains("""<c r="C4"><v>-2.25</v></c>"""))
  }

  test("infinite doubles/floats are skipped like NaN (Excel rejects <v>Infinity</v>)") {
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("f", FloatType)))
    val rows = Seq(
      Row(Double.PositiveInfinity, Float.NegativeInfinity),
      Row(1.0, 2.0f))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val path = tempDir("graft_xlsx_inf") + "/inf.xlsx"
    Excel.write(df, path)
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    assert(!sheet.contains("Infinity"))
    assert(!sheet.contains("""r="A2""""))
    assert(!sheet.contains("""r="B2""""))
    assert(sheet.contains("""<c r="A3"><v>1.0</v></c>"""))
  }

  test("column widths: max(header, 20) * 1.25 per the reference sizing rule") {
    val path = writeFixture()
    val sheet = unzip(path, "xl/worksheets/sheet1.xml")
    // all fixture headers are shorter than 20 → width 25.0
    assert(sheet.contains("""<col min="1" max="1" width="25.0" customWidth="1"/>"""))
    assert(sheet.contains("""<col min="4" max="4" width="25.0" customWidth="1"/>"""))
  }

  test("saveAsReadOnly plants fileSharing in workbook.xml; default does not") {
    val ro = unzip(writeFixture(readOnly = true), "xl/workbook.xml")
    assert(ro.contains("""<fileSharing readOnlyRecommended="1"/>"""))
    val rw = unzip(writeFixture(), "xl/workbook.xml")
    assert(!rw.contains("fileSharing"))
  }

  test("write -> read roundtrip: first sheet back as strings, blanks as nulls") {
    val path = writeFixture()
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq == Seq("name", "qty", "score", "ok"))
    val rows = back.collect().map(r => (0 until 4).map(i =>
      Option(r.getString(i)).orNull))
    assert(rows(0) == Seq("a<&>\"b", "7", "1.5", "1"))
    assert(rows(1) == Seq(null, null, null, "0")) // null/NaN skipped -> null
    assert(rows(2) == Seq("plain", "0", "-2.25", null))
    // typed recovery composes with a cast projection
    import org.apache.spark.sql.functions.col
    val typed = back.select(col("qty").cast("long"), col("score").cast("double"),
      col("ok").cast("boolean")).collect()
    assert(typed(0).getLong(0) == 7L && typed(0).getDouble(1) == 1.5 && typed(0).getBoolean(2))
  }

  test("read resolves shared strings and rich-text runs (foreign xlsx shape)") {
    // minimal workbook written the OTHER way xlsx encodes text: a
    // shared-string table with one rich-text (multi-run) entry
    val dir = java.nio.file.Paths.get(tempDir("graft_xlsx_shared"))
    val path = dir.resolve("shared.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(name))
      zos.write(body.getBytes("UTF-8")); zos.closeEntry()
    }
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="S" sheetId="1" r:id="rId9"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId9" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/data.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>h1</t></si><si><t>h2</t></si><si><r><t>rich </t></r><r><t>text</t></r></si></sst>""")
    part("xl/worksheets/data.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData><row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c></row><row r="2"><c r="A2" t="s"><v>2</v></c><c r="B2"><v>42</v></c></row></sheetData></worksheet>""")
    zos.close()
    val back = Excel.read(spark, path)
    assert(back.columns.toSeq == Seq("h1", "h2"))
    val r0 = back.collect()(0)
    assert(r0.getString(0) == "rich text" && r0.getString(1) == "42")
  }

  test("cellRef covers multi-letter columns") {
    assert(Excel.cellRef(0, 1) == "A1")
    assert(Excel.cellRef(25, 1) == "Z1")
    assert(Excel.cellRef(26, 2) == "AA2")
    assert(Excel.cellRef(27, 3) == "AB3")
    assert(Excel.cellRef(26 * 27, 9) == "AAA9")
  }
}
