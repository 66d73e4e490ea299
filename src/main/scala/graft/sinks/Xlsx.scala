package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** S10 fidelity: the reference's final artifact is one xlsx workbook with
  * conditional fills (openpyxl, main.py:538–539, :564, :579–603, :962–993,
  * :1030–1040). The engine contract keeps flags as boolean columns (the
  * scalable representation); this sink renders that frame to a real .xlsx —
  * a ZIP of SpreadsheetML parts, written with the JDK's ZipOutputStream,
  * no external dependency.
  *
  * Fill semantics (exact reference mapping):
  *   - FULL_NAME cell yellow      ⇐ flag_name_missing   (main.py:564, :603)
  *   - CATEGORY cell yellow       ⇐ flag_category_missing (main.py:579–582)
  *   - REM2 cell yellow           ⇐ flag_rem2_missing   (main.py:962–970)
  *   - REM2 cell red              ⇐ flag_rem2_conflict  (main.py:993)
  *   - whole row red, columns B.. ⇐ flag_rem2_conflict — the final pass
  *     colors range(2, max_column+1), leaving column A untouched
  *     (main.py:1036–1040), so a yellow A survives on a red row.
  *
  * This is a driver-side FINAL-REPORT sink by design: the reference emits
  * one workbook (thousands of rows), not a data-scale artifact. Rows are
  * streamed via toLocalIterator — the frame is never fully collected.
  */
object Xlsx {

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach {
      case '&' => sb ++= "&amp;"
      case '<' => sb ++= "&lt;"
      case '>' => sb ++= "&gt;"
      case '"' => sb ++= "&quot;"
      case c if c < ' ' && c != '\t' && c != '\n' && c != '\r' => () // illegal in XML 1.0
      case c => sb += c
    }
    sb.toString
  }

  /** A1-style column name: 0 → A, 25 → Z, 26 → AA. */
  def colName(i: Int): String = {
    var n = i; val sb = new StringBuilder
    while (n >= 0) { sb.insert(0, ('A' + n % 26).toChar); n = n / 26 - 1 }
    sb.toString
  }

  private val ContentTypes =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
      |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
      |<Default Extension="xml" ContentType="application/xml"/>
      |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
      |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
      |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
      |</Types>
      |""".stripMargin

  private val RootRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>
      |""".stripMargin

  private val WorkbookXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
      |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
      |</workbook>
      |""".stripMargin

  private val WorkbookRels =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
      |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
      |</Relationships>
      |""".stripMargin

  /** Style indices: 0 none, 1 yellow solid FFFF00, 2 red solid FF0000 —
    * the two PatternFills of main.py:538–539. */
  private val StylesXml =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
      |<fills count="4">
      |<fill><patternFill patternType="none"/></fill>
      |<fill><patternFill patternType="gray125"/></fill>
      |<fill><patternFill patternType="solid"><fgColor rgb="FFFFFF00"/><bgColor rgb="FFFFFF00"/></patternFill></fill>
      |<fill><patternFill patternType="solid"><fgColor rgb="FFFF0000"/><bgColor rgb="FFFF0000"/></patternFill></fill>
      |</fills>
      |<borders count="1"><border/></borders>
      |<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
      |<cellXfs count="3">
      |<xf numFmtId="0" fontId="0" fillId="0" borderId="0" xfId="0"/>
      |<xf numFmtId="0" fontId="0" fillId="2" borderId="0" xfId="0" applyFill="1"/>
      |<xf numFmtId="0" fontId="0" fillId="3" borderId="0" xfId="0" applyFill="1"/>
      |</cellXfs>
      |</styleSheet>
      |""".stripMargin

  val StyleNone = 0
  val StyleYellow = 1
  val StyleRed = 2

  /** Generic sink: any DataFrame → one-sheet workbook, header row +
    * inline-string cells; `cellStyle(row, colIdx)` picks the fill. Only the
    * first `emitCols` columns become cells (trailing columns may carry
    * styling inputs, e.g. flag booleans); emitCols < 0 emits all. */
  def write(df: DataFrame, path: String,
      cellStyle: (Row, Int) => Int = (_, _) => StyleNone,
      emitCols: Int = -1): Unit = {
    val cols =
      if (emitCols < 0) df.columns else df.columns.take(emitCols)
    val zos = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    def part(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    }
    try {
      part("[Content_Types].xml", ContentTypes)
      part("_rels/.rels", RootRels)
      part("xl/workbook.xml", WorkbookXml)
      part("xl/_rels/workbook.xml.rels", WorkbookRels)
      part("xl/styles.xml", StylesXml)
      zos.putNextEntry(new ZipEntry("xl/worksheets/sheet1.xml"))
      def raw(s: String): Unit = zos.write(s.getBytes(StandardCharsets.UTF_8))
      raw("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" + "\n" +
        """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      raw("<row r=\"1\">")
      cols.zipWithIndex.foreach { case (c, i) =>
        raw(s"""<c r="${colName(i)}1" t="inlineStr"><is><t>${esc(c)}</t></is></c>""")
      }
      raw("</row>")
      var r = 2
      val it = df.toLocalIterator()
      while (it.hasNext) {
        val row = it.next()
        raw(s"""<row r="$r">""")
        var i = 0
        while (i < cols.length) {
          val v = row.get(i)
          val text = if (v == null) "" else v.toString
          val s = cellStyle(row, i)
          val sAttr = if (s == StyleNone) "" else s""" s="$s""""
          raw(s"""<c r="${colName(i)}$r"$sAttr t="inlineStr"><is><t>${esc(text)}</t></is></c>""")
          i += 1
        }
        raw("</row>")
        r += 1
      }
      raw("</sheetData></worksheet>")
      zos.closeEntry()
    } finally zos.close()
  }

  /** The reference's report: render Pipeline.run output (entity_seq order)
    * to xlsx with the exact conditional-fill mapping. Flag columns are
    * consumed for styling and not emitted as cells. */
  def writeReport(pipelineOut: DataFrame, path: String): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = graft.Pipeline.CsvColumns
    val visible = pipelineOut.orderBy(col("entity_seq"))
      .select((cols ++ Seq("flag_name_missing", "flag_category_missing",
        "flag_rem2_missing", "flag_rem2_conflict")).map(col): _*)
    val nCols = cols.length
    val iName = cols.indexOf("FULL_NAME")
    val iCat = cols.indexOf("CATEGORY")
    val iRem2 = cols.indexOf("REM2")
    def style(row: Row, i: Int): Int = {
      val nameMiss = row.getBoolean(nCols)
      val catMiss = row.getBoolean(nCols + 1)
      val rem2Miss = row.getBoolean(nCols + 2)
      val conflict = row.getBoolean(nCols + 3)
      if (conflict && i > 0) StyleRed // columns B.. (main.py:1036–1040)
      else if (i == iName && nameMiss) StyleYellow
      else if (i == iCat && catMiss) StyleYellow
      else if (i == iRem2 && rem2Miss) StyleYellow
      else StyleNone
    }
    write(visible, path, style, emitCols = nCols)
  }
}
