package graft.matching

import java.util.regex.Pattern
import graft.norm.PyText

/** J1's per-chunk line scanner (SURVEY §2.4-J1, main.py:421–522) as a pure
  * function: extract the first Latin Name/Alias (with continuation-line
  * lookahead and field-label truncation), every `Number:` value, the first
  * `Programme:` (last `|`-part), and assemble the REM2 string.
  *
  * Sequential cross-line state makes this a genuine UDF, not a column
  * expression (SURVEY §2.11).
  */
object PdfParse {

  /** name == null ⇔ no Latin name found (chunk contributes nothing to the index). */
  final case class PdfChunkInfo(name: String, rem2: String)

  private val nameRe = Pattern.compile("(?i)Name/Alias\\s*:\\s*(.*)")
  private val labelSplit = Pattern.compile(
    "(?i)\\b(title|function|birth information|birth date|citizenship information|" +
      "contact information|identity information|address|remark|url|programme)\\b\\s*[:]")
  private val numberRe = Pattern.compile("(?i)^Number\\s*:")
  private val numberStrip = Pattern.compile("(?i)^Number\\s*:\\s*")
  private val progRe = Pattern.compile("(?i)^Programme\\s*:")
  private val progStrip = Pattern.compile("(?i)^Programme\\s*:\\s*")

  def parseChunk(txt0: String): PdfChunkInfo = {
    if (txt0 == null) return PdfChunkInfo(null, "")
    val txt = txt0.replace('\u00A0', ' ').replace('\r', '\n')
    val lines: Array[String] = txt.split("\n", -1).map(_.strip())

    // --- Name/Alias: first line whose candidate survives the Latin gate ---
    var name: String = null
    var idx = 0
    while (name == null && idx < lines.length) {
      val m = nameRe.matcher(lines(idx))
      if (m.lookingAt()) {
        var candidate = m.group(1).strip()
        if (candidate.isEmpty) {
          var j = idx + 1
          while (j < lines.length && lines(j).isEmpty) j += 1
          if (j < lines.length) candidate = lines(j)
        }
        if (candidate.nonEmpty)
          candidate = labelSplit.split(candidate, 2)(0).strip()
        if (candidate.nonEmpty && PyText.isLatinName(candidate))
          name = PyText.cleanName(candidate)
      }
      idx += 1
    }

    // --- Number: / Programme: scans with blank-line continuation lookahead ---
    val numbers = scala.collection.mutable.ArrayBuffer.empty[String]
    var programme: String = null
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      if (numberRe.matcher(line).find()) {
        val rest = numberStrip.matcher(line).replaceFirst("").strip()
        if (rest.nonEmpty) numbers += rest
        else {
          var j = i + 1
          while (j < lines.length && lines(j).isEmpty) j += 1
          if (j < lines.length) numbers += lines(j)
          i = j // continuation line consumed (reference skips past it)
        }
      }
      if (programme == null && progRe.matcher(line).find()) {
        val rest = progStrip.matcher(line).replaceFirst("").strip()
        if (rest.nonEmpty) programme = rest
        else {
          var j = i + 1
          while (j < lines.length && lines(j).isEmpty) j += 1
          if (j < lines.length) programme = lines(j)
          i = j
        }
      }
      i += 1
    }

    val numbersClean =
      numbers.filter(n => n != null && n.strip().nonEmpty)
        .map(n => PyText.collapseWs(n).strip())

    val progClean: String =
      if (programme != null && programme.strip().nonEmpty) {
        val parts = programme.split("\\|").map(_.strip()).filter(_.nonEmpty)
        if (parts.nonEmpty) parts.last else programme.strip()
      } else null

    val parts = scala.collection.mutable.ArrayBuffer.empty[String]
    if (numbersClean.nonEmpty) parts += ("Number: " + numbersClean.mkString(" / "))
    if (progClean != null) parts += ("Programme: " + progClean)

    PdfChunkInfo(name, parts.mkString("; "))
  }
}
