package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import java.text.Normalizer
import java.util.Locale
import com.ibm.icu.lang.UCharacter

/** Golden + parity-envelope guard for the NON-ASCII composed twin
  * (VERDICT r13 #2 option (a)): `pipeline_sanctions_unicode` runs the
  * full pipeline over the accented fixture pair and is hash-checked by a
  * Unicode-aware oracle re-derivation (Core.unicodeOracleCtes).
  *
  * Two legs:
  *  1. golden — pin the cells that prove each Unicode branch ran in
  *     composition (F2 accent-strip key matches in BOTH directions, F6
  *     accent-stripping final scrub, Unicode pyTitle on countries, the
  *     accented female-dictionary entry, accented place scrubs), plus
  *     the probe-candidate layer directly (the final frame alone cannot
  *     distinguish a missing Ingrid hit from a consensus overwrite);
  *  2. guard — pin every fixture char to the envelope on which the
  *     oracle's DuckDB spellings (strip_accents, per-char upper/lower
  *     pyTitle, \p{L} cased test) are exactly the engine's ICU/NFKD
  *     kernels: precomposed cased Latin letters with ASCII-base NFD
  *     decompositions and 1:1 case maps (bars ß, ligatures, uncased
  *     modifier letters, no-decomposition letters like Ł/ø, typographic
  *     chars and confusables).
  */
class PipelineUnicodeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val R1 = "Number: U-1; Programme: SYRIA"
  private val S = "Number: IM-7; Programme: LIBYA"
  private val R7 = "Number: CIV-001 / CIV-002; Programme: COTE"

  private lazy val rows: Map[Long, Row] = {
    val out = Pipeline.runFixtureUnicode(spark)
    out.collect().map(r => r.getAs[Long]("entity_seq") -> r).toMap
  }

  private def s(seq: Long, colName: String): String =
    rows(seq).getAs[String](colName)
  private def b(seq: Long, colName: String): Boolean =
    rows(seq).getAs[Boolean](colName)

  private def resource(path: String): String = {
    val in = getClass.getResourceAsStream(path)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
  }

  test("all 9 entities come out with the 28-column schema") {
    assert(rows.size == 9)
    val cols = rows(0L).schema.fieldNames.toSeq
    for (c <- Pipeline.CsvColumns) assert(cols.contains(c), s"missing column $c")
  }

  test("catalog entry is row-for-row the composed run (memoized local " +
    "relation is faithful)") {
    val viaCatalog = SparkEntry.queries("pipeline_sanctions_unicode")(spark, "")
      .collect().map(_.toSeq).toSeq
    val direct = Pipeline.runFixtureUnicode(spark).collect().map(_.toSeq).toSeq
    assert(viaCatalog == direct)
    GraftCaches.releasePrior()
  }

  test("probe candidates: the accent-strip key matches in BOTH " +
    "directions, including the Ingrid hit the final frame hides") {
    import spark.implicits._
    val entities = ingest.XmlEntities.fromXmlStrings(
      Seq(resource("/graft/fixtures/feed_u.xml")).toDF("value"))
    val enriched = enrich.Fields.enrich(entities)
    val index = matching.PdfIndex.build(ingest.PdfChunks.chunks(
      Seq(resource("/graft/fixtures/pdf_u.txt")).toDF("value")))
    val cand = matching.Rem2Join
      .probe(enriched.select("entity_seq", "candidates"), index)
      .collect().map(r => r.getAs[Long]("entity_seq") ->
        r.getAs[String]("rem2_candidate")).toMap
    // 0: accented XML "José García" → plain PDF "Jose Garcia": only the
    //    k3 accent-strip PROBE variant can match
    // 6: plain XML "Francois Dubois" → accented PDF "François Dubois":
    //    only the k3 accent-strip INDEX variant can match
    // 3/4: "Ingrid Müller" → "Ingrid Muller" via k3 — the consensus
    //    fill overwrites S with R1 downstream, so assert it here
    // 7: accent-to-accent k1 direct match
    assert(cand == Map(0L -> R1, 1L -> "", 2L -> "", 3L -> S, 4L -> S,
      5L -> "", 6L -> R1, 7L -> R7, 8L -> ""))
  }

  test("F6 final scrub strips accents from FULL_NAME; ALIAS keeps them") {
    assert(s(0, "FULL_NAME") == "Jose Garcia")
    assert(s(6, "FULL_NAME") == "Francois Dubois")
    assert(s(7, "FULL_NAME") == "Andres Nanez O'Brien")
    assert(s(8, "FULL_NAME") == "Otzberg Handel Gmbh")
    assert(s(2, "FULL_NAME") == "Aniko Szabo" && s(5, "FULL_NAME") == "Aniko Szabo")
    // ALIAS goes through cleanName only — accents survive
    assert(s(5, "ALIAS") == "Anikó Szabó")
    assert(s(2, "ALIAS") == "")
    assert(s(7, "ALIAS") == "Andrés Ñáñez O'Brien; Andrés Ñáñez")
  }

  test("gender: accented dictionary entry, accent-sensitive lookup, " +
    "no-name default") {
    assert(s(2, "GENDER") == "Female" && s(5, "GENDER") == "Female") // anikó
    assert(s(3, "GENDER") == "Female" && s(4, "GENDER") == "Female") // ingrid
    assert(s(0, "GENDER") == "Male") // 'josé' ∉ dict ('jose' is — exact match)
    assert(s(7, "GENDER") == "Male") // XML @gender=M on the skipped alias
    assert(s(1, "FULL_NAME") == "UNKNOWN" && s(1, "GENDER") == "Male")
    assert(b(1, "flag_name_missing"))
  }

  test("Unicode pyTitle on countries; accented place scrubs") {
    assert(s(7, "ADD_COUNTRY") == "Côte D'Ivoire")
    assert(s(7, "NATIONALITIES") == "") // first citizenship UNKNOWN
    assert(s(7, "ADD_CITY") == "São Paulo") // 'City' dropped + ci dedup
    assert(s(7, "STATE") == "São")          // 'Province' eats 'Paulo'
    assert(s(7, "ADDRESS") ==
      "Côte D'Ivoire São Paulo City São Paulo Rúa 5 São Paulo Province 1001")
    assert(s(7, "DOB") == "21-04-1963")
    assert(s(7, "REM1") == "Designation: Ministre Adjoint; Chef; Commandant")
    assert(s(7, "DETAILS") ==
      "Title: (UE) 2023/456 / Señor / Conde; " +
      "Birth date: 02-01-1965 / 1964 / 1962 to 1966; " +
      "Birth place: Provincia de Córdoba; Remark: Membre sénior.")
  }

  test("REM2: direct accented hits + chain fill over the accented rows") {
    assert(s(0, "REM2") == R1 && s(6, "REM2") == R1)
    assert(s(7, "REM2") == R7) // truncated label + Number continuation
    for (seq <- Seq(2L, 3L, 4L, 5L)) {
      assert(s(seq, "REM2") == R1, s"row $seq")
      assert(!b(seq, "flag_rem2_missing") && !b(seq, "flag_rem2_conflict"),
        s"row $seq")
    }
    assert(s(1, "REM2") == "" && b(1, "flag_rem2_missing"))
    assert(s(8, "REM2") == "" && b(8, "flag_rem2_missing"))
  }

  // ---- parity-envelope guard ------------------------------------------

  /** The non-ASCII chars on which the oracle's DuckDB spellings provably
    * equal the engine's kernels: cased Latin letters whose NFD (= NFKD)
    * decomposition is an ASCII letter followed by combining marks only,
    * with 1:1 upper/lower maps and titlecase == uppercase. */
  private def envelopeLatin(c: Char): Boolean = {
    val str = c.toString
    val nfd = Normalizer.normalize(str, Normalizer.Form.NFD)
    val nfkd = Normalizer.normalize(str, Normalizer.Form.NFKD)
    val cased = Character.isUpperCase(c) || Character.isLowerCase(c) ||
      Character.getType(c) == Character.TITLECASE_LETTER
    val baseAsciiMarks = nfd.length >= 2 && nfd(0) < 128.toChar &&
      Character.isLetter(nfd(0)) &&
      nfd.drop(1).forall(m => UCharacter.getCombiningClass(m.toInt) != 0)
    val up = str.toUpperCase(Locale.ROOT)
    val lo = str.toLowerCase(Locale.ROOT)
    val oneToOne = up.length == 1 && lo.length == 1 &&
      UCharacter.toTitleCase(Locale.ROOT, str, null) == up
    Character.isLetter(c) &&
      Character.UnicodeScript.of(c.toInt) == Character.UnicodeScript.LATIN &&
      cased && nfd == nfkd && baseAsciiMarks && oneToOne
  }

  private def charAllowed(c: Char): Boolean = {
    val printableAscii = c >= 0x20.toChar && c <= 0x7E.toChar
    val cyrillic = c >= 0x0400.toChar && c <= 0x04FF.toChar &&
      !"ІіЁё".contains(c) // confusables barred
    printableAscii || c == '\n' || cyrillic || envelopeLatin(c)
  }

  test("fixture guard: every feed_u.xml / pdf_u.txt char is inside the " +
    "oracle parity envelope") {
    val xml = resource("/graft/fixtures/feed_u.xml")
    val pdf = resource("/graft/fixtures/pdf_u.txt")
    for (c <- (xml + pdf).distinct)
      assert(charAllowed(c),
        f"char U+${c.toInt}%04X is outside the Unicode-twin parity " +
          "envelope (precomposed cased Latin with ASCII-base NFD, " +
          "printable ASCII, plain Cyrillic, newline) — extend " +
          "Core.unicodeOracleCtes' spellings before shipping it")
    // engine Latin-gate normalization must be a no-op on every name the
    // oracle gates with its bare regex
    val names = """wholeName="([^"]*)"""".r
      .findAllMatchIn(xml).map(_.group(1)).toSeq
    assert(names.nonEmpty)
    for (v <- names)
      assert(graft.norm.PyText.latinGateIsIdentity(v),
        s"wholeName '$v' altered by the engine's Latin-gate normalization")
    // XML entities unescape in the engine's parser, not the oracle
    assert(!xml.contains("&"))
    // whitespace besides plain ' '/newline diverges trim vs pyStrip
    for (c <- (xml + pdf).distinct)
      assert(c == '\n' || c == ' ' || !c.isWhitespace,
        f"whitespace char U+${c.toInt}%04X breaks the plain-space rule")
  }

  test("oracle pyTitle spelling == engine pyTitle on every string the " +
    "oracle title-cases") {
    // the oracle's per-char state machine: upper after a non-\p{L},
    // lower after a \p{L}, with DuckDB's 1:1 case maps (≈ Character.to*)
    def oracleTitleSim(str: String): String = {
      val sb = new StringBuilder
      var prevLetter = false
      for (ch <- str) {
        val isL = Character.isLetter(ch)
        sb.append(if (!isL) ch else if (prevLetter) ch.toLower else ch.toUpper)
        prevLetter = isL
      }
      sb.toString
    }
    val xml = resource("/graft/fixtures/feed_u.xml")
    val pdf = resource("/graft/fixtures/pdf_u.txt")
    val names = """wholeName="([^"]*)"""".r.findAllMatchIn(xml).map(_.group(1))
      .filter(graft.norm.PyText.isLatinName).toSeq
    val countries = """countryDescription="([^"]*)"""".r
      .findAllMatchIn(xml).map(_.group(1)).toSeq
    val chunks = pdf.split("(?U)(?=Entity\\s+\\d+\\b)").map(_.strip())
      .filter(c => c.nonEmpty && c.toLowerCase.startsWith("entity"))
    val pdfNames = chunks.map(graft.matching.PdfParse.parseChunk(_).name)
      .filter(n => n != null && graft.norm.PyText.isLatinName(n))
    val inputs = (names ++ countries ++ pdfNames)
      .map(v => graft.norm.PyText.collapseWs(v).strip())
    assert(inputs.nonEmpty)
    for (v <- inputs) {
      assert(graft.norm.PyText.pyTitle(v) == oracleTitleSim(v),
        s"pyTitle('$v') diverges from the oracle's per-char spelling")
      // and on the accent-stripped form F6 feeds to pyTitle
      val stripped = graft.norm.PyText.nfkdStripCombining(v)
      assert(graft.norm.PyText.pyTitle(stripped) == oracleTitleSim(stripped),
        s"pyTitle('$stripped') diverges post accent-strip")
    }
  }
}
