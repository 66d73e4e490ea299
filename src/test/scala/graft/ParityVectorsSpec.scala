package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.norm.PyText

/** Replays the fuzz corpus generated from the REFERENCE implementation
  * itself (tools/gen_parity_vectors.py executes the reference's helper
  * functions over ~600 random unicode strings + hand cases and stores the
  * expected outputs). Any divergence between PyText and the reference on
  * accents, confusables, titlecasing, ligatures, or script mixing fails
  * here with the exact input. */
class ParityVectorsSpec extends AnyFunSuite {

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'u' => sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case 'x' => sb.append(Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar); i += 4
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case c => sb.append(c); i += 2
        }
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  private lazy val vectors: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/graft/parity_vectors.tsv")
    require(in != null, "missing parity_vectors.tsv — run tools/gen_parity_vectors.py")
    val src = scala.io.Source.fromInputStream(in, "ASCII")
    try src.getLines().map { line =>
      val parts = line.split("\t", -1)
      (parts(0), unescape(parts(1)), if (parts(0).startsWith("is_")) parts(2) else unescape(parts(2)))
    }.toList
    finally src.close()
  }

  private val impls: Map[String, String => String] = Map(
    "clean_name" -> PyText.cleanName,
    "strip_accents" -> PyText.stripAccentsKey,
    "norm_keep_accents" -> PyText.normKeepAccents,
    "remove_punctuation" -> PyText.removePunctuationKey,
    "clean_fullname_no_accents_final" -> PyText.cleanFullnameNoAccentsFinal,
    "is_latin_name" -> (s => PyText.isLatinName(s).toString.capitalize),
    "is_forced_male" -> (s => PyText.isForcedMale(s).toString.capitalize))

  test("PyText matches the reference on the full fuzz corpus") {
    assert(vectors.size > 4000)
    var checked = 0
    for ((fn, input, want) <- vectors) {
      val got = impls(fn)(input)
      assert(got == want,
        s"$fn(<$input> codepoints=${input.map(_.toInt.toHexString).mkString(",")}) " +
          s"= <$got>, reference says <$want>")
      checked += 1
    }
    assert(checked == vectors.size)
  }
}
