package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.PdfText

/** Property: for ANY drawn text (printable ASCII with PDF-special chars,
  * plus non-ASCII routed through UTF-16BE hex strings), MiniPdf → PdfText
  * round-trips modulo the decoder's documented layout normalization
  * (trailing spaces per line stripped, blank page edges trimmed). Both
  * stream codings (raw, FlateDecode) and 1–3 page splits are exercised. */
class PdfPropertySpec extends AnyFunSuite {

  private def forAll[A](g: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    var seed = org.scalacheck.rng.Seed(20260812L)
    for (_ <- 1 to n) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  private val charPool: Gen[Char] = Gen.frequency(
    8 -> Gen.alphaNumChar,
    2 -> Gen.oneOf(' ', '(', ')', '\\', '/', '-', ':', '.', ',', '\'', '"',
      '[', ']', '<', '>', '%', '#', '&'),
    1 -> Gen.oneOf('é', 'ü', 'ß', 'Ж', 'я', '中', 'م'))

  private val lineGen: Gen[String] =
    Gen.chooseNum(0, 40).flatMap(n => Gen.stringOfN(n, charPool))

  private val pageGen: Gen[String] =
    Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, lineGen)).map(_.mkString("\n"))

  private val docGen: Gen[(List[String], Boolean)] = for {
    nPages <- Gen.chooseNum(1, 3)
    pages <- Gen.listOfN(nPages, pageGen)
    compress <- Gen.oneOf(true, false)
  } yield (pages, compress)

  /** The decoder's documented normalization of one drawn page. */
  private def normalize(page: String): String =
    page.linesIterator.map(_.replaceAll("\\s+$", "")).mkString("\n")
      .replaceAll("\\n+$", "").replaceAll("^\\n+", "")

  test("random documents round-trip through a real PDF byte stream") {
    forAll(docGen) { case (pages, compress) =>
      val expected = pages.map(normalize).filter(_.nonEmpty).map(_ + "\n").mkString
      val got = PdfText.extract(MiniPdf.write(pages, compress))
      assert(got == expected,
        s"pages=${pages.map(p => s"<$p>")} compress=$compress")
    }
  }

  test("random documents round-trip through the ObjStm variant") {
    forAll(docGen, n = 80) { case (pages, _) =>
      val expected = pages.map(normalize).filter(_.nonEmpty).map(_ + "\n").mkString
      assert(PdfText.extract(MiniPdf.writeObjStm(pages)) == expected)
    }
  }
}
