package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.norm.PyText

/** Unit vectors for the normalization kernel — expected values were produced
  * by the reference implementation itself (SURVEY §5.2-1). */
class NormSpec extends AnyFunSuite {

  /** Minimal property runner (scalatestplus bridge is not on the offline
    * classpath; scalacheck Gen is). */
  private def forAll(g: Gen[String])(f: String => Unit): Unit = {
    val seed0 = org.scalacheck.rng.Seed(42L)
    var seed = seed0
    for (_ <- 1 to 300) {
      g.apply(Gen.Parameters.default, seed).foreach(f)
      seed = seed.next
    }
  }

  test("F6 clean_fullname_no_accents_final matches reference") {
    for ((in, want) <- NormVectors.cleanFullnameNoAccentsFinal)
      assert(PyText.cleanFullnameNoAccentsFinal(in) == want, s"input=<$in>")
  }

  test("F1 clean_name (Python str.title semantics) matches reference") {
    for ((in, want) <- NormVectors.cleanName)
      assert(PyText.cleanName(in) == want, s"input=<$in>")
  }

  test("F3 norm_keep_accents matches reference") {
    for ((in, want) <- NormVectors.normKeepAccents)
      assert(PyText.normKeepAccents(in) == want, s"input=<$in>")
  }

  test("F4 remove_punctuation matches reference") {
    for ((in, want) <- NormVectors.removePunctuation)
      assert(PyText.removePunctuationKey(in) == want, s"input=<$in>")
  }

  test("F2 strip_accents matches reference") {
    for ((in, want) <- NormVectors.stripAccents)
      assert(PyText.stripAccentsKey(in) == want, s"input=<$in>")
  }

  test("F8 scrub_place_tokens matches reference") {
    for ((in, want) <- NormVectors.scrubPlaceTokens)
      assert(PyText.scrubPlaceTokens(in) == want, s"input=<$in>")
  }

  test("P2 is_latin_name matches reference") {
    for ((in, want) <- NormVectors.isLatinName)
      assert(PyText.isLatinName(in) == want, s"input=<$in>")
  }

  test("latinGateIsIdentity validates the RAW string (round-10 fix): " +
    "whitespace the engine strips/collapses but SQL trim + a bare " +
    "regex do not — U+0085 NEL, \\x1c-\\x1f, NBSP — voids parity " +
    "wherever it sits, while plain-space fixed points still pass") {
    import PyText.latinGateIsIdentity
    assert(latinGateIsIdentity(null))
    assert(latinGateIsIdentity("Abd Al-Rahman"))
    assert(latinGateIsIdentity("  padded name  ")) // plain ' ' = SQL trim
    // the exact escapes the round-9 ADVICE named: Python-isspace chars
    // Java's isWhitespace misses (U+0085) or SQL trim keeps (\x1c-\x1f)
    assert(!latinGateIsIdentity("a\u0085b"))       // interior NEL
    assert(!latinGateIsIdentity("\u0085name"))     // leading NEL
    assert(!latinGateIsIdentity("name\u001C"))     // trailing FS
    assert(!latinGateIsIdentity("a\u00A0b"))       // NBSP (mapped char)
    assert(!latinGateIsIdentity("a\tb"))           // tab: collapsed, not trimmed
    assert(!latinGateIsIdentity("\u2019name"))     // typo-mapped char
  }

  test("D1 is_forced_male matches reference") {
    for ((in, want) <- NormVectors.isForcedMale)
      assert(PyText.isForcedMale(in) == want, s"input=<$in>")
  }

  test("D2 dictionary covers female names beyond the round-1 core list") {
    import graft.norm.Normalize.femaleFirstNames
    // round-2 expansion: names absent from the original 428-entry list
    for (n <- Seq("zeynep", "svetlana", "guadalupe", "magdalena", "aisha",
        "ingrid", "valentina", "yvonne", "rosalind", "katarzyna",
        // round-3 expansion: international female names beyond round 2's list
        "anastasiya", "fatima", "gulnara", "ekaterina", "malgorzata",
        "nadezhda", "shirin", "tamara", "ximena", "zuzanna"))
      assert(femaleFirstNames.contains(n), s"missing female name: $n")
    // round-5 expansion: broad world coverage (Celtic, French, Slavic,
    // Arabic/Persian/Turkish, Indic, East/Southeast Asian, African,
    // Caucasus, Baltic) — 6,800+ female entries. The floor pins the
    // dictionary against silent shrinkage.
    for (n <- Seq("niamh", "myfanwy", "amandine", "desislava", "kateryna",
        "benazir", "hodan", "tilelli", "kalliyan", "thandar",
        "aishwarya", "sayuri", "meiling", "thandiwe", "funmilayo",
        "tsiala", "hasmik", "boglarka", "dovile", "mihaela"))
      assert(femaleFirstNames.contains(n), s"missing female name: $n")
    assert(femaleFirstNames.size >= 6500,
      s"female dictionary shrank: ${femaleFirstNames.size}")
    // male / unknown names must NOT leak into the female class
    for (n <- Seq("john", "pablo", "sergio", "xx-not-a-name",
        // unisex / predominantly-male names the reference's detector would
        // NOT class as plain "female" — they must stay out so the cascade's
        // everything-else-is-Male branch matches (main.py:781–784)
        "alex", "jordan", "casey", "taylor", "morgan", "deniz", "kiran"))
      assert(!femaleFirstNames.contains(n), s"wrongly female: $n")
  }

  test("D2 dictionary resource is well-formed (lowercase ascii, unique, two-class)") {
    val in = getClass.getResourceAsStream("/graft/gender_names.tsv")
    val lines = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSeq
    val rows = lines.map(_.split("\t"))
    assert(rows.forall(_.length == 2), "every row must be name<TAB>class")
    val names = rows.map(_(0))
    assert(names.distinct.size == names.size, "duplicate names in dictionary")
    assert(names.forall(_.matches("[\\p{Ll}]+")),
      "names must be lowercase letters (lookup lowercases the probe)")
    assert(rows.map(_(1)).toSet == Set("male", "female"))
    assert(names == names.sorted, "dictionary must stay sorted for diffable growth")
  }

  test("D2 cascade yields Female for an expansion name (no XML gender)") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = Seq(
        (null.asInstanceOf[String], "Zeynep Yilmaz"), // expansion dictionary hit
        (null.asInstanceOf[String], "John Smith"),    // not female
        ("F", "John Smith"))                          // XML gender beats dictionary
      .toDF("xml_gender", "name")
      .select(graft.norm.Normalize.genderCascade(col("xml_gender"), col("name")).as("g"))
      .collect().map(_.getString(0)).toSeq
    assert(out == Seq("Female", "Male", "Female"))
  }

  test("F5 all_variants matches reference") {
    for ((in, want) <- NormVectors.allVariants) {
      val (k1, k2, k3) = PyText.allVariants(in)
      assert(Seq(k1, k2, k3) == want, s"input=<$in>")
    }
  }

  test("F14 detail_birthdates matches reference") {
    for ((in, want) <- NormVectors.detailBirthdates)
      assert(PyText.detailBirthdates(in) == want, s"input=<$in>")
  }

  // -- property tests (SURVEY §5.2-2) ---------------------------------------

  private val weird = Gen.oneOf(' ', ' ', '’', '“', '—',
    'é', 'Ё', 'і', 'ß', 'A', 'z', '0', '.', ',', '\'', '-', '(', ')', '\t',
    'Ω', '中', 'م')
  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(5 -> Gen.alphaNumChar, 2 -> weird)).map(_.mkString)

  test("F1/F3/F6 are idempotent") {
    forAll(textGen) { s =>
      val c1 = PyText.cleanName(s)
      assert(PyText.cleanName(c1) == c1)
      val n1 = PyText.normKeepAccents(s)
      assert(PyText.normKeepAccents(n1) == n1)
      val f1 = PyText.cleanFullnameNoAccentsFinal(s)
      assert(PyText.cleanFullnameNoAccentsFinal(f1) == f1)
    }
  }

  test("F2 output is lowercase and accent-free") {
    forAll(textGen) { s =>
      val k = PyText.stripAccentsKey(s)
      assert(k == k.toLowerCase(java.util.Locale.ROOT))
      assert(PyText.stripAccentsKey(k) == k)
    }
  }

  test("F5 variants are probe/build symmetric (J3 self-consistency)") {
    forAll(textGen) { s =>
      val (k1, k2, k3) = PyText.allVariants(s)
      assert(PyText.allVariants(k1)._1 == k1)
      assert(PyText.allVariants(k2)._2 == k2)
      assert(PyText.allVariants(k3)._3 == k3)
    }
  }
}
