package graft.enrich

import org.scalatest.funsuite.AnyFunSuite

/** Edge cases of the per-entity enrichment kernels (SURVEY P3/P6/J2, F9,
  * F16 — main.py:584–618, :726–771, :810–830, :892–905). */
class FieldsSpec extends AnyFunSuite {

  test("aliasInfo: gender capture stops at the selected alias (main.py:589–596)") {
    val info = Fields.aliasInfo(
      Seq("Иван", "John Doe", "Jane Roe"),
      Seq("M", null, "F"))
    assert(info.selected == "John Doe")
    // the F on the LATER alias is never read — loop breaks at selection
    assert(info.xmlGender == "M")
  }

  test("aliasInfo: no Latin alias at all") {
    val info = Fields.aliasInfo(Seq("Иван", "Πέτρος"), Seq(null, null))
    assert(info.selected == null)
    assert(info.aliases.isEmpty && info.candidates.isEmpty)
  }

  test("aliasInfo: candidate list keeps duplicates, selected not re-prepended") {
    val info = Fields.aliasInfo(
      Seq("john  smith", "John Smith", "John Smith"), Seq(null, null, null))
    assert(info.selected == "John Smith")
    // all three clean to the same candidate; selected already present
    assert(info.candidates == Seq("John Smith", "John Smith", "John Smith"))
  }

  test("aliasInfo: selected prepended when cleaning changed every raw form") {
    val info = Fields.aliasInfo(Seq("ab c"), Seq(null))
    assert(info.selected == "Ab C")
    assert(info.candidates == Seq("Ab C"))
  }

  test("formatAddresses: field order, comma scrub, UNKNOWN and blank skipping") {
    val out = Fields.formatAddresses(
      city = Seq("Kabul, City", null),
      cd = Seq("afghanistan", "UNKNOWN"),
      street = Seq("St 5", "Elm St"),
      region = Seq("", "R2"),
      place = Seq(null, "P2"),
      zip = Seq("1001", null))
    // addr1: country title-cased first, comma→space in city, blanks dropped
    // addr2: UNKNOWN country dropped entirely, remaining fields kept
    assert(out == "Afghanistan Kabul City St 5 1001; Elm St R2 P2")
  }

  test("citizenshipSecond: only a differing second citizenship is emitted") {
    assert(Fields.citizenshipSecond(Seq("france")) == Seq.empty)
    assert(Fields.citizenshipSecond(Seq("france", "FRANCE")) == Seq.empty)
    assert(Fields.citizenshipSecond(Seq("france", "spain")) == Seq("Spain"))
    assert(Fields.citizenshipSecond(Seq("UNKNOWN", "france", "spain")) == Seq("Spain"))
    assert(Fields.citizenshipSecond(null) == Seq.empty)
  }
}
