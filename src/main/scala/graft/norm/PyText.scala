package graft.norm

import java.text.Normalizer
import java.util.Locale
import java.util.regex.Pattern
import com.ibm.icu.lang.UCharacter

/** Pure-Scala string kernel mirroring the reference's normalization helpers
  * (semantics from /root/reference/main.py — citations inline). These are the
  * "5 genuine UDFs" of SURVEY §2.11 plus their shared building blocks; they
  * are kept free of Spark imports so they unit-test without a session and can
  * be wrapped as UDFs or (later) codegen'd Catalyst expressions.
  *
  * Fidelity notes:
  *  - Python `str.title()` capitalizes after ANY non-cased char (SURVEY H3):
  *    replicated in [[pyTitle]] via the cased/uncased state machine.
  *  - Python `unicodedata.combining(c) != 0` is the accent-strip test
  *    (main.py:410): replicated via ICU's combining class (icu4j ships with
  *    Spark), NOT `\p{Mn}` (which includes class-0 marks Python keeps).
  *  - Python `re.\s` is Unicode-aware on str: all patterns here use `(?U)`.
  */
object PyText {

  // -- character maps ------------------------------------------------------

  /** Typographic replacements used by the Latin-script gate (main.py:339–347). */
  private val latinTypoMap: Map[Char, Char] = Map(
    '\u2018' -> '\'', '\u2019' -> '\'', '\u201B' -> '\'',
    '\u201C' -> '"', '\u201D' -> '"', '\u201F' -> '"',
    '\u00A0' -> ' ', '\u202F' -> ' ',
    '\u2013' -> '-', '\u2014' -> '-', '\u2010' -> '-',
    '\u2011' -> '-', '\u2012' -> '-')

  /** Cyrillic confusables mapped into Latin (main.py:349–354). */
  private val confusables: Map[Char, Char] =
    Map('\u0406' -> 'I', '\u0456' -> 'i', '\u0401' -> 'E', '\u0451' -> 'e')

  /** Smaller replacement map of the final display scrub (main.py:318–324). */
  private val finalTypoMap: Map[Char, Char] = Map(
    '\u2018' -> '\'', '\u2019' -> '\'', '\u201B' -> '\'',
    '\u201C' -> '"', '\u201D' -> '"',
    '\u2013' -> '-', '\u2014' -> '-',
    '\u00A0' -> ' ')

  private def mapChars(s: String, m: Map[Char, Char]): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) { sb.append(m.getOrElse(s.charAt(i), s.charAt(i))); i += 1 }
    sb.toString
  }

  /** Unicode-aware whitespace collapse (Python `re.sub(r"\s+", " ", s)`). */
  def collapseWs(s: String): String = s.replaceAll("(?U)\\s+", " ")

  /** Python `str.isspace()` set: Zs/Zl/Zp + the control whitespaces —
    * includes NBSP and \x1c–\x1f, which Java's `String.strip` leaves. */
  private def pyIsSpace(cp: Int): Boolean =
    Character.isSpaceChar(cp) || (cp >= 0x09 && cp <= 0x0D) ||
      (cp >= 0x1C && cp <= 0x1F) || cp == 0x85

  /** Python `str.strip()` (no-args form). */
  def pyStrip(s: String): String = {
    var a = 0
    var b = s.length
    while (a < b && pyIsSpace(s.charAt(a))) a += 1
    while (b > a && pyIsSpace(s.charAt(b - 1))) b -= 1
    s.substring(a, b)
  }

  private def lower(s: String): String = s.toLowerCase(Locale.ROOT)

  // -- NFKD accent stripping (main.py:406–411) ------------------------------

  /** Drop code points whose canonical combining class is non-zero after NFKD
    * — the exact test `unicodedata.combining(c) != 0` (main.py:310, :410). */
  def nfkdStripCombining(s: String): String = {
    val nfkd = Normalizer.normalize(s, Normalizer.Form.NFKD)
    val sb = new java.lang.StringBuilder(nfkd.length)
    var i = 0
    while (i < nfkd.length) {
      val cp = nfkd.codePointAt(i)
      if (UCharacter.getCombiningClass(cp) == 0) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  // -- Python str.title() (SURVEY H3) ---------------------------------------

  private def isCased(cp: Int): Boolean =
    Character.isUpperCase(cp) || Character.isLowerCase(cp) ||
      Character.getType(cp) == Character.TITLECASE_LETTER

  /** Python `str.title()`: first cased char of each cased run is titlecased,
    * the rest lowercased; word boundaries are ANY uncased char. Uses FULL
    * Unicode case mappings (ICU), matching CPython: ligatures expand
    * (`ﬁancé` → `Fiancé`), İ lowercases to `i̇` — a 1:1
    * `Character.toTitleCase` silently diverges on these (caught by the
    * reference-generated fuzz corpus, ParityVectorsSpec). */
  def pyTitle(s: String): String = {
    if (s == null) return null
    val sb = new java.lang.StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val cased = isCased(cp)
      if (!cased) sb.appendCodePoint(cp)
      else {
        val one = new String(Character.toChars(cp))
        if (!prevCased)
          sb.append(UCharacter.toTitleCase(java.util.Locale.ROOT, one, null))
        else
          sb.append(UCharacter.toLowerCase(java.util.Locale.ROOT, one))
      }
      prevCased = cased
      i += Character.charCount(cp)
    }
    sb.toString
  }

  // -- F1 clean_name (main.py:364–366) --------------------------------------

  def cleanName(name: String): String =
    if (name == null) null else pyTitle(pyStrip(collapseWs(name)))

  // -- F2/F3/F4/F5 key variants (main.py:393–418) ---------------------------

  /** k3: NFKD accent-strip → collapse → strip → lower (main.py:406–411). */
  def stripAccentsKey(s: String): String =
    if (s == null || s.isEmpty) "" else lower(pyStrip(collapseWs(nfkdStripCombining(s))))

  /** k1: collapse → strip → lower, accents kept (main.py:393–396). */
  def normKeepAccents(s: String): String =
    if (s == null || s.isEmpty) "" else lower(pyStrip(collapseWs(s)))

  private val punctPattern = Pattern.compile("(?U)[^\\p{L}\\p{N}\\s]")

  /** k2: non letter/digit/space → space, collapse, strip, lower (main.py:399–403). */
  def removePunctuationKey(s: String): String =
    if (s == null || s.isEmpty) ""
    else lower(pyStrip(collapseWs(punctPattern.matcher(s).replaceAll(" "))))

  /** F5: the (k1, k2, k3) probe/build key tuple (main.py:414–418). */
  def allVariants(s: String): (String, String, String) =
    (normKeepAccents(s), removePunctuationKey(s), stripAccentsKey(s))

  // -- P2 is_latin_name (main.py:333–361) ------------------------------------

  private val latinFull = Pattern.compile("[\\p{IsLatin}0-9 .,'\\-()]+")

  /** Latin-script gate: typographic normalize, confusable map, drop `"`,
    * collapse, then full-match over Latin script + name punctuation. */
  def isLatinName(text: String): Boolean = {
    if (text == null) return false
    var s = pyStrip(text)
    s = mapChars(s, latinTypoMap)
    s = mapChars(s, confusables)
    s = s.replace('"', ' ')
    s = collapseWs(s)
    latinFull.matcher(s).matches()
  }

  /** True when the Latin-gate pre-match normalization (typographic map,
    * confusable map, `"`-drop, whitespace collapse) is a NO-OP on `s`
    * modulo strip. This is the fixture-parity invariant the
    * `pipeline_sanctions_cols` oracle relies on: its bare regex
    * full-match agrees with [[isLatinName]] exactly when every fixture
    * name is such a fixed point (PipelineSpec enforces it). */
  def latinGateIsIdentity(s: String): Boolean = {
    if (s == null) return true
    // Whitespace is validated on the RAW string with the Python isspace
    // set, which is a superset of both Java's (?U)\s and
    // Character.isWhitespace (beyond Character.isWhitespace it adds
    // U+0085 NEL and the non-breaking Zs spaces U+00A0/U+2007/U+202F;
    // \x1c-\x1f are in BOTH sets): any whitespace besides plain ' '
    // voids parity — pyStrip/collapseWs remove or fold it while the
    // oracle's trim() + bare regex do not, whether it sits at the
    // edges (trim keeps it) or interior (collapseWs rewrites it).
    if (!s.forall(c => c == ' ' || !pyIsSpace(c))) return false
    val t = pyStrip(s) // now at most a plain-' ' trim, = SQL trim()
    var u = mapChars(t, latinTypoMap)
    u = mapChars(u, confusables)
    u = u.replace('"', ' ')
    // collapseWs deliberately excluded from the fixed-point check:
    // repetition of plain ' ' (already in the regex class) can never
    // change a full-match verdict.
    u == t
  }

  // -- F6 clean_fullname_no_accents_final (main.py:309–330) ------------------

  def cleanFullnameNoAccentsFinal(s: String): String = {
    if (s == null || s.isEmpty) return ""
    var t = nfkdStripCombining(s)
    t = mapChars(t, finalTypoMap)
    t = t.replaceAll("[^A-Za-z0-9 .,'\\-()]", "")
    t = pyStrip(collapseWs(t))
    pyTitle(t)
  }

  // -- D1 forced-male dictionaries (main.py:369–390) --------------------------

  val MaleTitles: Seq[String] = Seq(
    "mullah", "maulavi", "mawlavi", "moulavi", "molvi", "qari", "ustad",
    "imam", "amir", "haji", "hajji", "agha", "khan", "pir", "sardar",
    "sayed", "sayyid", "syed", "janan agha")

  val MaleNamePatterns: Seq[String] = Seq(
    "gul ahmad", "gul ahmed", "abdul", "mohammad", "mohammed", "rahman",
    "hakim", "hakimi", "ullah", "uddin", "ishakzai", "noorzai", "zai")

  def isForcedMale(name: String): Boolean = {
    if (name == null || name.isEmpty) return false
    val n = lower(name)
    MaleTitles.exists(n.contains) || MaleNamePatterns.exists(n.contains)
  }

  // -- F8 city/region token scrub + A2 dedup (main.py:651–680, :690–718) ------

  private val tokenPunct = Pattern.compile("[,.\\-;:]")

  /** Split on whitespace; token "province" removes itself AND the previous
    * kept token; token "city" removes itself; per-token strip of `,.-;:`;
    * then order-preserving case-insensitive dedup. */
  def scrubPlaceTokens(s: String): String = {
    if (s == null) return ""
    val words = s.split("(?U)\\s+").filter(_.nonEmpty)
    val filtered = scala.collection.mutable.ArrayBuffer.empty[String]
    for (w <- words) {
      val wClean = pyStrip(tokenPunct.matcher(w).replaceAll(""))
      val lw = lower(wClean)
      if (lw == "province") { if (filtered.nonEmpty) filtered.remove(filtered.length - 1) }
      else if (lw == "city") ()
      else if (wClean.nonEmpty) filtered += wClean
    }
    pyStrip(dedupCaseInsensitive(filtered.toSeq).mkString(" "))
  }

  /** A2: order-preserving case-insensitive dedup (main.py:672–678, :919–927). */
  def dedupCaseInsensitive(values: Seq[String]): Seq[String] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    values.filter(v => seen.add(lower(v)))
  }

  // -- F14 detail birthdate sub-rules (main.py:853–884) -----------------------

  /** Inputs are (birthdate, year, yearRangeFrom, yearRangeTo) per element.
    * Rule (a): the FIRST well-formed full date contributes only its year to a
    * suppression set; each SUBSEQUENT full date is emitted as dd-mm-yyyy and
    * its year suppressed. (b): standalone all-digit years not suppressed are
    * emitted. (c): complete ranges are emitted as "F to T". */
  def detailBirthdates(
      bds: Seq[(Option[String], Option[String], Option[String], Option[String])])
      : Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val years = scala.collection.mutable.HashSet.empty[String]
    var fullCount = 0
    for ((bd, _, _, _) <- bds; v <- bd if v.nonEmpty) {
      fullCount += 1
      val parts = v.split("-", -1)
      if (parts.length == 3) {
        if (fullCount > 1) { out += s"${parts(2)}-${parts(1)}-${parts(0)}" }
        years += parts(0)
      }
      // malformed dates: Python's tuple-unpack raises and is swallowed
    }
    for ((_, y, _, _) <- bds; v <- y if v.nonEmpty && v.forall(_.isDigit) && !years.contains(v))
      out += v
    for ((_, _, f, t) <- bds; fv <- f if fv.nonEmpty; tv <- t if tv.nonEmpty)
      out += s"$fv to $tv"
    out.toSeq
  }
}
