package graft.enrich

import java.util.Locale
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.norm.{Normalize, PyText}

/** P3–P6, F7–F17, D2: per-entity enrichment columns over the parsed entity
  * rows (SURVEY §2.2/§2.3). One narrow projection, no shuffle — everything
  * here is embarrassingly parallel.
  *
  * Built-in Catalyst expressions wherever the semantics are per-value;
  * Scala UDFs only for the sequential kernels (alias selection with its
  * stop-at-selected gender capture, address formatting with Python
  * `str.title()`, birthdate suppression rules, place-token scrub).
  */
object Fields {

  /** Unicode-aware trim (Python `str.strip()`). */
  private def uTrim(c: Column): Column = regexp_replace(c, "(?U)(^\\s+|\\s+$)", "")

  // -- P3 + P6 + J2: one pass over nameAlias (main.py:584–605, :757–771, :810–819)

  /** selected == null ⇔ no Latin alias (FULL_NAME becomes UNKNOWN + flag).
    * xmlGender is the LAST @gender attribute seen up to and including the
    * selected alias — the reference's scan breaks at the first Latin name,
    * so later aliases' genders are never read (main.py:589–596). */
  final case class AliasInfo(selected: String, xmlGender: String,
      aliases: Seq[String], candidates: Seq[String])

  private[enrich] def aliasInfo(wholeNames: Seq[String], genders: Seq[String]): AliasInfo = {
    val n = if (wholeNames == null) 0 else wholeNames.length
    var selected: String = null
    var gender: String = null
    var i = 0
    while (i < n && selected == null) {
      if (genders != null && genders(i) != null) gender = genders(i)
      val wn = wholeNames(i)
      if (wn != null && wn.nonEmpty && PyText.isLatinName(wn))
        selected = PyText.cleanName(wn)
      i += 1
    }
    val selectedLower =
      if (selected != null) selected.toLowerCase(Locale.ROOT) else null
    // ALIAS (T): Latin aliases cleaned, minus raw-lowercase == selected-lowercase
    val aliasesOut = (0 until n).flatMap { k =>
      val wn = wholeNames(k)
      if (wn == null || wn.isEmpty) None
      else if (selectedLower != null &&
        wn.strip().toLowerCase(Locale.ROOT) == selectedLower) None
      else if (PyText.isLatinName(wn)) Some(PyText.cleanName(wn))
      else None
    }
    // J2 probe candidates: every Latin alias cleaned (duplicates kept),
    // selected prepended iff not already present as an exact string
    val candBase = (0 until n).flatMap { k =>
      val wn = wholeNames(k)
      if (wn != null && wn.nonEmpty && PyText.isLatinName(wn))
        Some(PyText.cleanName(wn))
      else None
    }
    val candidates =
      if (selected != null && !candBase.contains(selected)) selected +: candBase
      else candBase
    AliasInfo(selected, gender, aliasesOut, candidates)
  }

  private val aliasInfoUdf =
    udf((wn: Seq[String], g: Seq[String]) => aliasInfo(wn, g))

  // -- F9 address formatter (main.py:726–755) — Python title() forces a UDF

  private[enrich] def formatAddresses(
      city: Seq[String], cd: Seq[String], street: Seq[String],
      region: Seq[String], place: Seq[String], zip: Seq[String]): String = {
    val n = if (cd == null) 0 else cd.length
    def valid(f: String): Boolean =
      f != null && f.strip().nonEmpty && f.strip().toUpperCase(Locale.ROOT) != "UNKNOWN"
    def clean(f: String): String = PyText.collapseWs(f.replace(',', ' ')).strip()
    val out = (0 until n).flatMap { i =>
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      if (valid(cd(i))) parts += PyText.pyTitle(clean(cd(i)))
      for (f <- Seq(city(i), street(i), region(i), place(i)) if valid(f)) parts += clean(f)
      if (valid(zip(i))) parts += clean(zip(i))
      if (parts.nonEmpty) Some(parts.mkString(" ")) else None
    }
    out.mkString("; ")
  }

  private val formatAddressesUdf = udf(
    (city: Seq[String], cd: Seq[String], street: Seq[String],
     region: Seq[String], place: Seq[String], zip: Seq[String]) =>
      formatAddresses(city, cd, street, region, place, zip))

  // -- F16 second-citizenship rule (main.py:892–905) — title() again

  private[enrich] def citizenshipSecond(descs: Seq[String]): Seq[String] = {
    val ds = if (descs == null) Seq.empty else descs
    val citList = ds.filter(d => d != null && d.strip().nonEmpty &&
        d.strip().toUpperCase(Locale.ROOT) != "UNKNOWN")
      .map(d => PyText.pyTitle(d.strip()))
    if (citList.length > 1) {
      val first = citList.head.strip().toLowerCase(Locale.ROOT)
      val second = citList(1).strip()
      if (second.nonEmpty && second.toLowerCase(Locale.ROOT) != first) Seq(second)
      else Seq.empty
    } else Seq.empty
  }

  private val citizenshipSecondUdf = udf((d: Seq[String]) => citizenshipSecond(d))

  /** P5 nationality: strip + Python title of the FIRST citizenship (valid
    * only; UNKNOWN ⇒ "") (main.py:607–618). */
  private val stripTitleUdf = udf((s: String) =>
    if (s == null) null else PyText.pyTitle(s.strip()))

  // -- the enrichment projection ---------------------------------------------

  /** Input: XmlEntities.parse output. Output: entity_seq + all per-entity
    * output columns + `candidates` for the REM2 probe + `full_name` (pre
    * final-scrub) for the fill passes. */
  def enrich(entities: DataFrame): DataFrame = {
    val info = aliasInfoUdf(col("nameAlias.wholeName"), col("nameAlias.gender"))

    // P4 category + flag (value "UNKNOWN" in the data does NOT flag)
    val cc = col("subjectType.classificationCode")
    val flagCategory = col("subjectType").isNull || cc.isNull || cc === ""
    val category = when(flagCategory, lit("UNKNOWN")).otherwise(cc)

    // P5 nationality from first citizenship
    val firstCit = try_element_at(col("citizenship"), lit(1)).getField("countryDescription")
    val nationalities =
      when(Normalize.validStr(firstCit), stripTitleUdf(firstCit)).otherwise("")

    // F7 DOB: first non-blank @birthdate, string-reversed or "" if not 3 parts
    val firstBd = uTrim(try_element_at(
      filter(col("birthdate"), b =>
        b.getField("birthdate").isNotNull && uTrim(b.getField("birthdate")) =!= ""),
      lit(1)).getField("birthdate"))
    val dob = when(firstBd.isNull, lit(""))
      .otherwise(when(firstBd.rlike("^[^-]*-[^-]*-[^-]*$"),
        concat_ws("-",
          regexp_extract(firstBd, "^([^-]*)-([^-]*)-([^-]*)$", 3),
          regexp_extract(firstBd, "^([^-]*)-([^-]*)-([^-]*)$", 2),
          regexp_extract(firstBd, "^([^-]*)-([^-]*)-([^-]*)$", 1)))
        .otherwise(""))

    // F8 first-address city/country/state
    val firstAddr = try_element_at(col("address"), lit(1))
    def placeCol(f: Column): Column =
      when(Normalize.validStr(f), Normalize.scrubPlaceTokensUdf(f)).otherwise("")
    val addCity = placeCol(firstAddr.getField("city"))
    val addCountry = when(Normalize.validStr(firstAddr.getField("countryDescription")),
      stripTitleUdf(firstAddr.getField("countryDescription"))).otherwise("")
    val state = placeCol(firstAddr.getField("region"))

    // F9 ADDRESS over all addresses
    val address = formatAddressesUdf(
      col("address.city"), col("address.countryDescription"), col("address.street"),
      col("address.region"), col("address.place"), col("address.zipCode"))

    // F11 REM1 designation splitter (main.py:789–807) — pure built-ins
    val fnArr = filter(coalesce(col("nameAlias.function"), array().cast("array<string>")),
      f => f.isNotNull && f =!= "")
    val processedFns = flatten(transform(fnArr, f => {
      val ft = uTrim(f)
      when(ft.rlike("\\([a-z]\\)"),
        transform(
          filter(split(regexp_replace(ft, "\\([a-z]\\)", "|"), "\\|"),
            p => uTrim(p) =!= ""),
          p => regexp_replace(uTrim(p), "^,+|,+$", "")))
        .otherwise(array(ft))
    }))
    val rem1 = when(size(processedFns) > 0,
      concat(lit("Designation: "), array_join(processedFns, "; "))).otherwise("")

    // F12 DETAILS blocks (main.py:832–945)
    def emptyArr: Column = array().cast("array<string>")
    val regTitles = transform(
      filter(coalesce(col("regulation.numberTitle"), emptyArr),
        t => t.isNotNull && t =!= ""), c => uTrim(c))
    val aliasTitles = flatten(transform(
      filter(coalesce(col("nameAlias.title"), emptyArr), t => t.isNotNull && t =!= ""),
      t => transform(
        filter(split(regexp_replace(t, "\\(\\w\\)", ""), ","), p => uTrim(p) =!= ""),
        p => uTrim(p))))
    val titleBlock = concat(regTitles, aliasTitles)

    val bdBlock = Normalize.detailBirthdatesUdf(
      coalesce(col("birthdate.birthdate"), emptyArr),
      coalesce(col("birthdate.year"), emptyArr),
      coalesce(col("birthdate.yearRangeFrom"), emptyArr),
      coalesce(col("birthdate.yearRangeTo"), emptyArr))

    val placeBlock = transform(
      filter(coalesce(col("birthdate.place"), emptyArr), p => p.isNotNull && p =!= ""),
      c => uTrim(c))

    val citBlock = citizenshipSecondUdf(col("citizenship.countryDescription"))

    val remarkBlock = filter(
      transform(coalesce(col("remark"), emptyArr), r => uTrim(coalesce(r, lit("")))),
      r => r =!= "" && lower(r) =!= "none")

    def block(label: String, arr0: Column): Column = {
      val arr = Normalize.dedupCaseInsensitiveUdf(arr0)
      when(size(arr) > 0,
        uTrim(concat(lit(label + ": "),
          when(size(arr) === 1, uTrim(try_element_at(arr, lit(1))))
            .otherwise(array_join(transform(arr, c => uTrim(c)), " / ")))))
    }
    val detailsJoined = concat_ws("; ",
      block("Title", titleBlock), block("Birth date", bdBlock),
      block("Birth place", placeBlock), block("Citizenship", citBlock),
      block("Remark", remarkBlock))
    val details = uTrim(regexp_replace(detailsJoined, "[\\n\\r]", " "))

    // two projection stages, not a 16-deep withColumn chain: every
    // withColumn call analyzes the whole (growing) plan, which dominated
    // the flagship's driver-side time; no derived column references
    // another, so one withColumns map after the `info` stage suffices
    entities
      .withColumn("info", info)
      .withColumns(Map(
        "full_name" -> coalesce(col("info.selected"), lit("UNKNOWN")),
        "flag_name_missing" -> col("info.selected").isNull,
        "CATEGORY" -> category,
        "flag_category_missing" -> flagCategory,
        "GENDER" ->
          Normalize.genderCascade(col("info.xmlGender"), col("info.selected")),
        "DOB" -> dob,
        "ADD_CITY" -> addCity,
        "ADD_COUNTRY" -> addCountry,
        "STATE" -> state,
        "NATIONALITIES" -> nationalities,
        "ADDRESS" -> address,
        "DETAILS" -> details,
        "ALIAS" -> array_join(col("info.aliases"), "; "),
        "REM1" -> rem1,
        "candidates" -> col("info.candidates")))
      .select("entity_seq", "full_name", "flag_name_missing", "CATEGORY",
        "flag_category_missing", "GENDER", "DOB", "ADD_CITY", "ADD_COUNTRY",
        "STATE", "NATIONALITIES", "ADDRESS", "DETAILS", "ALIAS", "REM1",
        "candidates")
  }
}
