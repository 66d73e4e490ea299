package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x108/x109: code-switch halves replay (plus a constructed mixed-language
  * fixture — the driver corpus is single-language per doc, so the flag
  * must be exercised synthetically) and the group-split leakage property. */
class Ext29Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val langMarkers = Map(
    "de" -> Seq("der", "die", "das", "und"),
    "en" -> Seq("the", "a", "of", "and"),
    "es" -> Seq("el", "los", "las", "y"),
    "fr" -> Seq("le", "les", "des", "et"))

  private def voteLang(tokens: Seq[String]): String = {
    val order = Seq("de", "en", "es", "fr")
    val scores = order.map(l => tokens.count(langMarkers(l).contains))
    val m = scores.max
    if (m == 0) "und" else order(scores.indexWhere(_ == m))
  }

  test("x108: equals the half-split marker-vote replay on the driver corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = docs.map { case (id, t) => (id, t.split(" ").toSeq) }
      .filter(_._2.size >= 2)
      .map { case (id, w) =>
        val h = w.size / 2
        val (a, b) = (voteLang(w.take(h)), voteLang(w.drop(h)))
        (id, a, b, a != b && a != "und" && b != "und")
      }.sortBy(_._1)
    val got = SparkEntry.queries("x108_code_switch")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // driver corpus is single-language per doc: halves must agree
    assert(got.forall(!_._4))
  }

  test("x108: flags a constructed mixed-language document (and only it)") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_x108").toString
    Seq(
      (0L, "the cat sat of the mat and a dog and the end", "en"),
      (1L, "le chat est sur les tables et des chiens et le fin", "fr"),
      (2L, "the cat sat of the mat and / le chat et les tables des le", "xx"),
      (3L, "zz yy xx ww vv uu", "und"))
      .toDF("doc_id", "text", "lang")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x108_code_switch")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getBoolean(3))).toSeq
    assert(got == Seq(
      (0L, "en", "en", false),
      (1L, "fr", "fr", false),
      (2L, "en", "fr", true),
      (3L, "und", "und", false)))
  }

  test("x109: no duplicate cluster ever spans a split (leakage-free by " +
    "construction), fractions near 80/10/10, replay-exact") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val keyed = docs.map { case (id, t) =>
      (id, md5hex(t.split(" ").distinct.sorted.mkString(" "))) }
    val sizes = keyed.groupBy(_._2).map { case (k, xs) => k -> xs.size.toLong }
    def splitOf(k: String): String = {
      val hv = java.lang.Long.parseLong(md5hex("gsplit:" + k).take(8), 16) % 10
      if (hv < 8) "train" else if (hv == 8) "val" else "test"
    }
    val want = keyed.map { case (id, k) => (id, sizes(k), splitOf(k)) }
      .sortBy(_._1)
    val got = SparkEntry.queries("x109_group_split")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == want)
    // leakage property: every cluster maps to exactly one split
    val keyMap = keyed.toMap
    val byKey = got.groupBy(t => keyMap(t._1))
    assert(byKey.values.forall(_.map(_._3).distinct.size == 1))
    val frac = got.groupBy(_._3).view.mapValues(_.size).toMap
    assert(frac("train") > got.size * 6 / 10)
    assert(frac.getOrElse("val", 0) > 0 && frac.getOrElse("test", 0) > 0)
  }
}
