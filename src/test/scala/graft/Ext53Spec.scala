package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x174 Jaro–Winkler: textbook classics pinned to exact ppm, a seeded
  * property sweep vs a pure-Scala brute force (short strings over a
  * 3-letter alphabet force transpositions, empty windows and the
  * lo > hi window edge), the one-limb loud path, and a full sf0.001
  * corpus-histogram replay — bit-equal output required. */
class Ext53Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- brute force (the textbook algorithm, straight collections) ---

  /** (jw_ppm, jaro_ppm, m, k, prefix_l) */
  private def bruteJw(a: String, b: String): (Long, Long, Long, Long, Long) = {
    val (la, lb) = (a.length.toLong, b.length.toLong)
    if (la == 0 || lb == 0) return (0L, 0L, 0L, 0L, 0L)
    val w = math.max(math.max(la, lb) / 2 - 1, 0L)
    val used = Array.fill(b.length)(false)
    val mi = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (i <- 0 until a.length) {
      val lo = math.max(0L, i - w).toInt
      val hi = math.min(lb - 1, i + w).toInt
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!used(j) && a(i) == b(j)) { used(j) = true; mi += i; done = true }
        j += 1
      }
    }
    val m = mi.length.toLong
    if (m == 0) return (0L, 0L, 0L, 0L, 0L)
    val ms1 = mi.map(a(_))
    val ms2 = (0 until b.length).filter(used(_)).map(b(_))
    val k = ms1.zip(ms2).count { case (x, y) => x != y }.toLong
    val jaro = 1000000L * (2 * m * m * lb + 2 * m * m * la +
      la * lb * (2 * m - k)) / (6 * la * lb * m)
    val pl = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length.toLong
    (jaro + pl * (1000000L - jaro) / 10L, jaro, m, k, pl)
  }

  private def engine(pairs: Seq[(Long, String, String)])
      : Seq[(Long, Long, Long, Long, Long, Long)] = {
    import spark.implicits._
    val df = pairs.toDF("pair_id", "a", "b")
    graft.queries.Ext53.jaroWinkler(df)
      .select("pair_id", "jw_ppm", "jaro_ppm", "m", "k", "prefix_l")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
  }

  test("x174 textbook classics land on the exact ppm values") {
    val cases = Seq(
      (1L, "martha", "marhta"),   // 0.9611 — one transposition
      (2L, "dixon", "dicksonx"),  // 0.8133
      (3L, "dwayne", "duane"),    // 0.84
      (4L, "abc", "abc"),         // identity
      (5L, "abc", "xyz"),         // disjoint
      (6L, "a", ""),              // empty side
      (7L, "ab", "ba"))           // window 0 kills the swap
    val got = engine(cases)
    assert(got.map(t => (t._2, t._3, t._4, t._5, t._6)) == Seq(
      (961110L, 944444L, 6L, 2L, 3L),
      (813332L, 766666L, 4L, 0L, 2L),
      (839999L, 822222L, 4L, 0L, 1L),
      (1000000L, 1000000L, 3L, 0L, 3L),
      (0L, 0L, 0L, 0L, 0L),
      (0L, 0L, 0L, 0L, 0L),
      (0L, 0L, 0L, 0L, 0L)))
    assert(got.map(t => (t._2, t._3, t._4, t._5, t._6)) ==
      cases.map(c => bruteJw(c._2, c._3)))
  }

  test("x174 seeded property: engine == brute force over 300 short " +
    "pairs (3-letter alphabet — transposition- and window-edge-heavy)") {
    val rnd = new scala.util.Random(174)
    val pairs = (1L to 300L).map { id =>
      def str() = {
        val n = rnd.nextInt(13) // 0..12, includes empties
        (0 until n).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
      }
      (id, str(), str())
    }
    val got = engine(pairs)
    val exp = pairs.map(p => bruteJw(p._2, p._3))
    assert(got.map(t => (t._2, t._3, t._4, t._5, t._6)) == exp)
    // kernel parity: the interpreted HOF fold (the __hoffold AbVariant
    // path) must be value-identical to the native graft_jaro_mk path
    import spark.implicits._
    val hof = graft.queries.Ext53
      .jaroWinklerHof(pairs.toDF("pair_id", "a", "b"))
      .select("pair_id", "jw_ppm", "jaro_ppm", "m", "k", "prefix_l")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(hof == got)
  }

  test("x174 loud path: a side past one bitmask limb raises") {
    val e = intercept[Exception] { engine(Seq((1L, "x" * 63, "y"))) }
    assert(e.getMessage.contains("bitmask limb") ||
      e.getCause != null && e.getCause.getMessage.contains("bitmask limb"))
  }

  // ---- x175 GraftSoundex ---------------------------------------------

  /** The textbook algorithm (Census/Knuth, WITH h/w transparency). */
  private def bruteSoundex(w: String): String = {
    def cls(c: Char): Int =
      if ("aeiouy".contains(c)) 0
      else if (c == 'h' || c == 'w') -1
      else "bfpvcgjkqszxdtlmnr".indexOf(c) match {
        case i if i < 4  => 1
        case i if i < 12 => 2
        case i if i < 14 => 3
        case 14          => 4
        case i if i < 17 => 5
        case _           => 6
      }
    var last = cls(w(0))
    val digits = scala.collection.mutable.ArrayBuffer.empty[Int]
    for (c <- w.drop(1) if digits.length < 3) {
      val k = cls(c)
      if (k > 0) { if (k != last) digits += k; last = k }
      else if (k == 0) last = 0
    }
    w(0).toUpper.toString + digits.mkString.padTo(3, '0')
  }

  private def engineSoundex(words: Seq[String]): Seq[(String, String)] = {
    import spark.implicits._
    words.toDF("w").withColumn("sdx", graft.queries.Ext53.soundexCol)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("x175 classic vectors (h/w rule load-bearing: Ashcraft A261, " +
    "Pfister P236)") {
    val vec = Seq("robert" -> "R163", "rupert" -> "R163",
      "ashcraft" -> "A261", "ashcroft" -> "A261", "tymczak" -> "T522",
      "pfister" -> "P236", "honeyman" -> "H555", "jackson" -> "J250",
      "washington" -> "W252", "lee" -> "L000", "gutierrez" -> "G362",
      "vandeusen" -> "V532", "a" -> "A000", "b" -> "B000")
    val got = engineSoundex(vec.map(_._1))
    assert(got == vec)
    assert(vec.forall { case (w, exp) => bruteSoundex(w) == exp })
  }

  test("x175 seeded property: engine == brute force over 500 random " +
    "alpha words") {
    val rnd = new scala.util.Random(175)
    val words = (1 to 500).map { _ =>
      (0 until (1 + rnd.nextInt(12)))
        .map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }.distinct
    val got = engineSoundex(words)
    assert(got == words.map(w => (w, bruteSoundex(w))))
  }

  test("x175 sf0.001 blocking audit == straight-collections replay") {
    val dw = spark.read.parquet(s"$sf/documents.parquet")
      .collect().flatMap(_.getAs[String]("text").split(" ", -1))
    val pw = spark.read.parquet(s"$sf/part.parquet")
      .collect().flatMap(_.getAs[String]("p_name").split(" ", -1))
    val vocab = (dw ++ pw).filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val exp = vocab.toSeq.map { case (w, occ) => (bruteSoundex(w), w, occ) }
      .groupBy(_._1).toSeq
      .map { case (k, xs) =>
        val n = xs.length.toLong
        (k, n, xs.map(_._3).sum, xs.map(_._2).min, n * (n - 1) / 2)
      }
      .sortBy { case (k, n, _, _, _) => (-n, k) }.take(20)
    val got = SparkEntry.queries("x175_soundex_blocking")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3),
        r.getLong(4))).toSeq
    assert(got == exp)
  }

  test("x174 sf0.001 corpus histogram == straight-collections replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val scored = docs.keys.filter(_ % 2 == 1).toSeq.sorted.map { c =>
      bruteJw(docs(c).take(40), docs(c - 1).take(40))
    }
    val exp = scored.groupBy(_._1 / 100000L).toSeq.sortBy(_._1)
      .map { case (dec, xs) =>
        (dec, xs.length.toLong, xs.map(_._1).sum, xs.map(_._2).sum,
          xs.map(_._3).sum, xs.map(_._4).sum, xs.map(_._5).sum)
      }
    val got = SparkEntry.queries("x174_jaro_winkler")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == exp)
  }
}
