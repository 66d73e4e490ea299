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
  }

  test("x174 loud path: a side past one bitmask limb raises") {
    val e = intercept[Exception] { engine(Seq((1L, "x" * 63, "y"))) }
    assert(e.getMessage.contains("bitmask limb") ||
      e.getCause != null && e.getCause.getMessage.contains("bitmask limb"))
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
