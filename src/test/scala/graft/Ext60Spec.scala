package graft

import org.scalatest.funsuite.AnyFunSuite

/** x187 Kruskal–Wallis + x188 Friedman: straight-collections replays
  * (explicit joint midranks / within-row midranks, brute tie terms) on
  * planted corpora — heavy ties, the exact-zero geometry, a textbook
  * hand-checked value — and full sf0.001. */
class Ext60Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val M = BigInt(1000000)

  // ---- x187 Kruskal–Wallis -------------------------------------------

  private def replayKw(docs: Seq[(String, String)])
      : (Long, Long, Long, Long, Long) = {
    val obs = docs.map { case (lang, t) =>
      lang -> t.split(" ", -1).length.toLong
    }
    val n = BigInt(obs.length)
    val byVal = obs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    // doubled joint midrank of an observation at value v
    def mid2(v: Long): BigInt =
      BigInt(2L * obs.count(_._2 < v)) + byVal(v) + 1
    val groups = obs.groupBy(_._1)
    val rr6 = groups.values.map { g =>
      val r2 = g.map(o => mid2(o._2)).sum
      r2 * r2 * M / BigInt(g.length).max(1)
    }.sum
    val tieT = byVal.values.map(t => BigInt(t) * t * t - t).sum
    val num = 3 * rr6 - 3 * M * n * (n + 1) * (n + 1)
    val d1 = (n * (n + 1)).max(1)
    val nn3 = n * n * n - n
    def sdiv(a: BigInt, b: BigInt): BigInt = if (a < 0) -((-a) / b) else a / b
    (n.toLong, groups.size.toLong, tieT.toLong, sdiv(num, d1).toLong,
      sdiv(num * nn3, d1 * (nn3 - tieT).max(1)).toLong)
  }

  private def engineKw(dir: String): (Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x187_kruskal_wallis")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def write(dir: String, docs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("x187 textbook untied three-group corpus lands the hand value") {
    val dir = TestSpark.scratchDir("x187a")
    // values a:{1,2}, b:{3,4}, c:{5,6} — ranks 1..6 exactly, no ties:
    // R = (3, 7, 11), H = 12/(6·7)·(9/2+49/2+121/2) − 3·7
    //   = 2/7·179/2 − 21 = 179/7 − 21 = 32/7 ≈ 4.571428
    val docs = Seq(("a", toks(1)), ("a", toks(2)), ("b", toks(3)),
      ("b", toks(4)), ("c", toks(5)), ("c", toks(6)))
    write(dir, docs)
    val got = engineKw(dir)
    assert(got == replayKw(docs))
    assert(got._1 == 6L && got._2 == 3L && got._3 == 0L)
    // 32/7 in ppm, floored (the three per-group ×1e6 floors are exact
    // here: (2R_g)² divisible by n_g = 2) — 4571428
    assert(got._5 == 4571428L)
    assert(got._4 == got._5) // no ties → correction is identity
  }

  test("x187 identical groups give H = 0 exactly; heavy ties hit the " +
    "midrank + tie-correction path") {
    val dir = TestSpark.scratchDir("x187b")
    // two groups with the SAME multiset {10,10,20} — every group rank
    // sum equals its expectation, H = 0 exactly (floors land on 0)
    val docs = Seq(("a", toks(10)), ("a", toks(10)), ("a", toks(20)),
      ("b", toks(10)), ("b", toks(10)), ("b", toks(20)))
    write(dir, docs)
    val got = engineKw(dir)
    assert(got == replayKw(docs))
    // tie groups: four 10s (t³−t = 60), two 20s (6) → 66
    assert(got._3 == 66L)
    assert(got._5 == 0L)
    val dir2 = TestSpark.scratchDir("x187c")
    // shifted groups with internal ties — replay is the oracle here
    val docs2 = Seq(("a", toks(5)), ("a", toks(5)), ("a", toks(5)),
      ("b", toks(9)), ("b", toks(9)), ("c", toks(9)), ("c", toks(14)))
    write(dir2, docs2)
    assert(engineKw(dir2) == replayKw(docs2))
  }

  test("x187 sf0.001 == brute replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(engineKw(sf) == replayKw(docs))
  }

  // ---- x188 Friedman ---------------------------------------------------

  /** Within-row doubled midranks + tie term for one (s0, s1, s2) block. */
  private def blockRanks(s: Seq[Long]): (Seq[BigInt], BigInt) = {
    val r2 = s.map { sj =>
      BigInt(2L * s.count(_ < sj) + s.count(_ == sj) + 1)
    }
    val t = s.groupBy(identity).values
      .map(g => BigInt(g.size) * g.size * g.size - g.size).sum
    (r2, t)
  }

  private def replayFr(blocks: Seq[(Long, Long, Long)])
      : (Long, Long, Long, Long, Long, Long) = {
    val rt = blocks.map { case (a, b, c) => blockRanks(Seq(a, b, c)) }
    val n = BigInt(blocks.length)
    val sa = rt.map(_._1(0)).sum
    val sb = rt.map(_._1(1)).sum
    val sc = rt.map(_._1(2)).sum
    val tT = rt.map(_._2).sum
    val num = 3 * (sa * sa + sb * sb + sc * sc) - 144 * n * n
    val chi2 = num * 2 * M / (24 * n - tT).max(1)
    (n.toLong, sa.toLong, sb.toLong, sc.toLong, tT.toLong, chi2.toLong)
  }

  test("x188 within-row midrank kernel: the three tie shapes") {
    // all distinct: ranks (1,2,3) doubled (2,4,6); tie term 0
    assert(blockRanks(Seq(5L, 9L, 30L)) == ((Seq(BigInt(2), BigInt(4),
      BigInt(6)), BigInt(0))))
    // one pair: (7,7,9) → midranks (1.5, 1.5, 3) doubled (3,3,6); t=6
    assert(blockRanks(Seq(7L, 7L, 9L)) == ((Seq(BigInt(3), BigInt(3),
      BigInt(6)), BigInt(6))))
    // all equal: midrank 2 each, doubled (4,4,4); t = 24; Σ2r = 12
    assert(blockRanks(Seq(4L, 4L, 4L)) == ((Seq(BigInt(4), BigInt(4),
      BigInt(4)), BigInt(24))))
  }

  test("x188 replay formula: identical-order blocks hit the classic " +
    "maximum chi2 = 2n; all-tied blocks give 0 with a guarded " +
    "denominator") {
    // 4 blocks all ranking s2 > s1 > s0: chi2 = 2n = 8 exactly
    val b1 = Seq((1L, 2L, 3L), (10L, 20L, 30L), (0L, 5L, 9L),
      (-3L, -2L, -1L))
    val r1 = replayFr(b1)
    assert(r1._6 == 8L * 1000000L)
    // every block fully tied: T = 24n, denominator guard → chi2 = 0
    val b2 = Seq((5L, 5L, 5L), (7L, 7L, 7L))
    val r2 = replayFr(b2)
    assert(r2._5 == 48L && r2._6 == 0L)
  }

  private def engineFr(dir: String): (Long, Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x188_friedman")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5))
  }

  // independent scorer replay from raw md5 (the Ext57Spec discipline —
  // never via TextOps)
  private def md5head8(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  private def rawScore(text: String, mult: Long): Long =
    text.split(" ", -1).map { t =>
      (md5head8(t) % 64 * mult) % 1000 - 500
    }.sum

  test("x188 sf0.001 == brute replay over the three scorer folds") {
    val mults = Seq(2654435761L, graft.queries.Ext57.McnemarMultB,
      graft.queries.Ext57.CochranMultC)
    val blocks = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map { r =>
        val t = r.getString(0)
        (rawScore(t, mults(0)), rawScore(t, mults(1)), rawScore(t, mults(2)))
      }.toSeq
    assert(engineFr(sf) == replayFr(blocks))
  }
}
