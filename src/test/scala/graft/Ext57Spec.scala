package graft

import org.scalatest.funsuite.AnyFunSuite

/** x179 McNemar + x180 Cohen's d: straight-collections replays (the
  * scorer re-derived from raw md5, never via TextOps) on planted
  * corpora and full sf0.001; x180 additionally pins a closed-form
  * d = 1.0 geometry and the zero-effect case. */
class Ext57Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.queries.Ext57.McnemarMultB
  private val MultA = 2654435761L

  // ---- independent scorer replay (raw md5) ---------------------------

  private def md5head8(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map("%02x".format(_)).mkString, 16)

  private def sbOf(text: String, mult: Long): Long = {
    val w = text.split(" ", -1)
    val n = w.length.toLong
    val sw = w.map { t =>
      val h = md5head8(t) % 64
      (h * mult) % 1000 - 500
    }.sum
    ((sw + 500L * n) * 1000L / n) / 1000L
  }

  private def replayMcnemar(docs: Seq[(String, String)])
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val preds = docs.map { case (lang, text) =>
      (lang == "en", sbOf(text, MultA) >= 500, sbOf(text, McnemarMultB) >= 500)
    }
    val n = preds.length.toLong
    val okA = preds.count { case (p, a, _) => a == p }.toLong
    val okB = preds.count { case (p, _, b) => b == p }.toLong
    val b = preds.count { case (p, a, bb) => a == p && bb != p }.toLong
    val c = preds.count { case (p, a, bb) => bb == p && a != p }.toLong
    val den = math.max(b + c, 1L)
    (n, okA * 1000 / math.max(n, 1), okB * 1000 / math.max(n, 1), b, c,
      1000000L * (b - c) * (b - c) / den,
      1000000L * math.max(math.abs(b - c) - 1, 0L) *
        math.max(math.abs(b - c) - 1, 0L) / den)
  }

  private def replayCohensD(docs: Seq[(String, String)])
      : (Long, Long, Long, Long) = {
    val vs = docs.map { case (lang, text) =>
      (lang == "en", BigInt(text.split(" ", -1).length))
    }
    val (a, b) = vs.partition(_._1)
    val (na, nb) = (BigInt(a.length), BigInt(b.length))
    val (sa, sb) = (a.map(_._2).sum, b.map(_._2).sum)
    val (qa, qb) = (a.map(v => v._2 * v._2).sum, b.map(v => v._2 * v._2).sum)
    val dn = sa * nb - sb * na
    val p = nb * (na * qa - sa * sa) + na * (nb * qb - sb * sb)
    val x = BigInt("1000000000000") * dn * dn * (na + nb - 2) /
      (na * nb * p).max(1)
    val d = graft.queries.Ext49.isqrt(x)
    (na.toLong, nb.toLong, dn.toLong, (if (dn < 0) -d else d).toLong)
  }

  private def engineMc(dir: String) = {
    val r = SparkEntry.queries("x179_mcnemar")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
  }

  private def engineD(dir: String) = {
    val r = SparkEntry.queries("x180_cohens_d")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def write(dir: String, docs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("x179 planted corpus == raw-md5 replay (discordants drive χ²)") {
    val dir = TestSpark.scratchDir("x179a")
    val rnd = new scala.util.Random(179)
    val vocab = Vector("spark", "join", "hash", "scan", "merge", "row",
      "filter", "agg", "sort", "key", "data", "table")
    val docs = (1 to 60).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val text = (0 until 5 + rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (lang, text)
    }
    write(dir, docs)
    assert(engineMc(dir) == replayMcnemar(docs))
  }

  test("x179 sf0.001 == raw-md5 replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(engineMc(sf) == replayMcnemar(docs))
  }

  test("x180 planted closed form: d = exactly 1.0 (ppm 1e6)") {
    val dir = TestSpark.scratchDir("x180a")
    // en: 10 and 14 tokens; de: 10 and 10 → Δmean = 2, pooled s = 2
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(("en", toks(10)), ("en", toks(14)),
      ("de", toks(10)), ("de", toks(10)))
    write(dir, docs)
    val got = engineD(dir)
    assert(got == replayCohensD(docs))
    assert(got == ((2L, 2L, 8L, 1000000L)))
  }

  test("x180 planted zero effect: identical groups give d = 0") {
    val dir = TestSpark.scratchDir("x180b")
    def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")
    val docs = Seq(("en", toks(12)), ("en", toks(16)),
      ("de", toks(12)), ("de", toks(16)))
    write(dir, docs)
    val got = engineD(dir)
    assert(got == replayCohensD(docs))
    assert(got._3 == 0L && got._4 == 0L)
  }

  // ---- x185 Cochran's Q ----------------------------------------------

  import graft.queries.Ext57.CochranMultC

  private def replayQ(docs: Seq[(String, String)])
      : (Long, Long, Long, Long, Long, Long, Long) = {
    val mults = Seq(MultA, McnemarMultB, CochranMultC)
    val oks = docs.map { case (lang, text) =>
      val pos = lang == "en"
      mults.map(m => if ((sbOf(text, m) >= 500) == pos) 1L else 0L)
    }
    val n = oks.length.toLong
    val g = (0 to 2).map(j => oks.map(_(j)).sum)
    val sl = oks.map(_.sum).sum
    val sl2 = oks.map(o => o.sum * o.sum).sum
    val num = 2L * (3L * g.map(x => x * x).sum - g.sum * g.sum)
    val q = 1000000L * num / math.max(3L * sl - sl2, 1L)
    (n, g(0), g(1), g(2), sl, sl2, q)
  }

  private def engineQ(dir: String) = {
    val r = SparkEntry.queries("x185_cochran_q")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5), r.getLong(6))
  }

  test("x185 planted corpus == raw-md5 replay; all-agree classifiers " +
    "give Q = 0") {
    val dir = TestSpark.scratchDir("x185a")
    val rnd = new scala.util.Random(185)
    val vocab = Vector("spark", "join", "hash", "scan", "merge", "row",
      "filter", "agg", "sort", "key")
    val docs = (1 to 50).map { i =>
      ((if (i % 4 == 0) "en" else "fr"),
        (0 until 4 + rnd.nextInt(16))
          .map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    write(dir, docs)
    assert(engineQ(dir) == replayQ(docs))
    // degenerate all-equal case: every doc scored right or wrong by all
    // three identically ⇒ ΣG² term cancels and Q = 0 — use one doc so
    // L ∈ {0, 3} forces agreement
    val dir2 = TestSpark.scratchDir("x185b")
    val one = Seq(("en", "spark join hash"))
    write(dir2, one)
    val got2 = engineQ(dir2)
    assert(got2 == replayQ(one))
    assert(got2._7 == 0L || got2._5 % 3 != 0)
  }

  test("x185 sf0.001 == raw-md5 replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(engineQ(sf) == replayQ(docs))
  }

  test("x180 sf0.001 == exact-BigInt replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(engineD(sf) == replayCohensD(docs))
  }
}
