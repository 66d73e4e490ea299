package graft

import org.scalatest.funsuite.AnyFunSuite

/** x189 METEOR-lite: straight-collections replay (explicit
  * occurrence-index alignment, stem-lite residual stage, chunk walk)
  * on planted corpora — identity, scramble (the classic chunk-penalty
  * case), stem-only matches, zero overlap — and full sf0.001. */
class Ext61Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- independent replay ---------------------------------------------

  private def stemLite(w: String): String = {
    val n = w.length
    if (w.endsWith("sses")) w.dropRight(2)
    else if (w.endsWith("ies")) w.dropRight(3) + "y"
    else if (w.endsWith("ss")) w
    else if (w.endsWith("s") && n >= 4) w.dropRight(1)
    else if (w.endsWith("ing") && n >= 6) w.dropRight(3)
    else if (w.endsWith("ed") && n >= 5) w.dropRight(2)
    else if (w.endsWith("ly") && n >= 5) w.dropRight(2)
    else w
  }

  /** Occurrence-index alignment of one stage: i-th occurrence of a key
    * on the cand side pairs with the i-th on the ref side. Inputs are
    * (position, key); returns matched (cpos, rpos). */
  private def stageAlign(cs: Seq[(Int, String)], rs: Seq[(Int, String)])
      : Seq[(Int, Int)] = {
    val rByKey = rs.groupBy(_._2).view
      .mapValues(_.sortBy(_._1).map(_._1)).toMap
    cs.groupBy(_._2).toSeq.flatMap { case (k, cOccs) =>
      val co = cOccs.sortBy(_._1).map(_._1)
      val ro = rByKey.getOrElse(k, Seq.empty)
      co.zip(ro)
    }
  }

  private case class PairScore(m: Long, m1: Long, ch: Long, nc: Long,
    nr: Long, score: Long)

  private def scorePair(cw: Seq[String], rw: Seq[String]): PairScore = {
    val cs = cw.zipWithIndex.map { case (w, i) => (i, w) }
    val rs = rw.zipWithIndex.map { case (w, i) => (i, w) }
    val m1 = stageAlign(cs, rs)
    val cMatched = m1.map(_._1).toSet
    val rMatched = m1.map(_._2).toSet
    val m2 = stageAlign(
      cs.filterNot(p => cMatched(p._1)).map { case (i, w) =>
        (i, stemLite(w)) },
      rs.filterNot(p => rMatched(p._1)).map { case (i, w) =>
        (i, stemLite(w)) })
    val all = (m1 ++ m2).sortBy(_._1)
    val m = all.length.toLong
    val ch = all.zip((-9, -9) +: all.dropRight(1)).map {
      case ((c, r), (pc, pr)) => if (c == pc + 1 && r == pr + 1) 0L else 1L
    }.sum
    val nc = cw.length.toLong; val nr = rw.length.toLong
    val score =
      if (m == 0) 0L
      else (10000000L * m / math.max(nc + 9 * nr, 1)) *
        (1000000L - 500000L * ch * ch * ch / (m * m * m)) / 1000000L
    PairScore(m, m1.length.toLong, ch, nc, nr, score)
  }

  private def replay(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] = {
    val byId = docs.map(d => d._1 -> d).toMap
    val pairs = docs.filter(_._1 % 2 == 1).flatMap { case (id, src, text) =>
      byId.get(id - 1).map { case (_, _, rtext) =>
        (src, scorePair(text.split(" ", -1).toSeq,
          rtext.split(" ", -1).toSeq))
      }
    }
    pairs.groupBy(_._1).map { case (src, ps) =>
      val s = ps.map(_._2)
      src -> (s.length.toLong, s.map(_.m1).sum, s.map(p => p.m - p.m1).sum,
        s.map(_.ch).sum, s.map(_.nc).sum, s.map(_.nr).sum,
        s.map(_.score).sum / s.length)
    }
  }

  private def engine(dir: String)
      : Map[String, (Long, Long, Long, Long, Long, Long, Long)] =
    SparkEntry.queries("x189_meteor_lite")(spark, dir).collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toMap

  private def write(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("stem-lite kernel: the seven rules and their guards") {
    assert(stemLite("classes") == "class") // sses -> ss
    assert(stemLite("cities") == "city")
    assert(stemLite("pass") == "pass")      // ss unchanged
    assert(stemLite("cats") == "cat")
    assert(stemLite("its") == "its")        // len < 4 guard
    assert(stemLite("walking") == "walk")
    assert(stemLite("doing") == "doing")    // len < 6 guard
    assert(stemLite("walked") == "walk")
    assert(stemLite("quickly") == "quick")
    assert(stemLite("run") == "run")
  }

  test("x189 identical pair scores ~1e6 with one chunk") {
    val dir = TestSpark.scratchDir("x189a")
    val docs = Seq(
      (0L, "s1", "the cat sat on the mat"),
      (1L, "s1", "the cat sat on the mat"))
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    val (n, m1, m2, ch, nc, nr, sc) = got("s1")
    assert(n == 1L && m1 == 6L && m2 == 0L && ch == 1L)
    assert(nc == 6L && nr == 6L)
    // F = 1e6; pen = 500000*1/216 = 2314 -> score 997686
    assert(sc == 997686L)
  }

  test("x189 scramble keeps the matches but pays the chunk penalty; " +
    "stem-only residual matches land in m_stem") {
    val dir = TestSpark.scratchDir("x189b")
    val docs = Seq(
      // cand = reversed word blocks of ref: all 6 exact matches, but
      // fragmented alignment -> more chunks than the identity pair
      (2L, "s1", "on the mat the cat sat"),
      (3L, "s1", "the cat sat on the mat"),
      // stem stage: walked~walking, cats~cat... exact: none
      (4L, "s2", "cat walked"),
      (5L, "s2", "cats walking"))
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    val (_, m1a, m2a, cha, _, _, sca) = got("s1")
    assert(m1a == 6L && m2a == 0L && cha >= 2L)
    assert(sca < 997686L) // strictly below the identity score
    val (_, m1b, m2b, _, _, _, _) = got("s2")
    assert(m1b == 0L && m2b == 2L) // cats->cat, walking->walk(ed)
  }

  test("x189 zero-overlap pair scores 0; occurrence clipping caps " +
    "repeated tokens at the reference multiset count") {
    val dir = TestSpark.scratchDir("x189c")
    val docs = Seq(
      (6L, "s1", "aa bb cc"),
      (7L, "s1", "dd ee ff"),
      // cand repeats 'x' 4 times, ref has it twice -> exactly 2 matches
      (8L, "s2", "x q x"),
      (9L, "s2", "x x x x"))
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    assert(got("s1")._7 == 0L)
    assert(got("s2")._2 == 2L) // m_exact clipped to ref count
  }

  test("x189 seeded property: 150 random pairs on a tiny colliding " +
    "vocab (repeats, stem conflations, shared suffixes) == replay") {
    val rnd = new scala.util.Random(18911)
    // vocab engineered to force multiset clipping, stem-stage matches
    // (cats/cat, walking/walked/walks), the ss/sses guards, and
    // sub-4-char 's' words
    val vocab = Vector("a", "as", "cat", "cats", "walk", "walks",
      "walking", "walked", "pass", "passes", "cities", "city", "x",
      "quickly", "quick", "its")
    val docs = (0 until 300).map { i =>
      val n = 1 + rnd.nextInt(12)
      (i.toLong, s"s${i % 3}",
        (1 to n).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
    }
    val dir = TestSpark.scratchDir("x189prop")
    write(dir, docs)
    assert(engine(dir) == replay(docs))
  }

  test("x189 sf0.001 == brute replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(engine(sf) == replay(docs))
  }
}
