package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 batch: Krippendorff's alpha (x147) replayed against the
  * textbook coincidence-matrix definition in exact BigInt rationals, and
  * longest-repeated-span (x148) against a planted-span corpus and a
  * brute-force scan of the real corpus.
  */
class Ext45Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  // --- independent reimplementation of the three raters (no engine code) ---
  private def md5hash32(t: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }
  private val weights: Array[Long] =
    (0 until 64).map(i => (i * 2654435761L) % 1000 - 500).toArray

  private def rate(text: String): (Boolean, Boolean, Boolean) = {
    val toks = text.split(" ", -1)
    val n = toks.length.toLong
    val nd = toks.distinct.length.toLong
    val sumW = toks.map(t => weights((md5hash32(t) % 64).toInt)).sum
    val a = n >= 40 && nd * 10 >= n * 3
    val b = (sumW + 500L * n) * 1000L / math.max(n, 1L) / 1000L >= 500L
    val c = nd * 2 >= n
    (a, b, c)
  }

  test("x147: alpha_ppm equals the textbook coincidence-matrix alpha " +
    "computed from an independent Scala replay of the raters (BigInt " +
    "rationals, floor-consistent ppm)") {
    val out = SparkEntry.queries("x147_krippendorff_alpha")(
      spark, "/root/testdata/sf0.001").collect().head
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    // textbook: per-unit values pooled into a coincidence matrix o_ck
    // (each of the m(m-1) ordered rater pairs contributes 1/(m-1))
    val js = texts.map { t =>
      val (a, b, c) = rate(t)
      Seq(a, b, c).count(identity)
    }
    val n = BigInt(js.length)
    // o_01 + o_10 = sum j(3-j) (the /(m-1)=2 cancels the double count)
    val dsum = BigInt(js.map(j => j * (3 - j)).sum)
    val o1 = BigInt(js.map(_.toLong).sum)
    val o0 = 3 * n - o1
    assert(out.getAs[Long]("n") == n)
    assert(out.getAs[Long]("o1") == o1)
    assert(out.getAs[Long]("o0") == o0)
    assert(out.getAs[Long]("dsum") == dsum)
    // alpha = 1 - Do/De, Do = dsum/N, De = 2*o0*o1/(N(N-1)), N = 3n
    val num = 2 * o0 * o1 - dsum * (3 * n - 1)
    val den = 2 * o0 * o1
    val expected =
      if (den == 0) BigInt(0)
      else (if (num < 0) -1 else 1) *
        ((num.abs / den) * 1000000 + (num.abs % den) * 1000000 / den)
    assert(BigInt(out.getAs[Long]("alpha_ppm")) == expected)
    // the three raters genuinely disagree below chance on this corpus —
    // the sign-split path is exercised by real data
    assert(out.getAs[Long]("alpha_ppm") < 0L)
    GraftCaches.releasePrior()
  }

  test("x147: degenerate corpus (every rater false on every unit) hits " +
    "the den = 0 guard and yields alpha_ppm = 0, no throw") {
    import spark.implicits._
    // pick a token with a NEGATIVE lexicon weight so rater B is false
    val tok = ('a' to 'z').map(_.toString)
      .find(t => weights((md5hash32(t) % 64).toInt) < 0).get
    // "t t t": 3 tokens, 1 distinct → A false (< 40 tokens), C false
    // (1*2 < 3), B false (negative average weight)
    val dir = TestSpark.scratchDir("x147deg")
    Seq((0L, s"$tok $tok $tok")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("x147_krippendorff_alpha")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("o1") == 0L)
    assert(r.getAs[Long]("alpha_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("x149: kappa_w_ppm equals the textbook quadratic-weighted kappa " +
    "computed from the full 4x4 contingency matrix in BigInt rationals " +
    "(validates the marginal-moment collapse of the double sum)") {
    val out = SparkEntry.queries("x149_weighted_kappa")(
      spark, "/root/testdata/sf0.001").collect().head
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    // independent rater replay (no engine code)
    val pairs = texts.map { t =>
      val toks = t.split(" ", -1)
      val n = toks.length.toLong
      val sumW = toks.map(x => weights((md5hash32(x) % 64).toInt)).sum
      val a = Seq(20L, 40L, 60L).count(n >= _)
      val sc = (sumW + 500L * n) * 1000L / math.max(n, 1L)
      val b = Seq(350000L, 500000L, 650000L).count(sc >= _)
      (a, b)
    }
    // textbook: O_ij and E_ij over the 4x4 grid, w_ij = (i-j)^2
    val n = BigInt(pairs.length)
    val obs = Array.fill(4, 4)(BigInt(0))
    pairs.foreach { case (a, b) => obs(a)(b) += 1 }
    val rowm = (0 to 3).map(i => obs(i).sum)
    val colm = (0 to 3).map(j => (0 to 3).map(i => obs(i)(j)).sum)
    // kappa_w = 1 - n * sum(w*O) / sum(w*R_i*C_j)  (E_ij = R_i C_j / n)
    val sObs = (for (i <- 0 to 3; j <- 0 to 3)
      yield BigInt((i - j) * (i - j)) * obs(i)(j)).sum
    val dExp = (for (i <- 0 to 3; j <- 0 to 3)
      yield BigInt((i - j) * (i - j)) * rowm(i) * colm(j)).sum
    assert(out.getAs[Long]("n") == n)
    assert(BigInt(out.getAs[Long]("s_diff2")) == sObs)
    assert(BigInt(out.getAs[Long]("d_exp")) == dExp,
      "marginal-moment collapse must equal the explicit double sum")
    val num = dExp - n * sObs
    val expected =
      if (dExp == 0) BigInt(0)
      else (if (num < 0) -1 else 1) *
        ((num.abs / dExp) * 1000000 + (num.abs % dExp) * 1000000 / dExp)
    assert(BigInt(out.getAs[Long]("kappa_w_ppm")) == expected)
    // graded raters disagree below chance on this corpus too
    assert(out.getAs[Long]("kappa_w_ppm") < 0L)
    GraftCaches.releasePrior()
  }

  test("x149: single-doc corpus where both raters grade 0 hits the " +
    "d_exp = 0 guard; kappa_w_ppm = 0, no throw") {
    import spark.implicits._
    // grade B 0 needs sc < 350000, i.e. lexicon weight < -150 (the
    // score is (w + 500)·1000 for a single-token vocabulary)
    val tok = ('a' to 'z').map(_.toString)
      .find(t => weights((md5hash32(t) % 64).toInt) < -150).get
    val dir = TestSpark.scratchDir("x149deg")
    // 3 tokens -> grade A 0; strongly negative lexicon -> grade B 0
    Seq((0L, s"$tok $tok $tok")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("x149_weighted_kappa")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("d_exp") == 0L)
    assert(r.getAs[Long]("kappa_w_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("x148: planted 20-token shared span between two otherwise " +
    "disjoint documents is found exactly (span_len 20, 2 occurrences, " +
    "2 docs, the right hash)") {
    import spark.implicits._
    val s20 = (1 to 20).map(i => s"s$i")
    val doc1 = ((1 to 50).map(i => s"u$i") ++ s20 ++
      (51 to 60).map(i => s"u$i")).mkString(" ")
    val doc2 = ((1 to 40).map(i => s"v$i") ++ s20 ++
      (41 to 80).map(i => s"v$i")).mkString(" ")
    val dir = TestSpark.scratchDir("x148plant")
    Seq((0L, doc1), (1L, doc2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x148_longest_repeat")(spark, dir).collect()
    assert(out.length == 1, s"expected exactly the planted span: ${out.toSeq}")
    val r = out.head
    assert(r.getAs[Long]("span_len") == 20L)
    assert(r.getAs[Long]("n_occ") == 2L)
    assert(r.getAs[Long]("n_docs") == 2L)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s20.mkString(" ").getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(r.getAs[String]("span_hash") == md)
    assert(!r.getAs[Boolean]("capped")) // 20 ≪ SpanCap — exact answer
    GraftCaches.releasePrior()
  }

  test("x148: a repeated span LONGER than SpanCap reports span_len = " +
    "SpanCap with capped = true — a truncated answer is distinguishable " +
    "from an exact one (round-8 ADVICE)") {
    import spark.implicits._
    // two docs sharing a 600-token run: true longest repeat (600) exceeds
    // the 511 cap, so the search must converge AT the cap and say so
    val s600 = (1 to 600).map(i => s"c$i")
    val doc1 = ((1 to 10).map(i => s"u$i") ++ s600).mkString(" ")
    val doc2 = (s600 ++ (1 to 10).map(i => s"v$i")).mkString(" ")
    val dir = TestSpark.scratchDir("x148cap")
    Seq((0L, doc1), (1L, doc2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x148_longest_repeat")(spark, dir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("span_len") ==
      graft.queries.Ext45.SpanCap))
    assert(out.forall(_.getAs[Boolean]("capped")))
    GraftCaches.releasePrior()
  }

  test("x148: span_len matches a brute-force longest-repeat scan of the " +
    "sf0.001 corpus, and every reported span genuinely repeats") {
    val out = SparkEntry.queries("x148_longest_repeat")(
      spark, "/root/testdata/sf0.001").collect()
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0).split(" ", -1).toSeq)
    val maxLen = docs.map(_.length).max
    // brute force: descend from maxLen until some span occurs twice
    def hasRepeat(len: Int): Boolean = {
      val seen = scala.collection.mutable.HashSet.empty[String]
      docs.exists { w =>
        (0 to w.length - len).exists(p => !seen.add(w.slice(p, p + len)
          .mkString(" ")))
      }
    }
    val expected = (math.min(maxLen, 511) to 1 by -1)
      .find(hasRepeat).getOrElse(0)
    assert(out.nonEmpty && out.head.getAs[Long]("span_len") == expected.toLong)
    // occurrence counts are honest: recount the top span brute-force
    val top = out.head
    val L = top.getAs[Long]("span_len").toInt
    val counts = scala.collection.mutable.HashMap.empty[String, Long]
    docs.foreach { w =>
      (0 to w.length - L).foreach { p =>
        val k = w.slice(p, p + L).mkString(" ")
        counts(k) = counts.getOrElse(k, 0L) + 1L
      }
    }
    val md5of = (s: String) => java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val byHash = counts.map { case (k, v) => md5of(k) -> v }
    for (r <- out)
      assert(byHash(r.getAs[String]("span_hash")) == r.getAs[Long]("n_occ"))
    GraftCaches.releasePrior()
  }

  test("x166 planted: the answer is the longest CROSS-SOURCE span, not " +
    "the longest repeat — a 20-token within-source repeat loses to a " +
    "12-token span shared across sources") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x166plant")
    val shared12 = (1 to 12).map(i => s"s$i").mkString(" ")
    val rep20 = (1 to 20).map(i => s"r$i").mkString(" ")
    Seq(
      // source A repeats a 20-token run INTERNALLY (two docs) — x148
      // would report 20; x166 must not
      (0L, "A", rep20 + " x1 " + shared12),
      (1L, "A", rep20 + " y1 y2"),
      // source B carries the 12-token span once
      (2L, "B", "z1 z2 " + shared12 + " z3"),
      (3L, "B", "q1 q2 q3"))
      .toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("x166_cross_source_span")(spark, dir)
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("span_len") == 12L)
    assert(out.head.getAs[Long]("n_occ") == 2L)
    assert(out.head.getAs[Long]("n_docs") == 2L)
    assert(out.head.getAs[Long]("n_sources") == 2L)
    assert(!out.head.getAs[Boolean]("capped"))
    GraftCaches.releasePrior()
  }

  test("x166: span_len matches a brute-force longest-cross-source scan " +
    "of sf0.001, and every reported row's counts recount exactly") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("source", "split(text, ' ') AS w").collect()
      .map(r => (r.getString(0), r.getSeq[String](1).toArray))
    def crossAt(len: Int): Boolean = {
      val srcs = scala.collection.mutable.HashMap.empty[String, String]
      var found = false
      for ((src, w) <- rows if !found; p <- 0 to w.length - len if !found) {
        val k = w.slice(p, p + len).mkString(" ")
        srcs.get(k) match {
          case Some(s0) if s0 != src => found = true
          case Some(_) => ()
          case None => srcs(k) = src
        }
      }
      found
    }
    val maxLen = rows.map(_._2.length).max
    val expected = (math.min(maxLen, 511) to 1 by -1)
      .find(crossAt).getOrElse(0)
    val out = SparkEntry.queries("x166_cross_source_span")(
      spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty && out.head.getAs[Long]("span_len") == expected.toLong)
    val L = out.head.getAs[Long]("span_len").toInt
    // recount occurrences / docs / sources of every reported hash
    case class Acc(var occ: Long, docs: scala.collection.mutable.Set[Int],
      srcs: scala.collection.mutable.Set[String])
    val accs = scala.collection.mutable.HashMap.empty[String, Acc]
    for (((src, w), di) <- rows.zipWithIndex; p <- 0 to w.length - L) {
      val k = w.slice(p, p + L).mkString(" ")
      val a = accs.getOrElseUpdate(k,
        Acc(0L, scala.collection.mutable.Set.empty,
          scala.collection.mutable.Set.empty))
      a.occ += 1; a.docs += di; a.srcs += src
    }
    val md5of = (str: String) => java.security.MessageDigest
      .getInstance("MD5").digest(str.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    val byHash = accs.map { case (k, a) => md5of(k) -> a }
    for (r <- out) {
      val a = byHash(r.getAs[String]("span_hash"))
      assert(a.occ == r.getAs[Long]("n_occ"))
      assert(a.docs.size.toLong == r.getAs[Long]("n_docs"))
      assert(a.srcs.size.toLong == r.getAs[Long]("n_sources"))
      assert(a.srcs.size >= 2)
    }
    GraftCaches.releasePrior()
  }
}
