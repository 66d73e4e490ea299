package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x154 ROUGE-L / x155 chrF: full independent replays at sf0.001 (the
  * LCS replay is the CLASSIC O(n·m) dynamic program — deliberately a
  * third spelling, so the engine's bit-parallel Allison–Dix fold and
  * the oracle's list_reduce twin are both checked against textbook
  * code), plus planted corpora for the hand-checkable boundary cases
  * (known LCS, long-pair exactness under the round-9 k-limb lift with the
  * 992-token cost guard surfacing, clipping, the absent-row semantics
  * for n-gram orders longer than every candidate), plus a random
  * multi-limb stress vs classic DP at 1..16 limb widths.
  */
class Ext47Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Classic DP LCS over token sequences — the textbook recurrence. */
  private def lcsDP(a: Seq[String], b: Seq[String]): Long = {
    val m = Array.ofDim[Int](a.length + 1, b.length + 1)
    for (i <- 1 to a.length; j <- 1 to b.length)
      m(i)(j) =
        if (a(i - 1) == b(j - 1)) m(i - 1)(j - 1) + 1
        else math.max(m(i - 1)(j), m(i)(j - 1))
    m(a.length)(b.length).toLong
  }

  /** Engine tokenizer twin: Spark split(text, " ") = Java split limit -1
    * (keeps empties; "" tokenizes to [""]). */
  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  test("x154: equals the classic-DP LCS replay per source on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    case class P(source: String, nc: Long, m: Long, cap: Boolean, lcs: Long)
    val pairs = docs.filter(_._1 % 2 == 1).flatMap {
      case (id, src, ctext) =>
        byId.get(id - 1).map { case (_, _, rtext) =>
          val cAll = toks(ctext); val rAll = toks(rtext)
          val cap = graft.queries.Ext47.LcsCap
          val cw = cAll.take(cap); val rw = rAll.take(cap)
          P(src, cw.length.toLong, rw.length.toLong,
            cAll.length > cap || rAll.length > cap, lcsDP(cw, rw))
        }
    }
    val expected = pairs.groupBy(_.source).map { case (src, ps) =>
      val lcs = ps.map(_.lcs).sum
      val cl = ps.map(_.nc).sum; val rl = ps.map(_.m).sum
      val fSum = ps.map(p => 2L * p.lcs * 1000000L / math.max(p.nc + p.m, 1L)).sum
      (src, ps.length.toLong, lcs, cl, rl, ps.count(_.cap).toLong,
        lcs * 1000000L / math.max(cl, 1L),
        lcs * 1000000L / math.max(rl, 1L),
        2L * lcs * 1000000L / math.max(cl + rl, 1L),
        fSum / math.max(ps.length.toLong, 1L))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x154_rouge_l")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._3).sum > 0L) // non-degenerate corpus
    GraftCaches.releasePrior()
  }

  test("x154 planted: known LCS on a hand-checkable pair; a 150-token " +
    "pair is now EXACT (the round-9 k-limb lift — the old two-limb " +
    "window capped it); a 600-token pair with 6 planted substitutions " +
    "has LCS = 594 exactly; only a 1000-token pair exceeds the " +
    "992-token cost guard and reports n_capped = 1 (the truncation " +
    "stays SURFACED, x148's capped lesson)") {
    import spark.implicits._
    val run150 = (1 to 150).map(i => s"t$i").mkString(" ")
    val ref600 = (1 to 600).map(i => s"t$i")
    val subs = Set(50, 150, 250, 350, 450, 550)
    val cand600 = ref600.zipWithIndex.map { case (t, i) =>
      if (subs(i + 1)) s"zz$i" else t }
    val run1000 = (1 to 1000).map(i => s"t$i").mkString(" ")
    val dir = TestSpark.scratchDir("x154")
    Seq(
      (0L, "the cat sat on the mat", "s1"),
      (1L, "the dog sat on a mat", "s1"),
      (2L, run150, "s2"),
      (3L, run150, "s2"),
      (4L, ref600.mkString(" "), "s3"),
      (5L, cand600.mkString(" "), "s3"),
      (6L, run1000, "s4"),
      (7L, run1000, "s4"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x154_rouge_l")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8),
          r.getLong(9))).toMap
    // s1: LCS(the dog sat on a mat | the cat sat on the mat) =
    // [the, sat, on, mat] = 4 over 6+6 tokens
    assert(rows("s1") == (1L, 4L, 6L, 6L, 0L,
      4000000L / 6L, 4000000L / 6L, 8000000L / 12L, 8000000L / 12L))
    // s2: 150 identical tokens, exact — 3 limbs, no cap
    assert(rows("s2") == (1L, 150L, 150L, 150L, 0L,
      1000000L, 1000000L, 1000000L, 1000000L))
    // s3: 600 tokens, 6 substitutions → LCS = 594 (10 limbs);
    // 594e6/600 = 990000 exactly
    assert(rows("s3") == (1L, 594L, 600L, 600L, 0L,
      990000L, 990000L, 990000L, 990000L))
    // s4: only past 992 does the cost guard bind, and it SAYS so
    assert(rows("s4") == (1L, 992L, 992L, 992L, 1L,
      1000000L, 1000000L, 1000000L, 1000000L))
    GraftCaches.releasePrior()
  }

  /** Classic O(nm) Levenshtein — the textbook row recurrence. */
  private def levDP(a: Seq[String], b: Seq[String]): Long = {
    var prev = (0 to b.length).toArray
    for (i <- 1 to a.length) {
      val cur = new Array[Int](b.length + 1); cur(0) = i
      for (j <- 1 to b.length)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(b.length).toLong
  }

  test("x156: equals the classic-DP Levenshtein replay per source on " +
    "sf0.001 (the engine's Myers bitvector fold and the oracle's " +
    "list_reduce twin are both generated from one step builder; this " +
    "is the independent third spelling)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    case class P(source: String, nc: Long, m: Long, cap: Boolean, dist: Long)
    val pairs = docs.filter(_._1 % 2 == 1).flatMap {
      case (id, src, ctext) =>
        byId.get(id - 1).map { case (_, _, rtext) =>
          val cAll = toks(ctext); val rAll = toks(rtext)
          val cap = graft.queries.Ext47.LcsCap
          val cw = cAll.take(cap); val rw = rAll.take(cap)
          P(src, cw.length.toLong, rw.length.toLong,
            cAll.length > cap || rAll.length > cap, levDP(cw, rw))
        }
    }
    val expected = pairs.groupBy(_.source).map { case (src, ps) =>
      val ds = ps.map(_.dist).sum
      val cl = ps.map(_.nc).sum; val rl = ps.map(_.m).sum
      val wSum = ps.map(p => p.dist * 1000000L / math.max(p.m, 1L)).sum
      (src, ps.length.toLong, ds, cl, rl, ps.count(_.cap).toLong,
        ds * 1000000L / math.max(rl, 1L),
        wSum / math.max(ps.length.toLong, 1L))
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x156_wer")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._3).sum > 0L)
    GraftCaches.releasePrior()
  }

  test("x156 planted: hand-checkable distances — a 1-substitution pair, " +
    "an insertion-only pair, a disjoint pair (dist = max len), a " +
    "150-token identical pair (now EXACT under the k-limb lift), a " +
    "600-token pair with 6 substitutions (dist = 6 exactly), and a " +
    "1000-token pair that hits the 992 cost guard with n_capped = 1") {
    import spark.implicits._
    val run150 = (1 to 150).map(i => s"t$i").mkString(" ")
    val ref600 = (1 to 600).map(i => s"t$i")
    val subs = Set(50, 150, 250, 350, 450, 550)
    val cand600 = ref600.zipWithIndex.map { case (t, i) =>
      if (subs(i + 1)) s"zz$i" else t }
    val run1000 = (1 to 1000).map(i => s"t$i").mkString(" ")
    val dir = TestSpark.scratchDir("x156")
    Seq(
      (0L, "the cat sat", "s1"), (1L, "the hat sat", "s1"),      // 1 sub
      (2L, "a b c", "s2"), (3L, "a b c d e", "s2"),              // 2 ins
      (4L, "x y z", "s3"), (5L, "p q r s", "s3"),                // disjoint
      (6L, run150, "s4"), (7L, run150, "s4"),                    // 3 limbs
      (8L, ref600.mkString(" "), "s5"),
      (9L, cand600.mkString(" "), "s5"),                         // 10 limbs
      (10L, run1000, "s6"), (11L, run1000, "s6"))                // capped
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x156_wer")(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    assert(rows("s1") == (1L, 1L, 3L, 3L, 0L,
      1000000L / 3L, 1000000L / 3L))
    assert(rows("s2") == (1L, 2L, 5L, 3L, 0L,
      2000000L / 3L, 2000000L / 3L))
    // disjoint 4-token cand vs 3-token ref: 3 subs + 1 ins = 4;
    // macro wer = 4/3 > 1 — WER's convention survives the ppm floor
    assert(rows("s3") == (1L, 4L, 4L, 3L, 0L,
      4000000L / 3L, 4000000L / 3L))
    assert(rows("s4") == (1L, 0L, 150L, 150L, 0L, 0L, 0L))
    // 6 substitutions across 600 tokens: 6e6/600 = 10000 ppm exactly
    assert(rows("s5") == (1L, 6L, 600L, 600L, 0L, 10000L, 10000L))
    assert(rows("s6") == (1L, 0L, 992L, 992L, 1L, 0L, 0L))
    GraftCaches.releasePrior()
  }

  test("x154/x156 k-limb stress: engine equals classic DP on random " +
    "pairs spanning 1..12 limbs (limb-boundary lengths 62/63/124/125 " +
    "included) — the cross-limb carry, <<1 seam and top-limb live " +
    "masks are exercised at every width") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260815L)
    val lens = Seq(1, 5, 62, 63, 124, 125, 200, 311, 500, 700, 992)
    val pairs = (0 until 16).map { i =>
      val m = lens(rnd.nextInt(lens.length))
      val n = lens(rnd.nextInt(lens.length))
      val v = 1 + rnd.nextInt(40)
      val cw = Seq.fill(n)(s"w${rnd.nextInt(v)}")
      val rw = Seq.fill(m)(s"w${rnd.nextInt(v)}")
      (i, cw, rw)
    }
    val dir = TestSpark.scratchDir("x4756stress")
    pairs.flatMap { case (i, cw, rw) => Seq(
      (2L * i, rw.mkString(" "), f"p$i%02d"),
      (2L * i + 1, cw.mkString(" "), f"p$i%02d"))
    }.toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val gotL = SparkEntry.queries("x154_rouge_l")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    val gotW = SparkEntry.queries("x156_wer")(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    for ((i, cw, rw) <- pairs) {
      val key = f"p$i%02d"
      assert(gotL(key) == lcsDP(cw, rw), s"$key lcs (|c|=${cw.length}, |r|=${rw.length})")
      assert(gotW(key) == levDP(cw, rw), s"$key dist (|c|=${cw.length}, |r|=${rw.length})")
    }
    GraftCaches.releasePrior()
  }

  test("x154/x156 plan pins: the whole per-pair DP is Project-resident " +
    "— no Generate, no cartesian, and exactly ONE shuffle exchange " +
    "(the |sources|-bounded rollup) before the presentation sort") {
    for (q <- Seq("x154_rouge_l", "x156_wer")) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
      assert(!p.contains("Generate"), s"$q: the fold must not explode:\n$p")
      val shuffles = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(shuffles <= 1, s"$q: $shuffles hash exchanges (want <= 1):\n$p")
      GraftCaches.releasePrior()
    }
  }

  test("x155 plan pin: gram generation is partition-local (Generates " +
    "sit below the aggregates, no pre-explode exchange) and no " +
    "cartesian anywhere") {
    val df = SparkEntry.queries("x155_chrf")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"), s"cartesian:\n$p")
    assert(p.contains("Generate"), "explode expected in x155")
    GraftCaches.releasePrior()
  }

  /** chrF replay twin: char n-gram multiset of the space-stripped text. */
  private def charGrams(t: String, n: Int): Map[String, Long] = {
    val s = t.replace(" ", "")
    (0 to s.length - n).map(i => s.substring(i, i + n))
      .groupBy(identity).map { case (g, o) => g -> o.length.toLong }
  }

  test("x155: equals the char-n-gram multiset-clipping replay per " +
    "(source, n) on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    val perPair = docs.filter(_._1 % 2 == 1).flatMap {
      case (id, src, ctext) =>
        byId.get(id - 1).toSeq.flatMap { case (_, _, rtext) =>
          (1 to 6).map { n =>
            val cg = charGrams(ctext, n); val rg = charGrams(rtext, n)
            val clip = cg.map { case (g, c) =>
              math.min(c, rg.getOrElse(g, 0L)) }.sum
            (src, n.toLong, clip, cg.values.sum, rg.values.sum)
          }
        }
    }
    val expected = perPair.groupBy(p => (p._1, p._2)).toSeq
      .map { case ((src, n), ps) =>
        val clip = ps.map(_._3).sum
        val tc = ps.map(_._4).sum; val tr = ps.map(_._5).sum
        val p = clip * 1000000L / math.max(tc, 1L)
        val r = clip * 1000000L / math.max(tr, 1L)
        (src, n, clip, tc, tr, p, r,
          5L * p * r / math.max(4L * p + r, 1L))
      }
      // engine rows exist only where the CANDIDATE side has grams
      .filter(_._4 > 0L)
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x155_chrf")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.map(_._3).sum > 0L)
    GraftCaches.releasePrior()
  }

  test("x155 packed-key variant: 48-bit BIGINT gram keys are exact and " +
    "reversible on ASCII text — source-level outputs equal the catalog " +
    "string-key form row for row on sf0.001") {
    val cat = SparkEntry.queries("x155_chrf")(spark, sf).collect()
      .map(_.toSeq).toSeq
    val packed = graft.queries.Ext47
      .chrF(spark, sf, joinClip = true, packKeys = true).collect()
      .map(_.toSeq).toSeq
    assert(packed == cat)
    GraftCaches.releasePrior()
  }

  test("x155 catalog native grams (GraftCharGrams, adopted r10) equal " +
    "the original HOF pyramid row for row on sf0.001, and on a planted " +
    "multibyte corpus (codepoint slicing, not byte slicing)") {
    val native = SparkEntry.queries("x155_chrf")(spark, sf).collect()
      .map(_.toSeq).toSeq
    val hof = graft.queries.Ext47
      .chrF(spark, sf, joinClip = true).collect()
      .map(_.toSeq).toSeq
    assert(native == hof)
    // multibyte: 2-byte (ā), 3-byte (€) and 4-byte (𝄞) codepoints — a
    // byte-sliced gram would split sequences and never match the HOF
    import spark.implicits._
    val dir = TestSpark.scratchDir("x155native")
    Seq((0L, "ā€𝄞ab", "m"), (1L, "ab ā€𝄞", "m"),
        (2L, "", "m"), (3L, "xyā", "m"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val native2 = SparkEntry.queries("x155_chrf")(spark, dir).collect()
      .map(_.toSeq).toSeq
    val hof2 = graft.queries.Ext47
      .chrF(spark, dir, joinClip = true).collect()
      .map(_.toSeq).toSeq
    assert(native2 == hof2 && hof2.nonEmpty)
    GraftCaches.releasePrior()
  }

  test("x155 packed-key variant FAILS LOUDLY off an ASCII corpus " +
    "(round-10 guard): a codepoint past 255 would alias distinct grams, " +
    "so the variant raises instead of emitting silently-wrong outputs") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x155ascii")
    Seq((0L, "abc", "m"), (1L, "abāb", "m")) // U+0101 ā > 255
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ex = intercept[Exception] {
      graft.queries.Ext47
        .chrF(spark, dir, joinClip = true, packKeys = true).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("ASCII")),
      s"expected the packed-key ASCII guard to fire, got: $ex")
    // the same corpus is fine for the catalog string-key form
    val cat = SparkEntry.queries("x155_chrf")(spark, dir).collect()
    assert(cat.nonEmpty)
    GraftCaches.releasePrior()
  }

  test("x155 planted: multiset clipping credits repeats per occurrence, " +
    "and n-gram orders longer than every candidate produce NO row " +
    "(cand 'abab' = 4 chars → rows for n = 1..4 only)") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x155")
    Seq((0L, "abc", "m"), (1L, "ab ab", "m"))
      .toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x155_chrf")(spark, dir).collect()
      .map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L))
    // n=1: cand a,b,a,b vs ref a,b,c — clipped = min(2,1)+min(2,1) = 2,
    // NOT the set overlap 2-of-2: the clip caps the cand's repeats at
    // the ref count (500000 ppm precision, not 1000000)
    val p1 = 2L * 1000000L / 4L; val r1 = 2L * 1000000L / 3L
    assert(rows(1L) == (2L, 4L, 3L, p1, r1,
      5L * p1 * r1 / (4L * p1 + r1)))
    // n=2: cand ab,ba,ab vs ref ab,bc — clipped min(2,1) = 1
    val p2 = 1L * 1000000L / 3L; val r2 = 1L * 1000000L / 2L
    assert(rows(2L) == (1L, 3L, 2L, p2, r2,
      5L * p2 * r2 / (4L * p2 + r2)))
    // n=3: no shared gram (aba,bab vs abc); n=4: ref has NO 4-gram —
    // total_ref = 0, everything 0 (the guarded divisors)
    assert(rows(3L) == (0L, 2L, 1L, 0L, 0L, 0L))
    assert(rows(4L) == (0L, 1L, 0L, 0L, 0L, 0L))
    GraftCaches.releasePrior()
  }
}
