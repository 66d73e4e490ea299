package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x170 TER: planted classic-tercom cases + a full pure-Scala replay
  * of the documented greedy bounded-shift algorithm (classic O(n·m)
  * Levenshtein instead of the bit-parallel fold, straight collections
  * instead of SQL arrays) over sf0.001 — the engine's packed keys,
  * caps, tie-breaks and round budget must reproduce it bit for bit. */
class Ext50Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.queries.Ext50.{TerRounds, TerLen, TerShiftDist, TerCands}

  // ---- the replay: ter_pair per the Ext50 object doc ----------------

  private def lev(a: IndexedSeq[String], b: IndexedSeq[String]): Long = {
    val m = b.length
    var prev = Array.tabulate(m + 1)(_.toLong)
    for (i <- 1 to a.length) {
      val cur = new Array[Long](m + 1)
      cur(0) = i.toLong
      for (j <- 1 to m)
        cur(j) = math.min(math.min(prev(j) + 1, cur(j - 1) + 1),
          prev(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      prev = cur
    }
    prev(m)
  }

  private def move[T](a: IndexedSeq[T], i: Int, l: Int,
      j: Int): IndexedSeq[T] = {
    val rest = a.take(i - 1) ++ a.drop(i - 1 + l)
    (rest.take(j - 1) ++ a.slice(i - 1, i - 1 + l) ++
      rest.drop(j - 1)).toIndexedSeq
  }

  /** (shifts, dist, converged, candCapped) for one pair. */
  private def terPair(hyp0: IndexedSeq[String],
      ref: IndexedSeq[String]): (Long, Long, Boolean, Boolean) = {
    var hyp = hyp0
    var d = lev(hyp, ref)
    var shifts = 0L
    var done = false
    var capped = false
    val m = ref.length
    for (_ <- 1 to TerRounds if !done) {
      val n = hyp.length
      val cands = for {
        l <- TerLen to 1 by -1
        rg = (1 to m - l + 1).map(k => ref.slice(k - 1, k - 1 + l)
          .mkString(" "))
        i <- 1 to n - l + 1
        g = hyp.slice(i - 1, i - 1 + l).mkString(" ")
        k = rg.indexOf(g) + 1 // 0 when absent
        j = math.min(k, n - l + 1)
        if k >= 1 && j != i && math.abs(i - j) <= TerShiftDist
      } yield (i, l, j)
      capped = capped || cands.length > TerCands
      val scored = cands.take(TerCands).map { case (i, l, j) =>
        ((lev(move(hyp, i, l, j), ref), i.toLong, (TerLen - l).toLong,
          j.toLong), (i, l, j))
      }
      val best = scored.sortBy(_._1).headOption
      best match {
        case Some(((sc, _, _, _), (i, l, j))) if sc < d =>
          hyp = move(hyp, i, l, j); d = sc; shifts += 1
        case _ => done = true
      }
    }
    (shifts, d, done, capped)
  }

  private def aggRows(docs: Seq[(Long, String, String)])
      : Seq[(String, Long, Long, Long, Long, Long, Long, Long, Long,
             Long, Long)] = {
    val cap = graft.queries.Ext47.LcsCap
    val byId = docs.map(d => d._1 -> d).toMap
    val per = for {
      (did, src, text) <- docs if did % 2 == 1
      r <- byId.get(did - 1)
    } yield {
      val hw = text.split(" ", -1).toIndexedSeq
      val rw = r._3.split(" ", -1).toIndexedSeq
      val (s, d, done, cc) = terPair(hw.take(cap), rw.take(cap))
      (src, s, d, math.min(hw.length, cap).toLong,
        math.min(rw.length, cap).toLong,
        hw.length > cap || rw.length > cap, cc, done)
    }
    per.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val np = xs.length.toLong
      val ss = xs.map(_._2).sum; val ds = xs.map(_._3).sum
      val cl = xs.map(_._4).sum; val rl = xs.map(_._5).sum
      val nc = xs.count(_._6).toLong
      val ncc = xs.count(_._7).toLong
      val nu = xs.count(!_._8).toLong
      val tsum = xs.map(x => (x._2 + x._3) * 1000000L /
        math.max(x._5, 1L)).sum
      (src, np, ss, ds, cl, rl, nc, ncc, nu,
        (ss + ds) * 1000000L / math.max(rl, 1L),
        tsum / math.max(np, 1L))
    }
  }

  private def runEngine(dir: String) =
    SparkEntry.queries("x170_ter")(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7),
        r.getLong(8), r.getLong(9), r.getLong(10))).toSeq

  test("x170 planted: the classic tercom cases — one block shift " +
    "repairs 'c d a b e', a single-token transposition costs one " +
    "shift, identity is free, disjoint text is pure edits") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x170")
    // one pair per source so the per-source rollup exposes each pair
    val docs = Seq(
      (0L, "a b c d e", "s1"), (1L, "c d a b e", "s1"), // 1 shift, d=0
      (2L, "a b", "s2"), (3L, "b a", "s2"),             // 1 shift, d=0
      (4L, "a b c", "s3"), (5L, "a b c", "s3"),         // identity
      (6L, "a b c", "s4"), (7L, "x y z", "s4"),         // no shift, d=3
      (8L, "the cat sat on the mat", "s5"),
      (9L, "the cat sat on mat the", "s5"))             // 1 shift, d=0
    docs.map(d => (d._1, d._3, d._2)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = runEngine(dir)
    val want = aggRows(docs.map(d => (d._1, d._3, d._2)))
    assert(got == want)
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("s1")._3 == 1L && bySrc("s1")._4 == 0L) // shifts, dist
    assert(bySrc("s2")._3 == 1L && bySrc("s2")._4 == 0L)
    assert(bySrc("s3")._3 == 0L && bySrc("s3")._4 == 0L)
    assert(bySrc("s4")._3 == 0L && bySrc("s4")._4 == 3L)
    assert(bySrc("s5")._3 == 1L && bySrc("s5")._4 == 0L)
    assert(bySrc("s1")._10 == 200000L) // 1 edit / 5 ref tokens, ppm
    GraftCaches.releasePrior()
  }

  test("x170 planted loud paths: a token repeated past the candidate " +
    "cap flags n_cand_capped; a many-block scramble exhausts the " +
    "round budget and flags n_unconverged") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x170b")
    // 60×"a" vs "a a a a r1..r56": every l∈1..4 block matches the ref
    // prefix gram (200 candidates > TerCands), but moving a block of
    // a's inside an all-a hyp is a no-op — sc never improves, so the
    // pair converges round 1 with the cap flag up and zero shifts
    // (python-validated against tools-era ter_ref before trusting)
    val rep = Seq.fill(60)("a").mkString(" ")
    val repRef = "a a a a " + (1 to 56).map(i => s"r$i").mkString(" ")
    // scramble needing > TerRounds single-token shifts
    val refS = (1 to 12).map(i => s"w$i").mkString(" ")
    val hypS = Seq(2, 1, 4, 3, 6, 5, 8, 7, 10, 9, 12, 11)
      .map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (0L, repRef, "cap"), (1L, rep, "cap"),
      (2L, refS, "rounds"), (3L, hypS, "rounds"))
    docs.map(d => (d._1, d._3, d._2)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = runEngine(dir)
    val want = aggRows(docs.map(d => (d._1, d._3, d._2)))
    assert(got == want)
    val bySrc = got.map(r => r._1 -> r).toMap
    assert(bySrc("cap")._8 == 1L, s"expected cand-capped: ${bySrc("cap")}")
    assert(bySrc("cap")._3 == 0L && bySrc("cap")._4 == 56L) // no-op moves
    assert(bySrc("rounds")._9 == 1L,
      s"expected unconverged: ${bySrc("rounds")}")
    assert(bySrc("rounds")._3 == TerRounds.toLong) // all rounds shifted
    GraftCaches.releasePrior()
  }

  test("x170: equals the pure-Scala replay on sf0.001, every source, " +
    "every column (shifts, dists, caps, convergence, both ppm forms)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    val want = aggRows(docs)
    val got = runEngine(sf)
    assert(got == want)
    // the corpus must actually exercise the machinery
    assert(got.map(_._3).sum > 100L, "expected many shifts on sf0.001")
    assert(got.map(_._9).sum > 0L, "expected some unconverged pairs")
    GraftCaches.releasePrior()
  }

  test("x170 seeded scramble property: engine equals the replay on a " +
    "dense-transposition corpus (8-token vocab => many equal grams, " +
    "candidate caps and packed tie-breaks under real pressure)") {
    import spark.implicits._
    val rnd = new scala.util.Random(170)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docs = (0 until 24).flatMap { p =>
      val n = 12 + rnd.nextInt(30)
      val ref = IndexedSeq.fill(n)(vocab(rnd.nextInt(vocab.size)))
      // hyp = ref with 1..4 random block moves and 0..2 substitutions
      var hyp = ref
      for (_ <- 0 until 1 + rnd.nextInt(4)) {
        val l = 1 + rnd.nextInt(math.min(4, hyp.length))
        val i = 1 + rnd.nextInt(hyp.length - l + 1)
        val j = 1 + rnd.nextInt(hyp.length - l + 1)
        if (i != j) hyp = move(hyp, i, l, j)
      }
      for (_ <- 0 until rnd.nextInt(3)) {
        val k = rnd.nextInt(hyp.length)
        hyp = hyp.updated(k, vocab(rnd.nextInt(vocab.size)))
      }
      val src = s"s${p % 5}"
      Seq((2L * p, src, ref.mkString(" ")), (2L * p + 1, src, hyp.mkString(" ")))
    }
    val dir = TestSpark.scratchDir("x170prop")
    docs.map(d => (d._1, d._2, d._3)).toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = runEngine(dir)
    val want = aggRows(docs)
    assert(got == want)
    // the corpus must actually stress the machinery
    assert(got.map(_._3).sum > 10L, s"too few shifts: $got")
    assert(got.map(_._8).sum > 0L, s"no cand-capped pair: $got")
    GraftCaches.releasePrior()
  }

  test("x170 packed-key headroom: the caps keep every field inside " +
    "its bit window (i, j < 2^12; lv < 2^4; sc < 2^11 at the token " +
    "cap), so BIGINT min IS the documented tie-break") {
    assert(TerLen <= 15, "lv must fit 4 bits")
    assert(graft.queries.Ext47.LcsCap < 4096, "i/j must fit 12 bits")
    assert(2L * graft.queries.Ext47.LcsCap < (1L << 28) / 4096 / 16,
      "sc field must not collide with i")
    assert(TerCands >= 1 && TerRounds >= 1 && TerShiftDist >= 1)
  }
}
