package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x160 Kendall tau-b: O(n²) brute-force replay on sf0.001 (counts
  * C/D/tie classes pair by pair — the textbook definition, independent
  * of the engine's Knight decomposition and bit-level inversion
  * kernel), planted tie corpora with hand-checkable answers, the exact
  * BigInt isqrt pinned at 2^100 scale, and the three-way sign
  * agreement with x158 Spearman / x159 tau-a on the same signal pair.
  * Plus the round-9 siblings: x162 Heaps-law vocabulary growth
  * (prefix-distinct replay + a 5-doc colliding-checkpoint plant) and
  * x163 exact Wasserstein-1 drift (CDF-gap-integral replay + planted
  * pure-shift / identical / one-empty-side corpora).
  */
class Ext49Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  /** Textbook tau-b over raw signal pairs: classify every pair. */
  private def bruteTauB(sig: Seq[(Long, Long)])
      : (Long, Long, Long, Long, Long, BigInt, BigInt, BigInt) = {
    val n = sig.length
    var c = 0L; var d = 0L
    for (i <- 0 until n; j <- i + 1 until n) {
      val p = BigInt(sig(i)._1 - sig(j)._1) * BigInt(sig(i)._2 - sig(j)._2)
      if (p > 0) c += 1 else if (p < 0) d += 1
    }
    def ties[K](key: ((Long, Long)) => K): Long =
      sig.groupBy(key).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
    val t1 = ties(_._1); val t2 = ties(_._2); val t3 = ties(identity)
    val n0 = BigInt(n) * (n - 1) / 2
    val cmd = BigInt(c) - d
    val r = graft.queries.Ext49.isqrt((n0 - t1) * (n0 - t2))
    val rr = r.max(1)
    val tau = if (cmd < 0) -((-cmd) * 1000000 / rr) else cmd * 1000000 / rr
    (n.toLong, t1, t2, t3, d, cmd, r, tau)
  }

  test("x160 isqrt: exact floor sqrt in BigInt — perfect squares, " +
    "off-by-one neighbours, and 2^100-scale values (the oracle's " +
    "HUGEINT Newton twin is pinned against the same floors)") {
    import graft.queries.Ext49.isqrt
    assert(isqrt(BigInt(0)) == BigInt(0) && isqrt(BigInt(1)) == BigInt(1))
    assert(isqrt(BigInt(3)) == BigInt(1) && isqrt(BigInt(4)) == BigInt(2))
    for (v <- Seq(BigInt(81), BigInt(82), BigInt(80),
        BigInt(10).pow(28), BigInt(10).pow(28) + 1,
        BigInt(2).pow(100), BigInt(2).pow(100) + 12345,
        (BigInt(2).pow(50) - 1).pow(2), (BigInt(2).pow(50) - 1).pow(2) - 1)) {
      val r = isqrt(v)
      assert(r * r <= v && (r + 1) * (r + 1) > v, s"isqrt($v) = $r")
    }
  }

  test("x160: equals the O(n^2) brute-force tau-b on sf0.001 (raw TIED " +
    "signals — the engine's five-scalar Knight decomposition plus the " +
    "bit-level discordance kernel against the textbook pair count)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val sig = docs.sortBy(_._1).map { case (_, t) =>
      val w = toks(t)
      (t.length.toLong,
        w.distinct.length.toLong * 1000000L / math.max(w.length.toLong, 1L))
    }.toSeq
    val (n, t1, t2, t3, d, cmd, r, tau) = bruteTauB(sig)
    assert(t1 > 0L || t2 > 0L,
      "corpus has no ties — the tau-b case would be vacuous")
    val row = SparkEntry.queries("x160_kendall_tau_b")(spark, sf)
      .collect().head
    assert(row.getAs[Long]("n") == n)
    assert(row.getAs[Long]("t1") == t1)
    assert(row.getAs[Long]("t2") == t2)
    assert(row.getAs[Long]("t3") == t3)
    assert(row.getAs[Long]("n_discordant") == d)
    assert(row.getAs[Long]("c_minus_d") == cmd.toLong)
    assert(row.getAs[Long]("denom_isqrt") == r.toLong)
    assert(row.getAs[Long]("tau_b_ppm") == tau.toLong)
    GraftCaches.releasePrior()
  }

  test("x160 planted: perfect agreement WITH ties scores exactly 1e6 " +
    "(tau-a over tie-broken ranks could not — the doc_id tie-break " +
    "manufactures discordance tau-b excludes); a reversal scores " +
    "-1e6; an all-tied x signal yields a 0/0 guard of 0") {
    import spark.implicits._
    // agreement with ties: 4 blocks of 3 identical docs; s1 and s2 move
    // together block-to-block (s2 = distinct ratio needs token crafting:
    // block b has length AND distinct-ratio increasing in b)
    val dirA = TestSpark.scratchDir("x160a")
    val blocks = Seq(
      "a a a a a a a a",         // len 15, 1/8 distinct
      "b bb b bb b bb bb bb",    // len 20, 2/9
      "c cc ccc c cc ccc ccc ccc ccc", // len 29, 3/9
      "d dd ddd dddd dd ddd dddd dddd dddd dddd") // len 39, 4/10
    (0 until 12).map(i => (i.toLong, blocks(i / 3)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val a = SparkEntry.queries("x160_kendall_tau_b")(spark, dirA)
      .collect().head
    // 4 blocks of 3: T1 = T2 = T3 = 4*C(3,2) = 12; D = 0;
    // C = pairs across blocks = C(12,2) - 12 = 54; denom = n0 - T1 = 54
    assert(a.getAs[Long]("t1") == 12L && a.getAs[Long]("t2") == 12L)
    assert(a.getAs[Long]("t3") == 12L)
    assert(a.getAs[Long]("n_discordant") == 0L)
    assert(a.getAs[Long]("c_minus_d") == 54L)
    assert(a.getAs[Long]("denom_isqrt") == 54L)
    assert(a.getAs[Long]("tau_b_ppm") == 1000000L)
    // reversal: 8 tokens per block, distinct count 4−b (ratio strictly
    // decreasing), token width b+2 (length strictly increasing)
    val dirB = TestSpark.scratchDir("x160b")
    val blocksRev = (0 until 4).map { b =>
      val c = ('a' + b).toChar
      val distinctToks = (0 until (4 - b)).map(i => c.toString * (b + 1) + i)
      (distinctToks ++ Seq.fill(8 - (4 - b))(distinctToks.head))
        .mkString(" ")
    }
    (0 until 12).map(i => (i.toLong, blocksRev(i / 3)))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val bSig = blocksRev.map { t =>
      val w = toks(t)
      (t.length.toLong,
        w.distinct.length.toLong * 1000000L / w.length.toLong)
    }
    assert(bSig.map(_._1) == bSig.map(_._1).sorted &&
      bSig.map(_._2) == bSig.map(_._2).sorted.reverse &&
      bSig.map(_._1).distinct.length == 4 &&
      bSig.map(_._2).distinct.length == 4,
      s"planted reversal corpus broke: $bSig")
    val b = SparkEntry.queries("x160_kendall_tau_b")(spark, dirB)
      .collect().head
    assert(b.getAs[Long]("n_discordant") == 54L)
    assert(b.getAs[Long]("c_minus_d") == -54L)
    assert(b.getAs[Long]("tau_b_ppm") == -1000000L)
    // degenerate: every doc identical — n0 = T1 = T2, denominator 0
    val dirC = TestSpark.scratchDir("x160c")
    (0 until 6).map(i => (i.toLong, "same text here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
    val cRow = SparkEntry.queries("x160_kendall_tau_b")(spark, dirC)
      .collect().head
    assert(cRow.getAs[Long]("denom_isqrt") == 0L)
    assert(cRow.getAs[Long]("tau_b_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("x162: equals the prefix-distinct replay on sf0.001 — exact " +
    "vocabulary growth at the 10 doc-rank checkpoints, and the curve " +
    "is concave-ish (new-vocab rate never grows by the Heaps " +
    "expectation on natural-ish text)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq
    val n = docs.length
    val want = (1 to 10).map { c =>
      val tc = (c * n) / 10
      val ts = docs.take(tc).flatMap(d => toks(d._2))
      (c.toLong, tc.toLong, ts.length.toLong, ts.distinct.length.toLong)
    }.toSeq
    val got = SparkEntry.queries("x162_heaps_vocab")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(got.last._4 > 0L && got.last._3 >= got.last._4)
    GraftCaches.releasePrior()
  }

  test("x162 planted: n = 5 (checkpoints collide below 10 docs — the " +
    "(c·n) div 10 thresholds repeat and early ones are empty), gapped " +
    "doc_ids, one doc all-new tokens, one all-repeats") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x162")
    Seq(
      (3L, "a b c"),        // rank 1: 3 new
      (7L, "a a a"),        // rank 2: all repeats
      (10L, "d"),           // rank 3: 1 new
      (95L, "a d e f"),     // rank 4: 2 new
      (99L, ""))            // rank 5: the empty token, new
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x162_heaps_vocab")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // thresholds for n=5: t_c = (c*5) div 10 = 0,1,1,2,2,3,3,4,4,5
    val want = Seq(
      (1L, 0L, 0L, 0L), (2L, 1L, 3L, 3L), (3L, 1L, 3L, 3L),
      (4L, 2L, 6L, 3L), (5L, 2L, 6L, 3L), (6L, 3L, 7L, 4L),
      (7L, 3L, 7L, 4L), (8L, 4L, 11L, 6L), (9L, 4L, 11L, 6L),
      (10L, 5L, 12L, 7L))
    assert(got == want)
    GraftCaches.releasePrior()
  }

  test("x163: equals the exact CDF-gap-integral replay on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val a = docs.filter(_._1 % 2 == 0).map(d => toks(d._2).length.toLong)
    val b = docs.filter(_._1 % 2 == 1).map(d => toks(d._2).length.toLong)
    val na = a.length.toLong; val nb = b.length.toLong
    val vals = (a ++ b).distinct.sorted
    var w1s = 0L
    for (i <- 0 until vals.length - 1) {
      val v = vals(i); val nxt = vals(i + 1)
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      w1s += math.abs(ca * nb - cb * na) * (nxt - v)
    }
    val ppm = if (na == 0 || nb == 0) 0L else w1s * 1000000L / (na * nb)
    val r = SparkEntry.queries("x163_wasserstein_drift")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("w1_scaled") == w1s)
    assert(r.getAs[Long]("w1_ppm") == ppm)
    GraftCaches.releasePrior()
  }

  test("x163 planted: a pure 4-token shift between the splits scores " +
    "w1_ppm = 4e6 exactly (W1 in signal units); identical splits " +
    "score 0; a single-doc corpus (one empty side) guards to 0") {
    import spark.implicits._
    val dirA = TestSpark.scratchDir("x163a")
    ((0 until 100 by 2).map(i => (i.toLong, Seq.fill(5)("w").mkString(" "))) ++
      (1 until 100 by 2).map(i => (i.toLong, Seq.fill(9)("w").mkString(" "))))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val a = SparkEntry.queries("x163_wasserstein_drift")(spark, dirA)
      .collect().head
    assert(a.getAs[Long]("w1_ppm") == 4000000L)
    val dirB = TestSpark.scratchDir("x163b")
    (0 until 40).map(i => (i.toLong, Seq.fill(1 + i / 2 % 7)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val b = SparkEntry.queries("x163_wasserstein_drift")(spark, dirB)
      .collect().head
    assert(b.getAs[Long]("w1_scaled") == 0L && b.getAs[Long]("w1_ppm") == 0L)
    val dirC = TestSpark.scratchDir("x163c")
    Seq((0L, "just one doc")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
    val c = SparkEntry.queries("x163_wasserstein_drift")(spark, dirC)
      .collect().head
    assert(c.getAs[Long]("n_b") == 0L && c.getAs[Long]("w1_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("x164: equals the brute-force pair count (2 per A>B pair, 1 per " +
    "tie) on sf0.001") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val a = docs.filter(_._1 % 2 == 0).map(d => toks(d._2).length.toLong)
    val b = docs.filter(_._1 % 2 == 1).map(d => toks(d._2).length.toLong)
    val u2 = (for (x <- a; y <- b) yield
      if (x > y) 2L else if (x == y) 1L else 0L).sum
    val na = a.length.toLong; val nb = b.length.toLong
    val ppm =
      if (na == 0 || nb == 0) 0L else u2 * 1000000L / (na * nb) - 1000000L
    val r = SparkEntry.queries("x164_mann_whitney")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("u2") == u2)
    assert(r.getAs[Long]("rank_biserial_ppm") == ppm)
    GraftCaches.releasePrior()
  }

  test("x164 planted: total dominance scores +1e6, total anti-dominance " +
    "-1e6, all-tied splits 0 exactly (u2 = n_a*n_b)") {
    import spark.implicits._
    val dirA = TestSpark.scratchDir("x164a")
    // evens 9 tokens, odds 3 tokens -> A > B always -> u2 = 2*na*nb
    ((0 until 20 by 2).map(i => (i.toLong, Seq.fill(9)("w").mkString(" "))) ++
      (1 until 20 by 2).map(i => (i.toLong, Seq.fill(3)("w").mkString(" "))))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val a = SparkEntry.queries("x164_mann_whitney")(spark, dirA)
      .collect().head
    assert(a.getAs[Long]("u2") == 200L)
    assert(a.getAs[Long]("rank_biserial_ppm") == 1000000L)
    val dirB = TestSpark.scratchDir("x164b")
    ((0 until 20 by 2).map(i => (i.toLong, Seq.fill(3)("w").mkString(" "))) ++
      (1 until 20 by 2).map(i => (i.toLong, Seq.fill(9)("w").mkString(" "))))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val b = SparkEntry.queries("x164_mann_whitney")(spark, dirB)
      .collect().head
    assert(b.getAs[Long]("u2") == 0L)
    assert(b.getAs[Long]("rank_biserial_ppm") == -1000000L)
    val dirC = TestSpark.scratchDir("x164c")
    (0 until 20).map(i => (i.toLong, "w w w w"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirC/documents.parquet")
    val c = SparkEntry.queries("x164_mann_whitney")(spark, dirC)
      .collect().head
    assert(c.getAs[Long]("u2") == 100L)  // every pair a tie: 1 each
    assert(c.getAs[Long]("rank_biserial_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("x165: equals the histogram-L1 replay on sf0.001; planted " +
    "disjoint supports score 1e6 exactly and identical splits 0") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val a = docs.filter(_._1 % 2 == 0).map(d => toks(d._2).length.toLong)
    val b = docs.filter(_._1 % 2 == 1).map(d => toks(d._2).length.toLong)
    val na = a.length.toLong; val nb = b.length.toLong
    val l1 = (a ++ b).distinct.map(v =>
      math.abs(a.count(_ == v) * nb - b.count(_ == v) * na)).sum
    val ppm = if (na == 0 || nb == 0) 0L else l1 * 1000000L / (2L * na * nb)
    val r = SparkEntry.queries("x165_total_variation")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("l1_scaled") == l1)
    assert(r.getAs[Long]("tv_ppm") == ppm)
    // planted: evens 5 tokens, odds 9 -> disjoint supports -> TV = 1
    val dirA = TestSpark.scratchDir("x165a")
    ((0 until 20 by 2).map(i => (i.toLong, Seq.fill(5)("w").mkString(" "))) ++
      (1 until 20 by 2).map(i => (i.toLong, Seq.fill(9)("w").mkString(" "))))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    assert(SparkEntry.queries("x165_total_variation")(spark, dirA)
      .collect().head.getAs[Long]("tv_ppm") == 1000000L)
    val dirB = TestSpark.scratchDir("x165b")
    (0 until 40).map(i => (i.toLong, Seq.fill(1 + i / 2 % 7)("w").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    assert(SparkEntry.queries("x165_total_variation")(spark, dirB)
      .collect().head.getAs[Long]("tv_ppm") == 0L)
    GraftCaches.releasePrior()
  }

  test("drift-family plan pins: x163/x164/x165 are PERSIST-FREE since " +
    "round 15 (the histogram is exchange-topped, so AQE stage reuse " +
    "dedupes its consumers at runtime — BENCH_AB_r15_r11persists.json " +
    "reversed the r9 persist) and have no CartesianProduct") {
    for (q <- Seq("x163_wasserstein_drift", "x164_mann_whitney",
        "x165_total_variation")) {
      val df = SparkEntry.queries(q)(spark, sf)
      val p = df.queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"$q: cartesian:\n$p")
      val cacheScans = "InMemoryTableScan".r.findAllIn(p).size
      assert(cacheScans == 0,
        s"$q: the r15 persist-free drift form must not cache — a persist " +
          s"here was measured as a pure materialization barrier, saw " +
          s"$cacheScans cache scans:\n$p")
      GraftCaches.releasePrior()
    }
  }

  test("x167: equals the full bigram-LM min-k replay on sf0.001 (sorted " +
    "bottom-quintile means, exact ppm)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val bigrams = docs.map { case (id, t) =>
      val w = toks(t); id -> w.zip(w.drop(1)) }.filter(_._2.nonEmpty)
    val all = bigrams.flatMap(_._2)
    val c2 = all.groupBy(identity).map { case (k, o) => k -> o.length.toLong }
    val c1 = all.groupBy(_._1).map { case (k, o) => k -> o.length.toLong }
    val want = bigrams.sortBy(_._1).map { case (id, bs) =>
      val sc = bs.map(b => c2(b) * 1000000L / c1(b._1)).sorted
      val n = sc.length.toLong; val k = (n + 4L) / 5L
      val mink = sc.take(k.toInt).sum / math.max(k, 1L)
      (id, n, k, mink, mink >= 50000L)
    }
    val got = SparkEntry.queries("x167_min_k_prob")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    GraftCaches.releasePrior()
  }

  test("x167 planted: a 10x-duplicated document with deterministic " +
    "transitions scores mink_ppm = 1e6 and flags; a doc whose left " +
    "token fans out across 40 successors scores 25000 and does not " +
    "(the low-probability tail natural text keeps)") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x167")
    val memo = (1 to 20).map(i => s"m$i").mkString(" ")
    val dup = (0 until 10).map(i => (i.toLong, memo))
    val fan = (0 until 40).map(i => (100L + i, s"h w$i"))
    (dup ++ fan).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("x167_min_k_prob")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(3), r.getBoolean(4))).toMap
    for (i <- 0L until 10L) {
      assert(rows(i) == ((1000000L, true)), s"dup doc $i: ${rows(i)}")
    }
    for (i <- 100L until 140L) {
      assert(rows(i) == ((25000L, false)), s"fan doc $i: ${rows(i)}")
    }
    GraftCaches.releasePrior()
  }

  test("x168: equals the quantized-centroid replay on sf0.001 (exact " +
    "integer l2/dot/norms and the isqrt-floored cosine)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .selectExpr("vec_id", "CAST(embedding AS array<double>) AS v")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    def q(v: Array[Double]): Array[Long] =
      v.map(x => math.floor((x + 1.0) * 1000.0).toLong)
    val a = vecs.filter(_._1 % 2 == 0).map(p => q(p._2))
    val b = vecs.filter(_._1 % 2 == 1).map(p => q(p._2))
    val na = a.length.toLong; val nb = b.length.toLong
    def centroid(vs: Array[Array[Long]], n: Long): Array[Long] =
      (0 until 64).map(d =>
        vs.map(_(d)).sum / math.max(n, 1L)).toArray
    val ma = centroid(a, na); val mb = centroid(b, nb)
    val l2 = ma.zip(mb).map { case (x, y) => (x - y) * (x - y) }.sum
    val dot = ma.zip(mb).map { case (x, y) => x * y }.sum
    val nasq = ma.map(x => x * x).sum; val nbsq = mb.map(x => x * x).sum
    val rr = graft.queries.Ext49.isqrt(BigInt(nasq) * BigInt(nbsq))
    val cos = (BigInt(dot) * 1000000 / rr.max(1)).toLong
    val r = SparkEntry.queries("x168_centroid_drift")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_a") == na && r.getAs[Long]("n_b") == nb)
    assert(r.getAs[Long]("l2_sq") == l2)
    assert(r.getAs[Long]("dot") == dot)
    assert(r.getAs[Long]("norm_a_sq") == nasq)
    assert(r.getAs[Long]("norm_b_sq") == nbsq)
    assert(r.getAs[Long]("cos_ppm") == cos)
    GraftCaches.releasePrior()
  }

  test("x168 planted: identical splits score cos = 1e6 with l2 = 0; " +
    "axis-orthogonal splits score cos = 0 with l2 = 2*1999^2") {
    import spark.implicits._
    val dirA = TestSpark.scratchDir("x168a")
    val vec = (0 until 64).map(d => if (d == 0) 0.9995f else -1.0f).toArray
    (0 until 10).map(i => (i.toLong, vec, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirA/embeddings.parquet")
    val a = SparkEntry.queries("x168_centroid_drift")(spark, dirA)
      .collect().head
    assert(a.getAs[Long]("l2_sq") == 0L)
    assert(a.getAs[Long]("cos_ppm") == 1000000L)
    val dirB = TestSpark.scratchDir("x168b")
    val e0 = (0 until 64).map(d => if (d == 0) 0.9995f else -1.0f).toArray
    val e1 = (0 until 64).map(d => if (d == 1) 0.9995f else -1.0f).toArray
    (0 until 10).map(i =>
      (i.toLong, if (i % 2 == 0) e0 else e1, 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dirB/embeddings.parquet")
    val b = SparkEntry.queries("x168_centroid_drift")(spark, dirB)
      .collect().head
    // q(e0) = [1999, 0...], q(e1) = [0, 1999, 0...] — exact axes
    assert(b.getAs[Long]("dot") == 0L)
    assert(b.getAs[Long]("cos_ppm") == 0L)
    assert(b.getAs[Long]("l2_sq") == 2L * 1999L * 1999L)
    GraftCaches.releasePrior()
  }

  test("x160 exactness bound is LOUD (round-10 guard): the documented " +
    "~3e9-row BIGINT bound rejects with a message instead of letting " +
    "the tie-term partial sums wrap silently; the bound itself is " +
    "exactly floor(sqrt(Long.MaxValue))") {
    import graft.queries.Ext49
    // the constant IS the floor sqrt: c*(c-1) < c^2 <= Long.Max at the
    // bound, and the next integer's square overflows
    assert(BigInt(Ext49.MaxTauBRows).pow(2) <= BigInt(Long.MaxValue))
    assert(BigInt(Ext49.MaxTauBRows + 1).pow(2) > BigInt(Long.MaxValue))
    Ext49.requireTauBExact(0L)
    Ext49.requireTauBExact(Ext49.MaxTauBRows) // boundary accepts
    val ex = intercept[IllegalArgumentException] {
      Ext49.requireTauBExact(Ext49.MaxTauBRows + 1)
    }
    assert(ex.getMessage.contains("BIGINT-exact bound"),
      s"wrong loud-path message: ${ex.getMessage}")
  }

  test("x160 sign agreement: tau-b, tau-a (x159) and Spearman (x158) " +
    "agree in sign on the sf0.001 signal pair") {
    val taub = SparkEntry.queries("x160_kendall_tau_b")(spark, sf)
      .collect().head.getAs[Long]("tau_b_ppm")
    val taua = SparkEntry.queries("x159_kendall_tau")(spark, sf)
      .collect().head.getAs[Long]("tau_ppm")
    val rho = SparkEntry.queries("x158_spearman")(spark, sf)
      .collect().head.getAs[Long]("rho_ppm")
    assert((taub >= 0L) == (taua >= 0L) && (taua >= 0L) == (rho >= 0L),
      s"sign disagreement: tau-b $taub, tau-a $taua, rho $rho")
    GraftCaches.releasePrior()
  }
}
