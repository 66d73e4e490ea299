package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x157 split-conformal coverage / x158 Spearman: independent pure-Scala
  * replays at sf0.001 plus planted corpora with closed-form answers
  * (exact conformal k / q / coverage arithmetic; rho = ±1e6 for the
  * perfectly ordered and perfectly reversed signal pairs — the reversed
  * case divides exactly, so the two-step floor is invisible there).
  */
class Ext48Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def toks(t: String): Seq[String] = t.split(" ", -1).toSeq

  test("x157: equals the pure-Scala conformal replay on sf0.001, and " +
    "empirical coverage sits at-or-just-above the 90% target " +
    "(exchangeability bound)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def alpha(t: String): Long =
      toks(t).length.toLong * 1000000L / math.max(t.length.toLong, 1L)
    val cal = docs.filter(_._1 % 2 == 0).map(d => alpha(d._2)).sorted
    val tst = docs.filter(_._1 % 2 == 1).map(d => alpha(d._2))
    val k = (9L * (cal.length + 1L) + 9L) / 10L
    val q = if (k <= cal.length) cal(k.toInt - 1) else Long.MaxValue
    val covered = tst.count(_ <= q).toLong
    val r = SparkEntry.queries("x157_conformal_coverage")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n_cal") == cal.length.toLong)
    assert(r.getAs[Long]("k") == k)
    assert(r.getAs[Long]("q_alpha_ppm") == q)
    assert(r.getAs[Long]("n_test") == tst.length.toLong)
    assert(r.getAs[Long]("n_covered") == covered)
    val cov = r.getAs[Long]("coverage_ppm")
    assert(cov == covered * 1000000L / math.max(tst.length.toLong, 1L))
    // split-conformal guarantee: E[coverage] >= 0.9; a single split can
    // fluctuate, so pin a generous-but-meaningful corridor
    assert(cov >= 850000L && cov <= 1000000L, s"coverage $cov")
    GraftCaches.releasePrior()
  }

  test("x157 planted: k = ceil(0.9(n+1)) in exact integers picks the " +
    "9th of 9 calibration scores; an over-dense test doc is uncovered") {
    import spark.implicits._
    // calibration (even ids): one token of length L = 2..10 -> alpha =
    // 1e6 div L, so q = k-th smallest = alpha(L=2) = 500000 when k = 9
    val cal = (2 to 10).zipWithIndex.map { case (l, i) =>
      (2L * i, "d" * l) }
    // test (odd ids): "b" (alpha 1e6, uncovered), "cc" (500000, covered
    // at the boundary), "eeee" (250000, covered)
    val tst = Seq((1L, "b"), (3L, "cc"), (5L, "eeee"))
    val dir = TestSpark.scratchDir("x157")
    (cal ++ tst).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("x157_conformal_coverage")(spark, dir)
      .collect().head
    assert(r.getAs[Long]("n_cal") == 9L)
    assert(r.getAs[Long]("k") == 9L)     // (9*10+9) div 10
    assert(r.getAs[Long]("q_alpha_ppm") == 500000L)
    assert(r.getAs[Long]("n_test") == 3L)
    assert(r.getAs[Long]("n_covered") == 2L)
    assert(r.getAs[Long]("coverage_ppm") == 666666L)
    GraftCaches.releasePrior()
  }

  test("x158: equals the pure-Scala rank replay on sf0.001 (row_number " +
    "ties broken by doc_id — the documented convention)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val s1 = docs.map { case (id, t) => (id, t.length.toLong) }
    val s2 = docs.map { case (id, t) =>
      val w = toks(t)
      (id, w.distinct.length.toLong * 1000000L / math.max(w.length.toLong, 1L))
    }
    def ranks(xs: Array[(Long, Long)]): Map[Long, Long] =
      xs.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val r1 = ranks(s1); val r2 = ranks(s2)
    val n = docs.length.toLong
    val sumD2 = docs.map { case (id, _) =>
      val d = r1(id) - r2(id); d * d }.sum
    val rho = 1000000L - ((6L * sumD2 / n) * 1000000L / (n * n - 1L))
    val r = SparkEntry.queries("x158_spearman")(spark, sf).collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("sum_d2") == sumD2)
    assert(r.getAs[Long]("rho_ppm") == rho)
    GraftCaches.releasePrior()
  }

  test("x159: equals the brute-force O(n^2) discordant-pair count on " +
    "sf0.001 (the engine counts inversions via bit-level prefix sums — " +
    "never a pair join), and agrees in sign with x158's Spearman on " +
    "the same signal pair") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val s1 = docs.map { case (id, t) => (id, t.length.toLong) }
    val s2 = docs.map { case (id, t) =>
      val w = toks(t)
      (id, w.distinct.length.toLong * 1000000L / math.max(w.length.toLong, 1L))
    }
    def ranks(xs: Array[(Long, Long)]): Map[Long, Long] =
      xs.sortBy { case (id, v) => (v, id) }.zipWithIndex
        .map { case ((id, _), i) => id -> i.toLong }.toMap
    val px = ranks(s1); val y = ranks(s2)
    val ids = docs.map(_._1)
    var inv = 0L
    for (i <- ids; j <- ids if px(i) < px(j) && y(i) > y(j)) inv += 1
    val n = ids.length.toLong
    // one-step floor (the engine's exact spelling; the x158-style
    // two-step would skew up to 1e6/(n-1) ppm here)
    val tau = 1000000L - (4L * inv * 1000000L / (n * (n - 1L)))
    val r = SparkEntry.queries("x159_kendall_tau")(spark, sf).collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_inversions") == inv)
    assert(r.getAs[Long]("tau_ppm") == tau)
    val rho = SparkEntry.queries("x158_spearman")(spark, sf)
      .collect().head.getAs[Long]("rho_ppm")
    assert((tau >= 0L) == (rho >= 0L),
      s"Kendall ($tau) and Spearman ($rho) disagree in sign")
    GraftCaches.releasePrior()
  }

  test("x159 planted: the reversed permutation counts every pair as an " +
    "inversion (C(n,2), tau = -1e6 exactly) and the agreeing pair " +
    "counts none (tau = 1e6)") {
    import spark.implicits._
    // reuse the x158 planted corpora shapes: agreeing via tie-break,
    // reversed via constant length + decreasing distinct count
    val dirA = TestSpark.scratchDir("x159a")
    (1 to 10).map(i => (i.toLong, (1 to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val a = SparkEntry.queries("x159_kendall_tau")(spark, dirA)
      .collect().head
    assert(a.getAs[Long]("n_inversions") == 0L)
    assert(a.getAs[Long]("tau_ppm") == 1000000L)
    val dirB = TestSpark.scratchDir("x159b")
    (1 to 10).map { i =>
      val toks12 = (1 to (12 - i)).map(j => f"w$j%02d") ++
        Seq.fill(i)("w01")
      (i.toLong, toks12.mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val b = SparkEntry.queries("x159_kendall_tau")(spark, dirB)
      .collect().head
    assert(b.getAs[Long]("n_inversions") == 45L) // C(10,2)
    // 1e6 - 4*45*1e6 div 90 = 1e6 - 2e6 = -1e6 exactly
    assert(b.getAs[Long]("tau_ppm") == -1000000L)
    GraftCaches.releasePrior()
  }

  test("x159 levels: tauLevelsFor is the exact bit length of n-1 " +
    "(the round-9 fix — a fixed constant is silently wrong past " +
    "2^levels rows)") {
    import graft.queries.Ext48.tauLevelsFor
    assert(tauLevelsFor(0L) == 1 && tauLevelsFor(1L) == 1)
    assert(tauLevelsFor(2L) == 1)        // y0 in {0,1}: one bit
    assert(tauLevelsFor(3L) == 2 && tauLevelsFor(4L) == 2)
    assert(tauLevelsFor(5L) == 3)
    assert(tauLevelsFor(1L << 24) == 24) // the old constant's boundary
    assert(tauLevelsFor((1L << 24) + 1L) == 25)
    assert(tauLevelsFor((1L << 40) + 7L) == 41)
  }

  test("x159 levels boundary: at n = 2^17 + 3 the adaptive 18-level " +
    "kernel counts the reversed permutation's C(n,2) inversions " +
    "EXACTLY, while forcing the old fixed-constant style one level " +
    "short undercounts — the derivation is load-bearing") {
    import graft.queries.Ext48
    val n = (1L << 17) + 3L
    val ranked = spark.range(n)
      .select((col("id") + 1L).as("px"), (lit(n) - 1L - col("id")).as("y0"))
    val want = n * (n - 1L) / 2L
    val good = Ext48.tauKernel(spark, ranked, Ext48.tauLevelsFor(n))
      .collect().head
    assert(good.getAs[Long]("n") == n)
    assert(good.getAs[Long]("n_inversions") == want)
    // negative control: 17 levels drop every pair whose y-ranks first
    // differ at bit 17 — the silent-wrong mode the count() fix removes
    val short = Ext48.tauKernel(spark, ranked, 17).collect().head
    assert(short.getAs[Long]("n_inversions") < want,
      "17 levels should undercount at n > 2^17")
    GraftCaches.releasePrior()
  }

  test("x158 planted: monotone-agreeing signals (via the doc_id " +
    "tie-break) give rho = 1e6 exactly; a perfectly reversed pair " +
    "gives rho = -1e6 exactly (sum_d2 = n(n^2-1)/3 divides out)") {
    import spark.implicits._
    val dirA = TestSpark.scratchDir("x158a")
    // s1 strictly increasing (length), s2 constant (all-distinct tokens)
    // -> s2 ties broken by doc_id -> r2 = r1
    (1 to 10).map(i => (i.toLong, (1 to i).map(j => s"w$j").mkString(" ")))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirA/documents.parquet")
    val a = SparkEntry.queries("x158_spearman")(spark, dirA).collect().head
    assert(a.getAs[Long]("sum_d2") == 0L)
    assert(a.getAs[Long]("rho_ppm") == 1000000L)
    // reversed: constant length (12 three-char tokens), distinct count
    // 12 - i strictly decreasing in doc order
    val dirB = TestSpark.scratchDir("x158b")
    (1 to 10).map { i =>
      val toks12 = (1 to (12 - i)).map(j => f"w$j%02d") ++
        Seq.fill(i)("w01")
      (i.toLong, toks12.mkString(" "))
    }.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dirB/documents.parquet")
    val b = SparkEntry.queries("x158_spearman")(spark, dirB).collect().head
    assert(b.getAs[Long]("sum_d2") == 330L) // n(n^2-1)/3, n = 10
    assert(b.getAs[Long]("rho_ppm") == -1000000L)
    GraftCaches.releasePrior()
  }
}
