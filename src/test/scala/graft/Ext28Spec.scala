package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x106/x107: exact local replays of the cluster-quality eval and the
  * temperature token-budget apportionment. */
class Ext28Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x106: purity and Rand index equal the exhaustive local replay") {
    import graft.ext.IvfCentroids.{K, c}
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Double](2).toArray))
    def cellOf(v: Array[Double]): Int = {
      val d = (0 until K).map(k => (0 until v.length).foldLeft(0.0)((a, i) =>
        a + v(i) * c(k)(i)))
      (0 until K).find(k => (k + 1 until K).forall(j => d(k) >= d(j))).get
    }
    val ct = rows.groupBy(r => (cellOf(r._3), r._2))
      .map { case ((cell, lab), xs) => (cell, lab, xs.size.toLong) }.toSeq
    def c2(n: Long) = n * (n - 1) / 2
    val nn = ct.map(_._3).sum
    val tp = ct.map(t => c2(t._3)).sum
    val rowsP = ct.groupBy(_._1).values.map(xs => c2(xs.map(_._3).sum)).sum
    val colsP = ct.groupBy(_._2).values.map(xs => c2(xs.map(_._3).sum)).sum
    val randPpm = (c2(nn) - rowsP - colsP + 2 * tp) * 1000000L / c2(nn)
    val want = ct.groupBy(_._1).toSeq.map { case (cell, xs) =>
      val n = xs.map(_._3).sum
      val (lab, topN) = xs.map(t => (t._2, t._3))
        .minBy { case (l, cnt) => (-cnt, l) }
      (cell, n, lab, topN, topN * 1000000L / n, randPpm)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x106_cluster_purity")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.size == K)
    // Rand of a non-degenerate partition pair sits strictly inside (0,1e6)
    assert(got.head._6 > 0 && got.head._6 < 1000000L)
  }

  test("x107: allocation is exact (sums to the budget), proportional to " +
    "floor(sqrt(tokens)), and flags data-constrained sources") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val w = toks.map { case (s, t) => (s, t, math.floor(math.sqrt(t.toDouble)).toLong) }
    val wtot = w.map(_._3).sum
    val base = w.map { case (s, t, r) =>
      (s, t, r, 1000000L * r / wtot, (1000000L * r) % wtot) }.toSeq
    val leftover = 1000000L - base.map(_._4).sum
    val bump = base.sortBy(t => (-t._5, t._1)).take(leftover.toInt)
      .map(_._1).toSet
    val want = base.map { case (s, t, r, b, _) =>
      val alloc = b + (if (bump(s)) 1L else 0L)
      (s, t, r, alloc, alloc * 1000000L / t)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x107_token_budget")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.map(_._4).sum == 1000000L, "largest-remainder must be exact")
    // 500 docs × ~tens of tokens ≪ 1e6 budget: every source repeats data
    assert(got.forall(_._5 > 1000000L))
  }
}
