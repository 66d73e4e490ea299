package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 12: local replays for the χ² and Benford audits. */
class Ext34Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x122: equals the contingency replay; all row/col pairs present") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val o = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rr = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val cc = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = docs.length.toLong
    val want = (for {
      (s0, r) <- rr.toSeq; (l, c) <- cc.toSeq
    } yield {
      val obs = o.getOrElse((s0, l), 0L)
      val diff = obs * n - r * c
      (s0, l, obs, r * c * 1000000L / n, diff * diff * 1000000L / (n * r * c))
    }).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x122_chi2_independence")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    assert(got.length == rr.size * cc.size, "O=0 cells must survive")
    // expected counts (×1e6) sum to the row margin per source, up to one
    // floor per cell
    got.groupBy(_._1).foreach { case (src, vs) =>
      val sumE = vs.map(_._4).sum
      val r = rr(src) * 1000000L
      assert(sumE <= r && sumE > r - vs.length, s"$src: $sumE vs $r")
    }
  }

  test("x123: equals the leading-digit replay; digits cover 1-9") {
    val prices = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val digits = prices.map(p => p.toLong.toString.head.asDigit.toLong)
    val counts = digits.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = digits.length.toLong
    val benford = Seq(301030L, 176091L, 124939L, 96910L, 79181L, 66947L,
      57992L, 51153L, 45757L)
    val want = (1L to 9L).map { d =>
      val nC = counts.getOrElse(d, 0L)
      val share = nC * 1000000L / t
      (d, nC, share, benford((d - 1).toInt),
        math.abs(share - benford((d - 1).toInt)))
    }
    val got = SparkEntry.queries("x123_benford_digits")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want)
    assert(benford.sum == 1000000L)
  }
}
