package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x95 SymSpell spelling variants and x96 skew audit: exact replays
  * against brute-force local computation. */
class Ext24Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("x95: equals the BRUTE-FORCE edit-distance pair scan (delete " +
    "neighborhood is complete for distance <= 2)") {
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) >= 3)
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val vocab = freq.keys.toSeq.sorted
    val want = (for {
      i <- vocab.indices; j <- i + 1 until vocab.length
      w1 = vocab(i); w2 = vocab(j)
      d = lev(w1, w2) if d <= 2
    } yield {
      val (canon, varr) =
        if (freq(w1) >= freq(w2)) (w1, w2) else (w2, w1)
      (canon, varr, d, freq(canon), freq(varr))
    }).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x95_spelling_variants")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "fixture vocabulary should contain close pairs")
    assert(got.forall { case (c, v, d, fc, fv) =>
      d >= 1 && d <= 2 && fc >= fv && c != v })
  }

  test("x96: every statistic matches the hand computation") {
    val counts = spark.read.parquet(s"$sf/events.parquet")
      .groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    val cs = counts.map(_._2).sorted
    val nKeys = cs.length
    val nRows = cs.sum
    def rank(p: Double) = cs(math.max(1, math.ceil(p * nKeys).toInt) - 1)
    val top10 = counts.sortBy { case (k, c) => (-c, k) }.take(10).map(_._2).sum
    val r = SparkEntry.queries("x96_skew_audit")(spark, sf).head()
    assert(r.getLong(0) == nRows && r.getLong(1) == nKeys)
    assert(r.getLong(2) == cs.last)
    assert(r.getLong(3) == rank(0.5) && r.getLong(4) == rank(0.99))
    assert(r.getLong(5) == top10)
    assert(r.getLong(6) == top10 * 1000000L / nRows)
    assert(r.getLong(7) == cs.last * 100L / rank(0.5))
    assert(r.getLong(8) ==
      math.max(1L, (cs.last * 32L + nRows - 1L) / nRows))
  }
}
