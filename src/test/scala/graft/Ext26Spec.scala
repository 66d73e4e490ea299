package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x100 t-closeness and x101 MRL truncation audit: exact replays against
  * local integer / double computation. */
class Ext26Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x100: equals the local total-variation replay (absent segments " +
    "contribute their full global mass)") {
    val rows = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val nTotal = rows.length.toLong
    val globBySeg = rows.groupBy(_._2).map { case (s, xs) => s -> xs.size.toLong }
    val want = rows.groupBy(_._1).toSeq.map { case (nk, xs) =>
      val nG = xs.size.toLong
      val per = xs.groupBy(_._2).map { case (s, ys) => s -> ys.size.toLong }
      // exact integer TV: sum over ALL segments of |cnt·N − gcnt·n_g|
      val num = globBySeg.map { case (s, gcnt) =>
        math.abs(per.getOrElse(s, 0L) * nTotal - gcnt * nG)
      }.sum
      val tvPpm = num * 1000000L / (2L * nG * nTotal)
      (nk, nG, tvPpm, tvPpm >= 200000L)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x100_t_closeness")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(t => t._3 >= 0 && t._3 <= 1000000))
  }

  test("x101: equals the local prefix-vs-full recall replay; truncation " +
    "loses some neighbors but not all") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cos6(a: Array[Double], b: Array[Double], d: Int): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- 0 until d) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      math.floor(dot / math.sqrt(na * nb) * 1e6) / 1e6
    }
    def top5(qid: Long, qv: Array[Double], d: Int): Set[Long] =
      vecs.filter(_._1 != qid)
        .map { case (id, v) => (-cos6(qv, v, d), id) }.sorted.take(5)
        .map(_._2).toSet
    val want = vecs.filter(_._1 % 100 == 0).sortBy(_._1).map { case (qid, qv) =>
      val hits = (top5(qid, qv, 64) & top5(qid, qv, 16)).size.toLong
      (qid, hits, hits * 1000L / 5L)
    }.toSeq
    val got = SparkEntry.queries("x101_mrl_truncation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    assert(got.map(_._2).sum > 0, "16-dim prefix should retain SOME recall")
  }
}
