package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q15/q16/q17/q22: exact local replays (BigDecimal where money is
  * summed) of the late-round TPC-H shapes. Timestamps are collected as
  * epoch micros (unix_micros of the cast) — the queries' own convention —
  * so the replay is independent of the column's NTZ/LTZ physical form. */
class RelationalQ2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def dec2(d: Double): BigDecimal =
    BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)

  test("q15: supplier(s) at the windowed revenue max, BigDecimal-exact") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_suppkey"),
        unix_micros(col("l_shipdate").cast("timestamp")).as("us"),
        col("l_extendedprice"), col("l_discount"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        dec2(r.getDouble(2)) * (BigDecimal(1) - dec2(r.getDouble(3)))))
    val rev = rows
      .filter(t => t._2 >= 820454400000000L && t._2 <= 828316799999999L)
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._3).sum }
    val mx = rev.values.max
    val want = rev.filter(_._2 == mx).keys.toSeq.sorted.map(k => (k, mx.toDouble))
    val got = SparkEntry.queries("q15_top_supplier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("q17: small-quantity predicate multiplied through matches the " +
    "BigDecimal replay") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getLong(0), dec2(r.getDouble(1)), dec2(r.getDouble(2))))
    val stats = rows.groupBy(_._1).map { case (k, xs) =>
      k -> (xs.map(_._2).sum, xs.size) }
    val small = rows.filter { case (k, q, _) =>
      val (sq, n) = stats(k); q * 5 * n < sq }
    val r = SparkEntry.queries("q17_small_quantity")(spark, sf).collect()(0)
    assert(r.getLong(0) == small.size.toLong)
    assert(r.getDouble(1) == small.map(_._3).sum.toDouble)
    assert(r.getLong(0) > 0)
  }

  test("q22: dormancy needs BOTH legs — above-average balance AND no " +
    "recent order; nation rollup is complete") {
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1), dec2(r.getDouble(2))))
    val pos = cust.map(_._3).filter(_ > 0)
    val (sp, np) = (pos.sum, pos.size)
    val recent = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("us"))
      .collect()
      .filter(_.getLong(1) >= 978307200000000L)
      .map(_.getLong(0)).toSet
    val dormant = cust.filter(c => c._3 * np > sp && !recent(c._1))
    val want = dormant.groupBy(_._2).toSeq.map { case (nk, xs) =>
      (nk, xs.size.toLong, xs.map(_._3).sum.toDouble) }.sortBy(_._1)
    val got = SparkEntry.queries("q22_dormant_customers")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // and the legs are each individually non-vacuous on this corpus
    assert(dormant.size < cust.count(c => c._3 * np > sp))
  }
}
