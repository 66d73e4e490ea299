package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q14 promo share and q18 large orders: exact replays against local
  * BigDecimal / integer arithmetic. */
class Ext23Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q14_promo_share: equals the BigDecimal replay") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val promoParts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey"), col("p_type"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    def dec(d: Double): BigDecimal =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP)
    var promo = BigDecimal(0); var total = BigDecimal(0)
    for ((pk, price, disc) <- li) {
      val rev = dec(price) * (BigDecimal(1) - dec(disc))
      total += rev
      if (promoParts(pk) == "PROMO") promo += rev
    }
    val r = SparkEntry.queries("q14_promo_share")(spark, sf).collect()(0)
    assert(r.getDouble(0) == promo.toDouble)
    assert(r.getDouble(1) == total.toDouble)
    assert(r.getDouble(2) ==
      math.floor(promo.toDouble / total.toDouble * 100 * 1e6) / 1e6)
    assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 100.0)
  }

  test("q18_large_orders: equals the threshold replay; sorted by volume") {
    val qty = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
      .groupBy(_._1).map { case (k, v) => (k, v.map(_._2).sum) }
    val ords = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = qty.filter(_._2 > 300)
      .map { case (ok, q) => (ords(ok), ok, q.toLong) }
      .toSeq.sortBy { case (_, ok, q) => (-q, ok) }
    val got = SparkEntry.queries("q18_large_orders")(spark, sf)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._3 > 300))
  }
}
