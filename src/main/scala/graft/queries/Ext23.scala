package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Round-5 relational round-out: the two classic TPC-H shapes still
  * missing from the q-family — Q14 (conditional-share aggregate over a
  * fact⨝dim join) and Q18 (group-filter semi join: large-volume orders).
  */
object Ext23 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q14 PROMO REVENUE SHARE: revenue through PROMO parts as a share of
    // all revenue — the conditional-aggregate-over-join shape. Decimal
    // sums keep both engines bit-equal; the share divides the two DOUBLE
    // casts and floor-truncates (never a decimal division, whose scale
    // rules differ across engines). One fact⨝dim hash join (part
    // broadcasts at any sane dim size), one partial-aggregable global
    // aggregate.
    "q14_promo_share" -> ((s, d) => {
      val rev = col("l_extendedprice").cast("decimal(18,2)") *
        (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)"))
      lineitem(s, d).select(col("l_partkey"), rev.as("rev"))
        .join(broadcast(part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(lit(BigDecimal(0)))).as("promo_dec"),
          sum(col("rev")).as("total_dec"))
        .select(
          col("promo_dec").cast("double").as("promo_revenue"),
          col("total_dec").cast("double").as("total_revenue"),
          (floor(col("promo_dec").cast("double") /
            col("total_dec").cast("double") * 100 * 1e6) / 1e6)
            .as("promo_share6"))
    }),

    // Q18 LARGE-VOLUME ORDERS: orders whose total quantity exceeds 300,
    // with customer attribution — the groupBy-HAVING-then-join shape.
    // The quantity rollup is partial-aggregable and the surviving order
    // set is tiny, so the customer/order attribute joins run AFTER the
    // filter (join inputs shrink first — the optimization Q18 exists to
    // test). Quantities are whole-number doubles ⇒ sums are exact in
    // any order; the output casts to BIGINT.
    "q18_large_orders" -> ((s, d) => {
      val big = lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 300)
      big.join(orders(s, d).select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(customer(s, d).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("o_custkey").as("custkey"),
          col("o_orderkey").as("orderkey"), col("o_orderdate").as("orderdate"),
          col("qty").cast("long").as("total_qty"))
        .orderBy(col("total_qty").desc, col("orderkey"))
    }))

  val oracleSql: Map[String, String] = Map(

    "q14_promo_share" ->
      """WITH j AS (SELECT CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |      AS rev, p_type
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (SELECT
        |    sum(CASE WHEN p_type = 'PROMO' THEN rev
        |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS promo_dec,
        |    sum(rev) AS total_dec FROM j)
        |SELECT CAST(promo_dec AS DOUBLE) AS promo_revenue,
        |  CAST(total_dec AS DOUBLE) AS total_revenue,
        |  floor(CAST(promo_dec AS DOUBLE) / CAST(total_dec AS DOUBLE)
        |    * 100 * 1e6) / 1e6 AS promo_share6
        |FROM a""".stripMargin,

    "q18_large_orders" ->
      """WITH big AS (SELECT l_orderkey, sum(l_quantity) AS qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 300)
        |SELECT c_name, o_custkey AS custkey, o_orderkey AS orderkey,
        |  o_orderdate AS orderdate, CAST(qty AS BIGINT) AS total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, orderkey""".stripMargin)
}
