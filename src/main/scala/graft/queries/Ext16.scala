package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Round-5 batch 8: percent-of-total in the SCALE-SAFE spelling (w28) —
  * the naive `sum() over ()` window funnels every row through ONE task;
  * the catalog spelling aggregates first and broadcasts the one-row total
  * back, and keeps the share integer (per-mille via multiply-div). */
object Ext16 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // W28 SHARE OF TOTAL: each nation's revenue share in per-mille. The
    // anti-pattern this entry exists to displace: `sum(rev) OVER ()` — an
    // unpartitioned window that sorts/funnels the whole frame into one
    // task (the same "No Partition Defined" class w1 eliminated). Here
    // both aggregation levels are partial-aggregable, the grand total is
    // a broadcast 1-row frame, and the share is exact integer arithmetic.
    "w28_share_of_total" -> ((s, d) => {
      val rev = orders(s, d)
        .join(customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(nation(s, d), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(floor(col("o_totalprice") * 100.0).cast("long"))
          .as("cents"))
      val total = rev.agg(sum(col("cents")).as("total_cents"))
      rev.crossJoin(broadcast(total))
        .select(col("n_name"), col("cents"),
          expr("cents * 1000 div total_cents").as("share_pm"))
        .orderBy(col("n_name"))
    }))

  val oracleSql: Map[String, String] = Map(

    "w28_share_of_total" ->
      """WITH rev AS (SELECT n_name,
        |    CAST(sum(CAST(floor(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
        |      AS cents
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total_cents FROM rev)
        |SELECT n_name, cents, cents * 1000 // total_cents AS share_pm
        |FROM rev, t ORDER BY n_name""".stripMargin)
}
