package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-5 batch 5: session_window batch semantics (boundary-exact),
  * conditional aggregation, HLL union property, 1-NN eval. */
class Ext13Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext13").toString

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, tus, uid, et, v) =>
      (id, new Timestamp(tus / 1000), uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("w25_session_window: exactly-24h gaps merge; 24h+1ms breaks") {
    // Spark's boundary rule (pinned here AND spelled `> gap` in the
    // oracle): an event at exactly gap distance still merges
    val day = 86400000000L
    val ms = 1000L
    val t0 = 1700000000000000L
    val d = eventsDir(Seq(
      (0L, t0, 1L, "a", 1.0),
      (1L, t0 + day, 1L, "a", 2.0),           // exactly 24h → same session
      (2L, t0 + 2 * day + ms, 1L, "a", 4.0))) // 24h + 1ms → new session
    val out = SparkEntry.queries("w25_session_window")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, t0, t0 + 2 * day, 2L, 3000L),
      (1L, t0 + 2 * day + ms, t0 + 3 * day + ms, 1L, 4000L)))
  }

  test("q12_priority_mix: CASE sums split the joined rows exactly") {
    import spark.implicits._
    val d = tmpDir()
    Seq((1L, 10L, "1-URGENT"), (2L, 10L, "5-LOW"))
      .map { case (ok, ck, p) => (ok, ck, "O", 0.0, "1995-01-01", p) }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    Seq((1L, 1L, 1L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"),
      (1L, 2L, 2L, 2, 1.0, 1.0, 0.0, 0.0, "N", "F", "1995-01-01"),
      (2L, 3L, 3L, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("q12_priority_mix")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(("F", 1L, 0L), ("O", 1L, 1L)))
  }

  test("x69_hll_union: union of per-type sketches equals the direct sketch") {
    val sf = "/root/testdata/sf0.001"
    val e = graft.tables.Tables.events(spark, sf)
    val out = SparkEntry.queries("x69_hll_union")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val direct = e.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .collect()(0).getLong(0)
    assert(out("ALL") == direct, "merged sketches == one-pass sketch")
    val exact = e.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(math.abs(out("ALL") - exact).toDouble / exact <= 0.05,
      s"estimate ${out("ALL")} vs exact $exact")
    // per-type estimates are each bounded by the union estimate's scope
    out.filterNot(_._1 == "ALL").values.foreach(v => assert(v <= direct))
  }

  test("x70_knn_eval: nearest neighbor predicts the planted labels") {
    import spark.implicits._
    val d = tmpDir()
    // two tight clusters on orthogonal axes; id 0 and 50 are the queries
    // (vec_id % 50 == 0) and sit inside cluster A and B respectively
    val a = Seq(0L, 1L, 2L).map(i => (i, Array(1.0f, 0.0f, 0.01f * i), 7))
    val b = Seq(50L, 51L, 52L).map(i => (i, Array(0.0f, 1.0f, 0.01f * (i - 50)), 9))
    (a ++ b).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("x70_knn_eval")(spark, d)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(out.toSeq === Seq((7, 7, 1L), (9, 9, 1L)))
  }
}
