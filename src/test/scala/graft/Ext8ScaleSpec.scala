package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-4 window/event operators: 200k synthetic
  * events across 1k users and 32 partitions. Not an oracle (sf tables
  * cover that) — these pin the INVARIANTS that must survive any scale:
  * row conservation, per-group bounds, and zero-anomaly steadiness.
  */
class Ext8ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = TestSpark.scratchDir("graft-e8scale")
    val t0 = 1700000000000000L
    spark.range(200000)
      .select(col("id").as("event_id"),
        timestamp_micros(lit(t0) + col("id") * 30000000L).as("ts"), // 30s apart
        (col("id") % 1000).as("user_id"),
        element_at(typedLit(Seq("view", "click", "purchase")),
          (col("id") % 3).cast("int") + 1).as("event_type"),
        ((col("id") % 97).cast("double") / 10.0).as("value"),
        lit("{}").as("props"))
      .repartition(32)
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("w15 resample: every user's grid spans min..max hour exactly") {
    val out = SparkEntry.queries("w15_resample_ffill")(spark, dir).collect()
    assert(out.length === 1000)
    // 200k events × 30 s / 1000 users → each user's span is ~6000 s / 3600
    // rounded to hour boundaries; grid size = n_hours, gaps = n_filled <
    // n_hours, and no user loses its grid entirely
    assert(out.forall(r => r.getLong(1) >= 1 && r.getLong(2) < r.getLong(1)))
  }

  test("w16 cumulative distinct: monotone per user, capped by 3 types") {
    val out = SparkEntry.queries("w16_cumulative_distinct")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byUser = out.groupBy(_._1)
    assert(byUser.size === 1000)
    for ((_, rows) <- byUser) {
      val cums = rows.sortBy(_._2).map(_._3)
      assert(cums.zip(cums.tail).forall { case (a, b) => a <= b }, "not monotone")
      assert(cums.last <= 3, "more distinct types than exist")
    }
  }

  test("w20 anomaly: modular-ramp stream has bounded flags, none for constants") {
    val out = SparkEntry.queries("w20_trailing_anomaly")(spark, dir).collect()
    assert(out.length === 1000)
    // value = (id % 97)/10 per user steps by +10·30s pattern — mostly
    // smooth ramps with one wrap per 97: flags must stay rare (< 20% of
    // tested events)
    val tested = out.map(_.getLong(1)).sum
    val flagged = out.map(_.getLong(2)).sum
    assert(tested > 190000L)
    assert(flagged < tested / 5, s"flagged $flagged of $tested")
  }

  test("w17 ohlc: bucket count conserved, high >= low everywhere") {
    val out = SparkEntry.queries("w17_ohlc")(spark, dir).collect()
    assert(out.map(_.getLong(2)).sum === 200000L) // every event in a bucket
    assert(out.forall(r => r.getDouble(4) >= r.getDouble(5)))
    assert(out.forall(r => r.getDouble(3) >= r.getDouble(5) &&
      r.getDouble(3) <= r.getDouble(4))) // open within [low, high]
  }
}
