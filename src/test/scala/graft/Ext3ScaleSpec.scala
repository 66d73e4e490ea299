package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-4 shapes: sessionization and funnel windows
  * over millions of events across many partitions and thousands of users,
  * and the CMS counter build over millions of tokens. The single-machine
  * proxy for the 100 TB question — no per-user state ever leaves its
  * partition, no O(rows) driver collect, counter cardinality stays at
  * d × w regardless of input size. */
class Ext3ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("sessionize shape: 5M events / 10k users in seconds, sessions exact") {
    val n = 5000000L
    val users = 10000L
    // event i of user u fires at u-offset + step*i; every 100th step jumps
    // past the gap so each user gets a deterministic session count
    val gap = 1000000L // gap threshold in "micros" for this synthetic frame
    val e = spark.range(n).select(
      (col("id") % users).as("user_id"),
      col("id").as("event_id"),
      (floor(col("id") / users) * 10 +
        (floor(col("id") / users) / 100).cast("long") * gap * 2).as("tus"))
      .repartition(32)
    val w = Window.partitionBy(col("user_id")).orderBy(col("tus"), col("event_id"))
    val t0 = System.nanoTime()
    val sessions = e
      .withColumn("prev", lag(col("tus"), 1).over(w))
      .withColumn("is_start",
        when(col("prev").isNull || col("tus") - col("prev") > gap, 1).otherwise(0))
      .withColumn("session_no", sum(col("is_start")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_no"))
      .agg(count(lit(1)).as("n_events"))
    val total = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    val nSessions = sessions.count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(total == n)
    // 500 steps per user, a session break every 100 steps => 5 sessions/user
    assert(nSessions == users * 5, s"got $nSessions sessions")
    assert(secs < 60, s"sessionize took $secs s for 5M events")
  }

  test("CMS counters: cardinality bounded at d*w regardless of input size") {
    import graft.ext.TextOps
    val n = 2000000L
    val tok = spark.range(n)
      .select(concat(lit("tok"), (col("id") % 50000).cast("string")).as("tok"))
      .repartition(32)
    val t0 = System.nanoTime()
    val counters = tok
      .select(posexplode(array((0 until 4).map(j =>
        pmod(TextOps.hash32(concat(lit(s"cms$j:"), col("tok"))), lit(1024))): _*))
        .as(Seq("j", "bucket")))
      .groupBy(col("j"), col("bucket")).agg(count(lit(1)).as("cnt"))
    val cells = counters.count()
    val mass = counters.agg(sum("cnt")).collect()(0).getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cells <= 4 * 1024, s"counter cardinality leaked: $cells")
    assert(mass == 4 * n) // every token lands in exactly one bucket per row
    assert(secs < 60, s"CMS build took $secs s for 2M tokens")
  }
}
