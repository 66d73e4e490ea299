package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 2: n-gram novelty, PQ codes, interval range join, salted
  * skew join, time-weighted segment sums. Semantic tests run the actual
  * catalog queries over hand-built parquet tables or the sf0.001 driver
  * tables; the join queries are additionally checked against their naive
  * (unsalted / theta) spellings so the scale rewrites are provably
  * transparent.
  */
class Ext5Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext5").toString

  private def docs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("x41_ngram_novelty: shared vs unique 5-grams, short docs dropped") {
    // doc 1 and doc 2 share the gram "a b c d e" (novel nowhere); doc 1's
    // "b c d e f" is unique to it; doc 3 is too short to produce any gram
    val d = docs(Seq(
      (1L, "a b c d e f"),
      (2L, "x a b c d e"),
      (3L, "p q r s")))
    val out = SparkEntry.queries("x41_ngram_novelty")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 1L), (2L, 2L, 1L)))
  }

  test("x41_ngram_novelty: repeated gram inside one doc counts once") {
    val d = docs(Seq((1L, "a b c d e a b c d e")))
    // grams: positions 1..6 — "a b c d e" appears twice (dedup to one),
    // plus 4 wrap grams crossing the repeat boundary + the shifted copies
    val out = SparkEntry.queries("x41_ngram_novelty")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 5L, 5L)))
  }

  test("x42_pq_codes: every vector coded, qdot is the per-subspace max sum") {
    val out = SparkEntry.queries("x42_pq_codes")(spark, sf).collect()
    assert(out.map(_.getLong(4)).sum === 500L)
    // code components are valid ids
    for (r <- out; m <- 0 until 4) {
      assert(r.getInt(m) >= 0 && r.getInt(m) < 4)
    }
    // cross-check one vector end-to-end against a plain Scala evaluation
    import graft.ext.PqCodebook.{M, SubDim, Kc, cw}
    val v = graft.tables.Tables.embeddings(spark, sf)
      .orderBy(col("vec_id")).limit(1)
      .select(col("embedding").cast("array<double>"))
      .collect()(0).getSeq[Double](0)
    val code = (0 until M).map { m =>
      val dots = (0 until Kc).map(k =>
        (0 until SubDim).foldLeft(0.0)((acc, j) => acc + v(m * SubDim + j) * cw(m)(k)(j)))
      // argmax with ties to the lowest id: first k with d(k) >= all later
      (0 until Kc).find(k => (k + 1 until Kc).forall(j => dots(k) >= dots(j))).get
    }
    val hist = out.map(r => ((0 until M).map(r.getInt), r.getLong(4))).toMap
    assert(hist.contains(code), s"vector 0's code $code missing from histogram")
  }

  test("j9_interval_join: bucket binning equals the naive theta join") {
    import graft.tables.Tables
    val dayUs = 86400000000L
    val l = Tables.orders(spark, sf)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000)
      .select(col("o_orderkey").as("k"),
        expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs").as("d"))
    val r = Tables.orders(spark, sf)
      .select(expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs").as("rd"),
        col("o_totalprice"))
    val naive = l.join(r, col("rd") >= col("d") && col("rd") < col("d") + 14)
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_price"))
      .orderBy(col("k")).collect().toSeq
    val binned = SparkEntry.queries("j9_interval_join")(spark, sf).collect().toSeq
    assert(binned === naive)
    assert(binned.nonEmpty)
  }

  test("j9_interval_join: window spanning a bucket boundary still matches once") {
    import spark.implicits._
    val d = tmpDir()
    val dayUs = 86400000000L
    // left window starts day 13 (bucket 0, spills into bucket 1); right
    // rows at days 13 (in), 20 (in, other bucket), 27 (out: d+14)
    def ts(day: Long) = new Timestamp(day * dayUs / 1000)
    Seq(
      (1L, 100L, "O", 500000.0, ts(13), "1-URGENT"),
      (2L, 101L, "O", 10.0, ts(20), "5-LOW"),
      (3L, 102L, "O", 20.0, ts(27), "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.parquet(s"$d/orders.parquet")
    val out = SparkEntry.queries("j9_interval_join")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 2L, 500010.0)))
  }

  test("j10_salted_join: salted result equals the plain join") {
    import graft.tables.Tables
    val dim = Tables.lineitem(spark, sf).select(col("l_returnflag").as("flag"))
      .distinct()
      .select(col("flag"), ascii(col("flag")).cast("long").as("weight"))
    val plain = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("flag"), col("l_quantity"))
      .join(dim, "flag")
      .groupBy(col("flag"))
      .agg(count(lit(1)).as("n"),
        sum((col("l_quantity") * col("weight")).cast("decimal(18,2)"))
          .cast("double").as("weighted_qty"))
      .orderBy(col("flag")).collect().toSeq
    val salted = SparkEntry.queries("j10_salted_join")(spark, sf).collect().toSeq
    assert(salted === plain)
    assert(salted.size === 3) // A, N, R
  }

  test("x44_sketch_accuracy: identical docs agree on all 8 perms, exact truth rides along") {
    // docs 1/2 identical (4 shingles, jaccard 1.0 — must agree on every
    // permutation and land in a band); doc 3 unrelated
    val d = docs(Seq(
      (1L, "a b c d e f"),
      (2L, "a b c d e f"),
      (3L, "q r s t u v")))
    val out = SparkEntry.queries("x44_sketch_accuracy")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq((1L, 2L, 8L, 4L, 4L, 4L)))
  }

  test("w14_streaks: streak split, multiple events per day collapse") {
    import spark.implicits._
    val d = tmpDir()
    val dayUs = 86400000000L
    def ts(day: Long, off: Long = 0) = new Timestamp((day * dayUs + off) / 1000)
    Seq(
      // user 1: days 10,11,12 (streak 3: two events on day 11 collapse),
      // then 15 (streak 1)
      (0L, ts(10), 1L, "a", 1.0, "{}"),
      (1L, ts(11), 1L, "a", 1.0, "{}"),
      (2L, ts(11, 5000000L), 1L, "a", 1.0, "{}"),
      (3L, ts(12), 1L, "a", 1.0, "{}"),
      (4L, ts(15), 1L, "a", 1.0, "{}"),
      // user 2: one day
      (5L, ts(20), 2L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w14_streaks")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 3L, 2L, 4L), (2L, 1L, 1L, 1L)))
  }

  test("x43_docpipe_e2e: dedup survivor, token counts, budget boundaries") {
    // docs 1 and 5 normalize identically ("a b c" after case/space fold) —
    // doc 1 survives; budget 1000 means shards split on the 4-token doc 7
    val d = docs(Seq(
      (1L, "a b  c"),
      (5L, "A B C"),
      (7L, (0 until 999).map(_ => "t").mkString(" ")),
      (9L, "x y")))
    val out = SparkEntry.queries("x43_docpipe_e2e")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // packing order by doc_id: d1 (3 toks, cum 3) shard 0; d7 (999, cum
    // 1002) shard 1; d9 (2, cum 1004) shard 1
    assert(out.toSeq === Seq(
      (0L, 1L, 3L, 1L, 1L),
      (1L, 2L, 1001L, 7L, 9L)))
  }

  test("q6_decorrelate: equals the hand-decorrelated DataFrame plan") {
    import graft.tables.Tables
    val c = Tables.customer(spark, sf)
    val stats = c.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("c_acctbal").cast("decimal(18,2)")).as("s"))
    val expected = c.join(stats, "c_nationkey")
      .filter(col("c_acctbal").cast("decimal(18,2)") * col("cnt") > col("s"))
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey")).collect().toSeq
    val got = SparkEntry.queries("q6_decorrelate")(spark, sf).collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    // Catalyst decorrelated both scalar subqueries: no per-row subquery
    // survives into the physical plan
    val plan = SparkEntry.queries("q6_decorrelate")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), s"subquery survived:\n$plan")
  }

  test("w13_time_weighted: hand timeline — durations, scaling, last-event drop") {
    import spark.implicits._
    val d = tmpDir()
    val t0 = 1700000000000000L // epoch micros
    def ts(us: Long) = new Timestamp(us / 1000)
    Seq(
      // user 1: values 1.5 (held 10ms), 2.0 (held 5ms), 7.25 (dropped)
      (0L, ts(t0), 1L, "a", 1.5, "{}"),
      (1L, ts(t0 + 10000), 1L, "a", 2.0, "{}"),
      (2L, ts(t0 + 15000), 1L, "a", 7.25, "{}"),
      // user 2: single event — no segment, user absent from output
      (3L, ts(t0), 2L, "a", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w13_time_weighted")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // wv: 1500*10000 + 2000*5000 = 25e6; dur total 15000 us
    assert(out.toSeq === Seq((1L, 2L, 15000L, 2.5e7)))
  }
}
