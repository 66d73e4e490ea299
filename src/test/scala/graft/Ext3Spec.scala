package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 catalog additions: sessionization, in-doc repetition, grouping
  * sets, unpivot, stratified sampling. Semantic tests run the actual catalog
  * queries over hand-built parquet tables (so the Tables loader path is
  * exercised too) or the sf0.001 driver tables.
  */
class Ext3Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Write a tiny table set under a temp dir so catalog queries can read it
    * like an sf dir. */
  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext3").toString

  test("w10_sessionize: splits at >24h gaps, numbers sessions per user") {
    import spark.implicits._
    val h = 3600L * 1000000 // 1h in micros
    val t0 = 1700000000000000L // arbitrary epoch micros
    val rows = Seq(
      // user 1: e0,e1 in one session (1h apart), e2 after a 30h gap
      (0L, new Timestamp(t0 / 1000), 1L, "a", 1.25, "{}"),
      (1L, new Timestamp((t0 + h) / 1000), 1L, "a", 2.50, "{}"),
      (2L, new Timestamp((t0 + 31 * h) / 1000), 1L, "a", 4.00, "{}"),
      // user 2: single event
      (3L, new Timestamp((t0 + 2 * h) / 1000), 2L, "b", 8.00, "{}"),
      // user 3: exactly 24h gap — NOT a split (strictly greater splits)
      (4L, new Timestamp(t0 / 1000), 3L, "c", 1.00, "{}"),
      (5L, new Timestamp((t0 + 24 * h) / 1000), 3L, "c", 2.00, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = tmpDir()
    rows.write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w10_sessionize")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L, 0L, 1L, 3.75), // user 1 session 1: e0+e1, 1.25+2.50
      (1L, 2L, 1L, 2L, 2L, 4.00), // user 1 session 2: e2 after 30h
      (2L, 1L, 1L, 3L, 3L, 8.00),
      (3L, 1L, 2L, 4L, 5L, 3.00))) // 24h exactly → same session
  }

  test("x28_repetition: duplicated-trigram fraction per doc") {
    import spark.implicits._
    val rows = Seq(
      (0L, "a a a a a", "en", "s", 9L),    // 3 trigrams, 1 distinct → 2/3
      (1L, "v w x y z", "en", "s", 9L),    // 3 trigrams, all distinct → 0
      (2L, "p q", "en", "s", 3L))          // <3 tokens → filtered out
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir()
    rows.write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x28_repetition")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0L, 3, 1, 2.0 / 3.0), (1L, 3, 3, 0.0)))
  }

  test("g4_grouping_sets: equals the manual union of its three levels") {
    val got = SparkEntry.queries("g4_grouping_sets")(spark, sf)
      .collect().map(_.toSeq).toSet
    val li = graft.tables.Tables.lineitem(spark, sf)
    def agg(gb: Seq[String], rf: Boolean, ls: Boolean) = {
      val base = if (gb.isEmpty) li.groupBy() else li.groupBy(gb.map(col): _*)
      base.agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"))
        .select(
          (if (rf) col("l_returnflag") else lit("ALL")).as("returnflag"),
          (if (ls) col("l_linestatus") else lit("ALL")).as("linestatus"),
          col("n"), col("sum_qty"),
          lit(if (rf) 0 else 1).as("g_rf"), lit(if (ls) 0 else 1).as("g_ls"))
    }
    val expected = (agg(Seq("l_returnflag", "l_linestatus"), rf = true, ls = true)
      .unionAll(agg(Seq("l_linestatus"), rf = false, ls = true))
      .unionAll(agg(Seq(), rf = false, ls = false)))
      .collect().map(_.toSeq).toSet
    assert(got === expected)
    // and the (flag)-only level is genuinely absent (not a cube)
    assert(!got.exists(r => r(4) == 0 && r(5) == 1))
  }

  test("f17_unpivot: 4 long rows per wide row, values preserved") {
    val wide = graft.tables.Tables.lineitem(spark, sf)
      .filter(col("l_orderkey") % 100 === 0)
    val out = SparkEntry.queries("f17_unpivot")(spark, sf)
    assert(out.count() === wide.count() * 4)
    val one = wide.select("l_orderkey", "l_linenumber", "l_quantity").head()
    val got = out.filter(col("l_orderkey") === one.getLong(0) &&
        col("l_linenumber") === one.getInt(1) &&
        col("measure") === "l_quantity")
      .select("val").head().getDouble(0)
    assert(got === one.getDouble(2))
  }

  test("w11_funnel: stage order enforced, ties cannot skip stages") {
    import spark.implicits._
    val m = 60L * 1000 // 1 min in millis for Timestamp ctor
    val t0 = 1700000000000L
    def e(id: Long, min: Long, u: Long, ty: String) =
      (id, new Timestamp(t0 + min * m), u, ty, 1.0, "{}")
    val rows = Seq(
      e(0, 0, 1, "view"), e(1, 1, 1, "click"), e(2, 2, 1, "purchase"),
      // user 2: click BEFORE the first view — must not count as stage 2
      e(3, 0, 2, "click"), e(4, 1, 2, "view"), e(5, 2, 2, "purchase"),
      // user 3: view only
      e(6, 0, 3, "view"),
      // user 4: no view at all — zero stages even with click+purchase
      e(7, 0, 4, "click"), e(8, 1, 4, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val d = tmpDir()
    rows.write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w11_funnel")(spark, d)
      .select("user_id", "stages_reached")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(out.toSeq === Seq((1L, 3), (2L, 1), (3L, 1), (4L, 0)))
  }

  test("x30_cms_heavy_hitters: estimates one-sided, top hitter found") {
    import spark.implicits._
    // skewed corpus: "alpha" appears in every doc many times
    val rows = (0L until 50L).map { i =>
      (i, ("alpha " * 10 + s"tok$i unique$i").trim, "en", "s", 1L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir()
    rows.write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x30_cms_heavy_hitters")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.head._1 === "alpha" && out.head._3 === 500L)
    // CMS error is one-sided: est >= exact, always
    assert(out.forall { case (_, est, exact) => est >= exact })
  }

  test("x31_canonical_pick: keeps the highest-quality doc per dup cluster") {
    import spark.implicits._
    // groups share a DISTINCT token set (order-free simhash ⇒ Hamming 0);
    // repetition lowers the quality score, so the cleanest copy survives
    val rows = Seq(
      (0L, "b c d e f g h j k l", "en", "s", 1L),            // q = 1.0  ← keep
      (1L, "b c d e f g h j k l b", "en", "s", 1L),          // 11 toks, 10 distinct
      (2L, "m n o p q r s t u v m n", "en", "s", 1L),        // 12/10
      (3L, "m n o p q r s t u v", "en", "s", 1L),            // q = 1.0  ← keep
      (4L, "m n o p q r s t u v m n o p q", "en", "s", 1L),  // 15/10
      (5L, "w x y z zz ww xx yy zx zy", "en", "s", 1L))      // singleton
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = tmpDir()
    rows.write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x31_canonical_pick")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq === Seq((0L, 0L, 1.0, 2L), (2L, 3L, 1.0, 3L)))
  }

  test("x29_stratified_sample: exactly min(k, stratum size) per source, stable") {
    val out = SparkEntry.queries("x29_stratified_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    val bySource = out.groupBy(_._1)
    val sizes = graft.tables.Tables.documents(spark, sf)
      .groupBy(col("source")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((src, rows) <- bySource) {
      assert(rows.length === math.min(20L, sizes(src)).toInt, src)
      assert(rows.map(_._3).sorted.toSeq === (1 to rows.length), src)
    }
    // reproducible: second run identical (hash order, no rand())
    val again = SparkEntry.queries("x29_stratified_sample")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(again.toSeq === out.toSeq)
  }
}
