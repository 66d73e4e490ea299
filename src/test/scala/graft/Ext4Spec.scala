package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 catalog additions: PII redaction, HTML strip, inverted index,
  * fixed-point PageRank, token chunking, k-means update, bloom semi join,
  * bigram top-k, cohort retention. Semantic tests run the actual catalog
  * queries over hand-built parquet tables (exercising the Tables loader
  * path) or the sf0.001 driver tables; PageRank is hand-traced through all
  * three fixed-point iterations.
  */
class Ext4Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext4").toString

  private def docs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("x32_pii_redact: counts and redacts the synthesized contact line") {
    val d = docs(Seq((7L, "hello world")))
    val out = SparkEntry.queries("x32_pii_redact")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3),
        r.getString(4)))
    assert(out.toSeq === Seq(
      (7L, 1, 1, 1, "hello world contact <EMAIL> or call <PHONE> from <IP>")))
  }

  test("x33_html_strip: tags stripped, entities decoded, whitespace collapsed") {
    val d = docs(Seq((3L, "x y")))
    val out = SparkEntry.queries("x33_html_strip")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    assert(out.toSeq === Seq((3L, 6, "x y & tail</>")))
  }

  test("x34_inverted_index: df / tf_total / sorted first-8 postings") {
    val d = docs(Seq(
      (5L, "b a b"),
      (1L, "a c"),
      (9L, "a")))
    val out = SparkEntry.queries("x34_inverted_index")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      ("a", 3L, 3L, "1,5,9"),
      ("b", 1L, 2L, "5"),
      ("c", 1L, 1L, "1")))
  }

  test("x35_pagerank: hand-traced 3-iteration fixed-point ranks") {
    import spark.implicits._
    val d = tmpDir()
    // one customer (node 2), two suppliers (nodes 3 and 5); the duplicate
    // (order 10, supplier 1) line must collapse in the DISTINCT edge set
    Seq((10L, 1L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (10L, 1L), (10L, 2L)).toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$d/lineitem.parquet")
    // r0 = 1e6 everywhere; r' = 150000 + 85*Σ(r div outdeg) div 100:
    //   i1: r2=1850000, r3=r5=575000
    //   i2: r2=1127500, r3=r5=936250
    //   i3: r2=1741625, r3=r5=629187
    val out = SparkEntry.queries("x35_pagerank")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((2L, 1741625L), (3L, 629187L), (5L, 629187L)))
  }

  test("x36_token_chunks: stride-48 windows incl. the 1-token and 65-token edges") {
    val one = "t0"
    val sixtyFive = (0 until 65).map(i => s"t$i").mkString(" ")
    val d = docs(Seq((1L, one), (2L, sixtyFive)))
    val out = SparkEntry.queries("x36_token_chunks")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    assert(out.toSeq === Seq(
      (1L, 0L, 1L, "t0", "t0"),
      (2L, 0L, 64L, "t0", "t63"),   // tokens 1..64
      (2L, 1L, 17L, "t48", "t64"))) // tokens 49..65 (overlap 48..64)
  }

  test("x37_kmeans_update: every vector lands in exactly one cell") {
    val out = SparkEntry.queries("x37_kmeans_update")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum === 500L)
    // fixed-point means of unit-scale embedding coords stay within ±1e6
    for (r <- out; j <- 2 until 6)
      assert(math.abs(r.getLong(j)) <= 1000000L)
  }

  test("x38_bloom_semi: bloom prefilter is transparent vs the plain semi join") {
    val plain = graft.tables.Tables.orders(spark, sf)
      .join(graft.tables.Tables.customer(spark, sf)
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("sum_total"))
      .orderBy(col("o_orderstatus"))
      .collect().toSeq
    val bloom = SparkEntry.queries("x38_bloom_semi")(spark, sf).collect().toSeq
    assert(bloom === plain)
  }

  test("x39_bigram_topk: adjacent pairs with count-desc/term-asc ordering") {
    val d = docs(Seq((1L, "a b a b"), (2L, "a b"), (3L, "z")))
    val out = SparkEntry.queries("x39_bigram_topk")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a b", 3L), ("b a", 1L)))
  }

  test("w12_retention: cohort week and offset math on a hand timeline") {
    import spark.implicits._
    val d = tmpDir()
    val dayUs = 86400000000L
    val t0 = 1700000000000000L // epoch micros
    val day0 = t0 / dayUs
    Seq(
      (0L, new Timestamp(t0 / 1000), 1L, "a", 1.0, "{}"),
      (1L, new Timestamp((t0 + 8 * dayUs) / 1000), 1L, "a", 1.0, "{}"),
      (2L, new Timestamp(t0 / 1000), 2L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w12_retention")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (day0 / 7, 0L, 2L, 2L),
      (day0 / 7, 1L, 1L, 1L)))
  }
}
