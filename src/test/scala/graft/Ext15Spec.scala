package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-5 batch 7: bag set-ops, transition counts, null semantics,
  * token drift. */
class Ext15Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext15").toString

  private def li(d: String, rows: Seq[(Long, Long, Double)]): Unit = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((ok, pk, q), i) =>
      (ok, pk, 1L, i + 1, q, 1.0, 0.0, 0.0, "N", "O", "1995-01-01")
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
  }

  test("s2_setops_all: multiplicities follow bag semantics") {
    val d = tmpDir()
    // low (qty<25): partkeys {1,1,2}; high (qty>=10): partkeys {1,2,2}
    // (rows with 10<=qty<25 are in BOTH sides)
    li(d, Seq(
      (1L, 1L, 5.0),   // low only
      (3L, 2L, 40.0),  // high only
      (4L, 1L, 12.0),  // both
      (5L, 2L, 12.0))) // both
    // low = {1,1,2}, high = {1,2,2}
    // intersect_all = {1,2} (min multiplicity); except_all = {1}
    val out = SparkEntry.queries("s2_setops_all")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      ("except_all", 1L, 1L, 1L),
      ("intersect_all", 2L, 2L, 3L)))
  }

  test("w27_transitions: lag pairs count per user in time order") {
    import spark.implicits._
    val d = tmpDir()
    val t0 = 1700000000000000L
    Seq((0L, t0, 1L, "v"), (1L, t0 + 1000, 1L, "c"), (2L, t0 + 2000, 1L, "p"),
      (3L, t0, 2L, "v"), (4L, t0 + 1000, 2L, "c"))
      .map { case (id, tus, uid, et) =>
        (id, new Timestamp(tus / 1000), uid, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w27_transitions")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq === Seq(("c", "p", 1L), ("v", "c", 2L)))
  }

  test("f18_nulls: null group, null-safe equality, count(col) vs count(*)") {
    import spark.implicits._
    val d = tmpDir()
    Seq((1L, "BUILDING"), (2L, "BUILDING"), (3L, "MACHINERY"))
      .map { case (k, seg) => (k, s"c$k", 0, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    val out = SparkEntry.queries("f18_nulls")(spark, d)
      .collect().map(r => (if (r.isNullAt(0)) "<null>" else r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    // nulls group together, sort NULLS LAST, count(col) skips them,
    // null <=> 'MACHINERY' is FALSE (not null)
    assert(out.toSeq === Seq(
      ("MACHINERY", 1L, 1L, 1L, "MACHINERY"),
      ("<null>", 2L, 0L, 0L, "MISSING")))
  }

  test("x72_token_drift: cross-multiplied rate difference, integer-exact") {
    import spark.implicits._
    val d = tmpDir()
    Seq((1L, "a a b", "src0"), (2L, "a b b", "src1"))
      .map { case (id, t, src) => (id, t, "en", src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x72_token_drift")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // N1=N2=3; a: |2·3−1·3| = 3; b: |1·3−2·3| = 3 — tie breaks to token
    assert(out.toSeq === Seq(("a", 2L, 1L, 3L), ("b", 1L, 2L, 3L)))
  }
}
