package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-5 batch 2: Q2-shape argmin join, median absolute deviation,
  * Z-order zone maps, BPE encode. Hand fixtures plus the Z-order range
  * property that IS the operator's reason to exist. */
class Ext10Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext10").toString

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, tus, uid, et, v) =>
      (id, new Timestamp(tus / 1000), uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  test("q10_cheapest_supplier: argmin row per part with full tie order") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q10_cheapest_supplier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getLong(3)))
    // reference: brute-force in Scala over the same filter
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .filter(col("p_size") <= 5).select("p_partkey")
      .collect().map(_.getLong(0)).toSet
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey"), col("l_orderkey"),
        col("l_linenumber"),
        floor(col("l_extendedprice") * 100.0).cast("long").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3).toLong, r.getLong(4)))
      .filter(t => parts(t._1))
    val expect = li.groupBy(_._1).view.mapValues(
      _.minBy(t => (t._5, t._2, t._3, t._4))).toMap
    assert(out.length == expect.size)
    out.foreach { case (pk, _, cents) =>
      assert(cents == expect(pk)._5, s"part $pk") }
    // suppliers match the argmin row's suppkey
    val sup = spark.read.parquet(s"$sf/supplier.parquet")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    out.foreach { case (pk, sname, _) =>
      assert(sname == sup(expect(pk)._2), s"part $pk supplier") }
  }

  test("w24_mad: exact nearest-rank median and MAD on a hand stream") {
    val d = eventsDir(Seq(
      (0L, 1000000L, 1L, "a", 1.0),    // vm 1000
      (1L, 2000000L, 1L, "a", 2.0),    // vm 2000
      (2L, 3000000L, 1L, "a", 100.0),  // vm 100000 (outlier)
      (3L, 1000000L, 2L, "a", 5.0),
      (4L, 2000000L, 2L, "a", 7.0)))
    val out = SparkEntry.queries("w24_mad")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 1: n=3, med = rank-2 of (1000,2000,100000) = 2000;
    //   devs (1000,0,98000) → sorted (0,1000,98000), rank 2 → mad = 1000
    // user 2: n=2, med = rank-1 of (5000,7000) = 5000; devs (0,2000) → mad 0
    assert(out.toSeq === Seq((1L, 3L, 2000L, 1000L), (2L, 2L, 5000L, 0L)))
  }

  test("x62_zorder_layout: morton key interleaves bits as specified") {
    // a=3 (011), b=5 (101) → z = a0·1 + b0·2 + a1·4 + b1·8 + a2·16 + b2·32
    //                          = 1 + 2 + 4 + 0 + 0 + 32 = 39 → block 0
    val d = eventsDir(Seq((0L, 1000000L, 3L, "a", 0.005)))
    val out = SparkEntry.queries("x62_zorder_layout")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq((0L, 1L, 3L, 3L, 5L, 5L)))
  }

  test("x62_zorder_layout: every aligned block keeps BOTH dims' range ≤ 7") {
    // 64 consecutive z-keys fix all but 3 bits of each dim — the zone-map
    // property that makes either-dim predicates prune blocks
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x62_zorder_layout")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(out.nonEmpty)
    out.foreach { case (block, aMin, aMax, bMin, bMax) =>
      assert(aMax - aMin <= 7, s"block $block a-range")
      assert(bMax - bMin <= 7, s"block $block b-range")
    }
  }

  test("x63_bpe_encode: encode lengths follow the learned merges") {
    import spark.implicits._
    val d = tmpDir()
    // 6 rounds merge the left chain of "abcdefgh" (lex-first among the
    // all-count-1 pairs each round): a+b, ab+c, …, abcdef+g → [abcdefg, h];
    // "ij" never merges → [i, j]
    Seq((1L, "abcdefgh ij", "en", "s", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x63_bpe_encode")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 2L, 4L)))
  }

  test("x63_bpe_encode: fully-merged corpus encodes to one symbol per word") {
    import spark.implicits._
    val d = tmpDir()
    // "abab abab abc": merges (a,b), (ab,ab), (ab,c) then exhausted —
    // every word collapses to a single symbol
    Seq((1L, "abab abab abc", "en", "s", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x63_bpe_encode")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((1L, 3L, 3L)))
  }
}
