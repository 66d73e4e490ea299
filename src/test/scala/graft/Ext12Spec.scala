package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Round-5 batch 4: dominant supplier, triangle count, rendezvous sharding,
  * k-anonymity. The x67 test pins the minimal-disruption property that is
  * rendezvous hashing's reason to exist. */
class Ext12Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("q11_dominant_supplier: share predicate fires on hand data") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext12").toString
    // part 1: supplier 10 ships 30 of 40 (75% > 20%) — supplier 20 ships
    //   10 of 40 (25% > 20%) — both reported; part 2: single supplier → out
    Seq(
      (1L, 1L, 10L, 1, 20.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01"),
      (2L, 1L, 10L, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01"),
      (3L, 1L, 20L, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01"),
      (4L, 2L, 30L, 1, 99.0, 100.0, 0.0, 0.0, "N", "O", "1995-01-01"))
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .write.parquet(s"$d/lineitem.parquet")
    val out = SparkEntry.queries("q11_dominant_supplier")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(4)))
    assert(out.toSeq === Seq((1L, 10L, 30.0, 2L), (1L, 20L, 10.0, 2L)))
  }

  test("x66_triangle_count: matches brute force over the verified pairs") {
    val sf = "/root/testdata/sf0.001"
    val pairs = SparkEntry.queries("x3_minhash_lsh")(spark, sf)
      .select(col("id1"), col("id2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (for {
      (a, b) <- pairs
      (b2, c) <- pairs if b2 == b && pairs((a, c))
    } yield (a, b, c)).toSeq.sorted
    val out = SparkEntry.queries("x66_triangle_count")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expect)
    spark.catalog.clearCache() // lshVerifiedPairs persists internally
  }

  test("x67_rendezvous_shard: total preservation and near-uniform spread") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x67_rendezvous_shard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(out.map(_._2).sum == nDocs)
    assert(out.length == 8) // every worker gets something at 50 docs/worker
  }

  test("x67: removing one worker only moves that worker's keys (HRW)") {
    val sf = "/root/testdata/sf0.001"
    def assign(nWorkers: Int) = {
      val scored = array((0 until nWorkers).map { w =>
        struct(TextOps.hash32(concat(lit(s"rdzv:$w:"),
          col("doc_id").cast("string"))).as("score"),
          lit(w.toLong).as("w"))
      }: _*)
      graft.tables.Tables.documents(spark, sf)
        .select(col("doc_id"), array_max(scored).getField("w").as("worker"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val with8 = assign(8)
    val with7 = assign(7)
    with8.foreach { case (doc, w) =>
      if (w != 7L) assert(with7(doc) == w,
        s"doc $doc moved from $w despite its worker surviving")
    }
    // and the orphaned keys were redistributed, not dropped
    assert(with7.size == with8.size)
  }

  test("x68_k_anonymity: small groups flagged, counts exact") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext12k").toString
    (Seq.fill(6)((1, "A")) ++ Seq.fill(2)((1, "B")) ++ Seq.fill(5)((2, "A")))
      .zipWithIndex
      .map { case ((nk, seg), i) => (i.toLong, s"c$i", nk, 0.0, seg) }
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .write.parquet(s"$d/customer.parquet")
    val out = SparkEntry.queries("x68_k_anonymity")(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(out.toSeq === Seq((1, "A", 6L, false), (1, "B", 2L, true),
      (2, "A", 5L, false)))
  }
}
