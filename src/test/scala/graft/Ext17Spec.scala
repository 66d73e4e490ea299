package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-6 batch 1: sampling/batching-layer operators — mixture
  * apportionment, length-bucket padding, OOV rate, source interleave,
  * next-fit-decreasing packing — plus the BPE learn-loop memo. */
class Ext17Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x73: quotas are exact Hamilton apportionment and sum to the budget") {
    val rows = SparkEntry.queries("x73_mixture_apportion")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    assert(rows.map(_._3).sum == 1000L, "quotas must sum to the budget")
    // replay the apportionment on the collected token counts
    val total = rows.map(_._2).sum
    val base = rows.map { case (s, tok, _) => (s, 1000L * tok / total,
      (1000L * tok) % total) }
    val leftover = 1000L - base.map(_._2).sum
    val bonus = base.sortBy { case (s, _, rem) => (-rem, s) }
      .take(leftover.toInt).map(_._1).toSet
    base.foreach { case (s, b, _) =>
      val expected = b + (if (bonus(s)) 1L else 0L)
      val got = rows.find(_._1 == s).get._3
      assert(got == expected, s"source $s: got $got, expected $expected")
    }
  }

  test("x74: buckets are powers of two covering every doc; waste in range") {
    val rows = SparkEntry.queries("x74_length_buckets")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._2).sum == nDocs, "every doc lands in one bucket")
    val allowed = Set(16L, 32L, 64L, 128L, 256L, 512L, 1024L)
    rows.foreach { case (bucket, n, sumT, pad, padPm) =>
      assert(allowed(bucket))
      assert(pad == bucket * n - sumT && pad >= 0,
        s"bucket $bucket: docs must fit under the bucket cap")
      assert(padPm >= 0 && padPm < 1000)
    }
  }

  test("x75: OOV rates are consistent counts; src0 is covered best") {
    val rows = SparkEntry.queries("x75_oov_rate")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTok, nOov, pm) =>
      assert(nOov >= 0 && nOov <= nTok)
      assert(pm == nOov * 1000 / nTok)
    }
    assert(rows.exists(_._1 == "src0"))
  }

  test("w29: interleave positions are exactly 1..10*|sources|, round-robin") {
    val rows = SparkEntry.queries("w29_interleave")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val nSources = spark.read.parquet(s"$sf/documents.parquet")
      .select("source").distinct().count()
    assert(rows.map(_._1).toSeq == (1L to 10L * nSources),
      "positions must be a contiguous 1-based sequence")
    // consecutive positions within a round cycle through distinct sources
    rows.grouped(nSources.toInt).foreach { round =>
      assert(round.map(_._2).distinct.length == nSources.toInt,
        "each round visits every source exactly once")
    }
    // no doc appears twice
    assert(rows.map(_._3).distinct.length == rows.length)
  }

  test("x76: NFD bins respect the budget; every doc packed exactly once") {
    val rows = SparkEntry.queries("x76_nfd_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.length == nDocs)
    assert(rows.map(_._1).distinct.length == rows.length)
    // per-bin fill: over budget only for a single oversized doc
    rows.groupBy(_._3).foreach { case (bin, docs) =>
      val fill = docs.map(_._2).sum
      assert(fill <= 200L || docs.length == 1,
        s"bin $bin overfilled: $fill tokens across ${docs.length} docs")
    }
    // bins stay inside their chunk's id space
    rows.foreach { case (docId, _, binId) =>
      assert(binId / 64 == docId / 64, "bin id must compose chunk*64+local")
    }
  }

  test("x76 packs no looser than x61 (decreasing never uses more bins here)") {
    val nf = SparkEntry.queries("x61_seq_pack")(spark, sf)
      .select(countDistinct(col("bin_id"))).collect()(0).getLong(0)
    val nfd = SparkEntry.queries("x76_nfd_pack")(spark, sf)
      .select(countDistinct(col("bin_id"))).collect()(0).getLong(0)
    // NFD is not universally <= NF, but on this corpus it holds and the
    // pin guards against a regression in the fold/sort wiring
    assert(nfd <= nf, s"NFD used $nfd bins vs NF $nf")
  }

  test("bpe memo: second loop invocation learns identical merges, no rerun") {
    import spark.implicits._
    val docs = Seq((0L, "aa ab aa ab ab"), (1L, "aa ab ba"))
      .toDF("doc_id", "text")
    val m1 = graft.queries.Ext9.bpeMerges(docs, 3)
      .collect().map(_.toSeq).toSeq
    val m2 = graft.queries.Ext9.bpeMerges(docs, 3)
      .collect().map(_.toSeq).toSeq
    assert(m1 == m2 && m1.nonEmpty)
    // encode over the memoized vocab agrees with a direct word/symbol count
    val enc = graft.queries.Ext9.bpeEncode(docs, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(enc.map(_._2) == Seq(5L, 3L), "word counts per doc")
    enc.foreach { case (_, nWords, nSym) => assert(nSym >= nWords) }
  }
}
