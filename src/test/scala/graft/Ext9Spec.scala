package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-5 batch 1: layout catalog entries (bucketed join, partition
  * pruning), exact dyadic EWMA, runtime-quota top-k, SCD-2 intervals,
  * train/val/test split, BPE merge learning, next-fit sequence packing.
  * Hand corpora small enough to verify by hand, plus plan pins for the
  * two layout queries and a sequential-reference equivalence check for
  * the packing fold.
  */
class Ext9Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext9").toString

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def eventsDir(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, tus, uid, et, v) =>
      (id, new Timestamp(tus / 1000), uid, et, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    d
  }

  // ---------------------------------------------------------------- j12

  test("j12_bucketed_join: merge join over buckets, no exchange on either side") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("j12_bucketed_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
      "orders side should read pre-bucketed")
    assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
      "lineitem side should read pre-bucketed")
    // and the result equals the plain shuffling join
    val plain = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("o_orderstatus"))
    assert(df.collect().toSeq == plain.collect().toSeq)
  }

  // ---------------------------------------------------------------- w21

  test("w21_ewma: Q16 dyadic smoother matches a hand fold, exactly") {
    // user 1: values 1.000, 2.000, 4.000 (vm = 1000, 2000, 4000)
    val d = eventsDir(Seq(
      (0L, 1000000L, 1L, "a", 1.0),
      (1L, 2000000L, 1L, "a", 2.0),
      (2L, 3000000L, 1L, "a", 4.0),
      (3L, 1000000L, 2L, "a", 8.0)))
    val out = SparkEntry.queries("w21_ewma")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    def q16(vals: Seq[Long]): Long = // vals newest-first, weight 2^(15-k)
      vals.zipWithIndex.map { case (v, k) => v * (1L << (15 - k)) }.sum
    val u1 = Seq(
      q16(Seq(1000L)),                 // after e0
      q16(Seq(2000L, 1000L)),          // after e1
      q16(Seq(4000L, 2000L, 1000L)))   // after e2
    assert(out.toSeq === Seq(
      (1L, 3L, u1(2), u1.max),
      (2L, 1L, 8000L * 32768, 8000L * 32768)))
  }

  test("w21_ewma: every intermediate stays exact (integer-only plan)") {
    // the catalog query must not contain a double anywhere after vm:
    // check the schema of the smoothed column is LongType end-to-end
    val d = eventsDir(Seq((0L, 1000000L, 1L, "a", 123.456)))
    val df = SparkEntry.queries("w21_ewma")(spark, d)
    val types = df.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(types("last_q16") == "long" && types("max_q16") == "long")
  }

  // ---------------------------------------------------------------- w22

  test("w22_quota_topk: quota floors at 1, scales with group share") {
    import spark.implicits._
    val d = tmpDir()
    // nation 0: 8 customers, nation 1: 2 customers → quotas 80 div 10 = 8? no:
    // quota = max(1, cnt*100 div total) with total=10 → n0: 8*100/10=80 (capped
    // by group size via rank), n1: 2*100/10=20 — degenerate for a tiny frame,
    // so use shares that produce quotas 1 and 2 with total=300 scaled… simpler:
    // verify the formula directly on a 150-customer frame: n0 has 3, n1 has 147
    val rows = (1 to 3).map(i => (i.toLong, 0, 1000.0 + i)) ++
      (4 to 150).map(i => (i.toLong, 1, 2000.0 + i))
    rows.toDF("c_custkey", "c_nationkey", "c_acctbal")
      .withColumn("c_name", concat(lit("c"), col("c_custkey")))
      .withColumn("c_mktsegment", lit("B"))
      .write.parquet(s"$d/customer.parquet")
    Seq((0, "ALPHA", 0), (1, "BETA", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
      .write.parquet(s"$d/nation.parquet")
    val out = SparkEntry.queries("w22_quota_topk")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    // total=150: nation0 quota = max(1, 300 div 150) = 2; nation1 = max(1, 98) = 98
    val alpha = out.filter(_._1 == "ALPHA")
    val beta = out.filter(_._1 == "BETA")
    assert(alpha.length == 2 && alpha.forall(_._4 == 2L))
    assert(alpha.map(_._3).toSeq == Seq(3L, 2L)) // top acctbal first
    assert(beta.length == 98 && beta.forall(_._4 == 98L))
    assert(beta.head._3 == 150L) // highest acctbal in nation 1
  }

  // ---------------------------------------------------------------- w23

  test("w23_scd2: change segments with [from, to) bounds and versions") {
    val d = eventsDir(Seq(
      (0L, 1000000L, 1L, "a", 0.0),
      (1L, 2000000L, 1L, "a", 0.0), // same type → same segment
      (2L, 3000000L, 1L, "b", 0.0), // change → v2
      (3L, 4000000L, 1L, "a", 0.0), // change back → v3 (not merged with v1)
      (4L, 5000000L, 2L, "x", 0.0)))
    val out = SparkEntry.queries("w23_scd2")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq(
      (1L, 1L, "a", 1000000L, 3000000L, 2L),
      (1L, 2L, "b", 3000000L, 4000000L, 1L),
      (1L, 3L, "a", 4000000L, -1L, 1L),
      (2L, 1L, "x", 5000000L, -1L, 1L)))
  }

  // ---------------------------------------------------------------- x56

  test("x56_train_split: partitions the corpus, ~80/10/10, deterministic") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x56_train_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = out.map(_._3).sum
    val nDocs = graft.tables.Tables.documents(spark, sf).count()
    assert(total == nDocs, "every doc lands in exactly one split")
    val bySplit = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(bySplit("train") > bySplit("val") &&
      bySplit("train") > bySplit("test"))
    // deterministic: a second run is identical
    val again = SparkEntry.queries("x56_train_split")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.toSeq == again.toSeq)
  }

  // ---------------------------------------------------------------- x59

  test("x59_partition_prune: scan lists only the filtered partition") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("x59_partition_prune")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("event_type = purchase") ||
      scan.contains("event_type#") && scan.contains("purchase"), scan)
    // result equals filtering the raw table
    val expect = graft.tables.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .groupBy(pmod(col("user_id"), lit(10)).as("user_bucket"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 1000.0).cast("long")).as("sum_vm"))
      .orderBy(col("user_bucket"))
    assert(df.collect().toSeq == expect.collect().toSeq)
  }

  // ---------------------------------------------------------------- x60

  test("x60_bpe_merges: learns the hand-computed merges on a tiny corpus") {
    // corpus: "abab abab abc" → words: abab ×2, abc ×1
    // round 1 pairs: (a,b): 2·2+1=5  (b,a): 2  (b,c): 1 → merge (a,b) freq 5
    // round 2 symbols: abab→[ab,ab], abc→[ab,c]
    //   pairs: (ab,ab): 2  (ab,c): 1 → merge (ab,ab) freq 2
    // round 3 symbols: abab→[abab], abc→[ab,c] → merge (ab,c) freq 1
    // round 4: no pairs left → stops early
    val d = docsDir(Seq((1L, "abab abab abc")))
    val out = SparkEntry.queries("x60_bpe_merges")(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(out.toSeq === Seq(
      (1, "a", "b", 5L),
      (2, "ab", "ab", 2L),
      (3, "ab", "c", 1L)))
  }

  test("x60_bpe_merges: greedy merge fold is left-to-right non-overlapping") {
    // "aaa" with merge (a,a): greedy gives [aa, a], NOT [a, aa] or [aa, aa]
    val d = docsDir(Seq((1L, "aaa aaa")))
    val out = SparkEntry.queries("x60_bpe_merges")(spark, d)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // round 1: (a,a) appears 2 per word × 2 words = 4 (overlapping count)
    assert(out.head === ((1, "a", "a", 4L)))
    // round 2: symbols are [aa, a] per word → pairs (aa,a): 2
    assert(out(1) === ((2, "aa", "a", 2L)))
  }

  // ---------------------------------------------------------------- x61

  /** Sequential reference: next-fit with per-chunk reset. */
  private def packRef(docs: Seq[(Long, Long)], budget: Long, chunkSz: Long)
    : Seq[(Long, Long, Long)] =
    docs.sortBy(_._1).groupBy(_._1 / chunkSz).toSeq.flatMap {
      case (chunk, ds) =>
        var fill = 0L; var bin = 0L
        ds.sortBy(_._1).map { case (id, t) =>
          if (fill > 0 && fill + t <= budget) fill += t
          else { if (fill > 0) bin += 1; fill = t }
          (id, t, chunk * 64 + bin)
        }
    }.sortBy(_._1)

  test("x61_seq_pack: equals the sequential reference on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.tables.Tables.documents(spark, sf)
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expect = packRef(docs, 200L, 64L)
    val out = SparkEntry.queries("x61_seq_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expect)
  }

  test("x61_seq_pack: no bin over budget; bins contiguous within chunk") {
    val sf = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("x61_seq_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val byBin = out.groupBy(_._3)
    // every multi-doc bin holds ≤ budget tokens (a single doc may exceed)
    byBin.foreach { case (bin, ds) =>
      if (ds.length > 1) assert(ds.map(_._2).sum <= 200L, s"bin $bin over budget")
    }
    // bin ids within a chunk are contiguous from chunk*64
    out.groupBy(_._1 / 64).foreach { case (chunk, ds) =>
      val bins = ds.map(_._3).distinct.sorted
      assert(bins.head == chunk * 64 && bins == (bins.head to bins.last))
    }
  }
}
