package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-5 batch 13–14 additions: the dataset
  * fingerprint must be bit-identical under re-partitioning at 1M docs,
  * the epoch shuffle must produce dense per-epoch permutations at 1M
  * docs without any corpus-scale window, and the bucket-then-refine
  * winsorization must hit closed-form nearest-rank thresholds at 2M
  * events. Each test materializes a synthetic fixture and drives the
  * real catalog entries. */
class Ext35ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def withDir(tag: String)(body: java.io.File => Unit): Unit = {
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_${tag}_${System.nanoTime()}")
    try body(dir)
    finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("x129: 1M docs — fingerprint invariant under re-partitioning; " +
    "root = xor of sources") {
    withDir("x129_scale") { dir =>
      def write(parts: Int, sub: String): Unit =
        spark.range(1000000L).select(col("id").as("doc_id"),
            concat(lit("doc body "), col("id")).as("text"),
            concat(lit("src"), col("id") % 7).as("source"))
          .repartition(parts)
          .write.mode("overwrite").parquet(s"$dir/$sub/documents.parquet")
      write(32, "a")
      write(5, "b")
      val a = SparkEntry.queries("x129_dataset_merkle")(spark, s"$dir/a")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      val b = SparkEntry.queries("x129_dataset_merkle")(spark, s"$dir/b")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      assert(a.toSeq == b.toSeq, "fingerprint must not depend on layout")
      assert(a.length == 8)
      val root = a.find(_._1 == "__root__").get
      val per = a.filter(_._1 != "__root__")
      assert(root._2 == 1000000L && per.map(_._2).sum == 1000000L)
      assert(per.map(_._3).reduce(_ ^ _) == root._3)
    }
  }

  test("x125: 1M docs — each epoch a dense permutation, shards balanced, " +
    "no corpus-scale window") {
    withDir("x125_scale") { dir =>
      val n = 1000000L
      spark.range(n).select(col("id").as("doc_id"),
          lit("t").as("text"), lit("s").as("source"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val t0 = System.nanoTime()
      val out = SparkEntry.queries("x125_epoch_shuffle")(spark, dir.toString)
      // validate distributively — never collect the 2M-row frame
      val stats = out.groupBy(col("epoch"))
        .agg(count(lit(1)).as("cnt"), min(col("pos")).as("mn"),
          max(col("pos")).as("mx"), countDistinct(col("pos")).as("nd"),
          countDistinct(col("doc_id")).as("nid"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5)))
      val secs = (System.nanoTime() - t0) / 1e9
      assert(stats.map(_._1).sorted.toSeq == Seq(0, 1))
      stats.foreach { s =>
        assert(s._2 == n && s._3 == 0L && s._4 == n - 1 && s._5 == n && s._6 == n,
          s"epoch ${s._1}: positions must be a dense permutation: $s")
      }
      val shards = out.groupBy(col("epoch"), col("shard"))
        .agg(count(lit(1)).as("c")).collect().map(_.getLong(2))
      assert(shards.max - shards.min <= 1, "shards balanced ±1")
      assert(secs < 120, s"1M-doc two-epoch shuffle took $secs s")
    }
  }

  test("x126: 2M events — closed-form nearest-rank thresholds and clip " +
    "counts, exact win_sum") {
    withDir("x126_scale") { dir =>
      val n = 2000000L // 1M per type; value = (id div 2) % 100 + 0.5
      spark.range(n).select(col("id").as("event_id"),
          timestamp_micros(col("id")).as("ts"),
          (col("id") % 1000).as("user_id"),
          concat(lit("t"), col("id") % 2).as("event_type"),
          (((col("id") / 2).cast("long") % 100).cast("double") + 0.5)
            .as("value"),
          lit("{}").as("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val got = SparkEntry.queries("x126_winsorize")(spark, dir.toString)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
      assert(got.length == 2)
      // per type: each of 0.5..99.5 appears 10k times; k05 = 50_000 →
      // value index (50_000−1)//10_000 = 4 → 4.5; k95 → 94.5
      val winSum = (4 to 94).map(j => BigDecimal(j) + 0.5).sum * 10000 +
        BigDecimal(4.5) * 40000 + BigDecimal(94.5) * 50000
      got.foreach { t =>
        assert(t._2 == 1000000L)
        assert(t._3 == 4.5 && t._4 == 94.5, s"thresholds: $t")
        assert(t._5 == 40000L && t._6 == 50000L, s"clip counts: $t")
        assert(BigDecimal(t._7) == winSum, s"win_sum: $t")
      }
    }
  }

  test("x136: 1M docs — every stage's drop count lands exactly on the " +
    "planted design") {
    withDir("x136_scale") { dir =>
      // id%10==0 → wrong lang (covers all %100==0 bench docs);
      // %10==1 → too short; %10==2 → no stopwords; %10∈{3,5} → exact-dup
      // pair per decade (min-id 3 survives, 5 drops); %100==4 → bow-key
      // permutation of bench doc id−4 (decontam victim); rest pass.
      spark.range(1000000L).select(col("id").as("doc_id"),
          when(col("id") % 10 === 0, "xx").otherwise("en").as("lang"),
          when(col("id") % 10 === 1, lit("aa bb"))
            .when(col("id") % 10 === 2,
              concat(lit("word aaa bbb ccc ddd q"), col("id")))
            .when(col("id") % 10 === 3 || col("id") % 10 === 5,
              concat(lit("the and alpha beta gamma delta p"), expr("id div 10")))
            .when(col("id") % 100 === 4,
              concat(lit("u"), col("id") - 4, lit(" delta gamma beta alpha and the")))
            .otherwise(concat(lit("the and alpha beta gamma delta u"), col("id")))
            .as("text"),
          lit("s").as("source"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("x136_filter_waterfall")(spark, dir.toString)
        .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      val wantDrops = Seq(100000L, 100000L, 100000L, 100000L, 10000L)
      assert(got.map(_._3).toSeq == wantDrops, s"stage drops: ${got.toSeq}")
      assert(got.head._2 == 1000000L && got.last._4 == 590000L)
    }
  }
}
