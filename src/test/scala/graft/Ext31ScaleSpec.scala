package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-5 batch 9–12 additions: the embedding
  * outlier audit must stay one (label, dim) shuffle + broadcast joins at
  * 400k vectors, the feature-hashed classifier must stay scan-speed at
  * 1M docs, and the KS drift statistic must stay exact with its
  * cumulative window on the bounded bucket frame at 2M events. Each test
  * materializes a closed-form synthetic fixture and drives the real
  * catalog entries. */
class Ext31ScaleSpec extends AnyFunSuite {

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

  test("x112: 400k vectors, 4 constant clusters with 10 planted outliers " +
    "each — exactly the plants flag, centroids floor clean, seconds") {
    withDir("x112_scale") { dir =>
      val n = 400000L
      // label = id % 4; members sit at 0.25 in every dim, the first 40
      // ids (10 per label) at 0.75 — quantized: 1250 vs 1750, centroid
      // floor((1250·(100000−10) + 1750·10)/100000) = 1250 exactly
      spark.range(n).select(col("id").as("vec_id"),
          (col("id") % 4).cast("int").as("label"),
          expr("transform(sequence(1, 64), j -> CAST(" +
            "CASE WHEN id < 40 THEN 0.75 ELSE 0.25 END AS FLOAT))")
            .as("embedding"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      val t0 = System.nanoTime()
      val got = SparkEntry.queries("x112_embedding_outliers")(spark, dir.toString)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(got.length == n)
      val d2o = 64L * 500 * 500
      val outliers = got.filter(_.getBoolean(4))
      assert(outliers.map(_.getLong(0)).sorted.toSeq == (0L until 40L),
        "exactly the planted vectors flag as outliers")
      assert(outliers.forall { r =>
        r.getLong(2) == d2o && r.getLong(3) == 1000000L / 10 })
      // top-3 farthest per label = the 3 lowest planted ids of that label
      val far = got.filter(_.getLong(5) > 0)
      assert(far.length == 12 && far.forall(_.getLong(0) < 12))
      val clean = got.filter(r => !r.getBoolean(4))
      assert(clean.forall(r => r.getLong(2) == 0L && r.getLong(5) == 0L))
      assert(secs < 60, s"outlier audit too slow at 400k: $secs s")
    }
  }

  test("x117: 1M docs classify at scan speed; every row equals its " +
    "class replay") {
    withDir("x117_scale") { dir =>
      val n = 1000000L
      // 16 doc classes, 8 tokens each: class c gets tokens tc_0..tc_7
      spark.range(n).select(col("id").as("doc_id"),
          concat_ws(" ", expr(
            "transform(sequence(0, 7), j -> concat('t', id % 16, '_', j))"))
            .as("text"))
        .withColumn("lang", lit("en"))
        .withColumn("source", concat(lit("src"), col("doc_id") % 20))
        .withColumn("n_chars", length(col("text")))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val ws = (0 until 64).map(i => (i * 2654435761L) % 1000 - 500)
      def md5PrefixLong(s: String): Long =
        java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8"))
            .take(4).map(b => f"$b%02x").mkString, 16)
      val classSum = (0 until 16).map { c =>
        c.toLong -> (0 until 8).map(j =>
          ws((md5PrefixLong(s"t${c}_$j") % 64).toInt)).sum
      }.toMap
      val t0 = System.nanoTime()
      val got = SparkEntry.queries("x117_hashed_classifier")(spark, dir.toString)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert(got.length == n)
      assert(got.forall { r =>
        val sw = classSum(r.getLong(0) % 16)
        r.getLong(1) == 8L && r.getLong(2) == sw &&
          r.getLong(3) == (sw + 500 * 8) * 1000 / 8 &&
          r.getBoolean(4) == (sw > 0)
      })
      assert(secs < 90, s"classifier too slow at 1M docs: $secs s")
    }
  }

  test("x120: 2M events with linear CDFs — the exact 200000-ppm gap at " +
    "vm=399, bounded bucket frame") {
    withDir("x120_scale") { dir =>
      val n = 2000000L
      // clicks: vm uniform on 0..499 (2000 each); errors: 0..399 (2500
      // each). Largest CDF gap lands at vm=399: |2000·400 − 2500·400|·1e6
      // ÷ 1e12 per unit → 500·400 = 200000 ppm.
      spark.range(n).select(col("id").as("event_id"),
          expr("timestamp_micros(id)").as("ts"),
          (col("id") % 1000).as("user_id"),
          when(col("id") % 2 === 0, "click").otherwise("error").as("event_type"),
          when(col("id") % 2 === 0, (col("id").cast("double") / 2) % 500)
            .otherwise((col("id").cast("double") / 2) % 400).as("value"),
          lit("").as("props"))
        .repartition(32)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      val t0 = System.nanoTime()
      val Array(row) = SparkEntry.queries("x120_ks_drift")(spark, dir.toString)
        .collect()
      val secs = (System.nanoTime() - t0) / 1e9
      assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
        == (399L, 1000000L, 1000000L, 200000L))
      assert(secs < 60, s"KS drift too slow at 2M events: $secs s")
    }
  }
}
