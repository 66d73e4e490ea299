package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale sanity for the round-5 span-digest family (x84 detection / x88
  * scrub / x91 matrix): 200k docs across 32 partitions with planted
  * cross-doc spans — work must track span WINDOWS (digest groupBy), with
  * nothing collected to the driver and no per-doc join fan-out. The
  * catalog lambdas read documents.parquet from a directory, so the spec
  * materializes a synthetic corpus once and drives the real entries. */
class SpanScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x84/x88: 200k docs, planted dup spans found in seconds") {
    import spark.implicits._
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"graft_span_scale_${System.nanoTime()}")
    val n = 200000L
    // every doc: 48 unique tokens; every 100th doc carries the SAME
    // 32-token boilerplate block at a stride-aligned offset (tokens
    // 17..48), so the planted digest appears in exactly n/100 docs
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(col("id") % 100 === 0,
        concat_ws(" ",
          expr("transform(sequence(1, 16), i -> concat('u', id, '_', i))"),
          expr("transform(sequence(1, 32), i -> concat('bp', i))")))
      .otherwise(
        concat_ws(" ",
          expr("transform(sequence(1, 48), i -> concat('u', id, '_', i))")))
      .as("text"))
      .withColumn("lang", lit("en")).withColumn("source",
        concat(lit("src"), (col("doc_id") % 20)))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val t0 = System.nanoTime()
      val top = SparkEntry.queries("x84_dup_spans")(spark, dir.toString)
        .collect()
      val secs1 = (System.nanoTime() - t0) / 1e9
      // the planted block dominates: its stride-17 window (b p tokens at
      // positions 17..48) lands in every 100th doc
      assert(top.nonEmpty)
      val best = top.head
      assert(best.getLong(1) == n / 100 && best.getLong(2) == n / 100,
        s"expected the planted span in ${n / 100} docs, got $best")
      val t1 = System.nanoTime()
      val scrub = SparkEntry.queries("x88_boilerplate_scrub")(spark, dir.toString)
      // every planted doc loses exactly its flagged windows' cover; clean
      // docs lose nothing — check the aggregate, not 200k rows
      val agg = scrub.agg(
        sum(when(col("removed_tokens") > 0, 1L).otherwise(0L)),
        max(col("removed_tokens")),
        sum(when(col("removed_tokens") > col("n_tokens"), 1L).otherwise(0L)))
        .collect()(0)
      val secs2 = (System.nanoTime() - t1) / 1e9
      assert(agg.getLong(0) == n / 100, s"expected ${n / 100} scrubbed docs: $agg")
      assert(agg.getLong(1) <= 48L && agg.getLong(2) == 0L)
      assert(secs1 < 120 && secs2 < 120,
        s"span family too slow at 200k docs: $secs1 s / $secs2 s")
      GraftCaches.releasePrior()
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }
}
