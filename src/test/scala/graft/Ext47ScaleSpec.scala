package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x154/x156 at 50k pairs — the scale shape proof for the bit-parallel
  * DP family: the entire per-pair kernel is row-local (no shuffle grows
  * with pair count; the only exchange stays the |sources|-bounded
  * rollup), so 20× the catalog's sf0.1 pair count must still run in
  * bounded wall time AND produce the CLOSED-FORM planted answer —
  * every candidate is its reference with exactly one token substituted
  * mid-sequence, so corpus-wide dist_sum = n_pairs (one edit each) and
  * lcs_sum = (len − 1) · n_pairs, exactly.
  */
class Ext47ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x156/x154 on 50k planted pairs (40 tokens each): exact " +
    "closed-form totals, bounded wall") {
    import spark.implicits._
    val n = 50000L
    val docs = spark.range(n).flatMap { i =>
      val ref = (0 until 40).map(j => s"w${i}_$j").mkString(" ")
      val cand = (0 until 40)
        .map(j => if (j == 20) "SUB" else s"w${i}_$j").mkString(" ")
      Seq((2 * i, ref, s"s${i % 4}"), (2 * i + 1, cand, s"s${i % 4}"))
    }.toDF("doc_id", "text", "source")
    val dir = TestSpark.scratchDir("x47scale")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val wer = SparkEntry.queries("x156_wer")(spark, dir).collect()
    val tWer = (System.nanoTime() - t0) / 1e9
    assert(wer.length == 4) // 4 sources
    assert(wer.map(_.getAs[Long]("n_pairs")).sum == n)
    assert(wer.map(_.getAs[Long]("dist_sum")).sum == n,
      "exactly one substitution per pair")
    assert(wer.map(_.getAs[Long]("ref_len")).sum == 40L * n)
    assert(wer.forall(_.getAs[Long]("n_capped") == 0L))
    // micro wer = n / 40n = 25000 ppm exactly, per source too (uniform)
    assert(wer.forall(_.getAs[Long]("wer_ppm") == 25000L))
    info(f"x156 on ${n} pairs: $tWer%.1f s")

    val t1 = System.nanoTime()
    val rouge = SparkEntry.queries("x154_rouge_l")(spark, dir).collect()
    val tR = (System.nanoTime() - t1) / 1e9
    assert(rouge.map(_.getAs[Long]("lcs_sum")).sum == 39L * n,
      "LCS = 39 of 40 tokens per pair")
    assert(rouge.forall(_.getAs[Long]("p_ppm") == 39000000L / 40L))
    info(f"x154 on ${n} pairs: $tR%.1f s")
    GraftCaches.releasePrior()
  }
}
