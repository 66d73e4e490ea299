package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-6 batch 4: Cohen's kappa (x144) — closed-form replay against an
  * independent computation of the contingency table, covering the
  * negative-kappa sign path the ppm split must keep floor-consistent.
  */
class Ext44Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x144: kappa_ppm equals an independent rational computation of " +
    "(po - pe)/(1 - pe) from the same contingency counts") {
    val r = SparkEntry.queries("x144_cohens_kappa")(spark, "/root/testdata/sf0.001")
      .collect().head
    val n = r.getAs[Long]("n"); val n11 = r.getAs[Long]("n11")
    val n00 = r.getAs[Long]("n00")
    val a1 = r.getAs[Long]("n_a1"); val b1 = r.getAs[Long]("n_b1")
    val chance = a1 * b1 + (n - a1) * (n - b1)
    val num = BigInt(n * (n11 + n00) - chance)
    val den = BigInt(n * n - chance)
    // two-step floor on |num| with a sign factor — the engine spelling
    val expected = (if (num < 0) -1 else 1) *
      ((num.abs / den) * 1000000 + (num.abs % den) * 1000000 / den)
    assert(BigInt(r.getAs[Long]("kappa_ppm")) == expected)
    assert(r.getAs[Long]("po_ppm") == (n11 + n00) * 1000000L / n)
    // the corpus raters genuinely disagree below chance — the sign path
    // is exercised by real data, not just constructed cases
    assert(r.getAs[Long]("kappa_ppm") != 0L)
    GraftCaches.releasePrior()
  }

  test("x144: an empty document tokenizes to ONE empty token on both " +
    "engines (split('', ' ') = ['']), so rater B's divisor is never 0 " +
    "via empty text — the greatest(·,1) guard is defensive (NULL text / " +
    "future tokenizer), not a reachable-throw fix") {
    import spark.implicits._
    // pin the divisor fact the guard comment relies on: n_tokens = 1,
    // NOT 0, for empty text
    import org.apache.spark.sql.functions.{col, size}
    val nEmpty = Seq("").toDF("text")
      .select(size(graft.ext.TextOps.words(col("text"))).as("n"))
      .collect().head.getInt(0)
    assert(nEmpty == 1, s"words('') size = $nEmpty — ANSI-audit fact moved")
    val dir = java.nio.file.Files.createTempDirectory("x144empty").toString
    Seq((0L, ""), (1L, "some words here repeated words here"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val r = SparkEntry.queries("x144_cohens_kappa")(spark, dir).collect().head
    assert(r.getAs[Long]("n") == 2L) // empty doc flowed through, no throw
    // both docs are < 40 tokens, so rater A is false for both
    assert(r.getAs[Long]("n_a1") == 0L)
    GraftCaches.releasePrior()
  }

  test("x145: finds exactly the seeded even/odd video pairs — no false " +
    "positives, and the frame-1 watermark (unsampled) does not break a match") {
    val out = SparkEntry.queries("x145_video_neardup")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    // seeded corpus: doc ids 0..499 → pairs (2k, 2k+1), 250 of them
    assert(out == (0L until 500L by 2).map(k => (k, k + 1)))
    GraftCaches.releasePrior()
  }

  test("x145 frame hashes: watermarked frame 1 differs between the pair; " +
    "sampled frames are identical") {
    import graft.ext.Multimodal
    val even = Multimodal.aviFrameAHashOf(6L, Multimodal.synthAviSeeded(6L), 1)
    val odd = Multimodal.aviFrameAHashOf(7L, Multimodal.synthAviSeeded(7L), 1)
    assert(even.size == odd.size && even.size >= 3)
    // same content everywhere except the odd id's tweaked frame 1
    val diff = even.zip(odd).filter { case (a, b) =>
      a.ahash_hi != b.ahash_hi || a.ahash_lo != b.ahash_lo }
    assert(diff.map(_._1.frame_idx) == Seq(1L),
      s"expected only frame 1 to differ, got ${diff.map(_._1.frame_idx)}")
  }
}
