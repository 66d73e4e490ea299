package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x47's rare-term df window is a RECALL knob, not a constant: on a corpus
  * whose similarity signal lives in commoner terms, the production [2,4]
  * window misses pairs that a wider window finds. This spec shifts the
  * fixture corpus's term statistics and pins both directions of the knob's
  * behavior against the exact all-shared-term ground truth
  * (dfHi = Int.MaxValue — complete support of dot > 0). */
class Ext7RecallSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("df window recall: wide cap recovers the shifted corpus; narrow cap provably cannot") {
    val sf = "/root/testdata/sf0.001"
    // shift the statistics: suffix every original token with its doc_id
    // (each doc's own shingles drop to df = 1 — no cross-doc rare-term
    // signal survives) and append a shared 12-token block drawn from a
    // pool of 7 (block = doc_id % 7). The block's shingles land at
    // df ≈ 150/7 ≈ 21 — far above the [2,4] window — and now carry ALL
    // of the pairwise similarity signal.
    val blockWords = (0 until 7).map { g =>
      (0 until 12).map(i => s"grp${g}tok${(i * 7 + g) % 11}").mkString(" ")
    }
    val blockCol = element_at(
      array(blockWords.map(lit): _*), (col("doc_id") % 7 + 1).cast("int"))
    val uniqued = expr(
      "array_join(transform(split(text, ' '), x -> concat(x, cast(doc_id AS string))), ' ')")
    val shifted = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 150)
      .select(col("doc_id"), concat(uniqued, lit(" "), blockCol).as("text"))
      .persist()
    shifted.count()

    def pairs(dfHi: Int): Set[(Long, Long)] =
      graft.queries.Ext7.sparseCosineTopK(shifted, dfLo = 2, dfHi = dfHi, k = 25)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val exact = pairs(Int.MaxValue) // ground truth: all pairs sharing a term
    assert(exact.size == 25)
    val wide = pairs(30)   // window covers the df≈21 block shingles
    val narrow = pairs(4)  // the production window, tuned to the ORIGINAL corpus

    val wideRecall = (wide & exact).size / 25.0
    val narrowRecall = (narrow & exact).size / 25.0
    assert(wideRecall >= 0.8, s"wide-cap recall $wideRecall (pairs=$wide)")
    assert(narrowRecall < wideRecall,
      s"narrow cap should lose recall on the shifted corpus: " +
        s"narrow=$narrowRecall wide=$wideRecall")
    shifted.unpersist(blocking = false)
    GraftCaches.releasePrior()
  }
}
