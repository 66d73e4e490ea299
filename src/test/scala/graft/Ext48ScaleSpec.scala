package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x159 at 200k docs — the scale proof for the partial+combine
  * inversion counter. Corpus: 1000 blocks of 200 docs; s1 = char
  * length DECREASES per block (within-block ties resolve by doc_id),
  * s2 is constant (rank = doc order). The px order is therefore
  * blocks-reversed / within-block-ascending, so the inversion count
  * has the closed form C(n,2) − k·C(m,2) = 19,980,000,000 EXACTLY —
  * any cross-partition double-count or drop in the O(P) boundary
  * combine shows up as an off-by-huge integer, across the 18 adaptive
  * bit levels (= bits(n−1), derived from the count — the round-9 fix)
  * × 32 range partitions with every partition pair contributing cross
  * terms. (Block structure keeps docs ≤ 1000 chars — a first cut of
  * this spec used 200k distinct lengths and accidentally built a
  * 20 GB corpus; it still counted exactly, in 139 s.)
  */
class Ext48ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x159 on 200k block-reversed docs: n_inversions = " +
    "C(n,2) - k*C(m,2) exactly — the cross-partition combine is " +
    "integer-exact at scale") {
    import spark.implicits._
    val n = 200000L; val m = 200L; val k = n / m
    // doc i: (k - i div m) copies of one letter, no spaces — one token,
    // so s2 = 1e6 for every doc while s1 = length decreases per block
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        expr(s"repeat('a', CAST($k - id div $m AS INT))").as("text"))
    val dir = TestSpark.scratchDir("x159scale")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val r = SparkEntry.queries("x159_kendall_tau")(spark, dir)
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    val expected = n * (n - 1L) / 2L - k * (m * (m - 1L) / 2L)
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_inversions") == expected)
    assert(r.getAs[Long]("tau_ppm") ==
      1000000L - (4L * expected * 1000000L / (n * (n - 1L))))
    info(f"x159 on ${n} docs: $secs%.1f s")
    GraftCaches.releasePrior()
  }
}
