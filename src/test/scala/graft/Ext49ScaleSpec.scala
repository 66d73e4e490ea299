package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x160 at 200k docs — the scale proof for the tie-aware path: 1000
  * blocks of 200 identical docs; block b has 1000+b one-char tokens of
  * which 10 are distinct, so s1 = 2(1000+b)−1 strictly INCREASES with
  * b while s2 = 10e6 div (1000+b) strictly DECREASES (consecutive
  * floors differ by ≥ 2 across the whole range — all 1000 values
  * distinct). Closed form: T1 = T2 = T3 = 1000·C(200,2) = 19,900,000;
  * every cross-block pair is discordant, D = C(n,2) − T1 =
  * 19,980,000,000; C = 0 ⇒ c_minus_d = −D, denominator = D, tau_b =
  * −1e6 EXACTLY. Exercises the three tie groupBys at 200-deep
  * multiplicities (map-side combine), dense ranking over 1000 distinct
  * values (adaptive 10 bit levels — far fewer than bits(n)), and the
  * O(P) boundary combine, with driver BigInt closing a 19.98B² product
  * no BIGINT could hold.
  */
class Ext49ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("x160 on 200k block-tied docs: all five scalars and tau_b = " +
    "-1e6 match the closed form exactly") {
    val n = 200000L; val m = 200L; val k = n / m
    // doc i, block b = i div 200: 10 distinct chars 'a'..'j' then
    // (1000+b − 10) copies of 'a', single-space separated
    val docs = spark.range(n)
      .select(col("id").as("doc_id"),
        expr("""concat('a b c d e f g h i j ',
               |  repeat('a ', CAST(990 + id div 200 AS INT) - 1), 'a')"""
          .stripMargin).as("text"))
    val dir = TestSpark.scratchDir("x160scale")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val t0 = System.nanoTime()
    val r = SparkEntry.queries("x160_kendall_tau_b")(spark, dir)
      .collect().head
    val secs = (System.nanoTime() - t0) / 1e9
    val ties = k * (m * (m - 1L) / 2L)          // 19,900,000
    val d = n * (n - 1L) / 2L - ties            // 19,980,000,000
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("t1") == ties)
    assert(r.getAs[Long]("t2") == ties)
    assert(r.getAs[Long]("t3") == ties)
    assert(r.getAs[Long]("n_discordant") == d)
    assert(r.getAs[Long]("c_minus_d") == -d)
    assert(r.getAs[Long]("denom_isqrt") == d)
    assert(r.getAs[Long]("tau_b_ppm") == -1000000L)
    info(f"x160 on ${n} docs: $secs%.1f s")
    GraftCaches.releasePrior()
  }
}
