package graft

import org.scalatest.funsuite.AnyFunSuite

/** x177 Calinski–Harabasz: a planted two-cluster geometry with a
  * closed-form exact CH, a planted worst case (cluster means equal ⇒
  * B ≈ 0), and a full sf0.001 replay vs an exact-BigInt brute force
  * computed straight from the definition (per-window... per-cluster
  * scatter matrices never materialized — same floors, independent
  * derivation). */
class Ext55Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def engine(dir: String): (Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x177_calinski_harabasz")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  /** Brute force from the definition: quantize, per-cluster mean
    * scatter via BigInt rationals — then apply the SAME documented
    * floor spelling. */
  private def replay(rows: Seq[(Int, Array[Float])])
      : (Long, Long, Long, Long, Long) = {
    val q = rows.map { case (lab, v) =>
      lab -> v.map(x => math.floor((x + 1.0) * 1000.0).toLong)
    }
    val n = BigInt(q.size)
    val byc = q.groupBy(_._1)
    val k = BigInt(byc.size)
    val dims = q.head._2.length
    val t = q.iterator.flatMap(_._2).map(x => BigInt(x) * x).sum
    val M = BigInt(1000000)
    val a6 = byc.values.map { vs =>
      val qc = (0 until dims).map { d =>
        val s = vs.map(v => BigInt(v._2(d))).sum; s * s
      }.sum
      qc * M / vs.size
    }.sum
    val u = (0 until dims).map { d =>
      val r = q.map(v => BigInt(v._2(d))).sum; r * r
    }.sum
    val w6 = t * M - a6
    val b6 = a6 - u * M / n
    val ch = b6 * (n - k) * M / (w6.max(1) * (k - 1).max(1))
    (n.toLong, k.toLong, w6.toLong, b6.toLong, ch.toLong)
  }

  private def write(dir: String, rows: Seq[(Long, Int, Array[Float])]): Unit = {
    import spark.implicits._
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("x177 planted: two tight clusters far apart — closed form") {
    val dir = TestSpark.scratchDir("x177a")
    // 1-D geometry in 64 dims with BINARY-EXACT float offsets (±0.625,
    // ±0.375 — float32-representable, so quantization is exactly 375/
    // 625 vs 1375/1625). Per cluster per dim: Σx² − S²/2 = 31250, so
    // W = 64·2·31250 = 4e6; B per dim = (10⁶/2 + 9·10⁶/2) − 16·10⁶/4
    // = 1e6, so B = 64e6; CH = 64e6·2/(4e6·1) = 32.
    def vec(x: Double) = Array.fill(64)(x.toFloat)
    val rows = Seq(
      (1L, 0, vec(-0.625)), (2L, 0, vec(-0.375)),
      (3L, 1, vec(0.375)), (4L, 1, vec(0.625)))
    write(dir, rows)
    val got = engine(dir)
    assert(got == replay(rows.map(r => (r._2, r._3))))
    assert(got._3 == 4000000L * 1000000L)
    assert(got._4 == 64000000L * 1000000L)
    assert(got._5 == 32L * 1000000L)
  }

  test("x177 planted: equal cluster means give B = 0 exactly") {
    val dir = TestSpark.scratchDir("x177b")
    def vec(x: Double) = Array.fill(64)(x.toFloat)
    // both clusters centered at 0 with the same symmetric spread
    val rows = Seq(
      (1L, 0, vec(-0.25)), (2L, 0, vec(0.25)),
      (3L, 1, vec(-0.25)), (4L, 1, vec(0.25)))
    write(dir, rows)
    val got = engine(dir)
    assert(got == replay(rows.map(r => (r._2, r._3))))
    assert(got._4 == 0L && got._5 == 0L)
  }

  test("x177 sf0.001 replay: engine == exact-BigInt brute force") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).toArray)).toSeq
    assert(engine(sf) == replay(rows))
  }
}
