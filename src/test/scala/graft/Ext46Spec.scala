package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x150 NDCG@10 / MRR@10 retrieval eval: full independent replay at
  * sf0.001 (double-precision fold order matches Similarity.dot, so
  * bits agree), plus closed-form corpora for the perfect-retrieval and
  * missed-top-1 boundary behavior.
  */
class Ext46Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val W = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def cos6(a: Array[Double], b: Array[Double]): Double =
    math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6) / 1e6

  /** Independent NDCG/MRR replay over collected rows (no engine code). */
  private def replay(rows: Array[(Long, Int, Array[Double])])
      : Seq[(Long, Long, Long, Long, Long)] =
    rows.filter(_._1 % 100 == 0).map { case (qid, qlab, qv) =>
      def top10(cands: Seq[(Long, Int, Array[Double])]): Seq[Long] =
        cands.filter(_._1 != qid)
          .map { case (id, _, v) => (id, cos6(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
      val gt = top10(rows.toSeq)
      val grade = gt.zipWithIndex.map { case (id, i) => id -> (10L - i) }.toMap
      val run = top10(rows.toSeq.filter(_._2 == qlab))
      val dcg = run.zipWithIndex.map { case (id, i) =>
        grade.getOrElse(id, 0L) * W(i) }.sum
      val idcg = gt.zipWithIndex.map { case (id, i) => grade(id) * W(i) }.sum
      val rr = run.zipWithIndex
        .collectFirst { case (id, i) if grade.getOrElse(id, 0L) == 10L =>
          2520L / (i + 1) }.getOrElse(0L)
      val ndcg = if (idcg == 0) 0L else dcg * 1000000L / idcg
      (qid, dcg, idcg, rr, ndcg)
    }.sortBy(_._1).toSeq

  private def collectOut(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("x150_ndcg")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("dcg_w"),
        r.getAs[Long]("idcg_w"), r.getAs[Long]("rr_2520"),
        r.getAs[Long]("ndcg_ppm"))).toSeq

  test("x150: equals the brute-force NDCG/MRR replay on sf0.001, and " +
    "the label-bucket run genuinely loses position credit somewhere " +
    "(ndcg < 1e6 for at least one query — else the audit is vacuous)") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val want = replay(rows)
    val got = collectOut(sf)
    assert(got == want)
    assert(got.exists(_._5 < 1000000L))
    assert(got.forall { case (_, dcg, idcg, rr, ndcg) =>
      dcg >= 0 && dcg <= idcg && ndcg <= 1000000L &&
        (rr == 0L || 2520L % rr == 0L) })
    GraftCaches.releasePrior()
  }

  test("x150: single-label corpus -> run arm IS the ground truth: " +
    "ndcg_ppm = 1000000 and rr_2520 = 2520 for every query") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x150perfect").toString
    // 24 vectors on a deterministic 4-dim lattice, all label 0
    val rows = (0 until 24).map { i =>
      (i.toLong, Array((i % 7 + 1).toFloat, (i % 5 + 1).toFloat,
        (i % 3 + 1).toFloat, 1.0f), 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = collectOut(dir)
    assert(got.size == 1 && got.head._1 == 0L)
    assert(got.head._4 == 2520L, s"expected perfect rr: $got")
    assert(got.head._5 == 1000000L, s"expected perfect ndcg: $got")
    GraftCaches.releasePrior()
  }

  test("x150: true nearest neighbor carries a different label -> the " +
    "bucket run cannot retrieve it: rr_2520 = 0 and ndcg_ppm < 1000000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x150miss").toString
    // query (id 0, label 0) at e1; id 1 (label 1) is nearly parallel to
    // the query — the true top-1; the label-0 bucket holds ids 2..19,
    // all strictly farther than id 1.
    val rows =
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0) +:
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f), 1) +:
      (2 until 20).map { i =>
        (i.toLong, Array(1.0f, (0.2f + i * 0.05f), 0.5f, 0.0f), 0)
      }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = collectOut(dir)
    assert(got.size == 1 && got.head._1 == 0L)
    assert(got.head._4 == 0L, s"expected missed top-1: $got")
    assert(got.head._5 < 1000000L && got.head._5 > 0L, s"got: $got")
    GraftCaches.releasePrior()
  }
}
