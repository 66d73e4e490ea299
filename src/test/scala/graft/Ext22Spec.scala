package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x90 ANN recall audit (full double-precision replay — the sequential
  * fold order matches Similarity.dot, so bits agree) and x91 source copy
  * matrix (span digest replay). */
class Ext22Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x90_ann_recall: equals the brute-force replay; IVF recall is partial") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6) / 1e6
    val queries = rows.filter(_._1 % 100 == 0)
    val want = queries.map { case (qid, qlab, qv) =>
      def top5(cands: Seq[(Long, Int, Array[Double])]): Set[Long] =
        cands.filter(_._1 != qid)
          .map { case (id, _, v) => (id, cos6(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(5).map(_._1).toSet
      val gt = top5(rows.toSeq)
      val ivf = top5(rows.toSeq.filter(_._2 == qlab))
      val hits = (gt & ivf).size.toLong
      (qid, hits, hits * 1000L / 5)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("x90_ann_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the audit is informative: some query misses its bucket's horizon
    // (otherwise the IVF arm would be pointless to audit)
    assert(got.forall { case (_, h, pm) => h >= 0 && h <= 5 && pm == h * 200 })
    GraftCaches.releasePrior()
  }

  test("x92_hard_negatives: equals the different-label top-3 replay") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6) / 1e6
    val want = rows.filter(_._1 % 100 == 0).flatMap { case (qid, qlab, qv) =>
      rows.toSeq.filter(_._2 != qlab)
        .map { case (id, _, v) => (id, cos6(qv, v)) }
        .sortBy { case (id, c) => (-c, id) }.take(3).zipWithIndex
        .map { case ((id, c), k) => (qid, id, k + 1L, c) }
    }.sortBy(t => (t._1, t._3)).toSeq
    val got = SparkEntry.queries("x92_hard_negatives")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2).toLong, r.getDouble(3))).toSeq
    assert(got == want)
    // hard negatives are genuinely hard: best wrong-class neighbor is
    // still quite similar on this corpus
    assert(got.filter(_._3 == 1L).forall(_._4 > 0.0))
    GraftCaches.releasePrior()
  }

  test("x93_sq8_quantize: equals the codec replay; error bounded by step size") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
    val dims = rows.head._2.length
    val mins = (0 until dims).map(i => rows.map(_._2(i)).min).toArray
    val maxs = (0 until dims).map(i => rows.map(_._2(i)).max).toArray
    def mse6(v: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dims) {
        if (maxs(i) != mins(i)) {
          val code = math.floor((v(i) - mins(i)) * 255.0 / (maxs(i) - mins(i)))
          val recon = mins(i) + code * (maxs(i) - mins(i)) / 255.0
          s += (v(i) - recon) * (v(i) - recon)
        }
        i += 1
      }
      math.floor(s / 64.0 * 1e6) / 1e6
    }
    val want = rows.map { case (id, v) => (id, mse6(v)) }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("x93_sq8_quantize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want)
    // codec guarantee: per-dim error < one quantization step, so the MSE
    // is under the max step squared
    val maxStep2 = (0 until dims)
      .map(i => math.pow((maxs(i) - mins(i)) / 255.0, 2)).max
    assert(got.forall { case (_, m) => m >= 0.0 && m <= maxStep2 })
  }

  test("x94_semantic_dedup: equals the union-find replay") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    def cos6(a: Array[Double], b: Array[Double]): Double =
      math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6) / 1e6
    val parent = scala.collection.mutable.Map(rows.map(r => r._1 -> r._1).toSeq: _*)
    def find(x: Long): Long =
      if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
    for {
      (ida, laba, va) <- rows; (idb, labb, vb) <- rows
      if laba == labb && ida < idb && cos6(va, vb) >= 0.35
    } {
      val (ra, rb) = (find(ida), find(idb))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val byRoot = rows.map(_._1).groupBy(find)
    val want = rows.map(_._1).map { id =>
      val root = find(id)
      (id, root, byRoot(root).length.toLong, id == root)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("x94_semantic_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(got == want)
    // retention decision is total and self-consistent
    assert(got.map(_._1).distinct.size == rows.length)
    assert(got.forall { case (id, keep, _, kept) => keep <= id && kept == (id == keep) })
    assert(got.exists(_._3 > 1))
    GraftCaches.releasePrior()
  }

  test("x91_source_copy_matrix: equals the pairwise digest replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"), col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    val bySrc = scala.collection.mutable.Map.empty[String, Set[String]]
    for ((src, text) <- docs) {
      val w = text.split(" ", -1)
      var i = 0
      while (i + 32 <= w.length) {
        val h = md.digest(w.slice(i, i + 32).mkString(" ").getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        bySrc(src) = bySrc.getOrElse(src, Set.empty) + h
        i += 16
      }
    }
    val srcs = bySrc.keys.toSeq.sorted
    val want = (for {
      a <- srcs; b <- srcs if a < b
      n = (bySrc(a) & bySrc(b)).size if n > 0
    } yield (a, b, n.toLong)).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x91_source_copy_matrix")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }
}
