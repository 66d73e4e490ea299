package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x88 boilerplate scrub (full window/island replay + conservation
  * invariants) and x89 dedup provenance (full cluster replay + trail
  * completeness). */
class Ext21Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs(): Seq[(Long, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("x88_boilerplate_scrub: equals the window/island replay; tokens conserve") {
    val d = docs()
    // windows: width 16, stride 8, 1-based starts
    val spans = d.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      (1 to w.length - 15 by 8).map(i =>
        (id, i, md5hex(w.slice(i - 1, i + 15).mkString(" "))))
    }
    val flagged = spans.groupBy(_._3).filter(_._2.map(_._1).distinct.size >= 2).keySet
    val perDoc = spans.filter(s => flagged(s._3)).groupBy(_._1).map { case (id, ss) =>
      val iv = ss.map(s => (s._2.toLong, s._2 + 15L)).sortBy(_._1)
      // merge overlapping/adjacent
      var removed = 0L
      var (cs, ce) = iv.head
      for ((s2, e2) <- iv.tail) {
        if (s2 > ce + 1) { removed += ce - cs + 1; cs = s2; ce = e2 }
        else ce = math.max(ce, e2)
      }
      removed += ce - cs + 1
      (id, ss.size.toLong, removed)
    }
    val want = d.map { case (id, text) =>
      val n = text.split(" ", -1).length.toLong
      val (nf, rm) = perDoc.find(_._1 == id).map(t => (t._2, t._3)).getOrElse((0L, 0L))
      (id, n, nf, rm, n - rm)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x88_boilerplate_scrub")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // conservation + the corpus really contains boilerplate to scrub
    assert(got.forall { case (_, n, _, rm, kept) => rm + kept == n && rm <= n })
    assert(got.exists(_._4 > 0))
    GraftCaches.releasePrior()
  }

  test("x89_dedup_provenance: equals the cluster replay; trail is complete") {
    val d = docs()
    val clusters = d.groupBy { case (_, text) =>
      text.split(" ", -1).distinct.sorted.mkString(" ") }
      .values.filter(_.size >= 2)
    val want = clusters.flatMap { c =>
      val ids = c.map(_._1).sorted
      ids.zipWithIndex.map { case (id, k) =>
        (id, ids.head, k + 1L, ids.size.toLong) }
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("x89_dedup_provenance")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    // every cluster's survivor is rank 1 and its own keep_id
    assert(got.filter(r => r._3 == 1L).forall(r => r._1 == r._2))
    assert(got.nonEmpty)
  }
}
