package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 18: label propagation and deterministic bootstrap. */
class Ext40Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x138: equals a 2-round synchronous LPA replay over x3's pairs") {
    val pairs = SparkEntry.queries("x3_minhash_lsh")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val seeds = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val adj = (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    def propagate(labels: Map[Long, String]): Map[Long, String] =
      labels.map { case (n, l) =>
        adj.get(n) match {
          case None => n -> l
          case Some(nbrs) =>
            val votes = nbrs.map(labels).groupBy(identity).view
              .mapValues(_.length).toSeq
            n -> votes.minBy { case (lab, v) => (-v, lab) }._1
        }
      }
    val l1 = propagate(seeds)
    val l2 = propagate(l1)
    val want = seeds.keys.toSeq.sorted.flatMap { n =>
      if (seeds(n) != l2(n) || seeds(n) != l1(n))
        Some((n, seeds(n), l1(n), l2(n), seeds(n) != l2(n)))
      else None
    }
    val got = SparkEntry.queries("x138_label_propagation")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getBoolean(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty, "the near-dup graph must flip at least one label")
  }

  test("w33: equals the first-touch replay; purchase mass matches w30") {
    val ev = graft.tables.Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts_ns div 1000")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val sorted = es.sortBy(e => (e._4, e._2))
      sorted.zipWithIndex.collect { case ((_, _, "purchase", _), i) =>
        sorted.take(i).collectFirst {
          case (_, _, t, _) if t != "purchase" => t
        }.getOrElse("(none)")
      }
    }.groupBy(identity).view.mapValues(_.length.toLong).toSeq.sortBy(_._1)
    val got = SparkEntry.queries("w33_first_touch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == want)
    val w30 = SparkEntry.queries("w30_last_touch")(spark, sf)
      .collect().map(_.getLong(1)).sum
    assert(got.map(_._2).sum == w30,
      "first- and last-touch must attribute the same purchase mass")
  }

  test("x139: equals the Poisson-weight replay; replica means tight around " +
    "the corpus mean") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def wOf(rep: Int, id: Long): Long = {
      val u = java.lang.Long.parseLong(md5hex(s"$rep:$id").take(8), 16) % 1000
      if (u < 368) 0L else if (u < 736) 1L else if (u < 920) 2L
      else if (u < 981) 3L else if (u < 996) 4L else 5L
    }
    val want = (0 until 8).map { rep =>
      val ws = docs.map { case (id, nc) => (wOf(rep, id), nc) }
      val nEff = ws.map(_._1).sum
      val wsum = ws.map(t => t._1 * t._2).sum
      (rep, nEff, wsum, wsum * 1000000L / math.max(nEff, 1L))
    }
    val got = SparkEntry.queries("x139_bootstrap_spread")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    // Poisson(1) replicas: n_eff ≈ corpus size, means within ±15% of truth
    val n = docs.length.toLong
    val truth = docs.map(_._2).sum * 1000000L / n
    got.foreach { t =>
      assert(t._2 > n / 2 && t._2 < n * 2, s"replica mass sane: $t")
      assert(math.abs(t._4 - truth) < truth * 15 / 100,
        s"replica mean ${t._4} vs truth $truth")
    }
  }
}
