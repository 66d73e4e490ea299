package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 13: local replays for silhouette, epoch shuffle,
  * winsorization, and distinct-n diversity. */
class Ext35Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x124: equals the integer silhouette replay; scores bounded by ±1e6") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet").collect()
    val pts = rows.map { r =>
      val v = r.getSeq[Float](1).map(x => math.floor((x + 1.0) * 1000.0).toLong).toArray
      (r.getLong(0), r.getInt(2), v)
    }
    val cent = pts.groupBy(_._2).view.mapValues { ms =>
      val n = ms.length.toLong
      Array.tabulate(64)(i => ms.map(_._3(i)).sum / n) // integer floor-mean
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => (a(i) - b(i)) * (a(i) - b(i))).sum
    val per = pts.map { case (_, lab, q) =>
      val a2 = d2(q, cent(lab))
      val b2 = cent.collect { case (l, c) if l != lab => d2(q, c) }.min
      val s = (if (b2 >= a2) 1L else -1L) *
        (math.abs(b2 - a2) * 1000000L / math.max(math.max(a2, b2), 1L))
      (lab, s, b2 > a2)
    }
    val want = per.groupBy(_._1).toSeq.sortBy(_._1).map { case (lab, vs) =>
      val n = vs.length.toLong
      val sum = vs.map(_._2).sum
      val mean = if (sum >= 0) sum / n else -((-sum) / n)
      (lab, n, sum, mean, vs.count(_._3).toLong * 1000000L / n)
    }
    val got = SparkEntry.queries("x124_silhouette")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    assert(got.forall(t => math.abs(t._4) <= 1000000L), "mean s in [-1, 1]")
  }

  test("x125: each epoch is a full permutation; epochs disagree; shards balanced") {
    val got = SparkEntry.queries("x125_epoch_shuffle")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    val byEpoch = got.groupBy(_._1)
    assert(byEpoch.keySet == Set(0, 1))
    for ((_, rs) <- byEpoch) {
      assert(rs.map(_._3).sorted.toSeq == (0L until nDocs), "dense 0-based positions")
      assert(rs.map(_._2).distinct.length == nDocs, "every doc exactly once")
      assert(rs.forall(r => r._4 == r._3 % 8), "round-robin shards")
      val shardSizes = rs.groupBy(_._4).values.map(_.length)
      assert(shardSizes.max - shardSizes.min <= 1, "shards balanced ±1")
    }
    val ord0 = byEpoch(0).sortBy(_._3).map(_._2).toSeq
    val ord1 = byEpoch(1).sortBy(_._3).map(_._2).toSeq
    assert(ord0 != ord1, "different epochs give different orders")
    // reproducible: a second construction yields the identical frame
    val again = SparkEntry.queries("x125_epoch_shuffle")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.sortBy(t => (t._1, t._3)).toSeq == again.sortBy(t => (t._1, t._3)).toSeq)
  }

  test("x126: thresholds are the exact nearest-rank p05/p95; clip counts < 5%") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val want = ev.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length.toLong
      val lo = sorted(((5 * n + 99) / 100).toInt - 1)
      val hi = sorted(((95 * n + 99) / 100).toInt - 1)
      val nLo = sorted.count(_ < lo).toLong
      val nHi = sorted.count(_ > hi).toLong
      val winSum = BigDecimal(sorted.map(v => BigDecimal(math.min(math.max(v, lo), hi))
        .setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum.toString).toDouble
      (t, n, lo, hi, nLo, nHi, winSum)
    }
    val got = SparkEntry.queries("x126_winsorize")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getLong(5), r.getDouble(6), r.getDouble(7)))
    assert(got.map(t => (t._1, t._2, t._3, t._4, t._5, t._6, t._7)).toSeq == want)
    got.foreach { t =>
      assert(t._5 * 20 <= t._2 && t._6 * 20 <= t._2, s"${t._1}: clips within 5%")
      assert(t._8 == t._7 / t._2, "mean is sum/n")
      assert(t._3 <= t._4, "lo <= hi")
    }
  }

  test("x127: equals the bigram type/token replay; ratios in (0, 1e6]") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val grams = docs.flatMap { case (src, text) =>
      val w = text.split(" ", -1)
      if (w.length < 2) Seq.empty
      else w.sliding(2).map(p => (src, p.mkString(" "))).toSeq
    }
    val want = grams.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, gs) =>
      val counts = gs.groupBy(_._2).view.mapValues(_.length.toLong)
      val total = gs.length.toLong
      val distinct = counts.size.toLong
      val hapax = counts.count(_._2 == 1L).toLong
      (src, total, distinct, hapax,
        distinct * 1000000L / total, hapax * 1000000L / distinct)
    }
    val got = SparkEntry.queries("x127_distinct_ngrams")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.forall(t => t._5 > 0 && t._5 <= 1000000L))
  }
}
