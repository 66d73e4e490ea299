package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 10: local replays for perplexity bucketing, the
  * feature-hashed classifier, and the pair-graph transitivity audit. */
class Ext32Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5PrefixLong(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16)

  private def docs(): Array[(Long, Array[String])] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1)))

  test("x116: equals the sequential LM + nearest-rank tercile replay") {
    val dd = docs()
    val bigrams = dd.filter(_._2.length >= 2)
      .map { case (id, w) => (id, w.sliding(2).map(p => (p(0), p(1))).toSeq) }
    val all = bigrams.flatMap(_._2)
    val c2 = all.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val c1 = all.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val scored = bigrams.map { case (id, bs) =>
      val ppms = bs.map(b => c2(b) * 1000000L / c1(b._1))
      (id, bs.length.toLong, ppms.sum / bs.length)
    }
    val n = scored.length
    val sortedScores = scored.map(_._3).sorted
    def rank(p: Double) = math.max(1L, math.ceil(n * p).toLong)
    val t1 = sortedScores((rank(1.0 / 3) - 1).toInt)
    val t2 = sortedScores((rank(2.0 / 3) - 1).toInt)
    val want = scored.groupBy { case (_, _, s) =>
      if (s <= t1) "tail" else if (s <= t2) "middle" else "head"
    }.view.mapValues { vs =>
      (vs.length.toLong, vs.map(_._3).min, vs.map(_._3).max, vs.map(_._2).sum)
    }.toMap
    val got = SparkEntry.queries("x116_perplexity_buckets")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    assert(got.keySet == Set("head", "middle", "tail"))
    // terciles are balanced to within one doc on a tie-free corpus
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1 || sortedScores.distinct.length < n)
  }

  test("x117: equals the hash-and-lookup replay on every doc") {
    val ws = (0 until 64).map(i => (i * 2654435761L) % 1000 - 500)
    val want = docs().sortBy(_._1).map { case (id, w) =>
      val sumW = w.map(t => ws((md5PrefixLong(t) % 64).toInt)).sum
      val n = w.length.toLong
      (id, n, sumW, (sumW + 500 * n) * 1000 / n, sumW > 0)
    }
    val got = SparkEntry.queries("x117_hashed_classifier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == want.toSeq)
    val acc = got.count(_._5)
    assert(acc > 0 && acc < got.length, "classifier splits the corpus")
  }

  test("x119: equals the integer-fold replay; fold sits within k ppm " +
    "below the exact binomial estimator") {
    val trials = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "value").collect()
      .map(r => (r.getLong(0) % 50, r.getDouble(1) >= 0.5))
    val groups = trials.groupBy(_._1).view.mapValues { vs =>
      (vs.length.toLong, vs.count(_._2).toLong) }.toMap
    def fold(k: Int, n: Long, c: Long): Option[Long] =
      if (n < k) None
      else Some(1000000L - (0 until k).foldLeft(1000000L) { (acc, i) =>
        acc * math.max(n - c - i, 0L) / (n - i) })
    val got = SparkEntry.queries("x119_pass_at_k")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    assert(got.length == groups.size)
    got.foreach { case (p, n, c, p1, p5) =>
      assert((n, c) == groups(p))
      assert(p1 == fold(1, n, c) && p5 == fold(5, n, c))
      // each fold step floors once, so the product undershoots the exact
      // rational by < k ppm — pass@k overshoots by the same bound
      def binom(n: Long, k: Int): BigInt =
        if (n < k) BigInt(0)
        else (0 until k).map(i => BigInt(n - i)).product /
          (1 to k).map(BigInt(_)).product
      for ((k, pk) <- Seq((1, p1), (5, p5)); v <- pk) {
        val exact = 1000000L - (BigInt(1000000) * binom(n - c, k) / binom(n, k)).toLong
        assert(v >= exact && v <= exact + k, s"problem $p k=$k: $v vs $exact")
      }
    }
  }

  test("x118: equals the wedge/triangle replay over x3's verified pairs") {
    val pairs = SparkEntry.queries("x3_minhash_lsh")(spark, sf)
      .select("id1", "id2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val wedges = deg.values.map(d => d * (d - 1) / 2).sum
    val pset = pairs.toSet
    val tris = (for {
      (a, b) <- pairs
      (b2, c) <- pairs if b2 == b
      if pset.contains((a, c))
    } yield (a, b, c)).length.toLong
    val Array(row) = SparkEntry.queries("x118_pair_transitivity")(spark, sf)
      .collect()
    assert((row.getLong(0), row.getLong(1)) == (wedges, tris))
    val closure = row.getLong(2)
    assert(closure == (if (wedges == 0) 0L else 3 * tris * 1000000L / wedges))
    assert(closure >= 0 && closure <= 1000000L)
  }
}
