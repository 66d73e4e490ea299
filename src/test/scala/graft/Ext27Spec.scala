package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x102–x105: exact local replays of the containment audit, greedy
  * k-center selection, soft-dedup reweighting, and tokenizer fertility. */
class Ext27Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def docs: Seq[(Long, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def hash32(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).take(4)
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex, 16)
  }

  private def shingleSet(text: String): Set[Long] = {
    val w = text.split(" ")
    if (w.length < 3) Set.empty
    else w.sliding(3).map(s => hash32(s.mkString(" "))).toSet
  }

  test("x102: containment pairs equal the exhaustive local replay over the " +
    "rare-shingle candidate set") {
    val sets = docs.map { case (id, t, _) => id -> shingleSet(t) }.toMap
    val df = sets.toSeq.flatMap { case (id, s) => s.map(_ -> id) }
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).toSet }
    val rare = df.filter { case (_, ids) => ids.size >= 2 && ids.size <= 4 }
    val cand = rare.values.flatMap { ids =>
      val v = ids.toSeq.sorted
      for (i <- v.indices; j <- (i + 1) until v.size) yield (v(i), v(j))
    }.toSet
    val want = cand.toSeq.map { case (a, b) =>
      val (s1, s2) = (sets(a), sets(b))
      val inter = (s1 & s2).size.toLong
      val (n1, n2) = (s1.size.toLong, s2.size.toLong)
      (a, b, n1, n2, inter, inter * 1000000L / n1, inter * 1000000L / n2,
        inter * 1000000L / (n1 + n2 - inter))
    }.filter(t => math.max(t._6, t._7) >= 500000L).sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x102_containment")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
      .toSeq
    assert(got == want)
    assert(got.nonEmpty, "the near-dup corpus should yield containment pairs")
    // the audit's point: at least one asymmetric (subset-ish) relation
    // where the two directions differ
    assert(got.exists(t => t._6 != t._7))
  }

  test("x103: greedy farthest-point selection matches the exact local replay " +
    "and is diverse (selected centers are mutually farther than random picks)") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toSeq
      .sortBy(_._1)
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      for (i <- a.indices) s += (a(i) - b(i)) * (a(i) - b(i))
      s
    }
    var sel = Vector((vecs.head._1, vecs.head._2, 0.0))
    while (sel.size < 4) {
      val next = vecs.filterNot(v => sel.exists(_._1 == v._1))
        .map { case (id, v) => (id, v, sel.map(c => d2(v, c._2)).min) }
        .maxBy { case (id, _, dm) => (dm, -id) }
      sel = sel :+ next
    }
    val want = sel.zipWithIndex.map { case ((id, _, dm), i) =>
      (i + 1L, id, math.floor(dm * 1e6) / 1e6) }
    val got = SparkEntry.queries("x103_kcenter_coreset")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == want)
    // selection distances are non-increasing (greedy k-center invariant)
    val ds = got.drop(1).map(_._3)
    assert(ds == ds.sorted.reverse)
    assert(ds.forall(_ > 0.0))
  }

  test("x104: weights are exact inverse cluster sizes and total mass ≈ one " +
    "doc per cluster; canonical picks match x2") {
    val got = SparkEntry.queries("x104_soft_dedup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3))).toSeq
    assert(got.map(_._1) == got.map(_._1).sorted)
    assert(got.forall(t => t._3 == 1000000L / t._2))
    // every doc survives
    assert(got.size == docs.size)
    // canonical flags: exactly one per cluster → matches x2's keep list
    val x2keep = SparkEntry.queries("x2_normalized_dedup")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(got.filter(_._4).map(_._1).toSet == x2keep)
    // soft mass: sum of weights over a cluster of size n is n·⌊1e6/n⌋ ≤ 1e6
    val byN = got.groupBy(_._2)
    byN.foreach { case (n, xs) =>
      assert(xs.forall(_._3 * n <= 1000000L && (xs.head._3 + 1) * n > 1000000L))
    }
  }

  test("x105: per-language byte/token arithmetic is exact; premium of the " +
    "cheapest language is exactly 1e6") {
    val want = docs.groupBy(_._3).map { case (lang, xs) =>
      val bytes = xs.map(_._2.getBytes("UTF-8").length.toLong).sum
      val toks = xs.map(_._2.split(" ", -1).length.toLong).sum
      (lang, xs.size.toLong, bytes, toks, bytes * 1000000L / toks)
    }.toSeq.sortBy(_._1)
    val minB = want.map(_._5).min
    val wantFull = want.map(t => (t._1, t._2, t._3, t._4, t._5,
      t._5 * 1000000L / minB))
    val got = SparkEntry.queries("x105_tokenizer_fertility")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == wantFull)
    assert(got.count(_._6 == 1000000L) >= 1)
    assert(got.forall(_._6 >= 1000000L))
  }
}
