package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 16: rank fusion and the filter waterfall. */
class Ext38Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("x135: equals the RRF replay over x7 and x16; members come from a " +
    "source list") {
    def ranks(name: String): Map[(Long, Long), Int] =
      SparkEntry.queries(name)(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val a = ranks("x7_ivf_topk")
    val b = ranks("x16_lsh_ann")
    val fused = (a.keySet ++ b.keySet).toSeq.map { k =>
      val ra = a.get(k).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      val rb = b.get(k).map(r => 1000000000L / (60 + r)).getOrElse(0L)
      (k._1, k._2, ra > 0, rb > 0, ra + rb)
    }
    val want = fused.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (_, vs) =>
      vs.sortBy(t => (-t._5, t._2)).take(3).zipWithIndex
        .map { case (t, i) => (t._1, t._2, t._3, t._4, t._5, i + 1) }
    }
    val got = SparkEntry.queries("x135_rank_fusion")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2),
        r.getBoolean(3), r.getLong(4), r.getInt(5))).toSeq
    assert(got == want)
    assert(got.forall(t => t._3 || t._4), "every fused row has a source")
  }

  test("x136: equals the sequential-filter replay; mass conserved") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stops = Set("the", "and", "of", "to", "a")
    val keepId = docs.groupBy(d => md5hex(d._3)).values
      .flatMap(g => g.map(d => d._1 -> g.map(_._1).min)).toMap
    def bow(t: String) = md5hex(t.split(" ", -1).distinct.sorted.mkString(" "))
    val benchKeys = docs.filter(_._1 % 100 == 0).map(d => bow(d._3)).toSet
    val firstFail = docs.map { case (id, lang, text) =>
      val w = text.split(" ", -1)
      val nTok = w.length.toLong
      val nCh = text.length.toLong
      val p1 = lang == "en"
      val p2 = nTok >= 5 && nTok <= 100000 && nCh >= nTok * 3 && nCh <= nTok * 10
      val p3 = w.distinct.length * 5 >= nTok && w.count(stops) >= 2
      val p4 = id == keepId(id)
      val p5 = id % 100 != 0 && !benchKeys(bow(text))
      if (!p1) 1 else if (!p2) 2 else if (!p3) 3 else if (!p4) 4
      else if (!p5) 5 else 0
    }
    val n = docs.length.toLong
    val drops = (1 to 5).map(k => firstFail.count(_ == k).toLong)
    var nIn = n
    val want = (1 to 5).map { k =>
      val d = drops(k - 1)
      val row = (k, nIn, d, nIn - d, d * 1000000L / math.max(nIn, 1L))
      nIn -= d
      row
    }
    val got = SparkEntry.queries("x136_filter_waterfall")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.last._4 == n - drops.sum, "survivors + drops conserve the corpus")
    assert(got.map(_._1) == (1 to 5), "all five stages present")
  }
}
