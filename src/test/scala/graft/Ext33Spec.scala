package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 11: local replays for the KS drift test and the
  * Mann–Whitney AUC. */
class Ext33Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5PrefixLong(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16)

  test("x120: equals the sequential CDF-gap replay") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(e => e._1 == "click" || e._1 == "error")
    val a = ev.filter(_._1 == "click").map(e => math.floor(e._2).toLong)
    val b = ev.filter(_._1 == "error").map(e => math.floor(e._2).toLong)
    val na = a.length.toLong; val nb = b.length.toLong
    val vms = (a ++ b).distinct.sorted
    val best = vms.map { v =>
      val ca = a.count(_ <= v).toLong; val cb = b.count(_ <= v).toLong
      (math.abs(ca * nb - cb * na) * 1000000L / (na * nb), v)
    }.maxBy { case (g, v) => (g, -v) }
    val Array(row) = SparkEntry.queries("x120_ks_drift")(spark, sf).collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == (best._2, na, nb, best._1))
    assert(best._1 >= 0 && best._1 <= 1000000L)
  }

  test("x121: equals the Mann-Whitney replay with half-credit ties") {
    val ws = (0 until 64).map(i => (i * 2654435761L) % 1000 - 500)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0) == "en", r.getString(1).split(" ", -1)))
    val scored = docs.map { case (pos, w) =>
      val sumW = w.map(t => ws((md5PrefixLong(t) % 64).toInt)).sum
      val n = w.length.toLong
      (pos, ((sumW + 500 * n) * 1000 / n) / 1000)
    }
    val pos = scored.filter(_._1).map(_._2)
    val neg = scored.filter(!_._1).map(_._2)
    val u2 = pos.map(p => 2L * neg.count(_ < p) + neg.count(_ == p)).sum
    val want = (pos.length.toLong, neg.length.toLong, u2,
      u2 * 1000000L / (2L * pos.length * neg.length))
    val Array(row) = SparkEntry.queries("x121_classifier_auc")(spark, sf)
      .collect()
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      == want)
    assert(want._4 >= 0 && want._4 <= 1000000L)
  }
}
