package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 14: local replays for calibration, dataset fingerprint,
  * MMR selection, and association lift. */
class Ext36Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** The x117/x121/x128 scorer replay: (is-en, per-mille score). */
  private def scoreDocs(): Array[(Boolean, Long)] = {
    val ws = (0 until 64).map(i => (i * 2654435761L) % 1000 - 500)
    spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect().map { r =>
      val w = r.getString(1).split(" ", -1)
      val sumW = w.map { t =>
        val h = java.lang.Long.parseLong(md5hex(t).take(8), 16)
        ws((h % 64).toInt)
      }.sum
      val n = w.length.toLong
      (r.getString(0) == "en", (sumW + 500L * n) * 1000L / n / 1000L)
    }
  }

  test("x128: equals the decile replay; Brier and rates exact; score in [0,1000]") {
    val scored = scoreDocs()
    assert(scored.forall(t => t._2 >= 0 && t._2 <= 1000))
    val want = scored.groupBy(t => math.min(t._2 / 100, 9L)).toSeq.sortBy(_._1)
      .map { case (b, vs) =>
        val n = vs.length.toLong
        val nPos = vs.count(_._1).toLong
        val sumSb = vs.map(_._2).sum
        val brier = vs.map { case (pos, sb) =>
          val y = if (pos) 1000L else 0L; (sb - y) * (sb - y)
        }.sum
        (b, n, nPos, sumSb / n, nPos * 1000L / n, brier, brier / n)
      }
    val got = SparkEntry.queries("x128_brier_calibration")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    // perfectly calibrated would mean pred_pm == obs_pm; assert both exist
    assert(got.map(_._2).sum == scored.length)
  }

  test("x169: ECE/MCE equal the decile replay with the cancelled-floor " +
    "identity |obs - pred|*n_b = |1000*n_pos - sum_sb| (one floor for " +
    "ECE, per-bucket floors for MCE)") {
    val scored = scoreDocs()
    val byB = scored.groupBy(t => math.min(t._2 / 100, 9L))
    val gaps = byB.map { case (_, vs) =>
      val np = vs.count(_._1).toLong
      val ssb = vs.map(_._2).sum
      (math.abs(1000L * np - ssb), vs.length.toLong)
    }.toSeq
    val n = scored.length.toLong
    val ece = gaps.map(_._1).sum / math.max(n, 1L)
    val mce = gaps.map { case (gp, nb) => gp / nb }.max
    val r = SparkEntry.queries("x169_ece_calibration")(spark, sf)
      .collect().head
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_buckets") == byB.size.toLong)
    assert(r.getAs[Long]("ece_pm") == ece)
    assert(r.getAs[Long]("mce_pm") == mce)
    // sanity: ECE never exceeds MCE
    assert(ece <= mce)
  }

  test("x129: root is the xor of per-source fingerprints; content-sensitive") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, ds) =>
      val fp = ds.map { case (_, id, text) =>
        java.lang.Long.parseLong(md5hex(s"$id:$text").take(15), 16)
      }.reduce(_ ^ _)
      (src, ds.length.toLong, fp)
    }
    val root = ("__root__", docs.length.toLong, want.map(_._3).reduce(_ ^ _))
    val got = SparkEntry.queries("x129_dataset_merkle")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == (root +: want).sortBy(_._1))
    // a one-character content change must flip the root fingerprint
    val mutated = java.lang.Long.parseLong(
      md5hex(s"${docs.head._2}:${docs.head._3}X").take(15), 16)
    val orig = java.lang.Long.parseLong(
      md5hex(s"${docs.head._2}:${docs.head._3}").take(15), 16)
    assert((root._3 ^ orig ^ mutated) != root._3)
  }

  test("x130: equals the greedy MMR replay; scores non-increasing after rank 1") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map { r =>
        (r.getLong(0),
          r.getSeq[Float](1).map(x => math.floor((x + 1.0) * 1000.0).toLong).toArray)
      }
    val n = pts.length.toLong
    val cent = Array.tabulate(64)(i => pts.map(_._2(i)).sum / n)
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(i => a(i) * b(i)).sum
    val rel = pts.map { case (id, q) => (id, q, dot(q, cent)) }
    var sel = Vector.empty[(Long, Array[Long], Long, Long)]
    while (sel.size < 4) {
      val cand = rel.filter(t => !sel.exists(_._1 == t._1)).map { case (id, q, rl) =>
        val pen = if (sel.isEmpty) 0L else sel.map(s => dot(q, s._2)).max
        (id, q, rl, pen)
      }
      val best = cand.minBy(t => (-(t._3 - t._4), t._1))
      sel = sel :+ best
    }
    val want = sel.zipWithIndex.map { case ((id, _, rl, pn), i) =>
      (i + 1L, id, rl, pn, rl - pn)
    }
    val got = SparkEntry.queries("x130_mmr_select")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toVector
    assert(got == want)
    val tail = got.drop(1).map(_._5)
    assert(tail == tail.sorted.reverse, "greedy scores non-increasing")
  }

  test("x131: equals the basket replay; pairs are ordered and lift near 1e6") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select("user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).distinct
    val users = ev.map(_._1).distinct.length.toLong
    val singles = ev.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val co = ev.groupBy(_._1).values.flatMap { b =>
      val ts = b.map(_._2).sorted
      for (i <- ts.indices; j <- (i + 1) until ts.length) yield (ts(i), ts(j))
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong)
    val want = co.toSeq.sortBy(_._1).map { case ((a, b), c) =>
      (a, b, c, singles(a), singles(b),
        (c * 1000000L / singles(a)) * users / singles(b))
    }
    val got = SparkEntry.queries("x131_cooccurrence_lift")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
    assert(got.forall(t => t._1 < t._2), "pairs ordered a < b")
  }
}
