package graft

import org.scalatest.funsuite.AnyFunSuite
import java.security.MessageDigest

/** Round-5 batch 9: local replays for the TPC-H Q4/Q13 shapes and the
  * four curation audits (embedding outliers, RBO, token Gini, DSIR-style
  * resampling) — each recomputed sequentially in plain Scala from the
  * sf0.001 parquet and compared row-for-row. */
class Ext31Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def md5PrefixLong(s: String): Long =
    java.lang.Long.parseLong(
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString, 16)

  test("q4: equals the sequential EXISTS replay; priorities complete") {
    def ms(r: org.apache.spark.sql.Row, i: Int): Long = r.get(i) match {
      case t: java.sql.Timestamp => t.getTime
      case l: java.time.LocalDateTime =>
        l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli
    }
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_orderkey", "o_orderdate", "o_orderpriority").collect()
      .map(r => (r.getLong(0), ms(r, 1), r.getString(2)))
    val lateByOrder = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_shipdate").collect()
      .map(r => (r.getLong(0), ms(r, 1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    val want = orders.filter { case (ok, odMs, _) =>
      java.time.Instant.ofEpochMilli(odMs).atOffset(java.time.ZoneOffset.UTC)
        .getYear == 1995 &&
        lateByOrder.get(ok).exists(_ - odMs > 75L * 86400000L)
    }.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val got = SparkEntry.queries("q4_priority_count")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
    assert(got.keySet.size == 5, "every priority class should have a late order")
  }

  test("q13: histogram conserves customers and non-urgent orders; " +
    "zero-order customers survive the outer join") {
    val rows = SparkEntry.queries("q13_custdist")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nCust = spark.read.parquet(s"$sf/customer.parquet").count()
    val nOrd = spark.read.parquet(s"$sf/orders.parquet")
      .filter("o_orderpriority <> '1-URGENT'").count()
    assert(rows.map(_._2).sum == nCust, "Σcustdist must equal customer count")
    assert(rows.map { case (c, n) => c * n }.sum == nOrd,
      "Σ(c_count·custdist) must equal the non-urgent order count")
    // DESC ordering is total because c_count is the group key
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("x112: equals the integer replay; outliers are exactly the >4×-mean " +
    "vectors") {
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(x => math.floor((x.toDouble + 1.0) * 1000.0).toLong).toArray))
      .sortBy(_._1)
    val byLabel = e.groupBy(_._2)
    val cent = byLabel.view.mapValues { vs =>
      val n = vs.length
      Array.tabulate(vs.head._3.length)(j => vs.map(_._3(j)).sum / n)
    }.toMap
    val d2 = e.map { case (id, l, q) =>
      (id, l, q.zip(cent(l)).map { case (x, c) => (x - c) * (x - c) }.sum)
    }
    val sd2 = d2.groupBy(_._2).view.mapValues(v => (v.map(_._3).sum, v.length)).toMap
    val rank: Map[Long, Long] = d2.groupBy(_._2).toSeq.flatMap { case (_, vs) =>
      vs.sortBy(v => (-v._3, v._1)).zipWithIndex.map { case ((id, _, _), i) =>
        id -> (if (i < 3) i + 1L else 0L) }
    }.toMap
    val want = d2.map { case (id, l, d) =>
      val (s, n) = sd2(l)
      (id, l, d, if (s == 0) 0L else d * 1000000L / s, d * n > 4 * s, rank(id))
    }
    val got = SparkEntry.queries("x112_embedding_outliers")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4), r.getLong(5)))
    assert(got.toSeq == want.toSeq)
    // the keyed top-k is always non-trivial: exactly ranks {1,2,3} per label
    got.groupBy(_._2).foreach { case (_, vs) =>
      assert(vs.filter(_._6 > 0).map(_._6).sorted.toSeq == Seq(1L, 2L, 3L))
    }
  }

  test("x113: bounded in [0,1e6]; n_hits agrees with x90; perfect " +
    "agreement iff rbo_ppm = 1e6") {
    val got = SparkEntry.queries("x113_rbo_overlap")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    assert(got.forall { case (_, h, p) => h >= 0 && h <= 5 && p >= 0 && p <= 1000000 })
    val x90 = SparkEntry.queries("x90_ann_recall")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (q, h, _) => x90(q) == h },
      "depth-5 overlap must equal x90's recall hits")
    // rbo = 1e6 requires every depth to agree fully (ov_d = d for all d),
    // which implies 5 hits; and 5 hits with identical rank vectors gives 1e6
    assert(got.filter(_._3 == 1000000L).forall(_._2 == 5))
  }

  test("x114: equals the count-map replay on every doc") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val want = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val counts = w.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = w.length.toLong
      val ss = counts.values.map(c => c * c).sum
      (id, n, counts.size.toLong, ss, 1000000L - ss * 1000000L / (n * n))
    }
    val got = SparkEntry.queries("x114_gini_diversity")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.toSeq == want.toSeq)
  }

  test("x115: equals the df-map replay; keep rule replays the salted hash") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bigrams = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      (id, (if (w.length >= 2) w.sliding(2).map(_.mkString(" ")).toSet
            else Set.empty[String]))
    }.toMap
    val tdf = bigrams.filter(_._1 % 10 >= 8).values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val rdf = bigrams.filter(_._1 % 10 < 8).values.flatten
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val want = docs.map(_._1).filter(_ % 10 < 8).sorted.map { id =>
      val bs = bigrams(id)
      val t = bs.toSeq.map(b => tdf.getOrElse(b, 0L)).sum
      val r = bs.toSeq.map(b => rdf(b)).sum
      val imp = (t + 1) * 1000000L / (r + 1)
      val u = md5PrefixLong(s"dsir:$id") % 1000000L
      (id, t, r, imp, u < math.min(1000000L, imp * 4))
    }
    val got = SparkEntry.queries("x115_importance_resample")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == want.toSeq)
    // the filter keeps a strict, non-trivial subset
    val kept = got.count(_._5)
    assert(kept > 0 && kept < got.length)
  }
}
