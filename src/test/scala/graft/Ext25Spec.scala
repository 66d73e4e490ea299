package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x97 backoff LM, x98 2-round Lloyd, x99 l-diversity, w32 windowed
  * top-k: exact replays against local integer computation. */
class Ext25Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x97: equals the local stupid-backoff replay; backoff levels fire") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq)
      .filter(_._2.length >= 3)
    val train = docs.filter(_._1 % 10 < 8).map(_._2)
    val tri = train.flatMap(_.sliding(3).map(_.toList)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val bi = train.flatMap(_.sliding(2).map(_.toList)).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val uni = train.flatten.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val nTrain = train.map(_.length.toLong).sum
    val want = docs.filter(_._1 % 10 >= 8).map { case (id, w) =>
      val grams = w.sliding(3).map(_.toList).toSeq
      var (s, h3, h2, h1, miss) = (0L, 0L, 0L, 0L, 0L)
      for (g <- grams) {
        val List(a, b, c) = g
        val c3 = tri.getOrElse(g, 0L)
        val c2bc = bi.getOrElse(List(b, c), 0L)
        val c1c = uni.getOrElse(c, 0L)
        if (c3 > 0) { s += c3 * 1000000L / bi(List(a, b)); h3 += 1 }
        else if (c2bc > 0) { s += c2bc * 2000000L / (5L * uni(b)); h2 += 1 }
        else if (c1c > 0) { s += c1c * 4000000L / (25L * nTrain); h1 += 1 }
        else miss += 1
      }
      (id, grams.length.toLong, s, h3, h2, h1, miss)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("x97_backoff_lm")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == want)
    assert(got.map(_._4).sum > 0, "trigram hits expected")
    assert(got.map(t => t._5 + t._6).sum > 0,
      "held-out docs should force at least one backoff")
  }

  test("x98: equals the local 2-round integer Lloyd replay") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => math.floor((x + 1.0) * 1e6).toLong).toArray)
      .sortBy(_._1)
    def assignTo(cents: Map[Int, Array[Long]]) = vecs.map { case (id, q) =>
      val best = cents.toSeq.map { case (cid, cq) =>
        (q.zip(cq).map { case (x, c) => (x - c) * (x - c) }.sum, cid)
      }.min
      (id, best._2, q)
    }
    def update(asg: Array[(Long, Int, Array[Long])]) =
      asg.groupBy(_._2).map { case (cid, xs) =>
        val n = xs.length
        cid -> Array.tabulate(64)(j => xs.map(_._3(j)).sum / n)
      }
    val init = vecs.filter(_._1 < 4).map { case (id, q) => id.toInt -> q }.toMap
    val p2 = assignTo(update(assignTo(init)))
    val want = p2.groupBy(_._2).toSeq.flatMap { case (cid, xs) =>
      val n = xs.length.toLong
      (0 until 64).map(j => (cid, n, j, xs.map(_._3(j)).sum / n))
    }.sortBy(t => (t._1, t._3))
    val got = SparkEntry.queries("x98_kmeans_lloyd")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getLong(3)))
      .toSeq
    assert(got == want)
    assert(got.map(_._1).distinct.size >= 2, "expect multiple live clusters")
  }

  test("x99: equals the local diversity replay") {
    val rows = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_nationkey", "c_mktsegment").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    val want = rows.groupBy(_._1).toSeq.map { case (nk, xs) =>
      val per = xs.groupBy(_._2).map(_._2.size.toLong)
      (nk, xs.size.toLong, per.size.toLong,
        per.max * 1000000L / xs.size, per.size < 3)
    }.sortBy(_._1)
    val got = SparkEntry.queries("x99_l_diversity")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4))).toSeq
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("w32: equals the local per-day top-3 replay (UTC days)") {
    val evs = graft.tables.Tables.events(spark, sf)
      .select(col("ts_ns"), col("event_type")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val perDay = evs.groupBy { case (ns, _) => ns / 86400000000000L }
    val want = perDay.toSeq.flatMap { case (day, xs) =>
      val counts = xs.groupBy(_._2).map { case (t, v) => (t, v.size.toLong) }
      counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(3).zipWithIndex
        .map { case ((t, n), i) =>
          (java.time.LocalDate.ofEpochDay(day), t, n, i + 1) }
    }.sortBy { case (d, _, _, rk) => (d.toEpochDay, rk) }
    val got = SparkEntry.queries("w32_window_topk")(spark, sf)
      .collect().map(r => (r.getDate(0).toLocalDate, r.getString(1),
        r.getLong(2), r.getInt(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.groupBy(_._1).values.forall(_.size <= 3))
  }
}
