package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 17: SRP sketch accuracy. */
class Ext39Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x137: equals the integer SRP replay; near pairs sit at lower " +
    "Hamming distance than far pairs") {
    val pts = spark.read.parquet(s"$sf/embeddings.parquet").collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toArray
      (r.getLong(0), r.getInt(2), v,
        v.map(x => math.floor((x + 1.0) * 1000.0).toLong))
    }
    val planes = (0 until 16).map(p => graft.queries.Ext39.plane(p).toArray)
    def codeOf(q: Array[Long]): Long =
      planes.zipWithIndex.map { case (r, p) =>
        val dot = q.indices.map(i => q(i) * r(i)).sum
        if (dot > 0) 1L << p else 0L
      }.sum
    val coded = pts.map(t => (t._1, t._2, t._3, codeOf(t._4)))
    val pairs = for {
      a <- coded; b <- coded
      if a._2 == b._2 && a._1 < b._1
    } yield {
      val dot = a._3.indices.map(i => a._3(i) * b._3(i)).sum
      val na = a._3.map(x => x * x).sum
      val nb = b._3.map(x => x * x).sum
      val cos6 = math.floor(dot / math.sqrt(na * nb) * 1e6) / 1e6
      (cos6 >= 0.35, java.lang.Long.bitCount(a._4 ^ b._4).toLong)
    }
    val want = pairs.groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.map { case ((near, h), n) => (near, h, n) }
      .sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x137_srp_sketch")(spark, sf)
      .collect().map(r => (r.getBoolean(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    def meanH(near: Boolean): Double = {
      val g = got.filter(_._1 == near)
      g.map(t => t._2 * t._3).sum.toDouble / g.map(_._3).sum
    }
    assert(meanH(true) < meanH(false),
      s"near mean ${meanH(true)} must beat far mean ${meanH(false)}")
  }
}
