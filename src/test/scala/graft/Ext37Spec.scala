package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 15: threshold sweep, quantile normalization, deflate
  * ratio. */
class Ext37Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("x132: counts monotone in the threshold; the 50% row matches x3; " +
    "docs bound pairs") {
    val got = SparkEntry.queries("x132_threshold_sweep")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.map(_._1).toSeq == Seq(30, 40, 50, 60, 70, 80, 90))
    val pairs = got.map(_._2)
    assert(pairs.zip(pairs.tail).forall { case (a, b) => a >= b },
      "raising the threshold can only drop pairs")
    val docs = got.map(_._3)
    assert(docs.zip(docs.tail).forall { case (a, b) => a >= b })
    got.foreach(t => assert(t._3 <= 2 * t._2, "docs ≤ 2·pairs"))
    val x3 = SparkEntry.queries("x3_minhash_lsh")(spark, sf).count()
    assert(got.find(_._1 == 50).get._2 == x3,
      "the 50% sweep row must equal x3's verified pair count")
  }

  test("x132: zero-union candidates (empty shingle sets) are excluded at " +
    "every threshold on a planted corpus") {
    // two docs under 3 tokens collide on the all-NULL signature's band
    // keys but have an undefined 0/0 jaccard — the sweep must not count
    // them at any threshold (the oracle mirrors with union > 0)
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_x132_edge_${System.nanoTime()}")
    try {
      import org.apache.spark.sql.functions._
      spark.range(4).select(col("id").as("doc_id"),
          when(col("id") < 2, lit("tiny doc"))
            .otherwise(concat(lit("alpha beta gamma delta epsilon zeta "),
              lit("eta theta iota kappa tag"), col("id") % 2)).as("text"),
          lit("en").as("lang"), lit("s").as("source"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val got = SparkEntry.queries("x132_threshold_sweep")(spark, dir.toString)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      // docs 2 and 3 share 10 of 11 shingle positions? they differ only in
      // the trailing tag token, so their 3-shingle sets overlap heavily →
      // they may pair at low thresholds; docs 0/1 (empty shingles) never do
      got.foreach { t =>
        assert(t._3 <= 2, s"only the two real docs may ever appear: $t")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(dir)
    }
  }

  test("x133: equals the rank-matching replay; identity when one source") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nPool = docs.length.toLong
    val poolCum = docs.map(_._2).groupBy(identity).view.mapValues(_.length.toLong)
      .toSeq.sortBy(_._1)
      .scanLeft((0L, 0L)) { case ((_, c), (len, n)) => (len, c + n) }.drop(1)
    val want = docs.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val nSrc = ds.length.toLong
      val hist = ds.map(_._2).groupBy(identity).view.mapValues(_.length.toLong)
        .toSeq.sortBy(_._1)
      hist.scanLeft((0L, 0L, 0L)) { case ((_, _, c), (len, n)) => (len, n, c + n) }
        .drop(1).map { case (len, n, cumS) =>
          val mapped = poolCum.find { case (_, cumP) => cumP * nSrc >= cumS * nPool }
            .get._1
          (src, len, n, cumS, mapped)
        }
    }
    val got = SparkEntry.queries("x133_quantile_norm")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == want)
    // rank-matching onto the pool preserves order within each source
    got.groupBy(_._1).values.foreach { rs =>
      val ms = rs.sortBy(_._2).map(_._5)
      assert(ms == ms.sorted, "mapping must be monotone in the source length")
    }
  }

  test("x134: equals a local Deflater replay; repetitive text compresses " +
    "far below shuffled-unique text") {
    val got = SparkEntry.queries("x134_deflate_ratio")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val defl = new java.util.zip.Deflater(6)
    val buf = new Array[Byte](64 * 1024)
    val want = docs.map { case (id, text) =>
      val in = text.getBytes("UTF-8")
      defl.reset(); defl.setInput(in); defl.finish()
      var n = 0L
      while (!defl.finished()) n += defl.deflate(buf)
      (id, in.length.toLong, n, n * 1000000L / math.max(in.length.toLong, 1L))
    }
    defl.end()
    assert(got.toSeq == want.toSeq)
    // ordering property on constructed extremes
    def ratio(s: String): Long = {
      val d2 = new java.util.zip.Deflater(6)
      val in = s.getBytes("UTF-8")
      d2.reset(); d2.setInput(in); d2.finish()
      var n = 0L
      while (!d2.finished()) n += d2.deflate(buf)
      d2.end()
      n * 1000000L / in.length
    }
    val rep = ratio("spark " * 2000)
    val uniq = ratio((0 until 2000).map(i => s"w${i * 2654435761L % 99991}").mkString(" "))
    assert(rep * 5 < uniq, s"repetitive ($rep) must compress far below unique ($uniq)")
  }
}
