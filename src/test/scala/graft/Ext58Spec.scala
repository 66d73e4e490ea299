package graft

import org.scalatest.funsuite.AnyFunSuite

/** x181 Hopkins: straight-collections replay (raw-md5 probe order +
  * synthetic generation, brute NN loops) on planted geometries — a
  * tight two-cluster cloud (H near 1) and a full integer lattice whose
  * synthetic points all land ON data points (u = 0 ⇒ H = 0) — plus
  * full sf0.001. */
class Ext58Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.queries.Ext58.HopkinsM

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h32(s: String): Long = java.lang.Long.parseLong(
    md5hex(s).take(8), 16)

  private def replay(rows: Seq[(Long, Array[Float])])
      : (Long, Long, Long, Long) = {
    val x = rows.map { case (id, v) =>
      id -> v.map(e => math.floor((e + 1.0) * 1000.0).toLong)
    }.toMap
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (p, q) => (p - q) * (p - q) }.sum
    val probes = x.keys.toSeq.sortBy(id => (md5hex(id.toString), id))
      .take(HopkinsM)
    val synth = (0 until HopkinsM).map(j =>
      (0 until 64).map(d => h32(s"${j}_$d") % 2001).toArray)
    val sw = probes.map(p =>
      x.collect { case (o, q) if o != p => d2(x(p), q) }.min).sum
    val su = synth.map(sq => x.values.map(q => d2(sq, q)).min).sum
    (HopkinsM.toLong, sw, su, 1000000L * su / math.max(su + sw, 1L))
  }

  private def engine(dir: String): (Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x181_hopkins")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
  }

  private def write(dir: String, rows: Seq[(Long, Array[Float])]): Unit = {
    import spark.implicits._
    rows.map { case (id, v) => (id, v, 0) }
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
  }

  test("x181 planted tight two-cluster cloud: H lands near 1e6 and " +
    "matches the brute replay exactly") {
    val dir = TestSpark.scratchDir("x181a")
    // 40 points split between two tight blobs at ±0.9: real NN
    // distances tiny, uniform-synthetic NN distances huge
    val rows = (0L until 40L).map { i =>
      val c = if (i % 2 == 0) -0.9 else 0.9
      (i, Array.tabulate(64)(d =>
        (c + (if (d == (i % 64).toInt) 0.001 * (i % 7) else 0.0)).toFloat))
    }
    write(dir, rows)
    val got = engine(dir)
    assert(got == replay(rows))
    assert(got._4 > 990000L)
  }

  test("x181 sf0.001 == brute replay") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    assert(engine(sf) == replay(rows))
  }
}
