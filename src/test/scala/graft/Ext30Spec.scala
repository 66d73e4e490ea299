package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ext.Multimodal

/** x110: the real nearest-neighbor resize against hand-computed pixel
  * arithmetic, both down- and up-scaling, across both containers. */
class Ext30Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def expected(id: Long, tw: Int, th: Int): (Long, Long, Long, Long) = {
    val w = (8 + id % 5).toInt; val h = (8 + id % 7).toInt
    var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
    for (y <- 0 until th; x <- 0 until tw) {
      val sx = x * w / tw; val sy = y * h / th
      val r = (sx * 3 + sy * 5 + id) % 256
      val g = (sx + sy * 2 + id * 7) % 256
      val b = (sx * 11 + sy + id * 13) % 256
      sr += r; sg += g; sb += b
      chk += ((r << 16) | (g << 8) | b) * (y.toLong * tw + x + 1)
    }
    (sr, sg, sb, chk)
  }

  test("x110: 4x4 downsample equals the generative replay for PNG and BMP") {
    val got = SparkEntry.queries("x110_image_resize")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.length == 500)
    assert(got.forall { case (id, w, h, sr, sg, sb, chk) =>
      w == 4 && h == 4 && (sr, sg, sb, chk) == expected(id, 4, 4) })
    // both containers took the decode path
    assert(got.exists(_._1 % 2 == 0) && got.exists(_._1 % 2 == 1))
  }

  test("imageResizeStats: upscale duplicates source pixels (NN), garbage " +
    "payloads emit no row") {
    import spark.implicits._
    val payloads = Seq(
      (0L, Multimodal.synthImage(0L, 8, 8, "png")),
      (1L, Multimodal.synthImage(1L, 9, 8, "bmp")),
      (99L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val got = Multimodal.imageResizeStats(payloads, 16, 16)
      .collect().map(r => r.doc_id ->
        (r.sum_r, r.sum_g, r.sum_b, r.chk)).toMap
    assert(got.keySet == Set(0L, 1L))
    def expectedDims(id: Long, sw: Int, sh: Int): (Long, Long, Long, Long) = {
      var sr = 0L; var sg = 0L; var sb = 0L; var chk = 0L
      for (y <- 0 until 16; x <- 0 until 16) {
        val sx = x * sw / 16; val sy = y * sh / 16
        val r = (sx * 3 + sy * 5 + id) % 256
        val g = (sx + sy * 2 + id * 7) % 256
        val b = (sx * 11 + sy + id * 13) % 256
        sr += r; sg += g; sb += b
        chk += ((r << 16) | (g << 8) | b) * (y.toLong * 16 + x + 1)
      }
      (sr, sg, sb, chk)
    }
    assert(got(0L) == expectedDims(0L, 8, 8))
    assert(got(1L) == expectedDims(1L, 9, 8))
  }

  test("x111: equals the sliding-window replay; a repeat at 2L implies a " +
    "repeat at L (stride grids nest)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").toSeq)).toSeq
    val want = Seq(8, 16, 32, 64).map { l =>
      val occ = scala.collection.mutable.Map.empty[String, Long]
      docs.foreach { case (_, w) =>
        var i = 0
        while (i + l <= w.size) {
          val k = w.slice(i, i + l).mkString(" ")
          occ(k) = occ.getOrElse(k, 0L) + 1
          i += l / 2
        }
      }
      val dups = occ.values.filter(_ > 1)
      (l, dups.size.toLong, dups.sum,
        if (dups.isEmpty) 0L else dups.max)
    }
    val got = SparkEntry.queries("x111_repeat_profile")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == want)
    // nesting property: repeats at 2L imply repeats at L
    got.sliding(2).foreach { case Seq(a, b) =>
      if (b._3 > 0) assert(a._3 > 0)
    }
  }
}
