package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x78 first-fit-decreasing packing: hand-computed fold, sequential replay
  * parity at sf0.001, and the never-overflow / improves-on-next-fit
  * properties. */
class Ext19Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  /** Sequential FFD reference: largest-first (tie: id), first open bin
    * that fits, budget 200, pack resets per 64-doc chunk. */
  private def ffdReference(docs: Seq[(Long, Long)]): Map[Long, Long] = {
    val out = scala.collection.mutable.Map.empty[Long, Long]
    for ((chunk, ds) <- docs.groupBy(_._1 / 64)) {
      val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
      for ((id, t) <- ds.sortBy { case (id, t) => (-t, id) }) {
        val pos = fills.indexWhere(_ + t <= 200L)
        if (pos >= 0) { fills(pos) += t; out(id) = chunk * 64 + pos }
        else { fills += t; out(id) = chunk * 64 + fills.size - 1 }
      }
    }
    out.toMap
  }

  test("x78_ffd_pack: hand example — big doc opens bin, smaller ones backfill") {
    val spark0 = spark
    import spark0.implicits._
    // tokens: id0→120, id1→90, id2→80, id3→60, id4→20
    // FFD order by t desc: 120, 90, 80, 60, 20
    //   120 → bin0 (fill 120); 90 → no fit in bin0 (210) → bin1 (90);
    //   80 → bin0 (200); 60 → bin1 (150); 20 → bin1 (170)
    val docs = Seq(
      (0L, Seq.fill(120)("a").mkString(" ")),
      (1L, Seq.fill(90)("b").mkString(" ")),
      (2L, Seq.fill(80)("c").mkString(" ")),
      (3L, Seq.fill(60)("d").mkString(" ")),
      (4L, Seq.fill(20)("e").mkString(" "))).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("x78").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x78_ffd_pack")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((0L, 120L, 0L), (1L, 90L, 1L), (2L, 80L, 0L),
      (3L, 60L, 1L), (4L, 20L, 1L)))
  }

  test("x78_ffd_pack: equals the sequential reference on sf0.001; bins never overflow; beats next-fit") {
    val sf = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val want = ffdReference(toks)
    val got = SparkEntry.queries("x78_ffd_pack")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == toks.size)
    for ((id, t) <- toks)
      assert(got(id) == ((t, want(id))), s"doc $id")
    // no bin over budget (unless a single doc alone exceeds it)
    val byBin = got.toSeq.groupBy(_._2._2).map { case (b, xs) =>
      b -> xs.map(_._2._1).sum }
    for ((b, fill) <- byBin if fill > 200L)
      assert(byBin(b) == got.toSeq.filter(_._2._2 == b).map(_._2._1).max &&
        got.toSeq.count(_._2._2 == b) == 1, s"bin $b overflowed with $fill")
    // FFD must not use MORE bins than x61's next-fit on the same corpus
    val nextFitBins = SparkEntry.queries("x61_seq_pack")(spark, sf)
      .select(countDistinct(col("bin_id"))).collect()(0).getLong(0)
    assert(byBin.size <= nextFitBins,
      s"FFD used ${byBin.size} bins vs next-fit $nextFitBins")
    GraftCaches.releasePrior()
  }
}
