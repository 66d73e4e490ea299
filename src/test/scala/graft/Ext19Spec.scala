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

  test("x79_vocab_coverage: monotone curve, exact against a local word count") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x79_vocab_coverage")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(100L, 1000L, 10000L))
    // local ground truth
    val freq = spark.read.parquet(s"$sf/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .collect().map(_.getString(0))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = freq.values.sum
    val ranked = freq.toSeq.sortBy { case (w, c) => (-c, w) }.map(_._2)
    for ((k, covered, tot, pm) <- rows) {
      assert(tot == total)
      assert(covered == ranked.take(k.toInt).sum, s"k=$k")
      assert(pm == covered * 1000 / total)
    }
    // monotone non-decreasing coverage
    assert(rows.map(_._2).toSeq == rows.map(_._2).toSeq.sorted)
    GraftCaches.releasePrior()
  }

  test("x80_dup_histogram: sizes partition the corpus; matches exact dedup counts") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x80_dup_histogram")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nDocs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(rows.map(_._3).sum == nDocs, "histogram must partition the corpus")
    for ((sz, nc, nd) <- rows) assert(nd == sz * nc)
    // cross-check the duplicate mass against x1's exact-dedup survivors:
    // total docs − clusters = removed duplicates
    val survivors = SparkEntry.queries("x1_exact_dedup")(spark, sf).count()
    assert(rows.map(_._2).sum == survivors,
      "cluster count must equal exact-dedup survivor count")
    GraftCaches.releasePrior()
  }

  test("x83_priority_sample: equals a local DLT replay; estimates dominate weights") {
    val sf = "/root/testdata/sf0.001"
    // local replay of the integer-faithful Duffield–Lund–Thorup sampler
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"),
        (pmod(graft.ext.TextOps.hash32(
          concat(lit("prio:"), col("doc_id").cast("string"))),
          lit(2147483648L)) + 1).as("u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ranked = docs
      .map { case (id, w, u) => (id, w, w * 2147483648L / u) }
      .sortBy { case (id, _, p) => (-p, id) }
    val tau = ranked(20)._3
    val want = ranked.take(20)
      .map { case (id, w, p) => (id, (w, p, math.max(w, tau / 2147483648L))) }
      .toMap
    val got = SparkEntry.queries("x83_priority_sample")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want)
    for ((_, (w, _, est)) <- got) assert(est >= w)
    GraftCaches.releasePrior()
  }

  test("x84_dup_spans: equals a local window-hash replay") {
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val occ = scala.collection.mutable.Map.empty[String, (Long, Set[Long], Long)]
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- docs) {
      val w = text.split(" ", -1)
      var i = 0
      while (i + 32 <= w.length) {
        val span = w.slice(i, i + 32).mkString(" ")
        val h = md.digest(span.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
        val (n, ds, fd) = occ.getOrElse(h, (0L, Set.empty[Long], Long.MaxValue))
        occ(h) = (n + 1, ds + id, math.min(fd, id))
        i += 16
      }
    }
    val want = occ.toSeq.collect { case (h, (n, ds, fd)) if n > 1 =>
      (h, n, ds.size.toLong, fd) }
      .sortBy { case (h, n, _, _) => (-n, h) }.take(20)
    val got = SparkEntry.queries("x84_dup_spans")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == want)
    assert(got.nonEmpty && got.forall(_._2 >= 2))
  }

  test("x82_span_merge: hand-checkable doc and global invariants") {
    val sf = "/root/testdata/sf0.001"
    val rows = SparkEntry.queries("x82_span_merge")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // doc 0: spans (s = 13i % 180, e = s + 10 + i) for i in 0..4:
    //   (0,10) (13,24) (26,38) (39,52) (52,66) — 52 = end(39,52) merges
    //   (at-boundary touch is NOT strictly greater), so islands are
    //   {0-10},{13-24},{26-38},{39-66}: 4 islands, covered 10+11+12+27=60
    assert(rows.head == ((0L, 4L, 60L)), s"doc 0 got ${rows.head}")
    // invariants for every doc: 1 ≤ islands ≤ 5, covered ≥ longest span (10),
    // covered ≤ sum of span lengths (≤ 5·39)
    for ((id, n, cov) <- rows) {
      assert(n >= 1 && n <= 5, s"doc $id islands $n")
      assert(cov >= 10 && cov <= 195, s"doc $id covered $cov")
    }
    assert(rows.size == 500)
  }
}
