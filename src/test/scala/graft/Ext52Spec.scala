package graft

import org.scalatest.funsuite.AnyFunSuite

/** x172 Zipf doubling-buckets + x173 burstiness: planted corpora with
  * closed-form expected rows (rank/bucket boundaries, Poisson-vs-clump
  * VMR), plus full pure-Scala replays over sf0.001 — straight
  * collections instead of the GlobalSeq/groupBy plan, bit-equal output
  * required. */
class Ext52Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  // ---- replays ------------------------------------------------------

  private def toks(t: String): Seq[String] =
    t.split(" ", -1).toSeq.filter(_.nonEmpty)

  private def bitLen(x: Long): Long = 64L - java.lang.Long.numberOfLeadingZeros(x)

  private def replayZipf(docs: Seq[(Long, String)])
      : Seq[(Long, Long, Long, Long, Long, Option[Long])] = {
    val freq = docs.flatMap(d => toks(d._2))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }
    val nv = ranked.length.toLong
    val byB = ranked.zipWithIndex
      .groupBy { case (_, i) => bitLen(i + 1L) - 1L }.toSeq.sortBy(_._1)
    var prev = Option.empty[Long]
    byB.map { case (b, xs) =>
      val mass = xs.map(_._1._2).sum
      val row = (b, 1L << b, math.min((1L << (b + 1)) - 1L, nv),
        xs.length.toLong, mass, prev.map(p => mass * 1000000L / p))
      prev = Some(mass)
      row
    }
  }

  private def replayBurst(docs: Seq[(Long, String)])
      : Seq[(String, Long, Long, Long)] = {
    val nd = docs.length.toLong
    val dc = docs.flatMap { case (id, t) => toks(t).map(w => (w, id)) }
      .groupBy(identity).map { case (k, xs) => k -> xs.length.toLong }
    dc.groupBy(_._1._1).toSeq.map { case (w, m) =>
      val s = m.values.sum
      val s2 = m.values.map(c => c * c).sum
      (w, s, m.size.toLong, 1000000L * (nd * s2 - s * s) / (nd * s))
    }.sortBy { case (w, _, _, v) => (-v, w) }.take(15)
  }

  private def engineZipf(dir: String) =
    SparkEntry.queries("x172_zipf_buckets")(spark, dir).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSeq

  private def engineBurst(dir: String) =
    SparkEntry.queries("x173_burstiness")(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  private def write(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  // ---- planted ------------------------------------------------------

  test("x172 planted: rank boundaries bucket exactly at powers of two " +
    "and the doubling ratio is the exact floor") {
    val dir = TestSpark.scratchDir("x172a")
    // 7 tokens with distinct freqs 70,60,50,40,30,20,10 → ranks 1..7;
    // buckets: {1}, {2,3}, {4..7} — masses 70, 110, 100.
    val words = Seq("a" -> 70, "b" -> 60, "c" -> 50, "d" -> 40,
      "e" -> 30, "f" -> 20, "g" -> 10)
    val text = words.flatMap { case (w, n) => Seq.fill(n)(w) }.mkString(" ")
    val docs = Seq((1L, text))
    write(dir, docs)
    val got = engineZipf(dir)
    assert(got == replayZipf(docs))
    assert(got == Seq(
      (0L, 1L, 1L, 1L, 70L, None),
      (1L, 2L, 3L, 2L, 110L, Some(110L * 1000000L / 70L)),
      (2L, 4L, 7L, 4L, 100L, Some(100L * 1000000L / 110L))))
  }

  test("x172 planted: frequency ties rank by token asc (the documented " +
    "total order), rank_hi clamps to vocab size") {
    val dir = TestSpark.scratchDir("x172b")
    // 5 tokens all freq 2 → ranks follow token order; vocab 5 so the
    // bucket-2 hi clamps 7 → 5.
    val docs = Seq((1L, "e e d d c c b b a a"))
    write(dir, docs)
    val got = engineZipf(dir)
    assert(got == replayZipf(docs))
    assert(got.map(t => (t._1, t._2, t._3, t._4)) ==
      Seq((0L, 1L, 1L, 1L), (1L, 2L, 3L, 2L), (2L, 4L, 5L, 2L)))
  }

  test("x173 planted: clumped token VMR = 3e6, Poisson-spread token " +
    "VMR = 0, absent-doc zeros counted") {
    val dir = TestSpark.scratchDir("x173a")
    // 4 docs; "x" 4 times in one doc: S=4 S2=16 → (4·16−16)/(4·4)=3.
    // "y" once in each doc: S=4 S2=4 → (16−16)/16 = 0.
    val docs = Seq(
      (1L, "x x x x y"), (2L, "y"), (3L, "y"), (4L, "y"))
    write(dir, docs)
    val got = engineBurst(dir)
    assert(got == replayBurst(docs))
    assert(got == Seq(("x", 4L, 1L, 3000000L), ("y", 4L, 4L, 0L)))
  }

  test("x173 planted: ties order by token asc; floor is exact on a " +
    "non-dividing case") {
    val dir = TestSpark.scratchDir("x173b")
    // "z": counts (2,1) over 3 docs: S=3 S2=5 → (15−9)/(9) = 666666 ppm.
    val docs = Seq((1L, "z z"), (2L, "z"), (3L, "w"))
    write(dir, docs)
    val got = engineBurst(dir)
    assert(got == replayBurst(docs))
    // "w": S=1 S2=1 → (3−1)/3 = 666666 too — a tie, token asc puts it first
    assert(got == Seq(("w", 1L, 1L, 666666L), ("z", 3L, 2L, 666666L)))
  }

  // ---- full corpus replay -------------------------------------------

  private def corpus(): Seq[(Long, String)] = {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
    rows.map(r => (r.getLong(0), r.getString(1))).toSeq
  }

  test("x172 sf0.001 replay: engine == straight-collections brute force") {
    assert(engineZipf(sf) == replayZipf(corpus()))
  }

  test("x173 sf0.001 replay: engine == straight-collections brute force") {
    assert(engineBurst(sf) == replayBurst(corpus()))
  }
}
