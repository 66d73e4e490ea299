package graft

import org.scalatest.funsuite.AnyFunSuite

/** x183 Wilcoxon signed-rank: straight-collections replay (brute pair
  * loops, explicit sort ranks) on planted corpora — an all-positive
  * shift (W− = 0, z > 0), a symmetric swap (W+ = W−, z = 0 exactly),
  * zero-diff drops — and full sf0.001. */
class Ext59WilcoxonSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def replay(docs: Seq[(Long, String)])
      : (Long, Long, Long, Long, Long) = {
    val v = docs.map { case (id, t) => id -> t.split(" ", -1).length.toLong }
      .toMap
    val pairs = v.keys.filter(k => k % 2 == 0 && v.contains(k + 1))
      .toSeq.sorted.map(k => (k, v(k + 1) - v(k)))
    val nz = pairs.filter(_._2 != 0)
      .sortBy { case (pid, d) => (math.abs(d), pid) }
    val n = BigInt(nz.length)
    val wplus = BigInt(nz.zipWithIndex
      .collect { case ((_, d), r) if d > 0 => r + 1L }.sum)
    val wminus = n * (n + 1) / 2 - wplus
    val s = 4 * wplus - n * (n + 1)
    val x = BigInt("1000000000000") * 3 * s * s /
      (2 * n * (n + 1) * (2 * n + 1)).max(1)
    val z = if (s < 0) -graft.queries.Ext49.isqrt(x)
      else graft.queries.Ext49.isqrt(x)
    (pairs.length.toLong, n.toLong, wplus.toLong, wminus.toLong, z.toLong)
  }

  private def engine(dir: String): (Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x183_wilcoxon_signed_rank")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def write(dir: String, docs: Seq[(Long, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  private def toks(n: Int) = (1 to n).map(i => s"t$i").mkString(" ")

  test("x183 planted all-positive shift: W- = 0; a zero-diff pair " +
    "drops from the ranks but stays in n_pairs") {
    val dir = TestSpark.scratchDir("x183a")
    val docs = Seq(
      (0L, toks(10)), (1L, toks(12)),   // +2
      (2L, toks(10)), (3L, toks(15)),   // +5
      (4L, toks(10)), (5L, toks(11)),   // +1
      (6L, toks(9)), (7L, toks(9)))     // 0 → dropped
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    assert(got == ((4L, 3L, 6L, 0L, got._5)))
    assert(got._5 > 0L)
  }

  test("x183 planted balanced ranks: W+ = W- = 5, z = 0 exactly") {
    val dir = TestSpark.scratchDir("x183b")
    // diffs +1, −2, −3, +4 → ranks 1..4, W+ = 1+4 = W− = 2+3
    val docs = Seq(
      (0L, toks(10)), (1L, toks(11)),   // +1
      (2L, toks(12)), (3L, toks(10)),   // −2
      (4L, toks(13)), (5L, toks(10)),   // −3
      (6L, toks(10)), (7L, toks(14)))   // +4
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    assert(got._3 == 5L && got._4 == 5L && got._5 == 0L)
  }

  test("x183 sf0.001 == brute replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(engine(sf) == replay(docs))
  }

  // ---- x184 Brown–Forsythe -------------------------------------------

  private def replayBf(docs: Seq[(String, String)])
      : (Long, Long, Long, Long, Long) = {
    val byLang = docs.map { case (lang, t) =>
      lang -> t.split(" ", -1).length.toLong
    }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    def medOf(vs: Seq[Long]): Long = {
      val s = vs.sorted; s(((s.length + 1) / 2 - 1).toInt)
    }
    val zs = byLang.map { case (lang, vs) =>
      val m = medOf(vs); lang -> vs.map(x => math.abs(x - m))
    }
    val M = BigInt(1000000)
    val n = BigInt(zs.values.map(_.length).sum)
    val k = BigInt(zs.size)
    val t = zs.values.flatten.map(z => BigInt(z) * z).sum
    val a6 = zs.values.map { v =>
      val s = v.map(BigInt(_)).sum; s * s * M / v.length
    }.sum
    val ss = zs.values.flatten.map(BigInt(_)).sum
    val b6 = a6 - ss * ss * M / n.max(1)
    val w6 = t * M - a6
    val f = b6 * (n - k) * M / (w6.max(1) * (k - 1).max(1))
    (n.toLong, k.toLong, b6.toLong, w6.toLong, f.toLong)
  }

  private def engineBf(dir: String): (Long, Long, Long, Long, Long) = {
    val r = SparkEntry.queries("x184_brown_forsythe")(spark, dir).head()
    (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
  }

  private def writeBf(dir: String, docs: Seq[(String, String)]): Unit = {
    import spark.implicits._
    docs.zipWithIndex.map { case ((lang, text), i) => (i.toLong, lang, text) }
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("x184 planted two-group geometry: the per-group ×1e6 floors " +
    "land exactly; equal-spread groups give B = 0") {
    val dir = TestSpark.scratchDir("x184a")
    // A: {10,10,20} → med 10, z {0,0,10}; B: {10,20,30} → med 20,
    // z {10,0,10}: A6 = 33333333 + 133333333, B6 = 16666666
    val docs = Seq(("a", toks(10)), ("a", toks(10)), ("a", toks(20)),
      ("b", toks(10)), ("b", toks(20)), ("b", toks(30)))
    writeBf(dir, docs)
    val got = engineBf(dir)
    assert(got == replayBf(docs))
    assert(got._3 == 16666666L)
    val dir2 = TestSpark.scratchDir("x184b")
    // identical z-profiles → B exactly 0
    val docs2 = Seq(("a", toks(10)), ("a", toks(20)),
      ("b", toks(30)), ("b", toks(40)))
    writeBf(dir2, docs2)
    val got2 = engineBf(dir2)
    assert(got2 == replayBf(docs2))
    assert(got2._3 == 0L && got2._5 == 0L)
  }

  test("x184 sf0.001 == brute replay") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("lang", "text").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(engineBf(sf) == replayBf(docs))
  }
}
