package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x161 chrF++: independent multiset-clipping replay at sf0.001 over
  * BOTH gram kinds (char 1..6 + word 1..2 keyed as orders 7..8), plus
  * a planted corpus covering the edge conventions — empty reference
  * (split('') = [""], one empty token, shared with x155/x156), absent
  * word bigrams on single-token docs, and the fixed-8 divisor with
  * absent orders counting zero.
  */
class Ext49ChrfSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  /** Replay twin of the engine/oracle pipeline, per source. */
  private def replay(docs: Seq[(Long, String, String)])
      : Map[String, (Long, Long, Long, Long)] = {
    val byId = docs.map(d => d._1 -> d).toMap
    // (source, order) -> (clipped, totalCand, totalRef)
    val per = scala.collection.mutable.Map
      .empty[(String, Int), (Long, Long, Long)].withDefaultValue((0L, 0L, 0L))
    def counts(xs: Seq[String]): Map[String, Long] =
      xs.groupBy(identity).map { case (g, o) => g -> o.length.toLong }
    for ((id, src, ctext) <- docs if id % 2 == 1;
         (_, _, rtext) <- byId.get(id - 1)) {
      val ct = ctext.replace(" ", ""); val rt = rtext.replace(" ", "")
      val cwv = ctext.split(" ", -1).toSeq; val rwv = rtext.split(" ", -1).toSeq
      def charGr(s: String, n: Int): Map[String, Long] =
        counts((0 to s.length - n).map(i => s.substring(i, i + n)))
      def wordGr(w: Seq[String], k: Int): Map[String, Long] =
        counts((0 to w.length - k).map(i => w.slice(i, i + k).mkString(" ")))
      val sides: Seq[(Int, Map[String, Long], Map[String, Long])] =
        (1 to 6).map(n => (n, charGr(ct, n), charGr(rt, n))) ++
          (1 to 2).map(k => (k + 6, wordGr(cwv, k), wordGr(rwv, k)))
      for ((n, cg, rg) <- sides) {
        val clip = cg.map { case (g, c) => math.min(c, rg.getOrElse(g, 0L)) }.sum
        val (a, b, c) = per((src, n))
        per((src, n)) = (a + clip, b + cg.values.sum, c + rg.values.sum)
      }
    }
    per.toSeq
      .filter(_._2._2 > 0L) // rows exist only where the candidate has grams
      .groupBy(_._1._1)
      .map { case (src, rows) =>
        var nOrd = 0L; var fc = 0L; var fw = 0L
        for (((_, n), (clip, tc, tr)) <- rows) {
          val p = clip * 1000000L / math.max(tc, 1L)
          val r = clip * 1000000L / math.max(tr, 1L)
          val f2 = 5L * p * r / math.max(4L * p + r, 1L)
          nOrd += 1
          if (n <= 6) fc += f2 else fw += f2
        }
        src -> (nOrd, fc, fw, (fc + fw) / 8L)
      }
  }

  private def run(dir: String): Map[String, (Long, Long, Long, Long)] =
    SparkEntry.queries("x161_chrf_pp")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap

  test("x161: equals the two-kind multiset-clipping replay per source " +
    "on sf0.001, and the word orders genuinely contribute (f2_word_sum " +
    "> 0 somewhere — the score is not just chrF re-averaged)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val want = replay(docs)
    val got = run(sf)
    assert(got == want)
    assert(got.values.exists(_._3 > 0L),
      "no source has any word-gram credit — degenerate corpus?")
    GraftCaches.releasePrior()
  }

  test("x161 catalog native grams (adopted r10) equal the HOF-struct " +
    "spelling row for row on sf0.001 and on a planted multibyte / " +
    "empty-token corpus — the space-prefix flat key is injective " +
    "across gram kinds (char grams never contain ' ')") {
    def hof(dir: String) = graft.queries.Ext49
      .chrFpp(spark, dir, nativeGrams = false).collect().map(_.toSeq).toSeq
    def native(dir: String) =
      SparkEntry.queries("x161_chrf_pp")(spark, dir).collect()
        .map(_.toSeq).toSeq
    assert(native(sf) == hof(sf))
    import spark.implicits._
    // the collision trap: token "abc" (word 1-gram, order 7) vs char
    // 3-gram "abc" (order 3) — plus multibyte codepoints and the
    // empty/double-space token edge (split keeps interior empties)
    val docs = Seq(
      (0L, "abc abc", "m"), (1L, "abcabc", "m"),
      (2L, "ā€𝄞 ab", "u"), (3L, "ab ā€𝄞", "u"),
      (4L, "a  b", "e"), (5L, "a b", "e"))
    val dir = TestSpark.scratchDir("x161native")
    docs.map(d => (d._1, d._2, d._3)).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(native(dir) == hof(dir) && hof(dir).nonEmpty)
    GraftCaches.releasePrior()
  }

  test("x161 planted: edge conventions — empty reference (one empty " +
    "token), single-token docs with no word bigram, identical pair " +
    "scoring 8/8 orders at 1e6, and the fixed-8 divisor over absent " +
    "orders") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the cat sat on the mat", "m"), (1L, "the cat sat on a mat", "m"),
      (2L, "xyz", "x"), (3L, "zyx", "x"),          // single token, anagram
      (4L, "", "y"), (5L, "q", "y"),               // empty reference
      (6L, "one two three four", "z"), (7L, "one two three four", "z"))
    val dir = TestSpark.scratchDir("x161")
    docs.map(d => (d._1, d._2, d._3)).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = run(dir)
    val want = replay(docs.map(d => (d._1, d._3, d._2)))
    assert(got == want)
    // identical pair: char 1..4 (4-char stripped text is "onetwothreefour",
    // 15 chars, so 1..6 all present) + word 1..2 = 8 orders, all 1e6
    assert(got("z") == (8L, 6000000L, 2000000L, 1000000L))
    // anagram: unigram chars match fully, word grams 0; 3 char orders
    // (len 3) + word unigram = 4 rows present; divisor stays 8
    assert(got("x")._1 == 4L && got("x")._3 == 0L)
    assert(got("x")._4 == got("x")._2 / 8L)
    // empty ref: candidate 'q' has char-1 and word-1 grams, ref token
    // is the single empty string — nothing clips, score 0
    assert(got("y") == (2L, 0L, 0L, 0L))
    GraftCaches.releasePrior()
  }
}
