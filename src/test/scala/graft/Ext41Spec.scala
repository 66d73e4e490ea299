package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-6 batch 1: per-line exact dedup (x141) — hand corpus with known
  * line structure, cross-doc and intra-doc duplicates, and a ragged tail
  * line; plus a plan pin (single aggregate+join shuffle chain, no window,
  * no cartesian).
  */
class Ext41Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docsDir(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext41").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def toks(r: Range, tag: String): String =
    r.map(i => s"$tag$i").mkString(" ")

  test("x141: first occurrence wins corpus-wide; intra-doc repeats dedup; " +
    "ragged tails count their true token length") {
    // line A = a0..a9, line B = b0..b9, tail = t0..t4 (5 tokens)
    val lineA = toks(0 until 10, "a")
    val lineB = toks(0 until 10, "b")
    val tail = toks(0 until 5, "t")
    val d = docsDir(Seq(
      // doc 1: A B  — both first occurrences
      1L -> s"$lineA $lineB",
      // doc 2: B A A-again — all three lines are duplicates (B and A seen
      // in doc 1; the second A in THIS doc also drops)
      2L -> s"$lineB $lineA $lineA",
      // doc 3: fresh line + ragged 5-token tail
      3L -> s"${toks(0 until 10, "c")} $tail"))
    val out = SparkEntry.queries("x141_line_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(out == Seq(
      // doc, n_lines, n_kept, n_dropped, toks_kept, n_dup_lines
      (1L, 2L, 2L, 0L, 20L, 2L),   // keeps both; both are corpus-duplicated
      (2L, 3L, 0L, 3L, 0L, 3L),    // everything seen before → all drop
      (3L, 2L, 2L, 0L, 15L, 0L)))  // fresh 10-token line + 5-token tail
  }

  test("x141: single-token and sub-line documents form one short line") {
    val d = docsDir(Seq(1L -> "only", 2L -> "two words"))
    val out = SparkEntry.queries("x141_line_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq
    assert(out == Seq((1L, 1L, 1L), (2L, 1L, 2L)))
  }

  test("x141 plan: no window, no cartesian; line key join is an equi join") {
    val df = SparkEntry.queries("x141_line_dedup")(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), s"corpus-scale window crept in:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"non-equi join crept in:\n$p")
    GraftCaches.releasePrior()
  }
}
