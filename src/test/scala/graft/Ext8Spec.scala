package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 5: BM25 scoring and co-occurrence mining over hand-built
  * corpora small enough to verify by hand. The BM25 expectation re-derives
  * the score with the same IEEE op sequence the engine declares, so the
  * test pins both the ranking and the exact fixed-point output.
  */
class Ext8Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def bm25(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Double =
    tf.toDouble * 2.2 /
      (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))) *
      n.toDouble / df.toDouble

  test("x50_bm25_topk: hand corpus — rare terms outrank frequent ones") {
    val d = docs(Seq((1L, "a a b"), (2L, "a c")))
    val out = SparkEntry.queries("x50_bm25_topk")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val avgdl = 5.0 / 2
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    // doc 1: b (tf1, df1) beats a (tf2, df2 — common term, discounted)
    assert(out.toSeq === Seq(
      (1L, 1, "b", t6(bm25(1, 3, 1, 2, avgdl))),
      (1L, 2, "a", t6(bm25(2, 3, 2, 2, avgdl))),
      (2L, 1, "c", t6(bm25(1, 2, 1, 2, avgdl))),
      (2L, 2, "a", t6(bm25(1, 2, 2, 2, avgdl)))))
  }

  test("x51_cooccurrence: within-doc distinct pairs, corpus-wide counts") {
    val d = docs(Seq((1L, "b a b"), (2L, "a b"), (3L, "c a")))
    val out = SparkEntry.queries("x51_cooccurrence")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // d1 dedups "b a b" to {a,b}; pairs: (a,b)×2 docs, (a,c)×1
    assert(out.toSeq === Seq(("a", "b", 2L), ("a", "c", 1L)))
  }

  test("x51_cooccurrence: pair generation is row-local — no join in the plan") {
    import org.apache.spark.sql.execution.FormattedMode
    val p = SparkEntry.queries("x51_cooccurrence")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), s"pair generation must not self-join:\n$p")
  }
}
