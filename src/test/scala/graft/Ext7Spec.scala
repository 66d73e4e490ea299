package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 4: sparse TF-IDF cosine, snapshot diff, dataset card.
  * Hand-built corpora chosen so every branch of the operators is exercised
  * with values small enough to verify by hand.
  */
class Ext7Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext7").toString

  private def docs(rows: Seq[(Long, String)], source: Long => String = _ => "s")
  : String = {
    import spark.implicits._
    val d = tmpDir()
    rows.map { case (id, t) => (id, t, "en", source(id), t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  test("x47_sparse_cosine: rare shingle pairs docs, common shingle doesn't") {
    // docs 1/2 share the rare shingle "r1 r2 r3" (df=2); docs 3..14 all
    // carry "c1 c2 c3" (df=12 > 10 — generates NO candidate pairs)
    val d = docs(Seq((1L, "r1 r2 r3"), (2L, "r1 r2 r3")) ++
      (3L to 14L).map(i => (i, "c1 c2 c3")))
    val out = SparkEntry.queries("x47_sparse_cosine")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // N=14, tf=1, df=2 → w = 14 div 2 = 7; dot = 49; norms = 49
    assert(out.toSeq === Seq((1L, 2L, 49L, 49L, 49L)))
  }

  test("x47_sparse_cosine: dot covers ALL shared terms, not just rare ones") {
    // docs 1/2 share a rare shingle AND a shingle also present in doc 3;
    // the pair comes from the rare index but the dot must include both
    // shared shingles (df of "a b c" = 3 ≤ 10 so it also pairs 1-2-3)
    val d = docs(Seq(
      (1L, "r1 r2 r3 z a b c"),
      (2L, "r1 r2 r3 z a b c"),
      (3L, "a b c")))
    val out = SparkEntry.queries("x47_sparse_cosine")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // all pairs share at least one rare shingle → 3 pairs, ordered dot desc
    assert(out.length === 3)
    // pair (1,2) shares 5 shingles (all df=2 except "a b c" df=3):
    // w(df=2) = 3 div 2 = 1, w("a b c") = 3 div 3 = 1 → dot = 5
    assert(out.head === (1L, 2L, 5L))
    // pairs (1,3) and (2,3) share only "a b c": dot = 1
    assert(out.toSet === Set((1L, 2L, 5L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("x48_snapshot_diff: add/remove/change/unchanged counted exactly") {
    val d = docs((1L to 25L).map(i => (i, s"text of doc $i")))
    val out = SparkEntry.queries("x48_snapshot_diff")(spark, d)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // ids 1..25: removed = {17}; changed = {5,10,15,20,25}; added =
    // {1000023}; unchanged = the remaining 19
    assert(out.toSeq === Seq(
      ("added", 1L, 1000023L, 1000023L),
      ("changed", 5L, 5L, 25L),
      ("removed", 1L, 17L, 17L),
      ("unchanged", 19L, 1L, 24L)))
  }

  test("x49_dataset_card: every statistic matches the hand computation") {
    val d = docs(Seq(
      (1L, "a b c"),          // 3 tokens, 5 chars
      (2L, "a  b c"),         // 4 tokens per split-on-space, 6 chars; dup of 1 normalized
      (3L, "longer doc here x")), // 4 tokens, 17 chars
      source = i => if (i == 3) "s2" else "s1")
    val r = SparkEntry.queries("x49_dataset_card")(spark, d).collect()(0)
    assert(r.getLong(0) === 3L)       // n_docs
    assert(r.getLong(1) === 2L)       // n_sources
    assert(r.getLong(2) === 1L)       // n_langs
    // tokens: split("a  b c", " ") = [a, "", b, c] = 4
    assert(r.getLong(3) === 11L)      // total_tokens 3+4+4
    assert(r.getLong(4) === 28L)      // total_chars 5+6+17
    assert(r.getLong(5) === 4L)       // max_tokens
    assert(r.getLong(6) === 3L)       // min_tokens
    assert(r.getLong(7) === 1L)       // docs 1/2 normalize identically
  }
}
