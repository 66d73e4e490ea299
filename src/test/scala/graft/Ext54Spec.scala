package graft

import org.scalatest.funsuite.AnyFunSuite

/** x176 MATTR: the contribution identity vs DIRECT per-window distinct
  * sets on planted docs (repeat boundaries exactly at the window edge),
  * plus a full sf0.001 replay via the naive O(n·W) spelling — the
  * engine's linear identity must reproduce it bit-for-bit. */
class Ext54Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.queries.Ext54.MattrW

  // naive ground truth: per-window distinct sets, then the pooled rollup
  private def replay(docs: Seq[(Long, String, String)])
      : Seq[(String, Long, Long, Long, Long)] = {
    val per = docs.flatMap { case (_, src, text) =>
      val toks = text.split(" ", -1).toSeq
      val n = toks.length
      if (n < MattrW) None
      else {
        val dis = (0 to n - MattrW)
          .map(j => toks.slice(j, j + MattrW).distinct.length.toLong).sum
        Some((src, dis, (n - MattrW + 1).toLong * MattrW))
      }
    }
    per.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val dis = xs.map(_._2).sum
      val wt = xs.map(_._3).sum
      (src, xs.length.toLong, dis, wt, 1000000L * dis / wt)
    }
  }

  private def engine(dir: String): Seq[(String, Long, Long, Long, Long)] =
    SparkEntry.queries("x176_mattr")(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq

  private def write(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("x176 planted: all-same doc gives 1 distinct per window; " +
    "all-distinct doc gives W; sub-W docs emit nothing") {
    val dir = TestSpark.scratchDir("x176a")
    val docs = Seq(
      (1L, "mono", Seq.fill(MattrW + 10)("x").mkString(" ")),
      (2L, "poly", (0 until MattrW + 10).map(i => s"t$i").mkString(" ")),
      (3L, "tiny", "a b c"))
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    // mono: 11 windows × 1 distinct over 11·W window tokens
    assert(got.find(_._1 == "mono").get ==
      ("mono", 1L, 11L, 11L * MattrW, 1000000L * 11L / (11L * MattrW)))
    // poly: every window all-distinct → ppm exactly 1e6
    assert(got.find(_._1 == "poly").get._5 == 1000000L)
    assert(!got.exists(_._1 == "tiny"))
  }

  test("x176 planted: a repeat exactly W apart is distinct in every " +
    "window (boundary of the prev(i) < j interval)") {
    val dir = TestSpark.scratchDir("x176b")
    // token "r" at positions 0 and W: no window holds both (window j
    // covers [j, j+W)), so both occurrences count everywhere they
    // appear; a repeat at distance W−1 shares exactly one window.
    val gapW = ((0 until 2 * MattrW).map {
      case 0 => "r"; case MattrW => "r"; case i => s"u$i"
    }).mkString(" ")
    val gapW1 = ((0 until 2 * MattrW).map {
      case 0 => "r"; case i if i == MattrW - 1 => "r"; case i => s"v$i"
    }).mkString(" ")
    val docs = Seq((1L, "gw", gapW), (2L, "gw1", gapW1))
    write(dir, docs)
    val got = engine(dir)
    assert(got == replay(docs))
    // gw: all windows fully distinct; gw1: exactly one window (j = 0)
    // sees the repeat → one lost distinct
    assert(got.find(_._1 == "gw").get._5 == 1000000L)
    val g1 = got.find(_._1 == "gw1").get
    // W+1 windows × W tokens, one lost distinct in window j = 0 only
    assert((g1._3, g1._4) ==
      ((MattrW + 1L) * MattrW - 1L, (MattrW + 1L) * MattrW))
  }

  test("x176 sf0.001 replay: engine == naive per-window distinct sets") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(engine(sf) == replay(docs))
  }
}
