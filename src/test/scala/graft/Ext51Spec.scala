package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x171 Self-BLEU: planted corpora pinning the clipping, the panel
  * hash-sample and the exact self-exclusion (the load-bearing parts),
  * plus a full pure-Scala replay over sf0.001 — straight collections
  * instead of the window/broadcast plan, bit-equal output required. */
class Ext51Spec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  import graft.queries.Ext51.SelfBleuRefs

  // ---- the replay --------------------------------------------------

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def gramCounts(w: IndexedSeq[String], n: Int)
      : Map[String, Long] =
    (0 to w.length - n).map(i => md5hex(w.slice(i, i + n).mkString(" ")))
      .groupBy(identity).map { case (g, xs) => g -> xs.length.toLong }

  /** rows: (doc_id, source, text) → engine-shaped output rows. */
  private def replay(docs: Seq[(Long, String, String)])
      : Seq[(String, Long, Long, Long, Long, Long, Long)] = {
    docs.groupBy(_._2).toSeq.sortBy(_._1).flatMap { case (src, ds) =>
      val toks = ds.map(d => d._1 -> d._3.split(" ", -1).toIndexedSeq)
      val refs = toks.sortBy { case (id, _) => (md5hex(id.toString), id) }
        .take(SelfBleuRefs)
      // (n, g) -> per-ref counts
      val rc = scala.collection.mutable.Map
        .empty[(Int, String), Map[Long, Long]]
      for ((rid, w) <- refs; n <- 1 to 4;
           (g, c) <- gramCounts(w, n))
        rc((n, g)) = rc.getOrElse((n, g), Map.empty) + (rid -> c)
      val idx = rc.map { case (k, m) =>
        val ranked = m.toSeq.sortBy { case (id, c) => (-c, id) }
        val m2 = if (ranked.length > 1) ranked(1)._2 else 0L
        k -> (ranked.head._2, ranked.head._1, m2)
      }.toMap
      val agg = Array.fill(5)(Array(0L, 0L)) // n -> [clipped, total]
      for ((did, w) <- toks; n <- 1 to 4; (g, cc) <- gramCounts(w, n)) {
        val (m1, d1, m2) = idx.getOrElse((n, g), (0L, -1L, 0L))
        val cap = if (d1 == did) m2 else m1
        agg(n)(0) += math.min(cc, cap)
        agg(n)(1) += cc
      }
      (1 to 4).filter(n => agg(n)(1) > 0).map { n =>
        val (cl, tot) = (agg(n)(0), agg(n)(1))
        (src, n.toLong, ds.length.toLong, refs.length.toLong, cl, tot,
          cl * 1000000L / math.max(tot, 1L))
      }
    }
  }

  private def runEngine(dir: String) =
    SparkEntry.queries("x171_self_bleu")(spark, dir).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq

  private def write(dir: String, docs: Seq[(Long, String, String)]): Unit = {
    import spark.implicits._
    docs.toDF("doc_id", "source", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }

  test("x171 planted: identical docs clip fully (p = 1e6 every n); " +
    "pairwise-disjoint vocab clips nothing") {
    val dir = TestSpark.scratchDir("x171a")
    val docs = (1L to 4L).map(i => (i, "same", "a b c d e f")) ++
      Seq((11L, "disj", "a b c"), (12L, "disj", "d e f"),
        (13L, "disj", "g h i"))
    write(dir, docs)
    val got = runEngine(dir)
    assert(got == replay(docs))
    val bySrc = got.groupBy(_._1)
    assert(bySrc("same").forall(_._7 == 1000000L))
    assert(bySrc("disj").forall(r => r._5 == 0L && r._7 == 0L))
    GraftCaches.releasePrior()
  }

  test("x171 planted: self-exclusion is load-bearing — two disjoint " +
    "docs both inside the panel score ZERO (each one's grams exist " +
    "only in ITSELF; clipping against yourself would score 1e6)") {
    val dir = TestSpark.scratchDir("x171b")
    val docs = Seq((1L, "s0", "a a b"), (2L, "s0", "c c d"))
    write(dir, docs)
    val got = runEngine(dir)
    assert(got == replay(docs))
    assert(got.forall(r => r._5 == 0L && r._7 == 0L),
      s"self-clipping leaked: $got")
    GraftCaches.releasePrior()
  }

  test("x171 planted: a tied argmax still clips full (m2 = m1 under " +
    "ties), and a unique argmax candidate falls back to the runner-up") {
    val dir = TestSpark.scratchDir("x171c")
    // 'a a' twice: for doc 1 (argmax of gram 'a' by doc order) the
    // runner-up doc 2 still holds count 2 -> cap 2, full clip.
    // 'b' exists ONLY in doc 3: doc 3's 'b' must clip to 0, docs 1/2
    // see cap 1 for 'b' but don't contain it.
    val docs = Seq((1L, "s0", "a a"), (2L, "s0", "a a"),
      (3L, "s0", "a b"))
    write(dir, docs)
    val got = runEngine(dir)
    assert(got == replay(docs))
    val n1 = got.find(_._2 == 1L).get
    // unigrams: docs 1/2 contribute clipped 2+2 (tied argmax), doc 3's
    // 'a' clips 1 (cap 2), 'b' clips 0 (self is the only holder)
    assert(n1._5 == 5L && n1._6 == 6L, s"unexpected n=1 row: $n1")
    GraftCaches.releasePrior()
  }

  test("x171 planted: panel is the md5(doc_id) hash-sample, not " +
    "doc-id order — a source wider than the panel excludes exactly " +
    "the docs ranked past R") {
    val dir = TestSpark.scratchDir("x171d")
    // 12 docs, one shared token + one unique token each: the unique
    // token of a doc OUTSIDE the panel can never clip (no ref holds
    // it); inside the panel it still can't (self-exclusion). But the
    // SHARED token clips for everyone -> per-doc clipped mass is the
    // panel-membership-independent part; the replay (which implements
    // the same md5 ranking) must agree bit-for-bit, proving the
    // engine's panel IS the hash order.
    val docs = (1L to 12L).map(i => (i, "s0", s"common u$i"))
    write(dir, docs)
    val got = runEngine(dir)
    assert(got == replay(docs))
    val n1 = got.find(_._2 == 1L).get
    assert(n1._4 == SelfBleuRefs.toLong, s"panel size: $n1")
    // every doc's 'common' clips (cap >= 1 from 7 other panel docs),
    // no 'u<i>' ever clips -> clipped = 12, total = 24
    assert(n1._5 == 12L && n1._6 == 24L, s"unexpected n=1 row: $n1")
    GraftCaches.releasePrior()
  }

  test("x171: native wordGramsAll path equals the HOF pyramid path on " +
    "a multibyte/empty-token planted corpus AND on sf0.001 (the " +
    "GraftCharGrams adoption discipline, word-gram edition)") {
    val dir = TestSpark.scratchDir("x171e")
    // 2/3/4-byte codepoints prove byte-level gram assembly; doubled
    // spaces produce EMPTY tokens; repeats exercise multiplicity
    val docs = Seq(
      (1L, "mb", "café café 世界 😀 x"),
      (2L, "mb", "café  世界 x x"), // empty token inside
      (3L, "mb", ""),                            // single empty token
      (4L, "mb", "😀 café"))
    write(dir, docs)
    val native = runEngine(dir)
    val hof = graft.queries.Ext51.selfBleu(spark, dir,
      nativeGrams = false).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(native == hof)
    assert(native == replay(docs))
    val sfNative = runEngine(sf)
    val sfHof = graft.queries.Ext51.selfBleu(spark, sf,
      nativeGrams = false).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(sfNative == sfHof)
    GraftCaches.releasePrior()
  }

  test("wordGramsAll kernel: a null array element is skipped inside " +
    "its window exactly like array_join skips it — native path equals " +
    "the HOF pyramid on a nulled token array") {
    import spark.implicits._
    val df = Seq(
      Tuple1(Seq[String]("a", null, "b", "c")),
      Tuple1(Seq[String](null, null)),
      Tuple1(Seq[String]("x"))).toDF("w")
    def rows(native: Boolean) =
      graft.queries.Ext46.wordGramRows(df, "w", native)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(identity).toSeq
    assert(rows(true) == rows(false))
    GraftCaches.releasePrior()
  }

  test("x171: equals the pure-Scala replay on sf0.001, every source, " +
    "every n, every column") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq
    val got = runEngine(sf)
    assert(got == replay(docs))
    // diversity metric must actually discriminate on the corpus
    assert(got.map(_._7).distinct.length > 1,
      s"degenerate p_ppm spread: $got")
    GraftCaches.releasePrior()
  }
}
