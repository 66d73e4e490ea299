package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** x150 NDCG@10 / MRR@10 retrieval eval: full independent replay at
  * sf0.001 (double-precision fold order matches Similarity.dot, so
  * bits agree), plus closed-form corpora for the perfect-retrieval and
  * missed-top-1 boundary behavior.
  */
class Ext46Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private val W = Array(1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }; s
  }
  private def cos6(a: Array[Double], b: Array[Double]): Double =
    math.floor(dot(a, b) / math.sqrt(dot(a, a) * dot(b, b)) * 1e6) / 1e6

  /** Independent NDCG/MRR replay over collected rows (no engine code). */
  private def replay(rows: Array[(Long, Int, Array[Double])])
      : Seq[(Long, Long, Long, Long, Long)] =
    rows.filter(_._1 % 100 == 0).map { case (qid, qlab, qv) =>
      def top10(cands: Seq[(Long, Int, Array[Double])]): Seq[Long] =
        cands.filter(_._1 != qid)
          .map { case (id, _, v) => (id, cos6(qv, v)) }
          .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1)
      val gt = top10(rows.toSeq)
      val grade = gt.zipWithIndex.map { case (id, i) => id -> (10L - i) }.toMap
      val run = top10(rows.toSeq.filter(_._2 == qlab))
      val dcg = run.zipWithIndex.map { case (id, i) =>
        grade.getOrElse(id, 0L) * W(i) }.sum
      val idcg = gt.zipWithIndex.map { case (id, i) => grade(id) * W(i) }.sum
      val rr = run.zipWithIndex
        .collectFirst { case (id, i) if grade.getOrElse(id, 0L) == 10L =>
          2520L / (i + 1) }.getOrElse(0L)
      val ndcg = if (idcg == 0) 0L else dcg * 1000000L / idcg
      (qid, dcg, idcg, rr, ndcg)
    }.sortBy(_._1).toSeq

  private def collectOut(dir: String): Seq[(Long, Long, Long, Long, Long)] =
    SparkEntry.queries("x150_ndcg")(spark, dir).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("dcg_w"),
        r.getAs[Long]("idcg_w"), r.getAs[Long]("rr_2520"),
        r.getAs[Long]("ndcg_ppm"))).toSeq

  test("x150: equals the brute-force NDCG/MRR replay on sf0.001, and " +
    "the label-bucket run genuinely loses position credit somewhere " +
    "(ndcg < 1e6 for at least one query — else the audit is vacuous)") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    val want = replay(rows)
    val got = collectOut(sf)
    assert(got == want)
    assert(got.exists(_._5 < 1000000L))
    assert(got.forall { case (_, dcg, idcg, rr, ndcg) =>
      dcg >= 0 && dcg <= idcg && ndcg <= 1000000L &&
        (rr == 0L || 2520L % rr == 0L) })
    GraftCaches.releasePrior()
  }

  test("x150: single-label corpus -> run arm IS the ground truth: " +
    "ndcg_ppm = 1000000 and rr_2520 = 2520 for every query") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x150perfect").toString
    // 24 vectors on a deterministic 4-dim lattice, all label 0
    val rows = (0 until 24).map { i =>
      (i.toLong, Array((i % 7 + 1).toFloat, (i % 5 + 1).toFloat,
        (i % 3 + 1).toFloat, 1.0f), 0)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = collectOut(dir)
    assert(got.size == 1 && got.head._1 == 0L)
    assert(got.head._4 == 2520L, s"expected perfect rr: $got")
    assert(got.head._5 == 1000000L, s"expected perfect ndcg: $got")
    GraftCaches.releasePrior()
  }

  test("x150: true nearest neighbor carries a different label -> the " +
    "bucket run cannot retrieve it: rr_2520 = 0 and ndcg_ppm < 1000000") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x150miss").toString
    // query (id 0, label 0) at e1; id 1 (label 1) is nearly parallel to
    // the query — the true top-1; the label-0 bucket holds ids 2..19,
    // all strictly farther than id 1.
    val rows =
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0) +:
      (1L, Array(0.99f, 0.01f, 0.0f, 0.0f), 1) +:
      (2 until 20).map { i =>
        (i.toLong, Array(1.0f, (0.2f + i * 0.05f), 0.5f, 0.0f), 0)
      }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = collectOut(dir)
    assert(got.size == 1 && got.head._1 == 0L)
    assert(got.head._4 == 0L, s"expected missed top-1: $got")
    assert(got.head._5 < 1000000L && got.head._5 > 0L, s"got: $got")
    GraftCaches.releasePrior()
  }

  // ---- x151 Bradley-Terry ----

  /** Independent BigInt replay of the regularized MM fit over explicit
    * battles (no engine code, no Spark). */
  private def btReplay(battles: Seq[(String, String, Long)])
      : Map[String, (Long, Long, Long, Long)] = {
    val dir = battles.flatMap { case (a, b, winA) =>
      Seq(((a, b), winA), ((b, a), 1L - winA)) }
    val pairs = dir.groupBy(_._1).map { case ((i, j), xs) =>
      (i, j, BigInt(xs.size + 2), BigInt(xs.map(_._2).sum + 1)) }.toSeq
    val raw = pairs.groupBy(_._1).map { case (i, ps) =>
      i -> (ps.map(_._3 - 2).sum, ps.map(_._4 - 1).sum) }
    val wTot = pairs.groupBy(_._1).map { case (i, ps) =>
      i -> ps.map(_._4).sum }
    var r: Map[String, BigInt] = wTot.map { case (i, _) => i -> BigInt(1000000) }
    for (_ <- 1 to 3) {
      val den = pairs.groupBy(_._1).map { case (i, ps) =>
        i -> ps.map { case (_, j, nij, _) =>
          nij * BigInt("1000000000000") / (r(i) + r(j)).max(1) }.sum }
      r = wTot.map { case (i, w) =>
        i -> w * BigInt("1000000000000") / den(i).max(1) }
    }
    val rsum = r.values.sum.max(1)
    r.map { case (i, ri) =>
      i -> (raw(i)._1.toLong, raw(i)._2.toLong, ri.toLong,
        (ri * 1000000 / rsum).toLong) }
  }

  test("x151: equals the BigInt MM replay over battles derived " +
    "independently from the raw event stream (sf0.001)") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value")).collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime](1),
        r.getLong(2), r.getString(3), r.getDouble(4)))
    val battles = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e =>
        (e._2.toEpochSecond(java.time.ZoneOffset.UTC), e._2.getNano, e._3))
      s.zip(s.drop(1)).collect {
        case (a, b) if a._4 != b._4 =>
          (a._4, b._4, if (a._5 >= b._5) 1L else 0L)
      }
    }
    val want = btReplay(battles)
    val got = SparkEntry.queries("x151_bradley_terry")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    // scores are a normalized distribution over the arms
    val scores = got.values.map(_._4).toSeq
    assert(scores.forall(_ > 0L) && math.abs(scores.sum - 1000000L) <= 5)
    GraftCaches.releasePrior()
  }

  test("x151: an arm that wins every duel ranks first; a clean " +
    "A>B>C duel chain orders the scores transitively") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x151dom").toString
    // one user; strictly descending values make the EARLIER arm win
    // every duel. Sequence A B A C B C A B ... gives duels
    // A>B, B>A?, ... — instead use value to force: A always 9, B 5, C 1.
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val seq = Seq("A", "B", "A", "C", "B", "C", "A", "B", "A", "C", "B", "C")
    val vals = Map("A" -> 9.0, "B" -> 5.0, "C" -> 1.0)
    val rows = seq.zipWithIndex.map { case (arm, i) =>
      (i.toLong, new java.sql.Timestamp(base.getTime + i * 1000L),
        7L, arm, vals(arm), "{}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("x151_bradley_terry")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(4))).toMap
    // A beats B and C whenever adjacent; B beats C; C never wins a duel
    assert(got("A")._2 > got("B")._2 && got("B")._2 > got("C")._2,
      s"transitive order violated: $got")
    GraftCaches.releasePrior()
  }

  // ---- x152 BLEU clipped n-gram precision ----

  test("x152: equals a pure-Scala multiset clipped-precision replay " +
    "over the sf0.001 pairs (candidate = odd doc_id, reference = " +
    "doc_id - 1)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val byId = docs.map(d => d._1 -> d).toMap
    case class Acc(var clipped: Long = 0, var total: Long = 0)
    val acc = scala.collection.mutable.Map.empty[(String, Int), Acc]
    val lens = scala.collection.mutable.Map.empty[String, (Long, Long)]
    for ((id, src, text) <- docs; if id % 2 == 1; refD <- byId.get(id - 1)) {
      val cw = text.split(" ", -1); val rw = refD._3.split(" ", -1)
      val (cl, rl) = lens.getOrElse(src, (0L, 0L))
      lens(src) = (cl + cw.length, rl + rw.length)
      for (n <- 1 to 4) {
        def counts(w: Array[String]) = w.sliding(n).filter(_.length == n)
          .map(_.mkString(" ")).toSeq.groupBy(identity).map { case (k, v) =>
            k -> v.size.toLong }
        val cc = counts(cw); val rc = counts(rw)
        val a = acc.getOrElseUpdate((src, n), Acc())
        a.total += cc.values.sum
        a.clipped += cc.map { case (g, c) =>
          math.min(c, rc.getOrElse(g, 0L)) }.sum
      }
    }
    val want = acc.toSeq.map { case ((src, n), a) =>
      (src, n.toLong, a.clipped, a.total,
        a.clipped * 1000000L / math.max(a.total, 1L),
        lens(src)._1, lens(src)._2,
        lens(src)._1 * 1000000L / math.max(lens(src)._2, 1L))
    }.sortBy(t => (t._1, t._2))
    val got = SparkEntry.queries("x152_bleu_precision")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toSeq
    assert(got == want)
    // precisions decay with n on unrelated docs (sanity that the four
    // orders are genuinely distinct signals)
    val bySrc = got.groupBy(_._1)
    assert(bySrc.values.forall(rs =>
      rs.sortBy(_._2).map(_._5).sliding(2).forall(p => p(0) >= p(1))))
    GraftCaches.releasePrior()
  }

  test("x152: clipping is MULTISET, not set — a candidate repeating a " +
    "reference gram gets credit min(cand_count, ref_count), and an " +
    "identical pair scores p_n = 1e6 at every n") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("x152clip").toString
    Seq(
      // pair 0/1: cand "a a a" vs ref "a b c" -> unigram clipped =
      // min(3,1) = 1 of 3 (set containment would say 3 of 3)
      (0L, "a b c", "s"), (1L, "a a a", "s"),
      // pair 2/3: identical 5-token texts -> every p_n = 1e6
      (2L, "x y z x y", "t"), (3L, "x y z x y", "t")
    ).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x152_bleu_precision")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("s", 1L)) == ((1L, 3L, 333333L)), s"clipping broken: $got")
    assert(got(("s", 2L))._1 == 0L) // "a a" never occurs in ref
    (1 to 4).foreach { n =>
      assert(got(("t", n.toLong))._3 == 1000000L, s"identical pair, n=$n: $got")
    }
    GraftCaches.releasePrior()
  }

  test("x152: native wordGramsAll path equals the HOF pyramid path on " +
    "a multibyte/empty-token planted corpus AND on sf0.001 (the " +
    "GraftCharGrams adoption discipline, word-gram edition)") {
    import spark.implicits._
    val dir = TestSpark.scratchDir("x152ng")
    Seq(
      // 2/3/4-byte codepoints prove byte-level gram assembly; the
      // doubled space makes an EMPTY token; pair 2/3 repeats tokens
      (0L, "café 世界 😀 café", "mb"), (1L, "café  世界 😀", "mb"),
      (2L, "", "mb2"), (3L, "a  a", "mb2")
    ).toDF("doc_id", "text", "source")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    def run(d: String, native: Boolean) =
      graft.queries.Ext46.bleuPrecision(spark, d, nativeGrams = native)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toSeq
    assert(run(dir, true) == run(dir, false))
    assert(run(sf, true) == run(sf, false))
    GraftCaches.releasePrior()
  }

  // ---- x153 watermark detection ----

  private def md5h32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      d.take(4).map(b => f"${b & 0xff}%02x").mkString, 16)
  }
  private def pairGreen(a: String, b: String): Boolean =
    md5h32(a + "\u0001" + b) % 2 == 0

  test("x153: equals the pair-green md5 replay on sf0.001, and the " +
    "natural corpus flags only a small tail (the ~2.3% ONE-SIDED " +
    "binomial rate — a green-list watermark can only INFLATE the green " +
    "fraction, so green-poor outliers are not flagged)") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val want = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      val t = (w.length - 1).toLong
      val g = w.zip(w.drop(1)).count { case (a, b) => pairGreen(a, b) }.toLong
      val z2 = (2 * g - t) * (2 * g - t) * 1000000L / math.max(t, 1L)
      (id, t, g, g * 1000000L / math.max(t, 1L), z2,
        z2 >= 4000000L && 2 * g - t > 0)
    }.sortBy(_._1).toSeq
    val got = SparkEntry.queries("x153_watermark_detect")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5))).toSeq
    assert(got == want)
    val flagRate = got.count(_._6).toDouble / got.size
    assert(flagRate < 0.2, s"natural-text flag rate implausible: $flagRate")
    GraftCaches.releasePrior()
  }

  test("x153: a greedily-constructed green-list document (every pair " +
    "green) scores z2_ppm = T * 1e6 and is flagged; a 1-token doc " +
    "scores 0 and is not") {
    import spark.implicits._
    val pool = (0 until 200).map(i => s"t$i")
    val toks = scala.collection.mutable.ArrayBuffer("t0")
    while (toks.size < 101)
      toks += pool.find(c => pairGreen(toks.last, c)).get
    // sanity on the generator itself
    assert(toks.zip(toks.drop(1)).forall { case (a, b) => pairGreen(a, b) })
    val dir = java.nio.file.Files.createTempDirectory("x153wm").toString
    Seq((0L, toks.mkString(" ")), (1L, "lone"))
      .toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("x153_watermark_detect")(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getBoolean(5))).toMap
    assert(got(0L) == ((100L, 100L, 100000000L, true)), s"planted: $got")
    assert(got(1L) == ((0L, 0L, 0L, false)), s"degenerate: $got")
    GraftCaches.releasePrior()
  }
}
