package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Components, ShardPack}

/** Round-3 extension helpers: connected components (dedup grouping) and
  * token-budget shard packing (distributed prefix sum). */
class Ext2Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cc(nodes: Seq[Long], edges: Seq[(Long, Long)],
      parts: Int, localThreshold: Long = 2000000L): Map[Long, Long] =
    Components.connectedComponents(
      nodes.toDF("id").repartition(parts),
      edges.toDF("id1", "id2").repartition(parts),
      localEdgeThreshold = localThreshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components: chain, triangle, isolated node") {
    // 1-2-3-4 chain (worst diameter), 10-11-12 triangle, 20 isolated
    val labels = cc(
      nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L),
      edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L)),
      parts = 4)
    assert(labels === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L))
  }

  test("components: deterministic across partition counts") {
    val rnd = new scala.util.Random(7)
    val nodes = (0L until 200L)
    // ring of 4-cliques occasionally bridged: several mid-size components
    val edges = nodes.flatMap { i =>
      val base = (i / 4) * 4
      Seq((base, i)) ++ (if (i % 17 == 0 && i > 0) Seq((i - 1, i)) else Nil)
    }.filter(e => e._1 != e._2)
    val a = cc(nodes, edges, parts = 1)
    val b = cc(nodes, edges, parts = 13)
    assert(a === b)
    // every label is the component minimum: label <= id, label is a fixpoint
    assert(a.forall { case (id, lab) => lab <= id && a(lab) == lab })
  }

  test("components: equals brute-force union-find on random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 5) {
      val n = 40 + rnd.nextInt(60)
      val nodes = (0L until n.toLong)
      val edges = Seq.fill(rnd.nextInt(n)) {
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter(e => e._1 != e._2).distinct
      // reference: plain union-find with path compression
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = {
        var r = x; while (parent(r) != r) r = parent(r)
        var c = x
        while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      for ((a, b) <- edges) {
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = nodes.map(i => i -> find(i.toInt).toLong).toMap
      // both paths — driver union-find (default threshold) and the
      // distributed min-label loop (threshold 0) — reach the same fixpoint
      val local = cc(nodes, edges, parts = 1 + rnd.nextInt(8))
      val iterative = cc(nodes, edges, parts = 1 + rnd.nextInt(8),
        localThreshold = 0L)
      assert(local === expected, s"local trial=$trial n=$n edges=${edges.size}")
      assert(iterative === expected,
        s"iterative trial=$trial n=$n edges=${edges.size}")
    }
  }

  test("shard pack: matches sequential prefix sum at any partitioning") {
    val rnd = new scala.util.Random(11)
    val rows = (0L until 500L).map(i => (i, 1L + rnd.nextInt(400).toLong))
    val budget = 1000L
    val out = ShardPack.pack(
        rows.toDF("doc_id", "n_tokens").repartition(16), "doc_id", "n_tokens", budget)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    var cum = 0L
    val expected = rows.map { case (id, v) => cum += v; (id, v, cum, (cum - 1) / budget) }
    assert(out.toSeq === expected)
    // shards are contiguous in doc order and start at 0
    assert(out.head._4 === 0L)
    assert(out.sliding(2).forall { case Array(a, b) => b._4 - a._4 <= 1 && b._4 >= a._4 })
  }

  test("quantile: distributed nearest-rank equals sorted-array selection") {
    import graft.ext.Quantile
    import org.apache.spark.sql.functions.col
    val rnd = new scala.util.Random(5)
    for (parts <- Seq(1, 7, 16)) {
      val xs = Seq.fill(997)(rnd.nextDouble() * 100 - 50) // odd n, dup-free-ish
      val ps = Seq(0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
      val (n, got) = Quantile.nearestRank(
        xs.toDF("v").repartition(parts), col("v"), ps)
      val sorted = xs.sorted
      val want = ps.map(p => sorted((math.max(1, math.ceil(p * xs.size).toLong) - 1).toInt))
      assert(n == xs.size)
      assert(got == want, s"parts=$parts")
    }
    // duplicates: selection is by rank over the sorted multiset
    val dup = Seq(5.0, 1.0, 5.0, 5.0, 2.0)
    val (n2, got2) = Quantile.nearestRank(dup.toDF("v"), col("v"), Seq(0.5, 1.0))
    assert(n2 == 5 && got2 == Seq(5.0, 5.0))
    // nulls are excluded (SQL percentile semantics), not NPE'd on
    val withNulls = Seq[Option[Double]](Some(3.0), None, Some(1.0), None, Some(2.0))
    val (n3, got3) = Quantile.nearestRank(withNulls.toDF("v"), col("v"), Seq(1.0))
    assert(n3 == 3 && got3 == Seq(3.0))
  }

  test("shard pack: leading zero-token docs land in shard 0, never -1") {
    import org.apache.spark.sql.functions.col
    val out = ShardPack.pack(
        Seq((1L, 0L), (2L, 0L), (3L, 5L)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", 10L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L)))
  }

  test("approx quantiles stay within rank tolerance of the exact selection") {
    import graft.ext.Quantile
    import org.apache.spark.sql.functions.{col, lit, percentile_approx}
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .select(col("l_extendedprice").as("v"))
    val (n, exact) = Quantile.nearestRank(li, col("v"), Seq(0.5, 0.9))
    val approx = li.agg(
      percentile_approx(col("v"), lit(0.5), lit(10000)).as("a50"),
      percentile_approx(col("v"), lit(0.9), lit(10000)).as("a90"))
      .collect()(0)
    // accuracy 10000 → rank error <= n/10000; translate to a value bound by
    // checking the approx answer's true rank lands within the tolerance
    val tol = math.max(2L, n / 10000 + 1)
    for ((p, a) <- Seq((0.5, approx.getDouble(0)), (0.9, approx.getDouble(1)))) {
      val targetRank = math.ceil(p * n).toLong
      val trueRank = li.filter(col("v") <= a).count()
      assert(math.abs(trueRank - targetRank) <= tol,
        s"p=$p approx=$a rank=$trueRank target=$targetRank n=$n")
    }
    assert(exact.length == 2)
  }

  test("shard pack: exact-multiple boundary lands in the finished shard") {
    // cum 1000 is the last token of shard 0; cum 1001 opens shard 1
    val out = ShardPack.pack(
        Seq((1L, 600L), (2L, 400L), (3L, 1L)).toDF("doc_id", "n_tokens"),
        "doc_id", "n_tokens", 1000L)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(3)))
    assert(out.toSeq === Seq((1L, 0L), (2L, 0L), (3L, 1L)))
  }
}
