package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import graft.ext.{Components, Quantile, ShardPack}

/** Scale sanity for the round-3 distributed primitives: linear-ish work at
  * millions of rows across many partitions (the single-machine proxy for
  * the 100 TB shape — what matters is that nothing collects O(rows) to the
  * driver or funnels through one task). */
class Ext2ScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("shard pack: 5M rows across 32 partitions in seconds") {
    val n = 5000000L
    val df = spark.range(n).select(col("id").as("doc_id"),
      (col("id") % 37 + 1).as("n_tokens")).repartition(32)
    val t0 = System.nanoTime()
    val out = ShardPack.pack(df, "doc_id", "n_tokens", budget = 100000L)
    val (rows, maxShard) = (out.count(),
      out.agg(org.apache.spark.sql.functions.max("shard_id")).collect()(0).getLong(0))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(rows == n)
    // total tokens = sum over id of (id % 37 + 1); spot-check the last shard
    val total = (0L until 37L).map(_ + 1).sum * (n / 37)
    assert(maxShard == (total - 1) / 100000L)
    assert(secs < 60, s"shard pack took $secs s for 5M rows")
  }

  test("quantile: 5M values across 32 partitions in seconds") {
    val n = 5000000L
    val df = spark.range(n)
      .select(((col("id") * 2654435761L) % 1000003L).as("v")).repartition(32)
    val t0 = System.nanoTime()
    val (cnt, vs) = Quantile.nearestRank(df, col("v"), Seq(0.5, 0.99))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(cnt == n)
    assert(vs.length == 2 && vs(0) <= vs(1))
    assert(secs < 60, s"quantile took $secs s for 5M values")
  }

  test("components: 200k nodes / 150k edges converge in few rounds") {
    val n = 200000
    // union of many small cliques plus sparse bridges — near-dup shape
    val edges = spark.range(n.toLong)
      .select((col("id") - (col("id") % 4)).as("id1"), col("id").as("id2"))
      .filter(col("id1") =!= col("id2"))
    val nodes = spark.range(n.toLong).select(col("id"))
    val t0 = System.nanoTime()
    // threshold 0 forces the distributed min-label loop (the ≥100 TB path;
    // the default would take the driver union-find at this edge count)
    val out = Components.connectedComponents(nodes, edges, localEdgeThreshold = 0L)
    val groups = out.select("cluster_id").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(groups == n / 4)
    assert(secs < 60, s"components took $secs s for $n nodes")
  }
}
