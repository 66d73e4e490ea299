package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of a near-duplicate dedup pipeline (pairs → groups →
  * one survivor per group), SURVEY §2.12 X2.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors; the fixpoint (every node holds its component's minimum id) is
  * unique, so the result is deterministic regardless of execution order or
  * partitioning. Rounds needed = the largest component's diameter — for
  * near-dup graphs that is small (duplicate clusters are dense); a chain
  * graph degenerates to O(n) rounds, where the large-star/small-star
  * doubling variant (Kiveris et al., "Connected Components in MapReduce")
  * would cut it to O(log n). Each round is one equi-join + one partial-
  * aggregable groupBy(min) — both shuffle on the node id, no all-pairs
  * anywhere, so a round scales linearly with |E|.
  *
  * Iteration hygiene at scale: every round persists its label frame and
  * unpersists the previous one, so lineage never re-executes; on a long
  * chain of rounds a periodic checkpoint would also truncate the logical
  * plan (documented, not needed at test scale).
  */
object Components {

  /** nodes: one column `id`; edges: columns `id1`,`id2` (undirected pairs).
    * Returns (id, cluster_id) with cluster_id = min id of the component;
    * isolated nodes keep their own id. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    val und = edges.select(col("id1").as("a"), col("id2").as("b"))
      .union(edges.select(col("id2").as("a"), col("id1").as("b")))
      .persist()

    var cached = nodes.select(col("id"), col("id").as("lab")).persist()
    var labels = cached
    var round = 0
    var done = false
    while (!done && round < maxRounds) {
      // min neighbor label per node, then fold into the node's own label
      val nbr = und.join(labels, und("a") === labels("id"))
        .select(col("b").as("id"), col("lab"))
        .groupBy(col("id")).agg(min(col("lab")).as("nbr_lab"))
      val next = labels.join(nbr, Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("lab"),
          (coalesce(col("nbr_lab"), col("lab")) < col("lab")).as("chg"))
        .persist()
      done = next.filter(col("chg")).count() == 0
      cached.unpersist(blocking = false)
      cached = next
      labels = next.select(col("id"), col("lab"))
      round += 1
    }
    und.unpersist(blocking = false)
    labels.withColumnRenamed("lab", "cluster_id")
  }
}
