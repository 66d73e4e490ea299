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
    * isolated nodes keep their own id.
    *
    * Only EDGE-TOUCHED nodes iterate: a node with no edge is its own
    * cluster by definition, so the loop runs over the pair graph (at
    * near-dup scale a small fraction of the corpus) and the full node set
    * joins back once at the end with `coalesce(label, id)`. At 100 TB this
    * is the difference between shuffling the corpus every round and
    * shuffling only the duplicate-pair endpoints. */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50): DataFrame = {
    // The union's two branches materialize concurrently into the cache in
    // the first job that touches `und` (per-partition cache locks stop
    // duplicate work), so the possibly-expensive edge pipeline costs one
    // wall-clock pass.
    val und = edges.select(col("id1").as("a"), col("id2").as("b"))
      .union(edges.select(col("id2").as("a"), col("id1").as("b")))
      .persist()

    // Fused init + round 1: with identity starting labels, the first
    // propagation is exactly min(id, min neighbor id) — one groupBy over the
    // edge list replaces both the endpoint-distinct and the first
    // join+aggregate round (both directions present ⇒ grouping by `b` alone
    // covers every endpoint).
    var cached = und.groupBy(col("b")).agg(min(col("a")).as("m"))
      .select(col("b").as("id"), least(col("b"), col("m")).as("lab"))
      .persist()
    var labels = cached
    var round = 1
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
    // singletons (no edges) resolve to themselves without ever iterating
    nodes.select(col("id"))
      .join(labels.withColumnRenamed("lab", "cluster_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }
}
