package graft.ext

import graft.GraftCaches.TrackedPersist
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of a near-duplicate dedup pipeline (pairs → groups →
  * one survivor per group), SURVEY §2.12 X2.
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors, then POINTER-JUMPS (label ← label-of-label, the doubling step
  * of Shiloach-Vishkin / large-star-style MapReduce CC à la Kiveris et al.),
  * so convergence is O(log n) rounds even on a chain graph — plain
  * neighbor-min alone would need O(diameter) rounds. The fixpoint (every
  * node holds its component's minimum id) is unique, so the result is
  * deterministic regardless of execution order or partitioning. Each round
  * is two equi-joins + one partial-aggregable groupBy(min) — all shuffle on
  * the node id, no all-pairs anywhere, so a round scales linearly with |E|.
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
    * shuffling only the duplicate-pair endpoints.
    *
    * LOCAL FINISH: when the edge list is small (≤ `localEdgeThreshold`
    * undirected pairs — one cheap count decides), the labels come from a
    * driver-side union-find instead of the iterative loop. This is the
    * standard two-phase CC design (distributed contraction + local finish,
    * as in Kiveris et al. / GraphFrames): the banded near-dup pair graph
    * is orders of magnitude smaller than the corpus, so after candidate
    * generation the component structure usually fits one machine even when
    * the corpus is 100 TB — and a driver union-find replaces O(log n)
    * shuffle rounds with one collect + one broadcast join (no shuffle at
    * all on the corpus side). Graphs above the threshold take the
    * distributed min-label + pointer-jumping loop below, so no scale is
    * ever driver-bound. Both paths compute the identical unique fixpoint
    * (min id per component). */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      maxRounds: Int = 50, localEdgeThreshold: Long = 2000000L): DataFrame = {
    val spark = nodes.sparkSession
    val labelSchema = StructType(Seq(
      StructField("id", LongType), StructField("lab", LongType)))
    // Truncate the round's LOGICAL lineage: each iteration otherwise nests
    // the previous round's whole plan inside its InMemoryRelation, and
    // analysis + cache-lookup canonicalization walk that growing tree every
    // round (the classic iterative-DataFrame blowup — measured 25 s/round
    // by round 5 on a 60-node graph). Wrapping the materialized cache's RDD
    // in a fresh LogicalRDD leaf keeps every round's plan O(1) deep; the
    // RDD still reads the persisted blocks, so nothing recomputes.
    def frozen(df: DataFrame): DataFrame =
      spark.createDataFrame(df.select(col("id"), col("lab")).rdd, labelSchema)

    // Persist the NORMALIZED edge list, not the doubled union: a union's
    // branches only share work when their common source is cached, so
    // persisting post-union would run the (possibly expensive — e.g. an
    // LSH band self-join) edge pipeline once per direction. One count
    // materializes the pipeline exactly once and decides the path.
    val en = edges.select(col("id1").cast("long").as("a"),
        col("id2").cast("long").as("b"))
      .persistTracked()
    val eCount = en.count()
    if (eCount <= localEdgeThreshold) {
      // Duplicate pairs and self-loops are harmless to union-find — no
      // dedup shuffle needed before the collect.
      val es = en.collect().map(r => (r.getLong(0), r.getLong(1)))
      en.unpersist(blocking = false)
      // Union-find with path compression and a min-root invariant: the
      // root of every tree is the smallest id in it, so find(x) IS the
      // component minimum — the same fixpoint the iterative path reaches.
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrDefault(r, r) != r) r = parent.get(r)
        var c = x
        while (parent.getOrDefault(c, c) != r) {
          val nx = parent.get(c); parent.put(c, r); c = nx
        }
        r
      }
      for ((x, y) <- es if x != y) {
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent.put(math.max(rx, ry), math.min(rx, ry))
      }
      val endpoints = es.iterator.flatMap(e => Iterator(e._1, e._2))
        .toArray.distinct
      import spark.implicits._
      val labelDf = endpoints.map(id => (id, find(id))).toSeq
        .toDF("id", "cluster_id")
      // Broadcast join: the label side is bounded by 2×threshold rows, the
      // node side never shuffles.
      return nodes.select(col("id"))
        .join(broadcast(labelDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
    }

    // Both directions, built from the CACHED normalized edges so the edge
    // pipeline is never re-executed; materialized once, then `en` is freed.
    val und = en.union(en.select(col("b").as("a"), col("a").as("b"))).persistTracked()
    und.count()
    en.unpersist(blocking = false)

    // Fused init + round 1: with identity starting labels, the first
    // propagation is exactly min(id, min neighbor id) — one groupBy over the
    // edge list replaces both the endpoint-distinct and the first
    // join+aggregate round (both directions present ⇒ grouping by `b` alone
    // covers every endpoint).
    var cached = und.groupBy(col("b")).agg(min(col("a")).as("m"))
      .select(col("b").as("id"), least(col("b"), col("m")).as("lab"))
      .persistTracked()
    var labels = frozen(cached)
    var round = 1
    var done = false
    while (!done && round < maxRounds) {
      // min neighbor label per node, folded into the node's own label …
      val nbr = und.join(labels, und("a") === labels("id"))
        .select(col("b").as("id"), col("lab"))
        .groupBy(col("id")).agg(min(col("lab")).as("nbr_lab"))
      val stepped = labels.join(nbr, Seq("id"), "left")
        .select(col("id"), col("lab").as("old_lab"),
          least(col("lab"), coalesce(col("nbr_lab"), col("lab"))).as("lab"))
      // … then the doubling step: follow the stepped label one hop through
      // the PREVIOUS round's cached labels (a self-join on `stepped` would
      // recompute the whole round twice — `labels` is already materialized).
      // Labels are node ids of the same component, so the join always
      // matches, and least(lab, jlab) <= lab <= old_lab — monotone.
      val l2 = labels.select(col("id").as("jid"), col("lab").as("jlab"))
      val next = stepped.join(l2, col("lab") === col("jid"))
        .select(col("id"), least(col("lab"), col("jlab")).as("lab"),
          (least(col("lab"), col("jlab")) < col("old_lab")).as("chg"))
        .persistTracked()
      val changed = next.filter(col("chg")).count()
      done = changed == 0
      // the old cache backs the new one's materialized blocks only via the
      // already-computed data; safe to release once `next` is materialized
      cached.unpersist(blocking = false)
      cached = next
      labels = frozen(next)
      round += 1
    }
    und.unpersist(blocking = false)
    // singletons (no edges) resolve to themselves without ever iterating.
    // Materialize the result, then release the final round's label cache —
    // the same persist hygiene as ChainFill: nothing this function pinned
    // outlives the call (the result's own persist is a Dataset cache the
    // session's clearCache can free).
    val outDf = nodes.select(col("id"))
      .join(labels.withColumnRenamed("lab", "cluster_id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
      .persistTracked()
    outDf.count()
    cached.unpersist(blocking = false)
    outDf
  }
}
