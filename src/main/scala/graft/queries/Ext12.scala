package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraftCaches.TrackedPersist
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-5 batch 4: share-threshold aggregation (TPC-H Q20 flavor, q11),
  * triangle counting over the near-dup graph (x66 — the third graph
  * operator after components and pagerank), rendezvous-hash shard
  * assignment (x67 — the placement primitive of every distributed ingest),
  * and a k-anonymity audit (x68 — the governance gate run before a corpus
  * ships). Determinism rules as everywhere in the catalog.
  */
object Ext12 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q11 DOMINANT SUPPLIER (Q20 flavor): suppliers shipping more than a
    // 20% share of a part's total quantity, among parts served by ≥2
    // suppliers (the driver corpus spreads parts near-uniformly over ~30
    // offers, so a majority threshold never fires).
    // Both aggregation levels are partial-aggregable decimal sums sharing
    // the l_partkey shuffle; the share predicate multiplies through
    // (5·sq > tq) so no float division exists on either engine.
    "q11_dominant_supplier" -> ((s, d) => {
      val ps = lineitem(s, d)
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
      val tot = ps.groupBy(col("l_partkey"))
        .agg(sum(col("sq")).as("tq"),
          count(lit(1)).as("n_supp"))
      ps.join(tot, "l_partkey")
        .filter(col("n_supp") >= 2 && col("sq") * 5 > col("tq"))
        .select(col("l_partkey"), col("l_suppkey"),
          col("sq").cast("double").as("supp_qty"),
          col("tq").cast("double").as("part_qty"), col("n_supp"))
        .orderBy(col("l_partkey"), col("l_suppkey"))
    }),

    // X2l TRIANGLE COUNT over the near-dup graph: mutual triples in x3's
    // verified LSH pairs — the transitivity evidence a dedup team reads
    // before trusting single-link clusters (many triangles ⇒ components
    // are tight; few ⇒ chains of borderline pairs). Edges arrive oriented
    // (id1 < id2 from the pair generator), which IS the classic
    // orientation trick: every triangle is counted exactly once as
    // a<b<c, and wedge fan-out is bounded by out-degree, not degree. Two
    // equi-joins, no explosion on high-degree nodes.
    // Round 14 (optimization, guide §2.4) NEGATIVE result: `e` is
    // referenced three times uncached (45 Exchanges in the static plan),
    // but persisting it measured a same-boot WASH (1.09 vs 1.13 s
    // min-of-4, BENCH_AB_r14_sharedsubtrees.json) — all three references
    // share the verify pipeline's exchanges, and AQE's runtime stage
    // reuse already dedupes subtrees that end at an identical Exchange
    // (only exchange-less shared subtrees like q9's late CTE genuinely
    // recompute). Kept persist-free: one fewer cached frame, per the
    // r8 x143 precedent.
    "x66_triangle_count" -> ((s, d) => {
      val e = Ext.lshVerifiedPairs(s, d, 0.5).select(col("id1"), col("id2"))
      val wedge = e.select(col("id1").as("a"), col("id2").as("b"))
        .join(e.select(col("id1").as("b"), col("id2").as("c")), "b")
      wedge.join(e.select(col("id1").as("a"), col("id2").as("c")),
          Seq("a", "c"), "left_semi")
        .select(col("a"), col("b"), col("c"))
        .orderBy(col("a"), col("b"), col("c"))
    }),

    // X4z RENDEZVOUS (HRW) SHARD ASSIGNMENT: each doc goes to the worker
    // with the highest salted hash — the placement rule that keeps
    // K/N keys stable when a worker joins/leaves (vs mod-N reshuffling
    // everything). Scores are per-row expressions over the 8 candidate
    // workers (array_max over (score, worker) structs — ties to the
    // higher worker id, mirrored in the oracle); the only shuffle is the
    // final per-worker rollup. The md5-prefix hash replays bit-identically
    // in DuckDB, like every hash in the catalog.
    "x67_rendezvous_shard" -> ((s, d) => {
      val scored = array((0 to 7).map { w =>
        struct(TextOps.hash32(concat(lit(s"rdzv:$w:"),
          col("doc_id").cast("string"))).as("score"),
          lit(w.toLong).as("w"))
      }: _*)
      documents(s, d)
        .select(col("doc_id"),
          size(TextOps.words(col("text"))).cast("long").as("t"),
          array_max(scored).getField("w").as("worker"))
        .groupBy(col("worker"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"))
        .orderBy(col("worker"))
    }),

    // X4aa K-ANONYMITY AUDIT: group sizes over the quasi-identifier pair
    // (nation, market segment) with an at-risk flag for groups smaller
    // than k=5 — the re-identification check a governance pass runs before
    // a derived dataset ships. One partial-aggregable rollup; the flag is
    // pure integer comparison.
    "x68_k_anonymity" -> ((s, d) => {
      customer(s, d)
        .groupBy(col("c_nationkey"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("n"),
          (col("n") < 5).as("at_risk"))
        .orderBy(col("c_nationkey"), col("c_mktsegment"))
    }))

  /** The x3 candidate/verify pipeline as oracle CTEs (same text as
    * x57/x58's preamble — the banded MinHash the whole dedup family
    * replays). */
  private[queries] val pairsCte: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT doc_id,
      |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w WHERE len(w) >= 3),
      |h AS (SELECT doc_id, ss,
      |  list_transform(ss, s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) AS hs FROM sh),
      |mh AS (SELECT doc_id,
      |  list_min(list_transform(hs, x -> (7*x+3) % 2147483647)) AS m0,
      |  list_min(list_transform(hs, x -> (11*x+5) % 2147483647)) AS m1,
      |  list_min(list_transform(hs, x -> (13*x+7) % 2147483647)) AS m2,
      |  list_min(list_transform(hs, x -> (17*x+11) % 2147483647)) AS m3,
      |  list_min(list_transform(hs, x -> (19*x+13) % 2147483647)) AS m4,
      |  list_min(list_transform(hs, x -> (23*x+17) % 2147483647)) AS m5,
      |  list_min(list_transform(hs, x -> (29*x+19) % 2147483647)) AS m6,
      |  list_min(list_transform(hs, x -> (31*x+23) % 2147483647)) AS m7 FROM h),
      |bk AS (SELECT doc_id, unnest([
      |  concat_ws('_', 0, m0, m1), concat_ws('_', 1, m2, m3),
      |  concat_ws('_', 2, m4, m5), concat_ws('_', 3, m6, m7)]) AS bk FROM mh),
      |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
      |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |ver AS (SELECT id1, id2, len(list_intersect(x.ss, y.ss)) AS inter,
      |    len(x.ss) AS n1, len(y.ss) AS n2
      |  FROM cand JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2),
      |pairs AS (SELECT id1, id2 FROM ver
      |  WHERE CAST(inter AS DOUBLE)/(n1+n2-inter) >= 0.5)""".stripMargin

  val oracleSql: Map[String, String] = Map(

    "q11_dominant_supplier" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_partkey, l_suppkey),
        |tot AS (SELECT l_partkey, sum(sq) AS tq, count(*) AS n_supp
        |  FROM ps GROUP BY l_partkey)
        |SELECT ps.l_partkey, l_suppkey,
        |  CAST(sq AS DOUBLE) AS supp_qty, CAST(tq AS DOUBLE) AS part_qty,
        |  n_supp
        |FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey
        |WHERE n_supp >= 2 AND sq * 5 > tq
        |ORDER BY ps.l_partkey, l_suppkey""".stripMargin,

    "x66_triangle_count" -> (pairsCte +
      """,
        |tri AS (SELECT p1.id1 AS a, p1.id2 AS b, p2.id2 AS c
        |  FROM pairs p1 JOIN pairs p2 ON p2.id1 = p1.id2
        |  WHERE EXISTS (SELECT 1 FROM pairs p3
        |    WHERE p3.id1 = p1.id1 AND p3.id2 = p2.id2))
        |SELECT a, b, c FROM tri ORDER BY a, b, c""".stripMargin),

    "x67_rendezvous_shard" ->
      """WITH s AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |    unnest(range(0, 8)) AS w FROM documents),
        |sc AS (SELECT doc_id, t, w,
        |    CAST(concat('0x', substr(md5('rdzv:' || CAST(w AS VARCHAR) || ':'
        |      || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS score
        |  FROM s),
        |r AS (SELECT doc_id, t, CAST(w AS BIGINT) AS worker,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY score DESC, w DESC) AS rn
        |  FROM sc)
        |SELECT worker, count(*) AS n_docs,
        |  CAST(sum(t) AS BIGINT) AS sum_tokens, min(doc_id) AS first_doc
        |FROM r WHERE rn = 1 GROUP BY worker ORDER BY worker""".stripMargin,

    "x68_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment, count(*) AS n,
        |  (count(*) < 5) AS at_risk
        |FROM customer GROUP BY c_nationkey, c_mktsegment
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin)
}
