package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextOps}
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Round-5 additions, part 9: two TPC-H shapes the relational family
  * still lacked (Q4's EXISTS-gated priority rollup, Q13's outer-join
  * count distribution) and four training-data curation audits —
  * per-label embedding outliers, rank-biased overlap of the ANN ranking,
  * token-Gini diversity, and DSIR-style importance resampling.
  */
object Ext31 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q4 ORDER-PRIORITY CHECK (TPC-H Q4 shape): orders placed in 1995
    // with at least one late lineitem (shipped > 75 days after the order
    // date — the schema has no commit/receipt dates, so lateness reuses
    // q9's exact integer epoch-micros arithmetic), counted per priority.
    // The correlated EXISTS decorrelates to ONE left-semi equi-join on
    // the order key; the rollup is 5 groups of partial-aggregable
    // counts. Distinct from q8 (customer-keyed EXISTS+NOT EXISTS pair):
    // here the semi join feeds an aggregation, the canonical
    // "filter-by-existence then count" report.
    "q4_priority_count" -> ((s, d) => {
      graft.tables.Tables.registerViews(s, d)
      s.sql("""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE year(o.o_orderdate) = 1995
          AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND unix_micros(CAST(l.l_shipdate AS TIMESTAMP)) -
                    unix_micros(CAST(o.o_orderdate AS TIMESTAMP))
                    > 75 * 86400000000)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")
    }),

    // Q13 CUSTOMER ORDER-COUNT DISTRIBUTION (TPC-H Q13 shape): LEFT
    // OUTER join so zero-order customers survive with count 0 (the whole
    // point of Q13 — an inner join silently drops them), then a second
    // aggregation over the counts themselves. The priority exclusion
    // lives in the join condition (TPC-H's NOT LIKE comment filter,
    // re-expressed on this schema). Two shuffles: custkey join+count,
    // then the tiny count-histogram rollup. (custdist, c_count) is
    // unique per row, so the DESC ordering is total.
    "q13_custdist" -> ((s, d) => {
      val o = orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      customer(s, d).select(col("c_custkey"))
        .join(o, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // X3h PER-LABEL EMBEDDING OUTLIERS: quantize coordinates to exact
    // integers (x98's trick, 1e3 scale so every product stays far from
    // Long range at any corpus size), per-label centroid as the floored
    // integer per-dim mean (ONE partial-aggregable shuffle over
    // (label, dim) — 640 groups regardless of corpus size), then squared
    // distance to the centroid as a per-row integer fold. A vector is an
    // outlier when its d² exceeds 4× the label mean d² — the comparison
    // is multiplied through (d²·n > 4·Σd²), so no division anywhere —
    // and far_rank additionally reports the top-3 farthest per label (a
    // keyed top-k window, so the report is non-trivial even on a corpus
    // with no absolute outliers). The centroid and per-label totals
    // broadcast (k rows); the corpus shuffles once (the label window)
    // after the stats pass. This is the pre-training mislabeled/
    // corrupted-vector sweep every embedding corpus runs.
    "x112_embedding_outliers" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(
          "transform(CAST(embedding AS array<double>), x -> CAST(floor((x + 1.0D) * 1000.0D) AS BIGINT))")
          .as("q"))
        .persistTracked()
      val cent = e.select(col("label"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy(col("label"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .select(col("label"), col("dim"), expr("sx div n").as("m"))
        .groupBy(col("label"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("st"))
        .select(col("label"), expr("transform(st, s -> s.m)").as("cq"))
      val d2f = e.join(broadcast(cent), "label")
        .select(col("vec_id"), col("label"), expr(
          "aggregate(zip_with(q, cq, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)")
          .as("d2"))
        .persistTracked()
      val tot = d2f.groupBy(col("label"))
        .agg(sum(col("d2")).as("sd2"), count(lit(1)).as("n"))
      d2f.join(broadcast(tot), "label")
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("label")).orderBy(col("d2").desc, col("vec_id"))))
        .select(col("vec_id"), col("label"), col("d2"),
          when(col("sd2") === 0, 0L)
            .otherwise(expr("d2 * 1000000L div sd2")).as("ratio_ppm"),
          (col("d2") * col("n") > col("sd2") * 4).as("is_outlier"),
          when(col("rnk") <= 3, col("rnk")).otherwise(0L).as("far_rank"))
        .orderBy(col("vec_id"))
    }),

    // X3i RANK-BIASED OVERLAP OF THE ANN RANKING: x90 scores the IVF
    // shortlist by set recall@5, which is blind to WHERE in the top-5
    // the hits sit; truncated RBO (dyadic decay p=1/2 — the one decay
    // whose weights are exact integers) credits depth-1 agreement 16×
    // depth-5. Integer spelling: per depth d, term = (1e6·|A_d∩B_d|)//d,
    // weighted 2^(5−d), normalized by Σ2^(5−d)=31 — every step floor-
    // exact and engine-identical. Same audit plan shape as x90: ONE
    // persisted embedding frame feeds both arms, the query sample
    // broadcasts, matches explode to ≤5 depth rows each.
    "x113_rbo_overlap" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", Similarity.norm2(col("v")))
        .persistTracked()
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("label").as("q_label"),
          col("v").as("qv"), col("nv").as("qnv"))
      val cos6 = Ext.trunc6(
        Similarity.dot(col("qv"), col("v")) / sqrt(col("qnv") * col("nv")))
      def rank5(pairs: DataFrame, rname: String): DataFrame = pairs
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .withColumn(rname, row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col(rname) <= 5)
        .select(col("q_id"), col("n_id"), col(rname))
      val gt = rank5(q.join(e, col("vec_id") =!= col("q_id")), "rb")
      val ivf = rank5(q.join(e,
        col("q_label") === col("label") && col("vec_id") =!= col("q_id")), "ra")
      val ov = ivf.join(gt, Seq("q_id", "n_id"))
        .select(col("q_id"),
          explode(sequence(greatest(col("ra"), col("rb")).cast("long"), lit(5L)))
            .as("dpt"))
        .groupBy(col("q_id"), col("dpt"))
        .agg(count(lit(1)).as("ov"))
      val per = ov
        .select(col("q_id"), col("dpt"), col("ov"),
          expr("CAST(shiftleft(1L, CAST(5 - dpt AS INT)) AS BIGINT)").as("w"),
          expr("1000000L * ov div dpt").as("term"))
        .groupBy(col("q_id"))
        .agg(sum(col("w") * col("term")).as("ws"),
          max(when(col("dpt") === 5, col("ov"))).as("ov5"))
      q.select(col("q_id")).join(per, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("ov5"), lit(0L)).as("n_hits"),
          coalesce(expr("ws div 31"), lit(0L)).as("rbo_ppm"))
        .orderBy(col("q_id"))
    }),

    // X4w TOKEN-GINI DIVERSITY: per-document Gini impurity of the token
    // distribution, 1 − Σ(c_i/n)², in exact ppm — the no-logarithm
    // stand-in for token entropy (low diversity ⇒ repetitive/templated
    // text; the quality-filter signal next to x10's ratios). JOINLESS
    // AND SHUFFLE-FREE before the final sort: Σc² and the distinct count
    // come from ONE per-row fold over the sorted token array (run-length
    // aggregate HOF with a finish lambda), never an explode+groupBy —
    // at 100 TB this is pure scan-side map work.
    "x114_gini_diversity" -> ((s, d) => {
      documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"),
          expr("""aggregate(array_sort(w),
              named_struct('p', CAST(NULL AS STRING), 'r', 0L, 'k', 0L, 's', 0L),
              (a, t) -> IF(a.p IS NOT NULL AND t = a.p,
                named_struct('p', a.p, 'r', a.r + 1L, 'k', a.k, 's', a.s),
                named_struct('p', t, 'r', 1L, 'k', a.k + 1L,
                  's', a.s + a.r * a.r)),
              a -> named_struct('k', a.k, 's', a.s + a.r * a.r))""").as("f"))
        .filter(col("n_tokens") > 0)
        .select(col("doc_id"), col("n_tokens"),
          col("f.k").as("n_distinct"), col("f.s").as("sumsq"),
          expr("1000000L - (f.s * 1000000L div (n_tokens * n_tokens))")
            .as("gini_ppm"))
        .orderBy(col("doc_id"))
    }),

    // X4x DSIR-STYLE IMPORTANCE RESAMPLING (ratio-of-sums variant): score
    // each candidate doc by how target-like its bigram features are —
    // Σ(target df)+1 over Σ(candidate-pool df)+1, in exact integer ppm —
    // then keep it when its salted uniform hash falls under 4× the score
    // (capped at 1). The published DSIR weight is a product of per-feature
    // log-ratios; the ratio-of-sums form keeps the same monotone signal
    // in pure integer arithmetic (no logs — documented deviation). The
    // target here is the held doc_id%10≥8 slice (x97's split). Two
    // partial-aggregable df shuffles + one score join; the keep decision
    // is a per-row hash filter, reproducible under resharding (x19's
    // contract).
    "x115_importance_resample" -> ((s, d) => {
      val bg = documents(s, d)
        .select(col("doc_id"),
          explode(TextOps.ngramsDistinct(TextOps.words(col("text")), 2)).as("bg"))
        .persistTracked()
      val tdf = bg.filter(col("doc_id") % 10 >= 8)
        .groupBy(col("bg")).agg(count(lit(1)).as("tdf"))
      val rdf = bg.filter(col("doc_id") % 10 < 8)
        .groupBy(col("bg")).agg(count(lit(1)).as("rdf"))
      val sums = bg.filter(col("doc_id") % 10 < 8)
        .join(tdf, Seq("bg"), "left")
        .join(rdf, Seq("bg"))
        .groupBy(col("doc_id"))
        .agg(sum(coalesce(col("tdf"), lit(0L))).as("t_sum"),
          sum(col("rdf")).as("r_sum"))
      documents(s, d).filter(col("doc_id") % 10 < 8).select(col("doc_id"))
        .join(sums, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("t_sum"), lit(0L)).as("t_sum"),
          coalesce(col("r_sum"), lit(0L)).as("r_sum"))
        .withColumn("importance_ppm",
          expr("(t_sum + 1) * 1000000L div (r_sum + 1)"))
        .withColumn("kept",
          pmod(TextOps.hash32(concat(lit("dsir:"), col("doc_id").cast("string"))),
            lit(1000000L)) < least(lit(1000000L), col("importance_ppm") * 4))
        .orderBy(col("doc_id"))
    }))

  private val dotSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)"
  private val naSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])), (a,b) -> a+b)"
  private val nbSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1), i -> v[i]*v[i])), (a,b) -> a+b)"

  val oracleSql: Map[String, String] = Map(

    "q4_priority_count" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders o
        |WHERE year(o.o_orderdate) = 1995
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |      WHERE l.l_orderkey = o.o_orderkey
        |        AND epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)
        |            > 75 * 86400000000)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q13_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        |  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        |  GROUP BY c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "x112_embedding_outliers" ->
      """WITH e AS (SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor((x + 1.0) * 1000.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |x AS (SELECT vec_id, label, i AS dim, q[i] AS v
        |  FROM e, (SELECT unnest(range(1, 65)) AS i) t),
        |c AS (SELECT label, dim,
        |    CAST(sum(v) AS BIGINT) // count(*) AS m FROM x GROUP BY 1, 2),
        |dd AS (SELECT vec_id, x.label,
        |    CAST(sum((v - m) * (v - m)) AS BIGINT) AS d2
        |  FROM x JOIN c ON x.label = c.label AND x.dim = c.dim
        |  GROUP BY 1, 2),
        |tt AS (SELECT label, CAST(sum(d2) AS BIGINT) AS sd2,
        |    count(*) AS n FROM dd GROUP BY 1),
        |rr AS (SELECT vec_id, label, d2, row_number() OVER (
        |    PARTITION BY label ORDER BY d2 DESC, vec_id) AS rnk FROM dd)
        |SELECT rr.vec_id, rr.label, rr.d2,
        |  CAST(CASE WHEN sd2 = 0 THEN 0
        |    ELSE rr.d2 * 1000000 // sd2 END AS BIGINT) AS ratio_ppm,
        |  (rr.d2 * n > 4 * sd2) AS is_outlier,
        |  CAST(CASE WHEN rnk <= 3 THEN rnk ELSE 0 END AS BIGINT) AS far_rank
        |FROM rr JOIN tt ON rr.label = tt.label
        |ORDER BY rr.vec_id""".stripMargin,

    "x113_rbo_overlap" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |    FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
        |  WHERE vec_id % 100 = 0),
        |gp AS (SELECT q_id, vec_id AS n_id,
        |    $dotSql AS d, $naSql AS na, $nbSql AS nb
        |  FROM q, e WHERE vec_id <> q_id),
        |gr AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 DESC, n_id)
        |    AS rnk FROM gp),
        |ip AS (SELECT q_id, vec_id AS n_id,
        |    $dotSql AS d, $naSql AS na, $nbSql AS nb
        |  FROM q JOIN e ON q_label = label AND vec_id <> q_id),
        |ir AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 DESC, n_id)
        |    AS rnk FROM ip),
        |m AS (SELECT g.q_id, GREATEST(g.rnk, i.rnk) AS lo
        |  FROM (SELECT q_id, n_id, rnk FROM gr WHERE rnk <= 5) g
        |  JOIN (SELECT q_id, n_id, rnk FROM ir WHERE rnk <= 5) i
        |    ON g.q_id = i.q_id AND g.n_id = i.n_id),
        |dd AS (SELECT q_id, unnest(range(lo, 6)) AS dpt FROM m),
        |ov AS (SELECT q_id, dpt, count(*) AS ov FROM dd GROUP BY 1, 2),
        |per AS (SELECT q_id,
        |    CAST(sum((1 << (5 - dpt)) * ((1000000 * ov) // dpt)) AS BIGINT)
        |      AS ws,
        |    CAST(max(CASE WHEN dpt = 5 THEN ov END) AS BIGINT) AS ov5
        |  FROM ov GROUP BY 1)
        |SELECT q.q_id, CAST(coalesce(ov5, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(ws // 31, 0) AS BIGINT) AS rbo_ppm
        |FROM q LEFT JOIN per ON q.q_id = per.q_id
        |ORDER BY q.q_id""".stripMargin,

    "x114_gini_diversity" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |t AS (SELECT doc_id, unnest(w) AS tok FROM w),
        |c AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
        |g AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_distinct,
        |    CAST(sum(c * c) AS BIGINT) AS sumsq
        |  FROM c GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct, sumsq,
        |  CAST(1000000 - (sumsq * 1000000 // (n_tokens * n_tokens))
        |    AS BIGINT) AS gini_ppm
        |FROM g WHERE n_tokens > 0
        |ORDER BY doc_id""".stripMargin,

    "x115_importance_resample" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w
        |  FROM documents),
        |bgl AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |      ELSE [] END) AS bg
        |  FROM w),
        |t AS (SELECT bg, count(*) AS tdf FROM bgl
        |  WHERE doc_id % 10 >= 8 GROUP BY 1),
        |r AS (SELECT bg, count(*) AS rdf FROM bgl
        |  WHERE doc_id % 10 < 8 GROUP BY 1),
        |s AS (SELECT b.doc_id,
        |    CAST(sum(coalesce(tdf, 0)) AS BIGINT) AS t_sum,
        |    CAST(sum(rdf) AS BIGINT) AS r_sum
        |  FROM bgl b LEFT JOIN t USING (bg) JOIN r USING (bg)
        |  WHERE b.doc_id % 10 < 8 GROUP BY 1),
        |f AS (SELECT d.doc_id, coalesce(t_sum, 0) AS t_sum,
        |    coalesce(r_sum, 0) AS r_sum
        |  FROM (SELECT doc_id FROM documents WHERE doc_id % 10 < 8) d
        |  LEFT JOIN s USING (doc_id)),
        |g AS (SELECT doc_id, t_sum, r_sum,
        |    CAST((t_sum + 1) * 1000000 // (r_sum + 1) AS BIGINT)
        |      AS importance_ppm
        |  FROM f)
        |SELECT doc_id, t_sum, r_sum, importance_ppm,
        |  (CAST(concat('0x', substr(md5('dsir:' || CAST(doc_id AS VARCHAR)), 1, 8))
        |      AS BIGINT) % 1000000
        |    < LEAST(1000000, importance_ppm * 4)) AS kept
        |FROM g ORDER BY doc_id""".stripMargin)
}
