package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.{Similarity, TextOps}
import graft.GraftCaches.TrackedPersist

/** Round-5 batch, part 4: the ANN recall audit (x90 — the eval that tells
  * you whether x7's IVF shortcut can be trusted before it replaces x6 in
  * production) and the cross-source span-copy matrix (x91 — corpus
  * forensics: which sources syndicate content from which, the signal that
  * drives per-source dedup and mixture decisions).
  */
object Ext22 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X90 ANN RECALL AUDIT: recall@5 of the IVF bucket search (x7's plan
    // shape) against the brute-force ground truth (x6's), per query —
    // the acceptance gate every ANN index must pass before the exact
    // path is turned off. Both rankings share ONE scanned+persisted
    // embedding frame; ground truth is bounded by the QUERY SAMPLE (an
    // audit runs on a sample by design — the corpus side still prunes by
    // bucket for the IVF arm, and the brute arm broadcasts the sample,
    // so cost is sample × corpus, never corpus²).
    "x90_ann_recall" -> ((s, d) => {
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
      def top5(pairs: DataFrame): DataFrame = pairs
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("n_id"))
      val gt = top5(q.join(e, col("vec_id") =!= col("q_id")))
      val ivf = top5(q.join(e,
        col("q_label") === col("label") && col("vec_id") =!= col("q_id")))
      val hits = ivf.join(gt, Seq("q_id", "n_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      q.select(col("q_id")).join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("coalesce(n_hits, 0) * 1000 div 5").as("recall_pm"))
        .orderBy(col("q_id"))
    }),

    // X92 HARD-NEGATIVE MINING: for each query vector, the top-3 most
    // similar vectors with a DIFFERENT label — the contrastive-training
    // sampler (similar-but-wrong-class examples are what the loss needs).
    // Same audit contract as x90: the query sample broadcasts against
    // the persisted corpus frame; a production run would swap the exact
    // arm for x7's bucket shortlist, same downstream plan.
    "x92_hard_negatives" -> ((s, d) => {
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
      q.join(e, col("q_label") =!= col("label"))
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("n_id"), col("rnk"), col("cos6"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // X93 SCALAR QUANTIZATION AUDIT (SQ8): quantize each dimension to an
    // 8-bit code against the corpus per-dim [min, max] (the FAISS SQ8
    // codec), reconstruct, and report each vector's truncated MSE — the
    // measurement that decides whether 4× compression is safe for the
    // ANN index. Per-dim stats are ONE partial-aggregable shuffle over
    // (dim, value) pairs (64 groups regardless of corpus size), folded
    // into two 64-element arrays broadcast back; quantize + error is
    // then pure per-row fold work in the scan, spelled term-identically
    // on both engines (floor-trunc, sequential sum — no float hazards).
    "x93_sq8_quantize" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val stats = e.select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("dim")).agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
        .agg(sort_array(collect_list(struct(col("dim"), col("mn"), col("mx"))))
          .as("st"))
        .select(expr("transform(st, s -> s.mn)").as("mins"),
          expr("transform(st, s -> s.mx)").as("maxs"))
      e.crossJoin(broadcast(stats))
        .select(col("vec_id"), expr(
          """aggregate(
            |  transform(sequence(1, size(v)), i ->
            |    CASE WHEN maxs[i-1] = mins[i-1] THEN 0.0D ELSE
            |      (v[i-1] - (mins[i-1] +
            |         floor((v[i-1] - mins[i-1]) * 255.0D / (maxs[i-1] - mins[i-1]))
            |           * (maxs[i-1] - mins[i-1]) / 255.0D)) *
            |      (v[i-1] - (mins[i-1] +
            |         floor((v[i-1] - mins[i-1]) * 255.0D / (maxs[i-1] - mins[i-1]))
            |           * (maxs[i-1] - mins[i-1]) / 255.0D))
            |    END),
            |  0.0D, (a, x) -> a + x)""".stripMargin).as("sse"))
        .select(col("vec_id"),
          Ext.trunc6(col("sse") / lit(64.0)).as("mse6"))
        .orderBy(col("vec_id"))
    }),

    // X94 SEMANTIC DEDUP (SemDeDup, Abbas et al.): embedding-cosine pair
    // graph (x14's label-bucketed candidates, cosine ≥ 0.35) → transitive
    // clusters via the SAME distributed CC primitive the text path uses
    // (ext/Components: min-label + pointer jumping, O(log n) rounds) →
    // survivor = min vec_id per cluster. Every vector reports its
    // survivor and cluster size — singletons keep themselves, so the
    // output is a total retention decision, not just a pair list. Scale:
    // candidates are bucket-equi-joined (never all-pairs), CC shuffles
    // edges only.
    "x94_semantic_dedup" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", Similarity.norm2(col("v")))
        .persistTracked()
      val cos6 = Ext.trunc6(Similarity.dot(col("a.v"), col("b.v")) /
        sqrt(col("a.nv") * col("b.nv")))
      val pairs = e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("id1"), col("b.vec_id").as("id2"),
          cos6.as("cos6"))
        .filter(col("cos6") >= 0.35)
        .select(col("id1"), col("id2"))
      val nodes = e.select(col("vec_id").as("id"))
      graft.ext.Components.connectedComponents(nodes, pairs)
        .select(col("id").as("vec_id"), col("cluster_id").as("keep_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("keep_id"))))
        .withColumn("is_kept", (col("vec_id") === col("keep_id")).cast("boolean"))
        .orderBy(col("vec_id"))
    }),

    // X91 CROSS-SOURCE SPAN-COPY MATRIX: for every source pair, how many
    // distinct 32-token spans (x84's digests) both carry — the
    // syndication fingerprint of a crawl. The (source, digest) frame
    // dedups once, then ONE digest groupBy emits each digest's sorted
    // source set and per-row pair expansion (bounded by #sources², never
    // by corpus rows) feeds a partial-aggregable pair count. No join in
    // the plan at all.
    "x91_source_copy_matrix" -> ((s, d) => {
      val spans = documents(s, d)
        .select(col("source"), TextOps.words(col("text")).as("w"),
          size(TextOps.words(col("text"))).as("n"))
        .filter(col("n") >= 32)
        .select(col("source"), col("w"),
          explode(sequence(lit(1), col("n") - 31, lit(16))).as("i"))
        .select(col("source"),
          md5(array_join(slice(col("w"), col("i"), lit(32)), " ")).as("h"))
        .distinct()
      spans.groupBy(col("h"))
        .agg(sort_array(collect_set(col("source"))).as("ss"))
        .filter(size(col("ss")) >= 2)
        .select(explode(expr(
          """flatten(transform(ss, (a, i) ->
            |  transform(slice(ss, i + 2, size(ss)),
            |    b -> struct(a AS src_a, b AS src_b))))""".stripMargin)).as("p"))
        .groupBy(col("p.src_a").as("src_a"), col("p.src_b").as("src_b"))
        .agg(count(lit(1)).as("n_spans"))
        .orderBy(col("src_a"), col("src_b"))
    }))

  private val dotSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)"
  private val naSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])), (a,b) -> a+b)"
  private val nbSql =
    "list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1), i -> v[i]*v[i])), (a,b) -> a+b)"

  val oracleSql: Map[String, String] = Map(

    "x90_ann_recall" ->
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
        |h AS (SELECT g.q_id, CAST(count(*) AS BIGINT) AS n_hits
        |  FROM (SELECT q_id, n_id FROM gr WHERE rnk <= 5) g
        |  JOIN (SELECT q_id, n_id FROM ir WHERE rnk <= 5) i
        |    ON g.q_id = i.q_id AND g.n_id = i.n_id
        |  GROUP BY 1)
        |SELECT q.q_id, CAST(coalesce(n_hits, 0) AS BIGINT) AS n_hits,
        |  CAST(coalesce(n_hits, 0) * 1000 // 5 AS BIGINT) AS recall_pm
        |FROM q LEFT JOIN h ON q.q_id = h.q_id ORDER BY q.q_id""".stripMargin,

    "x92_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
        |    FROM embeddings),
        |q AS (SELECT vec_id AS q_id, label AS q_label, v AS qv FROM e
        |  WHERE vec_id % 100 = 0),
        |p AS (SELECT q_id, vec_id AS n_id,
        |    $dotSql AS d, $naSql AS na, $nbSql AS nb
        |  FROM q JOIN e ON q_label <> label),
        |c AS (SELECT q_id, n_id,
        |    CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 AS cos6 FROM p),
        |r AS (SELECT q_id, n_id, cos6, row_number() OVER (PARTITION BY q_id
        |    ORDER BY cos6 DESC, n_id) AS rnk FROM c)
        |SELECT q_id, n_id, rnk, cos6 FROM r WHERE rnk <= 3
        |ORDER BY q_id, rnk""".stripMargin,

    "x93_sq8_quantize" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        |    FROM embeddings),
        |dm AS (SELECT i AS dim, min(v[i]) AS mn, max(v[i]) AS mx
        |  FROM e, (SELECT unnest(range(1, 65)) AS i) GROUP BY i),
        |st AS (SELECT list(mn ORDER BY dim) AS mins,
        |    list(mx ORDER BY dim) AS maxs FROM dm),
        |s AS (SELECT vec_id, list_reduce(list_prepend(0.0,
        |    list_transform(range(1, len(v)+1), i ->
        |      CASE WHEN maxs[i] = mins[i] THEN 0.0 ELSE
        |        (v[i] - (mins[i] +
        |           floor((v[i] - mins[i]) * 255.0 / (maxs[i] - mins[i]))
        |             * (maxs[i] - mins[i]) / 255.0)) *
        |        (v[i] - (mins[i] +
        |           floor((v[i] - mins[i]) * 255.0 / (maxs[i] - mins[i]))
        |             * (maxs[i] - mins[i]) / 255.0))
        |      END)), (a, b) -> a + b) AS sse
        |  FROM e, st)
        |SELECT vec_id, CAST(floor((sse / 64.0) * 1e6) AS DOUBLE)/1e6 AS mse6
        |FROM s ORDER BY vec_id""".stripMargin,

    "x94_semantic_dedup" ->
      """WITH RECURSIVE e AS (SELECT vec_id, label,
        |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |p AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i]*b.v[i])), (x,y) -> x+y) AS d,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(a.v)+1), i -> a.v[i]*a.v[i])), (x,y) -> x+y) AS na,
        |  list_reduce(list_prepend(0.0, list_transform(range(1, len(b.v)+1), i -> b.v[i]*b.v[i])), (x,y) -> x+y) AS nb
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id),
        |pairs AS (SELECT id1, id2 FROM p
        |  WHERE CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 >= 0.35),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |reach AS (
        |  SELECT vec_id AS id, vec_id AS lab FROM e
        |  UNION
        |  SELECT ed.b AS id, r.lab AS lab FROM reach r JOIN edges ed ON ed.a = r.id),
        |lab AS (SELECT id, min(lab) AS keep_id FROM reach GROUP BY id)
        |SELECT id AS vec_id, keep_id,
        |  count(*) OVER (PARTITION BY keep_id) AS n_members,
        |  id = keep_id AS is_kept
        |FROM lab ORDER BY vec_id""".stripMargin,

    "x91_source_copy_matrix" ->
      """WITH d AS (SELECT doc_id, source, string_split(text, ' ') AS w,
        |    len(string_split(text, ' ')) AS n FROM documents),
        |sp AS (SELECT source, md5(array_to_string(w[i:i+31], ' ')) AS h
        |  FROM (SELECT source, w, unnest(range(1, n-30, 16)) AS i
        |    FROM d WHERE n >= 32)),
        |ds AS (SELECT DISTINCT h, source FROM sp)
        |SELECT a.source AS src_a, b.source AS src_b,
        |  CAST(count(*) AS BIGINT) AS n_spans
        |FROM ds a JOIN ds b ON a.h = b.h AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
