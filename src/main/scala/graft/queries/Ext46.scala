package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.Similarity
import graft.GraftCaches.TrackedPersist

/** Round-7 batch, part 2: ranked-retrieval quality — NDCG@10 and MRR@10
  * of an approximate retrieval run against brute-force ground truth
  * (x150). x90 answers "how many of the true top-k did the index
  * return" (set recall); x150 answers the question every IR / RAG eval
  * actually reports: did the run put the RIGHT items at the TOP ranks,
  * with position-discounted credit. Completes the retrieval-eval family
  * (x70 label confusion, x90 recall, x113 RBO, x135 rank fusion).
  *
  * Float discipline: DCG's 1/log2(r+1) discounts are irrational, so the
  * statistic is spelled with a BAKED 10-entry integer table
  * floor(1e6/log2(r+1)) shared verbatim by both engines — gains, DCG,
  * IDCG and the ppm ratio are then exact BIGINT arithmetic end to end
  * (the family's no-floats-cross-engines rule). MRR uses lcm(1..10) =
  * 2520 fixed point: 2520/r is an integer for every rank r <= 10.
  */
object Ext46 {

  /** floor(1e6 / log2(r+1)) for run rank r = 1..10 — the NDCG discount
    * table, baked so no transcendental is evaluated by either engine. */
  private val discountW: Seq[Long] = Seq(
    1000000L, 630929L, 500000L, 430676L, 386852L,
    356207L, 333333L, 315464L, 301029L, 289064L)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X150 NDCG@10 / MRR@10 RETRIEVAL EVAL: ground truth = exact
    // brute-force cosine top-10 per query (grade 10 for the true
    // nearest neighbor down to 1 for rank 10); run = the label-bucket
    // IVF arm (x90's shape). Per query: DCG = sum over run ranks of
    // grade * W[rank], IDCG = the same sum over the ideal (ground-
    // truth) ordering, ndcg_ppm = floor(1e6 * DCG / IDCG), and
    // rr_2520 = 2520 / (run rank of the true top-1), 0 if missed.
    // Scale shape: identical audit contract to x90 — the bounded query
    // sample broadcasts against the one persisted corpus frame, so
    // both arms cost sample x corpus, never corpus squared; everything
    // downstream of the two top-10 windows operates on <= 10|Q| rows.
    "x150_ndcg" -> ((s, d) => {
      val wArr = array(discountW.map(lit): _*)
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
      def top10(pairs: DataFrame): DataFrame = pairs
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col("rnk") <= 10)
      val gt = top10(broadcast(q).join(e, col("vec_id") =!= col("q_id")))
        .select(col("q_id"), col("n_id"),
          (lit(11L) - col("rnk")).as("grade"),
          element_at(wArr, col("rnk").cast("int")).as("ideal_w"))
      val run = top10(broadcast(q).join(e,
          col("q_label") === col("label") && col("vec_id") =!= col("q_id")))
        .select(col("q_id"), col("n_id"), col("rnk"),
          element_at(wArr, col("rnk").cast("int")).as("run_w"))
      val perQ = run.join(gt, Seq("q_id", "n_id"))
        .groupBy(col("q_id"))
        .agg(sum(col("grade") * col("run_w")).as("dcg_w"),
          sum(when(col("grade") === 10L, expr("2520L div rnk"))
            .otherwise(0L)).as("rr_raw"))
      val idcg = gt.groupBy(col("q_id"))
        .agg(sum(col("grade") * col("ideal_w")).as("idcg_w"))
      q.select(col("q_id")).join(perQ, Seq("q_id"), "left")
        .join(idcg, Seq("q_id"), "left")
        .select(col("q_id"),
          coalesce(col("dcg_w"), lit(0L)).as("dcg_w"),
          coalesce(col("idcg_w"), lit(0L)).as("idcg_w"),
          coalesce(col("rr_raw"), lit(0L)).as("rr_2520"))
        .withColumn("ndcg_ppm",
          when(col("idcg_w") === 0L, 0L)
            .otherwise(expr("dcg_w * 1000000L div idcg_w")))
        .orderBy(col("q_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x150_ndcg" -> {
      val ws = discountW.mkString("[", ", ", "]")
      val dotSql =
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*v[i])), (a,b) -> a+b)"
      val naSql =
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])), (a,b) -> a+b)"
      val nbSql =
        "list_reduce(list_prepend(0.0, list_transform(range(1, len(v)+1), i -> v[i]*v[i])), (a,b) -> a+b)"
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
        |gt AS (SELECT q_id, n_id, CAST(11 - rnk AS BIGINT) AS grade,
        |    CAST(($ws)[CAST(rnk AS INT)] AS BIGINT) AS ideal_w
        |  FROM gr WHERE rnk <= 10),
        |ip AS (SELECT q_id, vec_id AS n_id,
        |    $dotSql AS d, $naSql AS na, $nbSql AS nb
        |  FROM q JOIN e ON q_label = label AND vec_id <> q_id),
        |ir AS (SELECT q_id, n_id, row_number() OVER (PARTITION BY q_id
        |    ORDER BY CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 DESC, n_id)
        |    AS rnk FROM ip),
        |run AS (SELECT q_id, n_id, rnk,
        |    CAST(($ws)[CAST(rnk AS INT)] AS BIGINT) AS run_w
        |  FROM ir WHERE rnk <= 10),
        |pq AS (SELECT run.q_id,
        |    CAST(sum(grade * run_w) AS BIGINT) AS dcg_w,
        |    CAST(sum(CASE WHEN grade = 10 THEN 2520 // rnk ELSE 0 END)
        |      AS BIGINT) AS rr_raw
        |  FROM run JOIN gt ON run.q_id = gt.q_id AND run.n_id = gt.n_id
        |  GROUP BY 1),
        |ic AS (SELECT q_id, CAST(sum(grade * ideal_w) AS BIGINT) AS idcg_w
        |  FROM gt GROUP BY 1)
        |SELECT q.q_id,
        |  CAST(coalesce(dcg_w, 0) AS BIGINT) AS dcg_w,
        |  CAST(coalesce(idcg_w, 0) AS BIGINT) AS idcg_w,
        |  CAST(coalesce(rr_raw, 0) AS BIGINT) AS rr_2520,
        |  CAST(CASE WHEN coalesce(idcg_w, 0) = 0 THEN 0
        |    ELSE coalesce(dcg_w, 0) * 1000000 // idcg_w END AS BIGINT)
        |    AS ndcg_ppm
        |FROM q LEFT JOIN pq ON q.q_id = pq.q_id
        |LEFT JOIN ic ON q.q_id = ic.q_id
        |ORDER BY q.q_id""".stripMargin
    })
}
