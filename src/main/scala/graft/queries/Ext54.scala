package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** Round-10 batch 4: x176 MATTR — moving-average type–token ratio
  * (Covington & McFall 2010), the length-independent lexical-diversity
  * statistic (plain TTR falls with document length, so corpus-level
  * TTR comparisons are length artifacts; MATTR fixes a window and
  * averages distinct-token counts over every window position).
  *
  * The naive spelling rescans W tokens per position (O(n·W) distinct
  * sets per doc). The exact linear identity used here instead: token
  * position i contributes to window j's distinct count iff i is the
  * FIRST occurrence of its token inside [j, j+W), i.e. iff
  * prev(i) < j ≤ i — so its total contribution across all windows is
  * the INTERVAL LENGTH
  *
  *   max(0, min(i, n−W) − max(prev(i)+1, i−W+1, 0) + 1)
  *
  * and Σ contributions = Σ over windows of distinct counts, exactly.
  * prev(i) is one lag over (doc_id, token) — position state becomes a
  * window function, never a per-row set.
  *
  * Scale shape: one posexplode + ONE lag window keyed (doc_id, token)
  * — doc-local keys, the x167 per-group precedent — then a per-doc and
  * a \|sources\|-bounded rollup, both partial-aggregable. Docs shorter
  * than W emit nothing (documented; MATTR is undefined there — the
  * per-source n_docs column surfaces how many qualified). All integer;
  * one ppm floor per source over the summed numerators/denominators
  * (pooled MATTR, not a mean of per-doc floors — documented choice,
  * matching the oracle exactly).
  */
object Ext54 {

  /** MATTR window length (tokens). Classic choice for short-document
    * corpora; surfaced here so the spec and oracle share it. */
  val MattrW = 50

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x176_mattr" -> ((s, d) => {
      val W = MattrW
      val e = documents(s, d)
        .select(col("doc_id"), col("source"),
          expr("size(split(text, ' '))").cast("long").as("n"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      val p = e.withColumn("prev",
        lag(col("pos"), 1).over(
          Window.partitionBy(col("doc_id"), col("w")).orderBy(col("pos"))))
      val c = p.filter(col("n") >= W)
        .select(col("doc_id"), col("source"), col("n"),
          expr(
            s"""greatest(0L, least(cast(pos AS BIGINT), n - ${W}L)
               | - greatest(cast(coalesce(prev, -1) AS BIGINT) + 1L,
               |     cast(pos AS BIGINT) - ${W}L + 1L, 0L) + 1L)"""
              .stripMargin).as("contrib"))
      val perDoc = c.groupBy(col("doc_id"), col("source"))
        .agg(max(col("n")).as("n"), sum(col("contrib")).as("dis"))
      perDoc.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("dis")).as("sum_distinct"),
          sum(expr(s"(n - ${W}L + 1L) * ${W}L")).as("sum_window_tokens"))
        .select(col("source"), col("n_docs"), col("sum_distinct"),
          col("sum_window_tokens"),
          expr("1000000L * sum_distinct div sum_window_tokens")
            .as("mattr_ppm"))
        .orderBy(col("source"))
    }))

  val oracleSql: Map[String, String] = {
    val W = MattrW
    Map(
      "x176_mattr" ->
        s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws
           |  FROM documents),
           |e AS (SELECT doc_id, source, CAST(len(ws) AS BIGINT) AS n,
           |    unnest(range(1, len(ws) + 1)) AS pos, ws FROM t),
           |f AS (SELECT doc_id, source, n, pos,
           |    ws[CAST(pos AS INT)] AS w FROM e),
           |p AS (SELECT doc_id, source, n, pos, w,
           |    coalesce(lag(pos) OVER (PARTITION BY doc_id, w
           |      ORDER BY pos), 0) AS prev
           |  FROM f),
           |c AS (SELECT doc_id, source, n,
           |    greatest(0, least(pos, n - $W + 1)
           |      - greatest(prev + 1, pos - $W + 1, 1) + 1) AS contrib
           |  FROM p WHERE n >= $W),
           |d AS (SELECT doc_id, source, CAST(max(n) AS BIGINT) AS n,
           |    CAST(sum(contrib) AS BIGINT) AS dis
           |  FROM c GROUP BY doc_id, source)
           |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           |  CAST(sum(dis) AS BIGINT) AS sum_distinct,
           |  CAST(sum((n - $W + 1) * $W) AS BIGINT) AS sum_window_tokens,
           |  CAST(1000000 * sum(dis) // sum((n - $W + 1) * $W) AS BIGINT)
           |    AS mattr_ppm
           |FROM d GROUP BY source ORDER BY source""".stripMargin)
  }
}
