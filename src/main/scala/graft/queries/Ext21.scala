package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps
import graft.GraftCaches.TrackedPersist

/** Round-5 batch, part 3: the boilerplate-span SCRUB (x88 — x84's
  * detection composed with x82's interval merge into the C4-style
  * rewrite report: what a cross-document repeated-span filter would
  * actually delete from each document) and the dedup provenance trail
  * (x89 — the per-document audit record exact dedup must emit before a
  * pipeline is allowed to drop rows).
  */
object Ext21 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X88 BOILERPLATE-SPAN SCRUB: 16-token windows at stride 8; any span
    // whose digest appears in ≥ 2 distinct docs is boilerplate (the
    // cross-document repeated-text rule of C4 / Lee et al., at window
    // granularity); overlapping or adjacent flagged windows merge into
    // islands, and each doc reports how many tokens the scrub would
    // remove vs keep. Every doc gets a row (clean docs report 0) — the
    // rewrite report is itself the audit artifact. Scale shape: span
    // digests (16 B) feed one groupBy and one digest-keyed join back —
    // both co-partitioned on the digest; the island merge is a per-doc
    // window over FLAGGED spans only (a vanishing fraction of the
    // corpus), never over raw tokens.
    "x88_boilerplate_scrub" -> ((s, d) => {
      val docs = documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).cast("long").as("n"))
      val spans = docs.filter(col("n") >= 16)
        .select(col("doc_id"), col("w"),
          explode(sequence(lit(1L), col("n") - 15, lit(8L))).as("i"))
        .select(col("doc_id"), col("i"),
          md5(array_join(slice(col("w"), col("i"), lit(16)), " ")).as("h"))
        .persistTracked()
      val flagged = spans.groupBy(col("h"))
        .agg(countDistinct(col("doc_id")).as("nd"))
        .filter(col("nd") >= 2)
        .select(col("h"))
      val fs = spans.join(flagged, Seq("h"))
        .select(col("doc_id"), col("i"), (col("i") + 15).as("e"))
      val w = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      val islands = fs
        .withColumn("prev_max_e",
          max(col("e")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("opens",
          when(col("prev_max_e").isNull || col("i") > col("prev_max_e") + 1, 1L)
            .otherwise(0L))
        .withColumn("island",
          sum(col("opens")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .groupBy(col("doc_id"), col("island"))
        .agg(min(col("i")).as("is_s"), max(col("e")).as("is_e"),
          count(lit(1)).as("nsp"))
        .groupBy(col("doc_id"))
        .agg(sum(col("nsp")).as("n_flagged"),
          sum(col("is_e") - col("is_s") + 1).as("removed"))
      docs.select(col("doc_id"), col("n"))
        .join(islands, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n").as("n_tokens"),
          coalesce(col("n_flagged"), lit(0L)).as("n_flagged"),
          coalesce(col("removed"), lit(0L)).as("removed_tokens"),
          (col("n") - coalesce(col("removed"), lit(0L))).as("kept_tokens"))
        .orderBy(col("doc_id"))
    }),

    // X89 DEDUP PROVENANCE TRAIL: for every document in a normalized-dup
    // cluster of size ≥ 2 (x2's bag-of-words key — the corpus has
    // reordered duplicates, not byte-identical ones), the audit record a
    // pipeline must keep when it drops rows — survivor id, the doc's rank
    // within its cluster (survivor = rank 1, by doc_id), and the cluster
    // size. ONE content-key shuffle (32 B/doc on the wire, same key as
    // x2) serves both the window and the rollup; clean docs produce
    // nothing, so the trail's size tracks duplicates, not the corpus.
    "x89_dedup_provenance" -> ((s, d) => {
      val keyed = documents(s, d)
        .select(col("doc_id"), md5(concat_ws(" ",
          array_sort(array_distinct(TextOps.words(col("text")))))
          .cast("binary")).as("h"))
      val w = Window.partitionBy(col("h"))
      keyed
        .withColumn("rank", row_number().over(w.orderBy(col("doc_id"))))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .withColumn("cluster_sz", count(lit(1)).over(w))
        .filter(col("cluster_sz") >= 2)
        .select(col("doc_id"), col("keep_id"),
          col("rank").cast("long").as("rank"), col("cluster_sz"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x88_boilerplate_scrub" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents),
        |sp AS (SELECT doc_id, i, md5(array_to_string(w[i:i+15], ' ')) AS h
        |  FROM (SELECT doc_id, w, unnest(range(1, n-14, 8)) AS i
        |    FROM d WHERE n >= 16)),
        |fl AS (SELECT h FROM sp GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
        |fs AS (SELECT doc_id, i, i + 15 AS e FROM sp JOIN fl USING (h)),
        |m AS (SELECT doc_id, i, e, CASE WHEN i > coalesce(max(e) OVER
        |      (PARTITION BY doc_id ORDER BY i
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
        |    THEN 1 ELSE 0 END AS opens FROM fs),
        |g AS (SELECT doc_id, i, e, sum(opens) OVER
        |    (PARTITION BY doc_id ORDER BY i) AS island FROM m),
        |isl AS (SELECT doc_id, min(i) AS s, max(e) AS e2,
        |    CAST(count(*) AS BIGINT) AS nsp FROM g GROUP BY doc_id, island),
        |agg AS (SELECT doc_id, sum(nsp) AS n_flagged,
        |    sum(e2 - s + 1) AS removed FROM isl GROUP BY doc_id)
        |SELECT d.doc_id, n AS n_tokens,
        |  CAST(coalesce(n_flagged, 0) AS BIGINT) AS n_flagged,
        |  CAST(coalesce(removed, 0) AS BIGINT) AS removed_tokens,
        |  CAST(n - coalesce(removed, 0) AS BIGINT) AS kept_tokens
        |FROM d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin,

    "x89_dedup_provenance" ->
      """WITH k AS (SELECT doc_id, md5(array_to_string(
        |    list_sort(list_distinct(string_split(text, ' '))), ' ')) AS h
        |  FROM documents),
        |r AS (SELECT doc_id, h,
        |    CAST(row_number() OVER (PARTITION BY h ORDER BY doc_id) AS BIGINT)
        |      AS rank,
        |    min(doc_id) OVER (PARTITION BY h) AS keep_id,
        |    CAST(count(*) OVER (PARTITION BY h) AS BIGINT) AS cluster_sz
        |  FROM k)
        |SELECT doc_id, keep_id, rank, cluster_sz FROM r
        |WHERE cluster_sz >= 2 ORDER BY doc_id""".stripMargin)
}
