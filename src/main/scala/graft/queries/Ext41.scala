package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-6 additions, part 1: per-line exact dedup (the C4 / Lee et al.
  * line-level pass — the last common LLM-curation primitive the catalog
  * lacked; x84/x88 cover span-level dedup).
  */
object Ext41 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X1c PER-LINE EXACT DEDUP WITH PROVENANCE (C4's line-level rule):
    // the corpus has no newlines, so line structure is synthesized in
    // the query — every 10-token chunk of a document is a "line"
    // (deterministic re-chunking, the same trick x36 uses for training
    // windows). A line occurring anywhere else in the corpus keeps only
    // its FIRST occurrence (min position corpus-wide, duplicates inside
    // one doc dedup too); per doc the output is the curation ledger:
    // lines seen / kept / dropped, tokens surviving, and how many of its
    // lines are corpus-duplicated. Scale shape: lines shuffle ONCE on a
    // 16-byte md5 line key with partial aggregation (min + count), then
    // the keeper frame equi-joins back — cost tracks duplicated lines,
    // never pairs; a 100M-copy boilerplate line is one hot key that AQE
    // skew-split handles, not a 10^16-pair blowup.
    "x141_line_dedup" -> ((s, d) => {
      val lines = documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("n"))
        .select(col("doc_id"), col("w"), col("n"),
          explode(sequence(lit(0), expr("(n - 1) div 10"))).as("line_no"))
        .select(col("doc_id"), col("line_no").cast("long").as("line_no"),
          // md5 key: the shuffle carries 32 B per line, not the line text
          md5(concat_ws(" ",
            slice(col("w"), (col("line_no") * 10 + 1).cast("int"), lit(10)))
            .cast("binary")).as("lk"),
          least(lit(10), col("n") - col("line_no") * 10)
            .cast("long").as("n_toks"),
          // position encoding keeps the keeper rule a plain integer min
          // (portable: no struct-min in the oracle); line_no < 1e6 holds
          // for any document under 10M tokens
          (col("doc_id") * 1000000L + col("line_no")).as("pos"))
      val keepers = lines.groupBy(col("lk"))
        .agg(min(col("pos")).as("keep_pos"), count(lit(1)).as("n_occ"))
      lines.join(keepers, "lk")
        .withColumn("kept",
          when(col("pos") === col("keep_pos"), 1L).otherwise(0L))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_lines"),
          sum(col("kept")).as("n_kept"),
          sum(lit(1L) - col("kept")).as("n_dropped"),
          sum(col("n_toks") * col("kept")).as("toks_kept"),
          sum(when(col("n_occ") > 1, 1L).otherwise(0L)).as("n_dup_lines"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    // grouping on the raw line text (the md5 key is a pure shuffle-width
    // optimization — identical groups); DuckDB list slice [a:b] is
    // 1-based inclusive and clamps, matching Spark's slice(w, a, 10)
    "x141_line_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w,
        |  len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, w, n,
        |  unnest(range(0, ((n - 1) // 10) + 1)) AS line_no FROM w),
        |l AS (SELECT doc_id, line_no,
        |  array_to_string(w[CAST(line_no*10 + 1 AS INT):CAST(line_no*10 + 10 AS INT)], ' ') AS line_txt,
        |  least(10, n - line_no*10) AS n_toks,
        |  doc_id*1000000 + line_no AS pos FROM c),
        |g AS (SELECT line_txt, min(pos) AS keep_pos, count(*) AS n_occ
        |  FROM l GROUP BY line_txt)
        |SELECT doc_id, count(*) AS n_lines,
        |  CAST(sum(CASE WHEN pos = keep_pos THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
        |  CAST(sum(CASE WHEN pos = keep_pos THEN 0 ELSE 1 END) AS BIGINT) AS n_dropped,
        |  CAST(sum(CASE WHEN pos = keep_pos THEN n_toks ELSE 0 END) AS BIGINT) AS toks_kept,
        |  CAST(sum(CASE WHEN n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_lines
        |FROM l JOIN g USING (line_txt)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
