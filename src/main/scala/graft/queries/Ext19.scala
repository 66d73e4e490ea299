package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-5 batch: first-fit-decreasing sequence packing (x78) — the
  * quality-optimizing sibling of x61's next-fit pack. Same distributed
  * contract (pack resets every 64 docs so chunks pack independently and in
  * parallel; bin ids compose as chunk·64 + local bin), but within a chunk
  * docs are taken LARGEST FIRST and each goes into the FIRST open bin it
  * fits — the classic FFD heuristic (≤ 11/9·OPT + 1 bins), which training
  * pipelines prefer over next-fit because it wastes far less token budget
  * per bin. The oracle replays the exact fold with a depth-64 recursive
  * CTE whose state carries the open-bin fill LIST (reference technique:
  * x61, extended with list state).
  */
object Ext19 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X78 FIRST-FIT-DECREASING PACKING: per chunk, sort docs by token
    // count DESC (tie: doc_id), then fold with state = open-bin fills
    // array: first fitting bin wins, else open a new one. The fold is a
    // single aggregate HOF per chunk (bounded 64-element state, no shuffle
    // beyond the chunk groupBy) — the same scale shape as x61; a doc
    // longer than the budget gets a bin of its own on both engines.
    "x78_ffd_pack" -> ((s, d) => {
      val docs = documents(s, d).select(col("doc_id"),
        expr("doc_id div 64").as("chunk"),
        size(TextOps.words(col("text"))).cast("long").as("t"))
      // sort_array ascending on (-t, doc_id, t) = largest-first, id tiebreak
      val packed = docs
        .groupBy(col("chunk"))
        .agg(sort_array(collect_list(
          struct((-col("t")).as("nt"), col("doc_id"), col("t")))).as("lst"))
        .withColumn("p", explode(expr(
          """aggregate(lst,
            |  named_struct(
            |    'fills', cast(array() as array<bigint>),
            |    'out', cast(array() as array<struct<doc_id:bigint,t:bigint,bin:bigint>>)),
            |  (acc, x) -> named_struct(
            |    'fills',
            |    CASE WHEN array_position(transform(acc.fills, f -> f + x.t <= 200), true) > 0
            |      THEN transform(acc.fills, (f, i) ->
            |        CASE WHEN i = array_position(transform(acc.fills, f2 -> f2 + x.t <= 200), true) - 1
            |          THEN f + x.t ELSE f END)
            |      ELSE concat(acc.fills, array(x.t)) END,
            |    'out',
            |    concat(acc.out, array(named_struct(
            |      'doc_id', x.doc_id, 't', x.t,
            |      'bin',
            |      CASE WHEN array_position(transform(acc.fills, f -> f + x.t <= 200), true) > 0
            |        THEN array_position(transform(acc.fills, f -> f + x.t <= 200), true) - 1
            |        ELSE cast(size(acc.fills) as bigint) END)))),
            |  acc -> acc.out)""".stripMargin)))
      packed.select(col("p.doc_id").as("doc_id"),
          col("p.t").as("n_tokens"),
          (col("chunk") * 64 + col("p.bin")).as("bin_id"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x78_ffd_pack" ->
      """WITH RECURSIVE d AS (SELECT doc_id, doc_id // 64 AS chunk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |    CAST(row_number() OVER (PARTITION BY doc_id // 64
        |      ORDER BY t DESC, doc_id) AS BIGINT) AS rn
        |  FROM documents),
        |st AS (
        |  SELECT chunk, rn, doc_id, t, [t] AS fills, CAST(0 AS BIGINT) AS bin
        |  FROM d WHERE rn = 1
        |  UNION ALL
        |  SELECT d.chunk, d.rn, d.doc_id, d.t,
        |    CASE WHEN p.pos > 0
        |      THEN st.fills[1:p.pos-1] || [st.fills[p.pos] + d.t] || st.fills[p.pos+1:]
        |      ELSE list_append(st.fills, d.t) END,
        |    CASE WHEN p.pos > 0 THEN CAST(p.pos - 1 AS BIGINT)
        |      ELSE CAST(len(st.fills) AS BIGINT) END
        |  FROM st JOIN d ON d.chunk = st.chunk AND d.rn = st.rn + 1,
        |    LATERAL (SELECT coalesce(list_position(
        |      list_transform(st.fills, f -> f + d.t <= 200), true), 0) AS pos) p)
        |SELECT doc_id, t AS n_tokens, chunk * 64 + bin AS bin_id
        |FROM st ORDER BY doc_id""".stripMargin)
}
