package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-6 batch 1: the sampling-and-batching layer of a training-data
  * pipeline — the steps between "corpus is deduped and scored" and "examples
  * are on disk": apportioning a sampling budget across sources (x73),
  * accounting padding waste under length-bucketed batching (x74), tokenizer
  * vocabulary coverage / OOV rate (x75), a deterministic cross-source
  * interleave order (w29), and the decreasing variant of sequence packing
  * (x76, next-fit-decreasing under the same chunked distributed contract as
  * x61).
  *
  * Shared determinism rules (ROUND_NOTES.md): integer arithmetic end to end
  * (per-mille shares via multiply-div, never float division), md5-prefix
  * hashes replayed bit-identically by the oracle, every result ordered by a
  * unique key. The only windows are over frames whose size is bounded by the
  * SOURCE COUNT (a handful of rows at any corpus size), never over the
  * corpus itself.
  */
object Ext17 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X73 MIXTURE APPORTIONMENT (largest remainder / Hamilton): split a
    // sampling budget of 1000 examples across sources proportional to
    // their token mass, exactly — floor quotas first, then the leftover
    // units go to the largest fractional remainders (ties to the source
    // name). This is the "dataset mixture" step of every pretraining run,
    // and the textbook apportionment method, in pure integer arithmetic:
    // remainder comparison is (1000·tok) mod total — no float ratio ever
    // exists. The corpus-scale work is ONE partial-aggregable token count;
    // the window runs on the per-source frame (|sources| rows).
    "x73_mixture_apportion" -> ((s, d) => {
      val tok = documents(s, d)
        .select(col("source"),
          size(TextOps.words(col("text"))).cast("long").as("t"))
        .groupBy(col("source")).agg(sum(col("t")).as("tok"))
      val tot = tok.agg(sum(col("tok")).as("total"))
      val q = tok.crossJoin(broadcast(tot))
        .select(col("source"), col("tok"),
          expr("1000 * tok div total").as("base"),
          expr("(1000 * tok) % total").as("rem"))
      val left = q.agg((lit(1000L) - sum(col("base"))).as("leftover"))
      q.withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("source"))).cast("long"))
        .crossJoin(broadcast(left))
        .select(col("source"), col("tok"),
          (col("base") +
            when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .as("quota"))
        .orderBy(col("source"))
    }),

    // X74 LENGTH-BUCKET PADDING ACCOUNTING: assign each doc to the
    // smallest power-of-two token-length bucket that holds it, then price
    // the padding a bucketed batcher pays — padded cells minus real
    // tokens, and the waste as integer per-mille of the padded volume.
    // This is the report that decides training batch-shape policy. One
    // scan, one partial-aggregable rollup on a derived key; the bucket
    // rule is a CASE chain spelled identically on both engines.
    "x74_length_buckets" -> ((s, d) => {
      val t = size(TextOps.words(col("text"))).cast("long")
      val bucket = when(t <= 16, 16L).when(t <= 32, 32L).when(t <= 64, 64L)
        .when(t <= 128, 128L).when(t <= 256, 256L).when(t <= 512, 512L)
        .otherwise(1024L)
      documents(s, d)
        .select(bucket.as("bucket"), t.as("t"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_docs"), sum(col("t")).as("sum_tokens"))
        .select(col("bucket"), col("n_docs"), col("sum_tokens"),
          (col("bucket") * col("n_docs") - col("sum_tokens")).as("pad"),
          expr("(bucket * n_docs - sum_tokens) * 1000 div (bucket * n_docs)")
            .as("pad_pm"))
        .orderBy(col("bucket"))
    }),

    // X75 VOCABULARY COVERAGE / OOV RATE: build the top-500 word
    // vocabulary from the src0 slice (freq desc, ties to the word — a
    // TOTAL order, so the cut is deterministic), then measure each
    // source's out-of-vocabulary token rate against it — the tokenizer
    // coverage check run before committing to a vocab. The vocab is
    // top-k-sized (TakeOrderedAndProject, never a global sort) and
    // BROADCAST into the corpus-scale probe; the rollup is
    // partial-aggregable. OOV rate is integer per-mille.
    "x75_oov_rate" -> ((s, d) => {
      val vocab = documents(s, d).filter(col("source") === "src0")
        .select(explode(TextOps.words(col("text"))).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("w")).limit(500)
        .select(col("w"), lit(1L).as("in_v"))
      documents(s, d)
        .select(col("source"), explode(TextOps.words(col("text"))).as("w"))
        .join(broadcast(vocab), Seq("w"), "left")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("in_v").isNull, 1L).otherwise(0L)).as("n_oov"))
        .withColumn("oov_pm", expr("n_oov * 1000 div n_tokens"))
        .orderBy(col("source"))
    }),

    // W29 DETERMINISTIC SOURCE INTERLEAVE: the epoch reading order that
    // alternates sources round-robin, with each source's internal order a
    // pure function of the doc id (salted md5 — stable across reruns,
    // reshards, and engines). Emitted: the first 10 rounds. The interleave
    // position is ARITHMETIC — (rank−1)·|sources| + source_index — so no
    // global window ever runs: ranks are per-source windows, the source
    // index comes from a |sources|-row frame joined back by broadcast.
    "w29_interleave" -> ((s, d) => {
      val h = TextOps.hash32(concat(lit("il:"), col("doc_id").cast("string")))
      val ranked = documents(s, d)
        .select(col("source"), col("doc_id"), h.as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .filter(col("rk") <= 10)
      val idx = documents(s, d).select(col("source")).distinct()
        .withColumn("sidx", row_number().over(Window.orderBy(col("source")))
          .cast("long"))
      val nsrc = idx.agg(count(lit(1)).as("ns"))
      ranked.join(broadcast(idx), "source").crossJoin(broadcast(nsrc))
        .select(((col("rk") - 1) * col("ns") + col("sidx")).as("pos"),
          col("source"), col("doc_id"))
        .orderBy(col("pos"))
    }),

    // X76 NEXT-FIT-DECREASING PACKING: x61's chunked sequence packing with
    // the classic bin-packing improvement — sort each chunk's docs by
    // token count DESCENDING before the next-fit fold, so big docs claim
    // bins first and the tail back-fills. Same distributed contract as
    // x61 (chunks of 64 pack independently; bin ids compose as
    // chunk·64 + local bin); the sort rides the same collect_list, via an
    // ascending sort_array on a negated-count struct key. The oracle
    // replays the exact fold with x61's depth-64 recursive CTE, stepping
    // docs in (t desc, doc_id) order.
    "x76_nfd_pack" -> ((s, d) => {
      val budget = 200L
      val outType = "array<struct<doc_id:bigint,t:bigint,bin:bigint>>"
      val docs = documents(s, d).select(col("doc_id"),
        expr("doc_id div 64").as("chunk"),
        size(TextOps.words(col("text"))).cast("long").as("t"))
      val packed = docs
        .groupBy(col("chunk"))
        .agg(sort_array(collect_list(
          struct((-col("t")).as("nt"), col("doc_id"), col("t")))).as("lst"))
        .withColumn("p", explode(aggregate(
          col("lst"),
          struct(lit(0L).as("fill"), lit(0L).as("bin"),
            array().cast(outType).as("out")),
          (acc, x) => {
            val fill = acc.getField("fill")
            val bin = acc.getField("bin")
            val out = acc.getField("out")
            val id = x.getField("doc_id")
            val t = x.getField("t")
            val fits = fill > 0 && fill + t <= budget
            val nbin = when(fill === 0, bin).otherwise(bin + 1)
            when(fits, struct((fill + t).as("fill"), bin.as("bin"),
              concat(out, array(struct(id.as("doc_id"), t.as("t"),
                bin.as("bin")))).as("out")))
            .otherwise(struct(t.as("fill"), nbin.as("bin"),
              concat(out, array(struct(id.as("doc_id"), t.as("t"),
                nbin.as("bin")))).as("out")))
          },
          acc => acc.getField("out"))))
      packed.select(col("p.doc_id").as("doc_id"),
          col("p.t").as("n_tokens"),
          (col("chunk") * 64 + col("p.bin")).as("bin_id"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x73_mixture_apportion" ->
      """WITH tok AS (SELECT source,
        |    CAST(sum(CAST(len(string_split(text, ' ')) AS BIGINT)) AS BIGINT)
        |      AS tok
        |  FROM documents GROUP BY source),
        |t AS (SELECT CAST(sum(tok) AS BIGINT) AS total FROM tok),
        |q AS (SELECT source, tok,
        |    CAST(1000 * tok // total AS BIGINT) AS base,
        |    (1000 * tok) % total AS rem
        |  FROM tok, t),
        |l AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS leftover FROM q),
        |r AS (SELECT source, tok, base,
        |    CAST(row_number() OVER (ORDER BY rem DESC, source) AS BIGINT)
        |      AS rk
        |  FROM q)
        |SELECT source, tok,
        |  base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS quota
        |FROM r, l ORDER BY source""".stripMargin,

    "x74_length_buckets" ->
      """WITH d AS (SELECT
        |    CASE WHEN t <= 16 THEN 16 WHEN t <= 32 THEN 32
        |      WHEN t <= 64 THEN 64 WHEN t <= 128 THEN 128
        |      WHEN t <= 256 THEN 256 WHEN t <= 512 THEN 512
        |      ELSE 1024 END AS bucket, t
        |  FROM (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        |    FROM documents)),
        |g AS (SELECT CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
        |    CAST(sum(t) AS BIGINT) AS sum_tokens
        |  FROM d GROUP BY bucket)
        |SELECT bucket, n_docs, sum_tokens,
        |  bucket * n_docs - sum_tokens AS pad,
        |  (bucket * n_docs - sum_tokens) * 1000 // (bucket * n_docs) AS pad_pm
        |FROM g ORDER BY bucket""".stripMargin,

    "x75_oov_rate" ->
      """WITH v AS (SELECT w FROM (
        |    SELECT unnest(string_split(text, ' ')) AS w FROM documents
        |    WHERE source = 'src0')
        |  GROUP BY w ORDER BY count(*) DESC, w LIMIT 500),
        |tk AS (SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |j AS (SELECT tk.source, CASE WHEN v.w IS NULL THEN 1 ELSE 0 END
        |    AS oov
        |  FROM tk LEFT JOIN v ON tk.w = v.w)
        |SELECT source, count(*) AS n_tokens,
        |  CAST(sum(oov) AS BIGINT) AS n_oov,
        |  CAST(sum(oov) AS BIGINT) * 1000 // count(*) AS oov_pm
        |FROM j GROUP BY source ORDER BY source""".stripMargin,

    "w29_interleave" ->
      """WITH d AS (SELECT source, doc_id,
        |    CAST(concat('0x', substr(md5('il:' || CAST(doc_id AS VARCHAR)),
        |      1, 8)) AS BIGINT) AS h
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |    CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
        |      AS BIGINT) AS rk
        |  FROM d),
        |s AS (SELECT source,
        |    CAST(row_number() OVER (ORDER BY source) AS BIGINT) AS sidx
        |  FROM (SELECT DISTINCT source FROM documents)),
        |n AS (SELECT count(*) AS ns FROM s)
        |SELECT (r.rk - 1) * n.ns + s.sidx AS pos, r.source, r.doc_id
        |FROM r JOIN s USING (source), n
        |WHERE r.rk <= 10 ORDER BY pos""".stripMargin,

    "x76_nfd_pack" ->
      """WITH RECURSIVE d AS (SELECT doc_id, doc_id // 64 AS chunk,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS t
        |  FROM documents),
        |o AS (SELECT doc_id, chunk, t,
        |    CAST(row_number() OVER (PARTITION BY chunk
        |      ORDER BY t DESC, doc_id) AS BIGINT) AS rn
        |  FROM d),
        |st AS (
        |  SELECT chunk, rn, doc_id, t, t AS fill, CAST(0 AS BIGINT) AS bin
        |  FROM o WHERE rn = 1
        |  UNION ALL
        |  SELECT o.chunk, o.rn, o.doc_id, o.t,
        |    CASE WHEN st.fill + o.t <= 200 THEN st.fill + o.t ELSE o.t END,
        |    CASE WHEN st.fill + o.t <= 200 THEN st.bin ELSE st.bin + 1 END
        |  FROM st JOIN o ON o.chunk = st.chunk AND o.rn = st.rn + 1)
        |SELECT doc_id, t AS n_tokens, chunk * 64 + bin AS bin_id
        |FROM st ORDER BY doc_id""".stripMargin)
}
