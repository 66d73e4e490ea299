package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-6 batch 2: warehouse-maintenance and event-analytics classics —
  * CDC changeset apply / MERGE INTO semantics (j13), a null-routed outer
  * join that keeps null keys out of the shuffle (j14), last-touch
  * attribution (w30), a dense calendar spine with zero-fill (w31), and
  * class-based regex tokenization (x77, the "BPE-ish regex" token counter).
  *
  * Determinism rules as everywhere (ROUND_NOTES.md): integer arithmetic,
  * md5-prefix hashes replayed on both engines, calendar math done as epoch
  * integer division (never engine week/date functions), results ordered by
  * a unique key.
  */
object Ext18 {

  /** Micros per day — epoch-day arithmetic shared by w31's two engines. */
  private val UsPerDay = 86400000000L

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // J13 CDC MERGE (MERGE INTO semantics): apply a changeset of
    // inserts/updates/deletes to a base table in ONE full-outer join —
    // the maintenance operation behind every warehouse upsert. The
    // changeset is derived deterministically from the base (md5 routing:
    // ~10% deletes, ~20% updates, ~10% inserts under fresh keys), so both
    // engines replay it bit-identically. At scale the merge is one
    // key-partitioned shuffle of base ⋈ changes; the verification rollup
    // is partial-aggregable.
    "j13_cdc_merge" -> ((s, d) => {
      val base = customer(s, d).select(col("c_custkey").as("k"),
        floor(col("c_acctbal") * 100.0).cast("long").as("cents"),
        col("c_mktsegment").as("seg"))
      val h = pmod(TextOps.hash32(concat(lit("cdc:"), col("k").cast("string"))),
        lit(10))
      val routed = base.withColumn("h", h)
      val deletes = routed.filter(col("h") === 0)
        .select(col("k"), lit("D").as("op"), lit(null).cast("long").as("n_cents"),
          lit(null).cast("string").as("n_seg"))
      val updates = routed.filter(col("h").isin(1, 2))
        .select(col("k"), lit("U").as("op"),
          (col("cents") + 1000L).as("n_cents"), col("seg").as("n_seg"))
      val inserts = routed.filter(col("h") === 3)
        .select((col("k") + 1000000L).as("k"), lit("I").as("op"),
          lit(500000L).as("n_cents"), col("seg").as("n_seg"))
      val changes = deletes.union(updates).union(inserts)
      val merged = base.join(changes, Seq("k"), "full_outer")
        .filter(col("op").isNull || col("op") =!= "D")
        .select(col("k"),
          when(col("op").isNotNull, col("n_cents")).otherwise(col("cents"))
            .as("cents"),
          when(col("op").isNotNull, col("n_seg")).otherwise(col("seg"))
            .as("seg"))
      merged.groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          max(col("k")).as("max_k"))
        .orderBy(col("seg"))
    }),

    // J14 NULL-ROUTED OUTER JOIN: when a left-join key is frequently NULL
    // (unattributed carts, anonymous sessions), a plain shuffle join
    // funnels EVERY null row into one reducer — the canonical skew
    // pathology at 100 TB. The catalog spelling routes null-key rows
    // AROUND the shuffle (they can never match — emit them null-extended
    // directly) and joins only the non-null slice. The oracle is the
    // plain LEFT JOIN, proving the routed plan is semantics-preserving.
    "j14_null_skew_join" -> ((s, d) => {
      val o = orders(s, d).select(col("o_orderkey"),
        floor(col("o_totalprice") * 100.0).cast("long").as("cents"),
        when(pmod(TextOps.hash32(
            concat(lit("nk:"), col("o_orderkey").cast("string"))),
          lit(10)) < 3, lit(null).cast("long"))
          .otherwise(col("o_custkey")).as("k"))
      val c = customer(s, d).select(col("c_custkey").as("k"),
        col("c_mktsegment").as("seg"))
      val nn = o.filter(col("k").isNotNull).join(c, Seq("k"), "left")
      val nul = o.filter(col("k").isNull)
        .withColumn("seg", lit(null).cast("string"))
      nn.unionByName(nul)
        .groupBy(col("seg"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"))
        .orderBy(col("seg").asc_nulls_last)
    }),

    // W30 LAST-TOUCH ATTRIBUTION: credit each purchase to the user's most
    // recent preceding non-purchase event — the marketing-analytics
    // classic. One user_id shuffle serves the IGNORE-NULLS window (frame
    // ends at 1 PRECEDING, so a purchase never attributes to itself) and
    // the rollup on the attributed channel is partial-aggregable.
    "w30_last_touch" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("tus"), col("event_type"))
        .withColumn("touch", last(
          when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .groupBy(coalesce(col("touch"), lit("(none)")).as("channel"))
        .agg(count(lit(1)).as("n_purchases"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("channel"))
    }),

    // W31 DATE SPINE ZERO-FILL: weekly event counts per type INCLUDING
    // empty weeks — reporting needs the gap rows a plain groupBy never
    // emits. Weeks are epoch integer division (day = µs div 86.4e9, week
    // = day div 7 — no engine calendar functions, so the two engines
    // cannot disagree on week boundaries). The spine is generated from a
    // broadcast 1-row bounds frame and stays tiny at ANY corpus size
    // (weeks × event types); the corpus-scale work is one
    // partial-aggregable count.
    "w31_date_spine" -> ((s, d) => {
      val e = events(s, d).select(
        expr(s"ts_ns div 1000 div $UsPerDay div 7").as("week"),
        col("event_type"))
      val bounds = e.agg(min(col("week")).as("w0"), max(col("week")).as("w1"))
      val spine = bounds
        .select(explode(sequence(col("w0"), col("w1"))).as("week"))
      val types = e.select(col("event_type")).distinct()
      val weekly = e.groupBy(col("week"), col("event_type"))
        .agg(count(lit(1)).as("cnt"))
      spine.crossJoin(broadcast(types))
        .join(weekly, Seq("week", "event_type"), "left")
        .select(col("week"), col("event_type"),
          coalesce(col("cnt"), lit(0L)).as("n"))
        .orderBy(col("week"), col("event_type"))
    }),

    // X77 CLASS-BASED REGEX TOKENIZATION: the "BPE-ish regex" token
    // counter — letter runs, digit runs, and punctuation runs counted
    // separately per document (the pre-tokenizer split every BPE
    // tokenizer applies before merging). The patterns use only character
    // classes and +, the regex subset Java and RE2 agree on exactly. One
    // scan, all three counts inside whole-stage codegen, no shuffle
    // before the ORDER BY.
    "x77_regex_tokens" -> ((s, d) => {
      def n(pat: String) =
        size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
      documents(s, d)
        .select(col("doc_id"),
          n("[A-Za-z]+").as("n_alpha"),
          n("[0-9]+").as("n_num"),
          n("[^A-Za-z0-9 ]+").as("n_other"))
        .withColumn("n_toks",
          col("n_alpha") + col("n_num") + col("n_other"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "j13_cdc_merge" ->
      """WITH base AS (SELECT c_custkey AS k,
        |    CAST(floor(c_acctbal * 100.0) AS BIGINT) AS cents,
        |    c_mktsegment AS seg FROM customer),
        |r AS (SELECT *, CAST(concat('0x',
        |    substr(md5('cdc:' || CAST(k AS VARCHAR)), 1, 8)) AS BIGINT) % 10
        |    AS h FROM base),
        |ch AS (
        |  SELECT k, 'D' AS op, CAST(NULL AS BIGINT) AS n_cents,
        |    CAST(NULL AS VARCHAR) AS n_seg FROM r WHERE h = 0
        |  UNION ALL
        |  SELECT k, 'U', cents + 1000, seg FROM r WHERE h IN (1, 2)
        |  UNION ALL
        |  SELECT k + 1000000, 'I', 500000, seg FROM r WHERE h = 3),
        |m AS (SELECT coalesce(base.k, ch.k) AS k,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.n_cents
        |      ELSE base.cents END AS cents,
        |    CASE WHEN ch.op IS NOT NULL THEN ch.n_seg
        |      ELSE base.seg END AS seg
        |  FROM base FULL OUTER JOIN ch ON base.k = ch.k
        |  WHERE ch.op IS NULL OR ch.op <> 'D')
        |SELECT seg, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  max(k) AS max_k
        |FROM m GROUP BY seg ORDER BY seg""".stripMargin,

    // the oracle is the PLAIN left join — proving the engine's
    // null-routed union plan preserves semantics exactly
    "j14_null_skew_join" ->
      """WITH o AS (SELECT o_orderkey,
        |    CAST(floor(o_totalprice * 100.0) AS BIGINT) AS cents,
        |    CASE WHEN CAST(concat('0x',
        |        substr(md5('nk:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
        |        AS BIGINT) % 10 < 3
        |      THEN NULL ELSE o_custkey END AS k
        |  FROM orders)
        |SELECT c_mktsegment AS seg, count(*) AS n,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM o LEFT JOIN customer ON o.k = c_custkey
        |GROUP BY seg ORDER BY seg NULLS LAST""".stripMargin,

    "w30_last_touch" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    event_type FROM events),
        |t AS (SELECT user_id, event_type,
        |    last_value(CASE WHEN event_type <> 'purchase'
        |        THEN event_type END IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY tus, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
        |  FROM e)
        |SELECT coalesce(touch, '(none)') AS channel,
        |  count(*) AS n_purchases, count(DISTINCT user_id) AS n_users
        |FROM t WHERE event_type = 'purchase'
        |GROUP BY channel ORDER BY channel""".stripMargin,

    "w31_date_spine" ->
      """WITH e AS (SELECT epoch_us(ts) // 86400000000 // 7 AS week,
        |    event_type FROM events),
        |b AS (SELECT min(week) AS w0, max(week) AS w1 FROM e),
        |spine AS (SELECT unnest(range(w0, w1 + 1)) AS week FROM b),
        |ty AS (SELECT DISTINCT event_type FROM e),
        |wk AS (SELECT week, event_type, count(*) AS cnt
        |  FROM e GROUP BY week, event_type)
        |SELECT spine.week, ty.event_type,
        |  CAST(coalesce(wk.cnt, 0) AS BIGINT) AS n
        |FROM spine CROSS JOIN ty
        |LEFT JOIN wk ON wk.week = spine.week AND wk.event_type = ty.event_type
        |ORDER BY spine.week, ty.event_type""".stripMargin,

    "x77_regex_tokens" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT)
        |    AS n_alpha,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_num,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT)
        |    AS n_other,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
        |    + len(regexp_extract_all(text, '[0-9]+'))
        |    + len(regexp_extract_all(text, '[^A-Za-z0-9 ]+')) AS BIGINT)
        |    AS n_toks
        |FROM documents ORDER BY doc_id""".stripMargin)
}
