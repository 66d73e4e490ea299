package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-5 batch 7: bag-semantics set operations (s2 — the ALL variants s1
  * lacked), Markov transition counts (w27), a cross-engine null-semantics
  * pin (f18 — the classic portability trap spelled explicitly on both
  * engines), and an integer distribution-drift detector (x72 — the corpus
  * QA check run when a source changes crawlers).
  */
object Ext15 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S2 SET OPERATIONS, BAG SEMANTICS: intersectAll keeps the MINIMUM
    // multiplicity, exceptAll subtracts multiplicities — semantics the
    // distinct variants (s1) silently lose. Spark plans these as
    // count-annotated joins (no explosion); duplicates come from part
    // keys appearing on many lineitems.
    "s2_setops_all" -> ((s, d) => {
      val low = lineitem(s, d).filter(col("l_quantity") < 25)
        .select(col("l_partkey"))
      val high = lineitem(s, d).filter(col("l_quantity") >= 10)
        .select(col("l_partkey"))
      val ia = low.intersectAll(high).withColumn("op", lit("intersect_all"))
      val ea = low.exceptAll(high).withColumn("op", lit("except_all"))
      ia.union(ea)
        .groupBy(col("op"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("l_partkey")).as("n_keys"),
          sum(col("l_partkey")).as("key_sum"))
        .orderBy(col("op"))
    }),

    // W27 TRANSITION COUNTS (Markov kernel numerator): corpus-wide counts
    // of consecutive event-type pairs per user — the session-flow
    // statistic behind "what do users do after X". One user_id shuffle
    // for the lag, then a partial-aggregable rollup on the pair.
    "w27_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"),
          expr("ts_ns div 1000").as("tus"), col("event_type"))
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("prev"), col("next"))
    }),

    // F18 NULL SEMANTICS: the portability traps, spelled explicitly —
    // null-safe equality (<=> vs IS NOT DISTINCT FROM), nullif/coalesce,
    // count(*) vs count(col), null GROUPING (both engines group nulls
    // together), and null ORDERING (Spark defaults NULLS FIRST ascending,
    // DuckDB NULLS LAST — the catalog rule is: ALWAYS spell it). The
    // nullable key is derived (nullif on a segment), so the frame
    // genuinely exercises every path.
    "f18_nulls" -> ((s, d) => {
      val c = customer(s, d)
        .withColumn("seg_n", nullif(col("c_mktsegment"), lit("BUILDING")))
      c.groupBy(col("seg_n"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("seg_n")).as("n_notnull"),
          sum(when(col("seg_n") <=> lit("MACHINERY"), 1L).otherwise(0L))
            .as("n_nullsafe_machinery"),
          max(coalesce(col("seg_n"), lit("MISSING"))).as("filled"))
        .orderBy(col("seg_n").asc_nulls_last)
    }),

    // X4ab TOKEN DISTRIBUTION DRIFT: which tokens differ most between two
    // sources — the corpus QA check run when a feed changes crawlers or a
    // pipeline stage regresses. The drift score is the PURE-INTEGER
    // cross-multiplied rate difference |c1·N2 − c2·N1| (the numerator of
    // the two-proportion z-test — no division, no float, no log), so it
    // is bit-stable and partial-aggregable end to end. Top-20, ties to
    // the token.
    "x72_token_drift" -> ((s, d) => {
      val toks = documents(s, d)
        .filter(col("source").isin("src0", "src1"))
        .select(col("source"), explode(TextOps.words(col("text"))).as("tok"))
      val counts = toks.groupBy(col("tok"))
        .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
          sum(when(col("source") === "src1", 1L).otherwise(0L)).as("c2"))
      val totals = counts.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
      counts.crossJoin(broadcast(totals))
        .select(col("tok"), col("c1"), col("c2"),
          abs(col("c1") * col("n2") - col("c2") * col("n1")).as("drift"))
        .orderBy(col("drift").desc, col("tok"))
        .limit(20)
    }))

  val oracleSql: Map[String, String] = Map(

    "s2_setops_all" ->
      """WITH low AS (SELECT l_partkey FROM lineitem WHERE l_quantity < 25),
        |high AS (SELECT l_partkey FROM lineitem WHERE l_quantity >= 10),
        |ia AS (SELECT l_partkey, 'intersect_all' AS op FROM
        |  (SELECT l_partkey FROM low INTERSECT ALL SELECT l_partkey FROM high)),
        |ea AS (SELECT l_partkey, 'except_all' AS op FROM
        |  (SELECT l_partkey FROM low EXCEPT ALL SELECT l_partkey FROM high)),
        |u AS (SELECT * FROM ia UNION ALL SELECT * FROM ea)
        |SELECT op, count(*) AS n_rows,
        |  count(DISTINCT l_partkey) AS n_keys,
        |  CAST(sum(l_partkey) AS BIGINT) AS key_sum
        |FROM u GROUP BY op ORDER BY op""".stripMargin,

    "w27_transitions" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    event_type FROM events),
        |l AS (SELECT event_type AS next,
        |    lag(event_type) OVER (PARTITION BY user_id
        |      ORDER BY tus, event_id) AS prev
        |  FROM e)
        |SELECT prev, next, count(*) AS n
        |FROM l WHERE prev IS NOT NULL
        |GROUP BY prev, next ORDER BY prev, next""".stripMargin,

    "f18_nulls" ->
      """WITH c AS (SELECT nullif(c_mktsegment, 'BUILDING') AS seg_n
        |  FROM customer)
        |SELECT seg_n, count(*) AS n_rows, count(seg_n) AS n_notnull,
        |  CAST(sum(CASE WHEN seg_n IS NOT DISTINCT FROM 'MACHINERY'
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_nullsafe_machinery,
        |  max(coalesce(seg_n, 'MISSING')) AS filled
        |FROM c GROUP BY seg_n ORDER BY seg_n NULLS LAST""".stripMargin,

    "x72_token_drift" ->
      """WITH t AS (SELECT source, unnest(string_split(text, ' ')) AS tok
        |  FROM documents WHERE source IN ('src0', 'src1')),
        |c AS (SELECT tok,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM t GROUP BY tok),
        |g AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
        |    CAST(sum(c2) AS BIGINT) AS n2 FROM c)
        |SELECT tok, c1, c2, abs(c1 * n2 - c2 * n1) AS drift
        |FROM c, g ORDER BY drift DESC, tok LIMIT 20""".stripMargin)
}
