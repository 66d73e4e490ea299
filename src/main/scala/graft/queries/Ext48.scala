package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps
import graft.ingest.GlobalSeq

/** Round-8 batch 2: two more exact-integer eval statistics —
  *
  *   - x157 split-conformal coverage (Vovk et al.; the distribution-free
  *     calibration check an LLM-judge / quality-classifier pipeline
  *     runs before trusting its thresholds): calibrate the
  *     ceil((n+1)·0.9)-th smallest nonconformity score on one half of
  *     the corpus, measure empirical coverage of the induced bound on
  *     the held-out half. Exchangeability gives E[coverage] ∈
  *     [0.9, 0.9 + 1/(n_cal+1)] — the spec pins the planted arithmetic
  *     and the corpus run should sit near 900000 ppm.
  *   - x158 Spearman rank correlation between two document quality
  *     signals (char length vs distinct-token ratio) — ranks are the
  *     DETERMINISTIC total orders (row_number over (signal, doc_id);
  *     the tie convention is documented, matching the oracle exactly,
  *     rather than textbook average ranks).
  *
  * Scale shapes:
  *   - x157 is one scan → per-split counts + a VALUE-BOUNDED histogram
  *     (nonconformity is a ppm integer in [0, 1e6], so the cumulative
  *     window runs over ≤ 1e6 distinct values — bounded by the value
  *     domain, never by corpus rows; the x126-winsorize shape).
  *   - x158 ranks both signals with GlobalSeq (range sort + O(P) offset
  *     exchange — windowless, the x125 machinery) and joins the two
  *     narrow (doc_id, rank) frames; the statistic is one partial-
  *     aggregable Σd². BIGINT headroom: 6·Σd²·1e6 must fit, so the
  *     ppm is a documented TWO-STEP floor ((6Σd² div n)·1e6 div (n²−1),
  *     the x147 precedent) — exact-match across engines, ≤ 1 ppm from
  *     the one-step value; past ~2M rows shift the fixed point (the
  *     x151 rule) — at this corpus's 5k docs headroom is ~400×.
  */
object Ext48 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X157 SPLIT-CONFORMAL COVERAGE: nonconformity α = token density
    // (whitespace tokens per char, ppm). Calibration = even doc_id,
    // test = odd. q = k-th smallest calibration α with
    // k = ceil(0.9·(n_cal+1)) — spelled in EXACT integers as
    // (9·(n_cal+1) + 9) div 10 (never ceil(0.9·x) in floating point:
    // 0.9 is not binary-exact and rounds k up at exact multiples).
    // Coverage = fraction of test docs with α ≤ q.
    "x157_conformal_coverage" -> ((s, d) => {
      val scored = documents(s, d)
        .select(col("doc_id"),
          expr("""size(split(text, ' ')) * 1000000L
                 | div greatest(length(text), 1L)""".stripMargin).as("alpha"))
      val cal = scored.filter(col("doc_id") % 2 === 0)
      val tst = scored.filter(col("doc_id") % 2 === 1)
      // value-bounded histogram of calibration α + cumulative count;
      // the window orders ≤ 1e6 distinct ppm values, not corpus rows
      val hist = cal.groupBy(col("alpha")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("alpha"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val nCal = cal.agg(count(lit(1)).as("n_cal"))
      // q = min α with cum ≥ k; k > n_cal (tiny corpora) ⇒ no such α ⇒
      // the conformal bound is +∞ — spelled as Long.MaxValue
      val q = hist.crossJoin(nCal)
        .filter(col("cum") >= expr("(9L * (n_cal + 1L) + 9L) div 10L"))
        .agg(coalesce(min(col("alpha")), lit(Long.MaxValue)).as("q_alpha"))
      tst.crossJoin(broadcast(q)).crossJoin(nCal)
        .agg(
          first(col("n_cal")).as("n_cal"),
          expr("(9L * (first(n_cal) + 1L) + 9L) div 10L").as("k"),
          first(col("q_alpha")).as("q_alpha_ppm"),
          count(lit(1)).as("n_test"),
          sum(when(col("alpha") <= col("q_alpha"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("n_cal"), col("k"), col("q_alpha_ppm"), col("n_test"),
          col("n_covered"),
          expr("n_covered * 1000000L div greatest(n_test, 1L)")
            .as("coverage_ppm"))
    }),

    // X158 SPEARMAN RHO between s1 = char length and s2 = distinct-token
    // ratio (ppm). Ranks are 1-based row_numbers over (signal, doc_id)
    // — the deterministic-total-order convention, NOT average ranks
    // (documented; oracle identical). rho = 1 − 6Σd²/(n(n²−1)) in ppm
    // via the two-step floor (headroom note in the object doc).
    "x158_spearman" -> ((s, d) => {
      import s.implicits._
      val scored = documents(s, d)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("s1"),
          expr("""size(array_distinct(split(text, ' '))) * 1000000L
                 | div greatest(size(split(text, ' ')), 1L)""".stripMargin)
            .as("s2"))
      val r1 = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s1")),
          Seq(col("s1"), col("doc_id")), "z1")
        .select(col("doc_id"), (col("z1") + 1L).as("r1"))
      val r2 = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s2")),
          Seq(col("s2"), col("doc_id")), "z2")
        .select(col("doc_id"), (col("z2") + 1L).as("r2"))
      r1.join(r2, Seq("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("(r1 - r2) * (r1 - r2)")).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          expr("""1000000L - ((6L * sum_d2 div greatest(n, 1L)) * 1000000L
                 | div greatest(n * n - 1L, 1L))""".stripMargin)
            .as("rho_ppm"))
    }),
  )

  val oracleSql: Map[String, String] = Map(
    "x157_conformal_coverage" ->
      """WITH sc AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) * 1000000
        |      // greatest(length(text), 1) AS alpha
        |  FROM documents),
        |cal AS (SELECT alpha FROM sc WHERE doc_id % 2 = 0),
        |tst AS (SELECT alpha FROM sc WHERE doc_id % 2 = 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |hist AS (SELECT alpha, count(*) AS c,
        |    sum(count(*)) OVER (ORDER BY alpha
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cal GROUP BY alpha),
        |q AS (SELECT coalesce(min(alpha), 9223372036854775807) AS q_alpha
        |  FROM hist, nc
        |  WHERE cum >= (9 * (n_cal + 1) + 9) // 10)
        |SELECT nc.n_cal,
        |  CAST((9 * (n_cal + 1) + 9) // 10 AS BIGINT) AS k,
        |  CAST(q_alpha AS BIGINT) AS q_alpha_ppm,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN tst.alpha <= q_alpha THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST(sum(CASE WHEN tst.alpha <= q_alpha THEN 1 ELSE 0 END)
        |    * 1000000 // greatest(count(*), 1) AS BIGINT) AS coverage_ppm
        |FROM tst, q, nc GROUP BY nc.n_cal, q_alpha""".stripMargin,

    "x158_spearman" ->
      """WITH sc AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS s1,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      * 1000000
        |      // greatest(len(string_split(text, ' ')), 1) AS s2
        |  FROM documents),
        |rk AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY s1, doc_id) AS BIGINT) AS r1,
        |    CAST(row_number() OVER (ORDER BY s2, doc_id) AS BIGINT) AS r2
        |  FROM sc),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        |  FROM rk)
        |SELECT n, sum_d2,
        |  CAST(1000000 - ((6 * sum_d2 // greatest(n, 1)) * 1000000
        |    // greatest(n * n - 1, 1)) AS BIGINT) AS rho_ppm
        |FROM ag""".stripMargin,
  )
}
