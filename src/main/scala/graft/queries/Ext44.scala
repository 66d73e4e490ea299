package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-6 additions, part 4: inter-rater agreement — Cohen's kappa
  * between two independent document-quality raters, the chance-corrected
  * agreement statistic a curation team reads before trusting a cheap
  * classifier as a filter. Completes the eval family next to AUC (x121),
  * Brier (x128), pair-counting Rand (x106) and pass@k (x119).
  */
object Ext44 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X9f COHEN'S KAPPA: rater A = rule-based quality gate (≥ 40 tokens
    // AND ≥ 30% distinct tokens — the x21/x53 family's spirit); rater
    // B = hashed-lexicon score ≥ 500‰ (the x117 feature-hashing family).
    // kappa = (pₒ − pₑ)/(1 − pₑ) in EXACT integer arithmetic:
    // numerator n·(n11+n00) − (nA1·nB1 + nA0·nB0), denominator
    // n² − (nA1·nB1 + nA0·nB0); the ppm value is a sign-split two-step
    // floor (Spark div truncates toward zero while DuckDB // floors, so
    // negatives route through |·| and a sign factor — x127's rule).
    // One corpus scan, one partial-aggregable rollup to a single row —
    // per-row expression work and a 5-long aggregate at any scale.
    "x144_cohens_kappa" -> ((s, d) => {
      val wArr = array((0 until 64).map(i =>
        lit((i * 2654435761L) % 1000 - 500)): _*)
      val rated = documents(s, d)
        .select(TextOps.words(col("text")).as("w"))
        .select(size(col("w")).cast("long").as("n_tokens"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct"),
          aggregate(
            transform(col("w"), t =>
              element_at(wArr,
                (pmod(TextOps.hash32(t), lit(64L)) + 1L).cast("int"))),
            lit(0L), (acc, x) => acc + x).as("sum_w"))
        .select(
          (col("n_tokens") >= 40 && col("n_distinct") * 10 >= col("n_tokens") * 3)
            .as("a"),
          (expr("(sum_w + 500L * n_tokens) * 1000L div n_tokens div 1000L")
            >= 500L).as("b"))
      val agg = rated.agg(
        count(lit(1)).as("n"),
        sum(when(col("a") && col("b"), 1L).otherwise(0L)).as("n11"),
        sum(when(!col("a") && !col("b"), 1L).otherwise(0L)).as("n00"),
        sum(when(col("a"), 1L).otherwise(0L)).as("n_a1"),
        sum(when(col("b"), 1L).otherwise(0L)).as("n_b1"))
      agg.select(col("n"), col("n11"), col("n00"), col("n_a1"), col("n_b1"))
        .withColumn("chance",
          col("n_a1") * col("n_b1") +
            (col("n") - col("n_a1")) * (col("n") - col("n_b1")))
        .withColumn("num", col("n") * (col("n11") + col("n00")) - col("chance"))
        .withColumn("den", col("n") * col("n") - col("chance"))
        .select(col("n"), col("n11"), col("n00"), col("n_a1"), col("n_b1"),
          expr("(n11 + n00) * 1000000L div n").as("po_ppm"),
          expr("chance * 1000000L div (n * n)").as("pe_ppm"),
          expr("""CASE WHEN den = 0 THEN 0L ELSE
                    (CASE WHEN num < 0 THEN -1L ELSE 1L END) *
                    ((abs(num) div den) * 1000000L
                      + (abs(num) % den) * 1000000L div den) END""")
            .as("kappa_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x144_cohens_kappa" -> {
      val ws = (0 until 64).map(i => (i * 2654435761L) % 1000 - 500)
        .mkString("[", ", ", "]")
      s"""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |r0 AS (SELECT CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(w, t -> ($ws)[CAST(
        |      CAST(concat('0x', substr(md5(t),1,8)) AS BIGINT) % 64 + 1
        |      AS INT)])), (acc, x) -> acc + x) AS BIGINT) AS sum_w
        |  FROM w),
        |r AS (SELECT
        |  (n_tokens >= 40 AND n_distinct * 10 >= n_tokens * 3) AS a,
        |  ((sum_w + 500 * n_tokens) * 1000 // n_tokens // 1000) >= 500 AS b
        |  FROM r0),
        |agg AS (SELECT count(*) AS n,
        |  CAST(sum(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n11,
        |  CAST(sum(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n00,
        |  CAST(sum(CASE WHEN a THEN 1 ELSE 0 END) AS BIGINT) AS n_a1,
        |  CAST(sum(CASE WHEN b THEN 1 ELSE 0 END) AS BIGINT) AS n_b1
        |  FROM r),
        |k AS (SELECT n, n11, n00, n_a1, n_b1,
        |  n_a1 * n_b1 + (n - n_a1) * (n - n_b1) AS chance,
        |  n * (n11 + n00) - (n_a1 * n_b1 + (n - n_a1) * (n - n_b1)) AS num,
        |  n * n - (n_a1 * n_b1 + (n - n_a1) * (n - n_b1)) AS den
        |  FROM agg)
        |SELECT n, n11, n00, n_a1, n_b1,
        |  (n11 + n00) * 1000000 // n AS po_ppm,
        |  chance * 1000000 // (n * n) AS pe_ppm,
        |  CASE WHEN den = 0 THEN 0 ELSE
        |    (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |    ((abs(num) // den) * 1000000 + (abs(num) % den) * 1000000 // den)
        |  END AS kappa_ppm
        |FROM k""".stripMargin
    })
}
