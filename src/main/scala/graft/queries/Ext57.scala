package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.tables.Tables._

/** Round-10 batch 7: two more exact-integer eval statistics — the
  * paired-classifier significance test and the standardized effect
  * size, the pair every model-comparison writeup reports next to the
  * AUC/kappa family (x121/x144/x149):
  *
  *   - x179 McNemar's test (1947): are classifiers A and B DIFFERENT on
  *     the same documents? Only the discordant pairs carry signal:
  *     χ² = (b − c)²/(b + c) over b = A-only-correct, c =
  *     B-only-correct — one ppm floor, plus the continuity-corrected
  *     (|b − c| − 1)²/(b + c) variant. A is the x117/x121/x128 shared
  *     hashed scorer; B is the SAME scorer body under a different
  *     weight-mix multiplier, computed in the SAME per-row pass (no
  *     join pairs the predictions — pairing is positional by
  *     construction).
  *   - x180 Cohen's d (pooled, 1988): the standardized token-count
  *     difference between en and non-en docs. Everything reduces to
  *     the six conditional sums (n, Σv, Σv² per side):
  *     d² = (S_a·n_b − S_b·n_a)²·(N−2) / (n_a·n_b·P) with
  *     P = n_b(n_a·Q_a − S_a²) + n_a(n_b·Q_b − S_b²) — ONE floored
  *     quotient into 1e12 space, then an EXACT integer sqrt (driver
  *     BigInt Newton on the engine, the x160 float-seeded
  *     Newton-with-correction CTE chain in HUGEINT on the oracle),
  *     sign restored from the mean-difference numerator.
  *
  * Scale shapes: x179 is one corpus scan (two per-row folds) + a 1-row
  * global agg; x180 is one scan of conditional partial-aggregable sums
  * + an O(1) driver closure. Magnitudes (documented): x180's
  * 1e12·Δ²·(N−2) ≤ ~7.5e33 at sf0.1 — HUGEINT/BigInt territory,
  * never BIGINT.
  */
object Ext57 {

  /** Classifier B's weight-mix multiplier (xxHash prime — any odd
    * constant that differs from [[Ext33.ScorerMult]] works; pinned so
    * the oracle renders the same table). */
  val McnemarMultB = 2246822519L

  /** Classifier C's multiplier (x185's third arm; xxHash prime 2). */
  val CochranMultC = 3266489917L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x179_mcnemar" -> ((s, d) => {
      val sc = documents(s, d)
        .select(col("lang"), TextOps.words(col("text")).as("w"))
        .select((col("lang") === "en").as("pos"),
          size(col("w")).cast("long").as("n_tokens"),
          Ext33.sumWCol(Ext33.ScorerMult).as("sum_a"),
          Ext33.sumWCol(McnemarMultB).as("sum_b"))
        .select(col("pos"),
          (expr("(sum_a + 500L * n_tokens) * 1000L div n_tokens div 1000L")
            >= 500L).as("pa"),
          (expr("(sum_b + 500L * n_tokens) * 1000L div n_tokens div 1000L")
            >= 500L).as("pb"))
      sc.agg(count(lit(1)).as("n"),
          sum(when(col("pa") === col("pos"), 1L).otherwise(0L)).as("ok_a"),
          sum(when(col("pb") === col("pos"), 1L).otherwise(0L)).as("ok_b"),
          sum(when(col("pa") === col("pos") && col("pb") =!= col("pos"), 1L)
            .otherwise(0L)).as("n_a_only"),
          sum(when(col("pb") === col("pos") && col("pa") =!= col("pos"), 1L)
            .otherwise(0L)).as("n_b_only"))
        .select(col("n"),
          expr("ok_a * 1000L div greatest(n, 1L)").as("acc_a_pm"),
          expr("ok_b * 1000L div greatest(n, 1L)").as("acc_b_pm"),
          col("n_a_only"), col("n_b_only"),
          expr("""1000000L * (n_a_only - n_b_only) * (n_a_only - n_b_only)
                 | div greatest(n_a_only + n_b_only, 1L)""".stripMargin)
            .as("chi2_ppm"),
          expr("""1000000L * greatest(abs(n_a_only - n_b_only) - 1L, 0L)
                 | * greatest(abs(n_a_only - n_b_only) - 1L, 0L)
                 | div greatest(n_a_only + n_b_only, 1L)""".stripMargin)
            .as("chi2_cc_ppm"))
    }),

    "x180_cohens_d" -> ((s, d) => {
      val r = documents(s, d)
        .select((col("lang") === "en").as("isa"),
          expr("size(split(text, ' '))").cast("long").as("v"))
        .agg(
          sum(when(col("isa"), 1L).otherwise(0L)).as("na"),
          sum(when(col("isa"), 0L).otherwise(1L)).as("nb"),
          sum(when(col("isa"), col("v")).otherwise(0L)).as("sa"),
          sum(when(col("isa"), 0L).otherwise(col("v"))).as("sb"),
          sum(when(col("isa"), expr("v * v")).otherwise(0L)).as("qa"),
          sum(when(col("isa"), 0L).otherwise(expr("v * v"))).as("qb"))
        .head()
      val na = BigInt(r.getLong(0)); val nb = BigInt(r.getLong(1))
      val sa = BigInt(r.getLong(2)); val sb = BigInt(r.getLong(3))
      val qa = BigInt(r.getLong(4)); val qb = BigInt(r.getLong(5))
      val dn = sa * nb - sb * na
      val p = nb * (na * qa - sa * sa) + na * (nb * qb - sb * sb)
      val x = BigInt("1000000000000") * dn * dn * (na + nb - 2) /
        ((na * nb * p).max(1))
      val dAbs = Ext49.isqrt(x)
      val dPpm = if (dn < 0) -dAbs else dAbs
      import s.implicits._
      Seq((na.toLong, nb.toLong, dn.toLong, dPpm.toLong))
        .toDF("n_a", "n_b", "mean_diff_num", "d_ppm")
    }),

    // X185 COCHRAN'S Q (1950): x179's k-classifier generalization — do
    // THREE classifiers (the shared scorer under three weight mixes,
    // all computed in ONE per-row pass) have equal accuracy on the same
    // documents? Q = (k−1)·(k·ΣG_j² − (ΣG_j)²) / (k·ΣL_i − ΣL_i²) over
    // the per-classifier correct counts G_j and per-doc correct counts
    // L_i — exact integers end to end, one ppm floor (reduces to
    // McNemar exactly at k = 2). One corpus scan + a 1-row agg.
    "x185_cochran_q" -> ((s, d) => {
      val k = 3L
      val sc = documents(s, d)
        .select(col("lang"), TextOps.words(col("text")).as("w"))
        .select((col("lang") === "en").as("pos"),
          size(col("w")).cast("long").as("n_tokens"),
          Ext33.sumWCol(Ext33.ScorerMult).as("sum_0"),
          Ext33.sumWCol(McnemarMultB).as("sum_1"),
          Ext33.sumWCol(CochranMultC).as("sum_2"))
      val ok = (0 to 2).map(j => when(
        (expr(s"(sum_$j + 500L * n_tokens) * 1000L div n_tokens div 1000L")
          >= 500L) === col("pos"), 1L).otherwise(0L).as(s"ok_$j"))
      sc.select(ok: _*)
        .withColumn("l", expr("ok_0 + ok_1 + ok_2"))
        .agg(count(lit(1)).as("n"),
          sum(col("ok_0")).as("g_a"), sum(col("ok_1")).as("g_b"),
          sum(col("ok_2")).as("g_c"),
          sum(col("l")).as("sum_l"), sum(expr("l * l")).as("sum_l2"))
        .select(col("n"), col("g_a"), col("g_b"), col("g_c"),
          col("sum_l"), col("sum_l2"),
          expr(s"""1000000L * (${k - 1}L * (${k}L
                  |  * (g_a*g_a + g_b*g_b + g_c*g_c)
                  |  - (g_a + g_b + g_c) * (g_a + g_b + g_c)))
                  | div greatest(${k}L * sum_l - sum_l2, 1L)"""
            .stripMargin).as("q_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x179_mcnemar" ->
      s"""WITH w AS (SELECT lang, string_split(text, ' ') AS w
         |  FROM documents),
         |s AS (SELECT (lang = 'en') AS pos,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  ${Ext33.duckSumW(Ext33.ScorerMult)} AS sum_a,
         |  ${Ext33.duckSumW(McnemarMultB)} AS sum_b
         |  FROM w),
         |sb2 AS (SELECT pos,
         |    ((sum_a + 500 * n_tokens) * 1000 // n_tokens) // 1000 >= 500
         |      AS pa,
         |    ((sum_b + 500 * n_tokens) * 1000 // n_tokens) // 1000 >= 500
         |      AS pb
         |  FROM s),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN pa = pos THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ok_a,
         |    CAST(sum(CASE WHEN pb = pos THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ok_b,
         |    CAST(sum(CASE WHEN pa = pos AND pb <> pos THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_a_only,
         |    CAST(sum(CASE WHEN pb = pos AND pa <> pos THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_b_only
         |  FROM sb2)
         |SELECT n,
         |  ok_a * 1000 // greatest(n, 1) AS acc_a_pm,
         |  ok_b * 1000 // greatest(n, 1) AS acc_b_pm,
         |  n_a_only, n_b_only,
         |  1000000 * (n_a_only - n_b_only) * (n_a_only - n_b_only)
         |    // greatest(n_a_only + n_b_only, 1) AS chi2_ppm,
         |  1000000 * greatest(abs(n_a_only - n_b_only) - 1, 0)
         |    * greatest(abs(n_a_only - n_b_only) - 1, 0)
         |    // greatest(n_a_only + n_b_only, 1) AS chi2_cc_ppm
         |FROM ag""".stripMargin,

    "x180_cohens_d" ->
      s"""WITH v AS (SELECT (lang = 'en') AS isa,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS v
        |  FROM documents),
        |ag AS (SELECT
        |    CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS HUGEINT) AS na,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE 1 END) AS HUGEINT) AS nb,
        |    CAST(sum(CASE WHEN isa THEN v ELSE 0 END) AS HUGEINT) AS sa,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE v END) AS HUGEINT) AS sb,
        |    CAST(sum(CASE WHEN isa THEN v * v ELSE 0 END) AS HUGEINT)
        |      AS qa,
        |    CAST(sum(CASE WHEN isa THEN 0 ELSE v * v END) AS HUGEINT)
        |      AS qb
        |  FROM v),
        |dd AS (SELECT *, sa * nb - sb * na AS dn,
        |    nb * (na * qa - sa * sa) + na * (nb * qb - sb * sb) AS p
        |  FROM ag),
        |xx AS (SELECT *,
        |    (1000000000000 * dn * dn * (na + nb - 2))
        |      // greatest(na * nb * p, 1) AS x FROM dd),
        |${Ext49.newtonIsqrtCtes("xx", "x")}
        |SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
        |  CAST(dn AS BIGINT) AS mean_diff_num,
        |  CAST(CASE WHEN dn < 0 THEN -r ELSE r END AS BIGINT) AS d_ppm
        |FROM rt3_""".stripMargin,

    "x185_cochran_q" -> {
      val oks = (0 to 2).map(j =>
        s"""(CASE WHEN (((sum_$j + 500 * n_tokens) * 1000 // n_tokens)
           |  // 1000 >= 500) = pos THEN 1 ELSE 0 END)""".stripMargin)
      s"""WITH w AS (SELECT lang, string_split(text, ' ') AS w
         |  FROM documents),
         |s AS (SELECT (lang = 'en') AS pos,
         |  CAST(len(w) AS BIGINT) AS n_tokens,
         |  ${Ext33.duckSumW(Ext33.ScorerMult)} AS sum_0,
         |  ${Ext33.duckSumW(McnemarMultB)} AS sum_1,
         |  ${Ext33.duckSumW(CochranMultC)} AS sum_2
         |  FROM w),
         |o AS (SELECT ${oks.zipWithIndex.map { case (e, j) =>
              s"$e AS ok_$j" }.mkString(",\n|    ")},
         |    ${oks.mkString(" + ")} AS l
         |  FROM s),
         |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(ok_0) AS BIGINT) AS g_a,
         |    CAST(sum(ok_1) AS BIGINT) AS g_b,
         |    CAST(sum(ok_2) AS BIGINT) AS g_c,
         |    CAST(sum(l) AS BIGINT) AS sum_l,
         |    CAST(sum(l * l) AS BIGINT) AS sum_l2
         |  FROM o)
         |SELECT n, g_a, g_b, g_c, sum_l, sum_l2,
         |  CAST(1000000 * (2 * (3 * (g_a*g_a + g_b*g_b + g_c*g_c)
         |    - (g_a + g_b + g_c) * (g_a + g_b + g_c)))
         |    // greatest(3 * sum_l - sum_l2, 1) AS BIGINT) AS q_ppm
         |FROM ag""".stripMargin
    })
}
