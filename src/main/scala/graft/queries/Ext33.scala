package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Round-5 additions, part 11: distribution-drift and classifier-quality
  * statistics in exact integer arithmetic — the two-sample KS test and
  * ROC AUC (Mann–Whitney with tie handling), each reduced to a cumulative
  * pass over a BOUNDED bucket frame so no corpus-scale window appears.
  */
object Ext33 {

  /** x117's feature-hashed linear scorer, shared by the AUC (x121) and
    * calibration (x128) evaluators: per doc, (pos = lang='en',
    * sb = shifted per-mille score in [0, 1000]). Pure per-row fold —
    * no shuffle; callers add their own rollup. The weight fold is
    * factored per multiplier so x179's SECOND classifier is the same
    * scorer under a different hash mix, computed in the SAME pass (one
    * body, never a copy; no join to pair the two predictions). */
  private[queries] val ScorerMult = 2654435761L

  /** The 64-entry weight table for a multiplier (Spark and DuckDB
    * spellings both render from this one sequence). */
  private[queries] def scorerWeights(mult: Long): Seq[Long] =
    (0 until 64).map(i => (i * mult) % 1000 - 500)

  /** Σ weights over the token array column `w` (Spark side). */
  private[queries] def sumWCol(mult: Long): org.apache.spark.sql.Column = {
    val wArr = array(scorerWeights(mult).map(lit(_)): _*)
    aggregate(
      transform(col("w"), t =>
        element_at(wArr,
          (pmod(TextOps.hash32(t), lit(64L)) + 1L).cast("int"))),
      lit(0L), (acc, x) => acc + x)
  }

  /** The DuckDB spelling of [[sumWCol]] (expression over column `w`).
    * Round 12: the 64-entry weight literal is LET-BOUND once per row
    * (the 1-element list_transform trick) — DuckDB re-materializes an
    * indexed list literal inside a per-token lambda once per ELEMENT,
    * which made this fold the wall of every scorer-family oracle
    * (x144's row shape: 2.37 s → 0.19 s at sf0.1, rows identical). */
  private[queries] def duckSumW(mult: Long): String = {
    val ws = scorerWeights(mult).mkString("[", ", ", "]")
    s"""(list_transform([$ws], wsx ->
      |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
      |    list_transform(w, t -> wsx[
      |      CAST((CAST(concat('0x', substr(md5(t), 1, 8)) AS BIGINT) % 64)
      |        + 1 AS INT)])), (a, b) -> a + b) AS BIGINT)))[1]""".stripMargin
  }

  private[queries] def hashedScorePm(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("lang"), TextOps.words(col("text")).as("w"))
      .select((col("lang") === "en").as("pos"),
        size(col("w")).cast("long").as("n_tokens"),
        sumWCol(ScorerMult).as("sum_w"))
      .select(col("pos"),
        expr("(sum_w + 500L * n_tokens) * 1000L div n_tokens div 1000L")
          .as("sb"))

  /** The DuckDB spelling of [[hashedScorePm]]: a CTE chain ending in
    * `sb(pos, sb)`. */
  private[queries] val hashedScorePmSql: String =
    s"""w AS (SELECT lang, string_split(text, ' ') AS w FROM documents),
      |s AS (SELECT (lang = 'en') AS pos,
      |  CAST(len(w) AS BIGINT) AS n_tokens,
      |  ${duckSumW(ScorerMult)} AS sum_w
      |  FROM w),
      |sb AS (SELECT pos,
      |    ((sum_w + 500 * n_tokens) * 1000 // n_tokens) // 1000 AS sb
      |  FROM s)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X8b TWO-SAMPLE KOLMOGOROV–SMIRNOV DRIFT TEST: the largest CDF gap
    // between the click and error value distributions, in exact ppm —
    // the distribution-drift gate a feature pipeline runs between
    // snapshots (the numeric twin of x72's token drift). Values bucket
    // to integer units first, so after the ONE partial-aggregable
    // shuffle the frame is ≤ #buckets rows and the cumulative window
    // runs on that bounded frame, never on the corpus. The gap compares
    // cross-multiplied counts (|c1·n2 − c2·n1|·1e6 div n1·n2) — no
    // division until the final ppm, no floats anywhere.
    "x120_ks_drift" -> ((s, d) => {
      val f = events(s, d)
        .filter(col("event_type").isin("click", "error"))
        .select(floor(col("value")).cast("long").as("vm"),
          (col("event_type") === "click").as("is_a"))
      val per = f.groupBy(col("vm"))
        .agg(sum(when(col("is_a"), 1L).otherwise(0L)).as("a"),
          sum(when(col("is_a"), 0L).otherwise(1L)).as("b"))
      // bounded frame: one row per integer value bucket (≤ ~500 here,
      // fixed by the value range, independent of corpus size)
      val w = Window.orderBy(col("vm"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = per
        .withColumn("ca", sum(col("a")).over(w))
        .withColumn("cb", sum(col("b")).over(w))
        .persistTracked()
      val tot = cum.agg(max(col("ca")).as("na"), max(col("cb")).as("nb"))
      cum.crossJoin(broadcast(tot))
        .select(col("vm"),
          (abs(col("ca") * col("nb") - col("cb") * col("na")) * 1000000L)
            .as("num"),
          col("na"), col("nb"))
        // greatest-guard: a corpus with only one of the two event types
        // would make na·nb = 0 — ANSI div would throw; the guard is inert
        // whenever both classes exist
        .withColumn("gap_ppm", expr("num div greatest(na * nb, 1L)"))
        .withColumn("rnk", row_number().over(
          Window.orderBy(col("gap_ppm").desc, col("vm"))))
        .filter(col("rnk") === 1)
        .select(col("vm").as("vm_at_max"), col("na").as("n_click"),
          col("nb").as("n_error"), col("gap_ppm").as("ks_ppm"))
    }),

    // X8c CLASSIFIER ROC AUC: Mann–Whitney AUC of x117's feature-hashed
    // score against the is-English label, ties credited half — the
    // acceptance metric for any quality classifier before it gates a
    // corpus. The score buckets to its shifted per-mille (≤ 1001
    // distinct), so the rank accumulation is a cumulative pass over a
    // bounded frame; the doubled U statistic (2·wins + ties) keeps the
    // half-credit in integers, and auc_ppm = U2·1e6 div (2·n_pos·n_neg)
    // is the one floor. Corpus-side cost: the x117 per-row fold plus one
    // partial-aggregable shuffle on the bucket.
    "x121_classifier_auc" -> ((s, d) => {
      val scored = hashedScorePm(s, d)
      val per = scored.groupBy(col("sb"))
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
      val w = Window.orderBy(col("sb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = per.withColumn("cneg", coalesce(sum(col("nn")).over(w), lit(0L)))
      val u = cum.agg(
        sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (col("cneg") * 2 + col("nn"))).as("u2"))
      u.select(col("n_pos"), col("n_neg"), col("u2"),
        expr("u2 * 1000000L div greatest(2L * n_pos * n_neg, 1L)").as("auc_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x120_ks_drift" ->
      """WITH f AS (SELECT CAST(floor(value) AS BIGINT) AS vm,
        |    (event_type = 'click') AS is_a
        |  FROM events WHERE event_type IN ('click', 'error')),
        |per AS (SELECT vm,
        |    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS a,
        |    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS b
        |  FROM f GROUP BY 1),
        |cum AS (SELECT vm,
        |    sum(a) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS ca,
        |    sum(b) OVER (ORDER BY vm ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND CURRENT ROW) AS cb
        |  FROM per),
        |tot AS (SELECT max(ca) AS na, max(cb) AS nb FROM cum),
        |g AS (SELECT vm, na, nb,
        |    CAST(abs(ca * nb - cb * na) * 1000000 // greatest(na * nb, 1) AS BIGINT)
        |      AS gap_ppm
        |  FROM cum, tot),
        |r AS (SELECT vm, na, nb, gap_ppm, row_number() OVER (
        |    ORDER BY gap_ppm DESC, vm) AS rnk FROM g)
        |SELECT vm AS vm_at_max, CAST(na AS BIGINT) AS n_click,
        |  CAST(nb AS BIGINT) AS n_error, gap_ppm AS ks_ppm
        |FROM r WHERE rnk = 1""".stripMargin,

    "x121_classifier_auc" -> {
      s"""WITH $hashedScorePmSql,
        |per AS (SELECT sb,
        |    CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
        |    CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
        |  FROM sb GROUP BY 1),
        |cum AS (SELECT sb, np, nn,
        |    CAST(coalesce(sum(nn) OVER (ORDER BY sb ROWS BETWEEN
        |      UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cneg
        |  FROM per)
        |SELECT CAST(sum(np) AS BIGINT) AS n_pos,
        |  CAST(sum(nn) AS BIGINT) AS n_neg,
        |  CAST(sum(np * (cneg * 2 + nn)) AS BIGINT) AS u2,
        |  CAST(sum(np * (cneg * 2 + nn)) * 1000000
        |    // greatest(2 * sum(np) * sum(nn), 1) AS BIGINT) AS auc_ppm
        |FROM cum""".stripMargin
    })
}
