package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.Quantile
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Round-5 additions, part 1: corpus spelling-variant mining via the
  * SymSpell delete-neighborhood join (the OCR/typo detection pass a
  * training-data pipeline runs before token statistics), and a per-key
  * skew audit (the diagnosis step that decides whether a join/agg key
  * needs salting and at what factor).
  */
object Ext24 {

  /** SymSpell delete neighborhood of `w` (itself + every 1- and
    * 2-deletion), as a SQL expression string over column name `c`. */
  private def deleteKeys(c: String): String = {
    def d1(of: String) =
      s"""transform(sequence(1, length($of)), i ->
         |  concat(substring($of, 1, i-1), substring($of, i+1, length($of)-i)))"""
        .stripMargin
    s"""array_distinct(concat(
       |  array($c),
       |  ${d1(c)},
       |  flatten(transform(${d1(c)}, v ->
       |    transform(sequence(1, length(v)), j ->
       |      concat(substring(v, 1, j-1), substring(v, j+1, length(v)-j)))))))"""
      .stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X5a SPELLING-VARIANT MINING (SymSpell, Garbe's symmetric-delete
    // algorithm): find vocabulary pairs within Levenshtein distance 2 and
    // report each as (canonical = the more frequent form, variant) — the
    // OCR-error / typo mining pass of corpus cleaning. Candidate
    // generation is an EQUI-join on the delete-neighborhood inverted
    // index (each word emits its ≤2-deletion variants as keys; two words
    // within distance ≤2 always share a key), so cost tracks key
    // collisions — never the |V|² of a naive edit-distance cross join —
    // and the exact levenshtein() verify makes the output provably
    // identical to the brute-force definition. Keys per word are O(L²)
    // (≈ 1 + L + L(L−1)/2); at web scale the few hottest ultra-short
    // keys would get a df cap (x47's convention) at a measured recall
    // cost — here the index is exact.
    "x95_spelling_variants" -> ((s, d) => {
      val vocab = documents(s, d)
        .select(explode(split(col("text"), " ")).as("w"))
        .filter(length(col("w")) >= 3)
        .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      val keyed = vocab
        .select(col("w"), col("freq"), explode(expr(deleteKeys("w"))).as("k"))
        .persistTracked()
      val cand = keyed.as("a").join(keyed.as("b"),
          col("a.k") === col("b.k") && col("a.w") < col("b.w"))
        .select(col("a.w").as("w1"), col("a.freq").as("f1"),
          col("b.w").as("w2"), col("b.freq").as("f2"))
        .distinct()
      // w1 < w2 throughout, so a frequency tie resolves to the
      // lexicographically smaller form as canonical
      cand.withColumn("dist", levenshtein(col("w1"), col("w2")))
        .filter(col("dist") <= 2)
        .select(
          when(col("f1") >= col("f2"), col("w1")).otherwise(col("w2"))
            .as("canonical"),
          when(col("f1") >= col("f2"), col("w2")).otherwise(col("w1"))
            .as("variant"),
          col("dist"),
          when(col("f1") >= col("f2"), col("f1")).otherwise(col("f2"))
            .as("freq_canonical"),
          when(col("f1") >= col("f2"), col("f2")).otherwise(col("f1"))
            .as("freq_variant"))
        .orderBy(col("canonical"), col("variant"))
    }),

    // X5b KEY-SKEW AUDIT: the diagnosis that decides whether a key needs
    // salting before a join/agg, and at what factor — per-key counts,
    // nearest-rank p50/p99/max of the count distribution (ext/Quantile:
    // range sort + O(P) exchange, never a single-partition window),
    // top-10 key share, and the recommended salt factor so the hottest
    // key spreads to ≈ one average partition's share of rows at P=32.
    // All integer arithmetic (shares in ppm, ratios ×100) — exact on any
    // engine. NOTE: like x24/x17, this constructor EXECUTES the
    // selection jobs (scalar results are inherently actions) and returns
    // a local 1-row frame.
    // Round 15: counts persist dropped (the exchange-topped-rollup rule;
    // BENCH_AB_r15_rollups2.json) — the three scalar jobs and the
    // quantile selection all share the per-key groupBy's exchange.
    "x96_skew_audit" -> ((s, d) => skewAudit(s, d, persistCounts = false)))

  /** x96 body with the round-15 counts-persist knob. */
  private[graft] def skewAudit(s: SparkSession, d: String,
      persistCounts: Boolean): DataFrame = {
      import s.implicits._
      val counts0 = events(s, d)
        .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val counts = if (persistCounts) counts0.persistTracked() else counts0
      val (nKeys, qs) =
        Quantile.nearestRank(counts, col("cnt"), Seq(0.5, 0.99, 1.0))
      val (p50, p99, mx) = (qs(0).toLong, qs(1).toLong, qs(2).toLong)
      val nRows = counts.agg(sum(col("cnt"))).head().getLong(0)
      val top10 = counts.orderBy(col("cnt").desc, col("user_id"))
        .limit(10).agg(sum(col("cnt"))).head().getLong(0)
      Seq((nRows, nKeys, mx, p50, p99, top10,
          top10 * 1000000L / nRows,         // top10_share_ppm
          mx * 100L / p50,                  // skew_x100 (max vs median)
          math.max(1L, (mx * 32L + nRows - 1L) / nRows))) // salt_factor
        .toDF("n_rows", "n_keys", "max_cnt", "p50_cnt", "p99_cnt",
          "top10_cnt", "top10_share_ppm", "skew_x100", "salt_factor")
  }

  val oracleSql: Map[String, String] = Map(

    "x95_spelling_variants" ->
      """WITH v AS (SELECT w, count(*) AS freq
        |  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents) t
        |  WHERE len(w) >= 3 GROUP BY w),
        |k AS (SELECT w, freq, unnest(list_distinct(flatten([
        |    [w],
        |    list_transform(range(1, len(w)+1), i ->
        |      substr(w, 1, i-1) || substr(w, i+1, len(w)-i)),
        |    flatten(list_transform(
        |      list_transform(range(1, len(w)+1), i ->
        |        substr(w, 1, i-1) || substr(w, i+1, len(w)-i)),
        |      v2 -> list_transform(range(1, len(v2)+1), j ->
        |        substr(v2, 1, j-1) || substr(v2, j+1, len(v2)-j))))
        |  ]))) AS k FROM v),
        |c AS (SELECT a.w AS w1, a.freq AS f1, b.w AS w2, b.freq AS f2
        |  FROM k a JOIN k b ON a.k = b.k AND a.w < b.w
        |  GROUP BY 1, 2, 3, 4),
        |p AS (SELECT w1, f1, w2, f2, levenshtein(w1, w2) AS dist
        |  FROM c WHERE levenshtein(w1, w2) <= 2)
        |SELECT CASE WHEN f1 >= f2 THEN w1 ELSE w2 END AS canonical,
        |  CASE WHEN f1 >= f2 THEN w2 ELSE w1 END AS variant,
        |  dist,
        |  CASE WHEN f1 >= f2 THEN f1 ELSE f2 END AS freq_canonical,
        |  CASE WHEN f1 >= f2 THEN f2 ELSE f1 END AS freq_variant
        |FROM p ORDER BY canonical, variant""".stripMargin,

    "x96_skew_audit" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1),
        |r AS (SELECT cnt, user_id,
        |    row_number() OVER (ORDER BY cnt) AS rn,
        |    count(*) OVER () AS nk FROM c),
        |q AS (SELECT max(nk) AS n_keys,
        |    max(CASE WHEN rn = CAST(ceil(nk * 0.5) AS BIGINT) THEN cnt END) AS p50,
        |    max(CASE WHEN rn = CAST(ceil(nk * 0.99) AS BIGINT) THEN cnt END) AS p99,
        |    max(cnt) AS mx, sum(cnt) AS n_rows FROM r),
        |t AS (SELECT sum(cnt) AS top10
        |  FROM (SELECT cnt FROM c ORDER BY cnt DESC, user_id LIMIT 10))
        |SELECT CAST(n_rows AS BIGINT) AS n_rows, n_keys,
        |  mx AS max_cnt, p50 AS p50_cnt, p99 AS p99_cnt,
        |  CAST(top10 AS BIGINT) AS top10_cnt,
        |  CAST(top10 * 1000000 // n_rows AS BIGINT) AS top10_share_ppm,
        |  CAST(mx * 100 // p50 AS BIGINT) AS skew_x100,
        |  CAST(greatest(1, (mx * 32 + n_rows - 1) // n_rows) AS BIGINT)
        |    AS salt_factor
        |FROM q, t""".stripMargin)
}
