package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.{Multimodal, TextOps}
import graft.GraftCaches.TrackedPersist

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
    // floor (both Spark div and DuckDB // truncate toward zero —
    // verified round 11 — so routing negatives through |·| and a sign
    // factor is the family's defensive parity convention).
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
          // greatest(·, 1) is a DEFENSIVE divisor guard, not a fix for a
          // reachable throw: split('', ' ') returns [''] on both engines
          // (the round-7 ANSI-audit note), so n_tokens ≥ 1 for any
          // non-NULL text — only a NULL text column or a future
          // tokenizer change could make the divisor non-positive.
          // Hash-neutral either way (Ext44Spec pins n_tokens = 1 for
          // the empty document).
          (expr("(sum_w + 500L * n_tokens) * 1000L" +
              " div greatest(n_tokens, 1L) div 1000L")
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
    }),

    // X5h VIDEO NEAR-DUP (frame-sampled signatures): decode every 2nd
    // DIB frame of the seeded AVI corpus, aHash each frame (x64's exact
    // integer pipeline in image coordinates), and match videos whose
    // sampled-frame hash sequences agree on ≥ 2/3 of frames — the
    // re-encoded/watermarked-copy detector, and a demonstration that
    // frame-sampled dedup is invariant to changes confined to unsampled
    // frames (the seeded corpus tweaks exactly frame 1). Scale shape:
    // decode + hash are partition-local; the pair join bands on
    // (frame_idx, hash) so cost tracks colliding frames, never video
    // pairs; rollups are partial-aggregable.
    "x145_video_neardup" -> ((s, d) => {
      val hashes = Multimodal.aviFrameAHashes(
        Multimodal.synthAviPayloadsSeeded(
          documents(s, d).select(col("doc_id"))), 2).toDF()
        .persistTracked()
      val ns = hashes.groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_sampled"))
      val matches = hashes.as("a").join(hashes.as("b"),
          col("a.frame_idx") === col("b.frame_idx") &&
            col("a.ahash_hi") === col("b.ahash_hi") &&
            col("a.ahash_lo") === col("b.ahash_lo") &&
            col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .agg(count(lit(1)).as("n_match"))
      matches
        .join(ns.select(col("doc_id").as("id1"), col("n_sampled").as("nf1")), "id1")
        .join(ns.select(col("doc_id").as("id2"), col("n_sampled").as("nf2")), "id2")
        .filter(col("n_match") * 3 >= greatest(col("nf1"), col("nf2")) * 2)
        .select(col("id1"), col("id2"), col("n_match"),
          col("nf1").as("n_frames"))
        .orderBy(col("id1"), col("id2"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x144_cohens_kappa" -> {
      s"""WITH w AS (SELECT string_split(text, ' ') AS w FROM documents),
        |r0 AS (SELECT CAST(len(w) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |  ${Ext33.duckSumW(Ext33.ScorerMult)} AS sum_w
        |  FROM w),
        |r AS (SELECT
        |  (n_tokens >= 40 AND n_distinct * 10 >= n_tokens * 3) AS a,
        |  ((sum_w + 500 * n_tokens) * 1000 // greatest(n_tokens, 1) // 1000) >= 500 AS b
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
    },

    // replays the seeded generative pixel formula through the exact
    // integer aHash pipeline per sampled frame, then the banded match.
    // The odd-id tweak touches only frame 1 — never sampled — so the
    // oracle ignores it (that invariance IS the property under test).
    "x145_video_neardup" ->
      """WITH d AS (SELECT doc_id, doc_id // 2 AS s FROM documents),
        |dim AS (SELECT doc_id, s, 8 + s % 5 AS w, 8 + s % 7 AS h,
        |  3 + s % 3 AS nf FROM d),
        |f AS (SELECT doc_id, s, w, h, unnest(range(0, nf)) AS fi FROM dim),
        |sf AS (SELECT doc_id, s, w, h, fi FROM f WHERE fi % 2 = 0),
        |xs AS (SELECT doc_id, s, w, h, fi, unnest(range(0, w)) AS x FROM sf),
        |ys AS (SELECT doc_id, s, w, h, fi, x, unnest(range(0, h)) AS y FROM xs),
        |p AS (SELECT doc_id, fi,
        |    299 * ((x * 3 + y * 5 + (x * y + 1) * s + fi * 11) % 256)
        |      + 587 * ((x + y * 2 + (x + y + 2) * s * 7 + fi * 3) % 256)
        |      + 114 * ((x * 11 + y + (x * 2 + y + 3) * s * 13 + fi * 7) % 256) AS lum,
        |    (y * 8) // h * 8 + (x * 8) // w AS bi
        |  FROM ys),
        |blk AS (SELECT doc_id, fi, bi, sum(lum) // count(*) AS bval
        |  FROM p GROUP BY doc_id, fi, bi),
        |m AS (SELECT doc_id, fi, sum(bval) // 64 AS mean
        |  FROM blk GROUP BY doc_id, fi),
        |bits AS (SELECT blk.doc_id, blk.fi, bi,
        |    CASE WHEN bval > mean THEN 1 ELSE 0 END AS bit
        |  FROM blk JOIN m ON blk.doc_id = m.doc_id AND blk.fi = m.fi),
        |hs AS (SELECT doc_id, fi,
        |    CAST(sum(CASE WHEN bit = 1 AND bi >= 32
        |      THEN (CAST(1 AS BIGINT) << (bi - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN bit = 1 AND bi < 32
        |      THEN (CAST(1 AS BIGINT) << bi) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id, fi),
        |ns AS (SELECT doc_id, count(*) AS n_sampled FROM hs GROUP BY doc_id),
        |mt AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
        |    count(*) AS n_match
        |  FROM hs a JOIN hs b ON a.fi = b.fi AND a.hi = b.hi
        |    AND a.lo = b.lo AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT id1, id2, n_match, n1.n_sampled AS n_frames
        |FROM mt JOIN ns n1 ON n1.doc_id = id1 JOIN ns n2 ON n2.doc_id = id2
        |WHERE n_match * 3 >= greatest(n1.n_sampled, n2.n_sampled) * 2
        |ORDER BY id1, id2""".stripMargin)
}
