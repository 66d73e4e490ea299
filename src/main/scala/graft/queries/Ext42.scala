package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.Multimodal

/** Round-6 additions, part 2: the last two stubbed multimodal paths made
  * REAL with codec-free formats — uncompressed-AVI video frame decode
  * (RIFF walk + DIB raster) and IMA-ADPCM audio decode (pure integer
  * predictor). Pattern of x64/x65: deterministic generative payloads whose
  * decode an oracle replays exactly — closed-form for the pixels, a
  * recursive replay of the predictor for ADPCM.
  */
object Ext42 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X5f VIDEO FRAME SAMPLING + DECODE: every 2nd '00db' DIB frame of an
    // uncompressed AVI reduced to per-channel sums and the top-left
    // pixel's luminance (bottom-up raster order is load-bearing for that
    // column — a top-down decode bug shifts it, channel sums would not).
    // Decode is partition-local CPU work with no shuffle; the only
    // exchange is the final order for the dump. At 100 TB the shape is
    // unchanged: frames fan out before any aggregation, payload bytes
    // never cross the wire twice.
    "x140_video_frames" -> ((s, d) => {
      Multimodal.aviFrameStats(
        Multimodal.synthAviPayloads(documents(s, d).select(col("doc_id"))), 2)
        .toDF()
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // X5g COMPRESSED-AUDIO DECODE (IMA ADPCM): run the integer predictor
    // over the nibble stream and keep the audit columns a curation
    // pipeline needs — sample count, sum, peak amplitude, final decoder
    // state. All-integer end to end, so the oracle replays it exactly
    // (recursive CTE over the same step/index tables).
    "x142_adpcm_decode" -> ((s, d) => {
      Multimodal.adpcmStats(
        Multimodal.synthAdpcmPayloads(documents(s, d).select(col("doc_id"))))
        .toDF()
        .orderBy(col("doc_id"))
    }))

  private val stepTab: String = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767).mkString("[", ",", "]")

  val oracleSql: Map[String, String] = Map(

    // replays the generative pixel formula over the sampled frames
    "x140_video_frames" ->
      """WITH d AS (SELECT doc_id, 6 + doc_id % 5 AS w, 4 + doc_id % 4 AS h,
        |    3 + doc_id % 4 AS nf FROM documents),
        |f AS (SELECT doc_id, w, h, unnest(range(0, nf)) AS fi FROM d),
        |sf AS (SELECT doc_id, w, h, fi FROM f WHERE fi % 2 = 0),
        |xs AS (SELECT doc_id, w, h, fi, unnest(range(0, w)) AS x FROM sf),
        |ys AS (SELECT doc_id, w, h, fi, x, unnest(range(0, h)) AS y FROM xs),
        |p AS (SELECT doc_id, fi,
        |    (x*3 + y*5 + fi*11 + doc_id) % 256 AS r,
        |    (x + y*2 + fi*3 + doc_id*7) % 256 AS g,
        |    (x*11 + y + fi*7 + doc_id*13) % 256 AS b
        |  FROM ys),
        |agg AS (SELECT doc_id, fi, count(*) AS n_pix,
        |    CAST(sum(r) AS BIGINT) AS sum_r, CAST(sum(g) AS BIGINT) AS sum_g,
        |    CAST(sum(b) AS BIGINT) AS sum_b
        |  FROM p GROUP BY doc_id, fi)
        |SELECT doc_id, CAST(fi AS BIGINT) AS frame_idx, n_pix,
        |  sum_r, sum_g, sum_b,
        |  CAST(299*((fi*11 + doc_id) % 256) + 587*((fi*3 + doc_id*7) % 256)
        |    + 114*((fi*7 + doc_id*13) % 256) AS BIGINT) AS tl_lum
        |FROM agg ORDER BY doc_id, frame_idx""".stripMargin,

    // replays the IMA predictor: one recursion step per nibble, step and
    // index tables as list literals, exact integer arithmetic throughout
    "x142_adpcm_decode" ->
      s"""WITH RECURSIVE d AS (SELECT doc_id,
        |    64 + (doc_id % 32) * 2 AS n_nib,
        |    (doc_id % 100) * 10 - 500 AS p0,
        |    doc_id % 16 AS i0
        |  FROM documents),
        |st(doc_id, n_nib, i, pred, idx, s, mx) AS (
        |  SELECT doc_id, n_nib, CAST(0 AS BIGINT), CAST(p0 AS BIGINT),
        |    CAST(i0 AS BIGINT), CAST(p0 AS BIGINT), CAST(abs(p0) AS BIGINT)
        |  FROM d
        |  UNION ALL
        |  SELECT doc_id, n_nib, i + 1, np, ni, s + np, greatest(mx, abs(np))
        |  FROM (
        |    SELECT doc_id, n_nib, i, s, mx,
        |      least(CAST(32767 AS BIGINT), greatest(CAST(-32768 AS BIGINT),
        |        pred + CASE WHEN (nib & 8) <> 0 THEN -diff ELSE diff END)) AS np,
        |      least(CAST(88 AS BIGINT), greatest(CAST(0 AS BIGINT),
        |        idx + CASE WHEN (nib & 7) < 4 THEN -1
        |                   ELSE (nib & 7) * 2 - 6 END)) AS ni
        |    FROM (
        |      SELECT q.*, (step >> 3)
        |        + CASE WHEN (nib & 4) <> 0 THEN step ELSE 0 END
        |        + CASE WHEN (nib & 2) <> 0 THEN step >> 1 ELSE 0 END
        |        + CASE WHEN (nib & 1) <> 0 THEN step >> 2 ELSE 0 END AS diff
        |      FROM (
        |        SELECT doc_id, n_nib, i, pred, idx, s, mx,
        |          (i * 7 + doc_id) % 16 AS nib,
        |          ($stepTab)[CAST(idx + 1 AS INT)] AS step
        |        FROM st WHERE i < n_nib) q) q2) q3)
        |SELECT doc_id, CAST(n_nib + 1 AS BIGINT) AS n_samples, s AS sum_s,
        |  mx AS max_abs, pred AS end_pred, idx AS end_index
        |FROM st WHERE i = n_nib ORDER BY doc_id""".stripMargin)
}
