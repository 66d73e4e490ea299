package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.ext.Multimodal

/** Round-5 batch 3: multimodal operators promoted from spec-only plumbing
  * to catalog entries — perceptual-hash image near-dup (x64) and windowed
  * audio feature extraction (x65). Both run REAL codec work in the
  * executors (JDK PNG/BMP decode; PCM WAV chunk-walk) over deterministic
  * synthetic payloads whose content the DuckDB oracle predicts in closed
  * form from the generative formulas — so an encode OR decode defect
  * hash-mismatches, exactly like x40.
  */
object Ext11 {

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    queries1 ++ queries2

  private lazy val queries1: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X5d PERCEPTUAL-HASH IMAGE NEAR-DUP: the image twin of the text
    // near-dup family — aHash (8×8 block-mean bits over decoded luminance,
    // exact integer arithmetic end to end) then BANDED candidate
    // generation (4×16-bit bands, equi-join — never all-pairs, the same
    // LSH discipline as x3/x22) and a Hamming≤6 verify via bit_count.
    // The corpus carries each image TWICE (PNG for even ids, BMP for odd,
    // same pixels — the "one picture re-encoded by different sites" case),
    // so every (2k, 2k+1) pair must surface at Hamming 0; the spec pins
    // that recall. Decode is partition-local; the only shuffles are the
    // band join and the rollup.
    "x64_image_ahash" -> ((s, d) => imageAhash(s, d, persist = true)))

  /** The full x64 body; `persist` caches the decoded-hash frame, which
    * three consumers read (band explode + both verify joins) — without
    * it the REAL PNG/BMP encode+decode pipeline runs three times per
    * query (round-10 finding; adopted on a same-boot win, see
    * BENCH_AB_r10_x64persist.json). `persist = false` is the AbVariants
    * cost control. */
  private[graft] def imageAhash(s: SparkSession, d: String,
      persist: Boolean): DataFrame = {
      import graft.GraftCaches.TrackedPersist
      val hashes0 = Multimodal.imageAHashes(
        Multimodal.synthImagePayloadsSeeded(
          documents(s, d).select(col("doc_id")))).toDF()
      val hashes = if (persist) hashes0.persistTracked() else hashes0
      val bands = hashes.select(col("doc_id"), explode(array(
        struct(lit(0).as("band"), col("ahash_lo").bitwiseAND(lit(65535L)).as("bv")),
        struct(lit(1).as("band"), shiftright(col("ahash_lo"), 16).as("bv")),
        struct(lit(2).as("band"), col("ahash_hi").bitwiseAND(lit(65535L)).as("bv")),
        struct(lit(3).as("band"), shiftright(col("ahash_hi"), 16).as("bv"))))
        .as("b"))
        .select(col("doc_id"), col("b.band").as("band"), col("b.bv").as("bv"))
      val cand = bands.as("a").join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
            col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      cand
        .join(hashes.select(col("doc_id").as("id1"),
          col("ahash_hi").as("h1"), col("ahash_lo").as("l1")), "id1")
        .join(hashes.select(col("doc_id").as("id2"),
          col("ahash_hi").as("h2"), col("ahash_lo").as("l2")), "id2")
        .select(col("id1"), col("id2"),
          (expr("bit_count(h1 ^ h2)") + expr("bit_count(l1 ^ l2)"))
            .cast("long").as("hamming"))
        .filter(col("hamming") <= 6)
        .orderBy(col("id1"), col("id2"))
  }

  private lazy val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X5e WINDOWED AUDIO FEATURES: RMS energy, peak amplitude and
    // zero-crossing count per 1024-sample window of a PCM WAV payload —
    // the audio-quality gate run before training-data selection. The
    // decode is a REAL chunk walk (fmt/data located by scanning, 16-bit
    // LE samples); the synthetic square wave keeps even the double-typed
    // RMS in closed form (±A windows square-sum to n·A², and IEEE sqrt of
    // a perfect square is exact). Partition-local fan-out to windows, one
    // final sort — no shuffle before it at any corpus size.
    "x65_audio_features" -> ((s, d) => {
      Multimodal.audioFeatures(
        Multimodal.synthWavPayloads(
          documents(s, d).select(col("doc_id"))), 1024).toDF()
        .select(col("doc_id"), col("window_idx").cast("long").as("window_idx"),
          col("n_samples").cast("long").as("n_samples"), col("rms"),
          col("peak").cast("long").as("peak"),
          col("zero_crossings").cast("long").as("zero_crossings"))
        .orderBy(col("doc_id"), col("window_idx"))
    }))

  val oracleSql: Map[String, String] = Map(

    // replays the generative pixel formula (seed = doc_id // 2) through the
    // exact integer aHash pipeline, then the same banded join + bit_count
    "x64_image_ahash" ->
      """WITH d AS (SELECT doc_id, doc_id // 2 AS s FROM documents),
        |dim AS (SELECT doc_id, s, 8 + s % 5 AS w, 8 + s % 7 AS h FROM d),
        |xs AS (SELECT doc_id, s, w, h, unnest(range(0, w)) AS x FROM dim),
        |ys AS (SELECT doc_id, s, w, h, x, unnest(range(0, h)) AS y FROM xs),
        |p AS (SELECT doc_id,
        |    299 * ((x * 3 + y * 5 + (x * y + 1) * s) % 256)
        |      + 587 * ((x + y * 2 + (x + y + 2) * s * 7) % 256)
        |      + 114 * ((x * 11 + y + (x * 2 + y + 3) * s * 13) % 256) AS lum,
        |    (y * 8) // h * 8 + (x * 8) // w AS bi
        |  FROM ys),
        |blk AS (SELECT doc_id, bi, sum(lum) // count(*) AS bval
        |  FROM p GROUP BY doc_id, bi),
        |m AS (SELECT doc_id, sum(bval) // 64 AS mean FROM blk GROUP BY doc_id),
        |bits AS (SELECT blk.doc_id, bi,
        |    CASE WHEN bval > mean THEN 1 ELSE 0 END AS bit
        |  FROM blk JOIN m ON blk.doc_id = m.doc_id),
        |hs AS (SELECT doc_id,
        |    CAST(sum(CASE WHEN bit = 1 AND bi >= 32
        |      THEN (CAST(1 AS BIGINT) << (bi - 32)) ELSE 0 END) AS BIGINT) AS hi,
        |    CAST(sum(CASE WHEN bit = 1 AND bi < 32
        |      THEN (CAST(1 AS BIGINT) << bi) ELSE 0 END) AS BIGINT) AS lo
        |  FROM bits GROUP BY doc_id),
        |bands AS (SELECT doc_id, hi, lo, unnest([
        |    concat_ws('_', 0, lo & 65535), concat_ws('_', 1, lo >> 16),
        |    concat_ws('_', 2, hi & 65535), concat_ws('_', 3, hi >> 16)]) AS bk
        |  FROM hs),
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bands a JOIN bands b ON a.bk = b.bk AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ver AS (SELECT id1, id2,
        |    CAST(bit_count(xor(x.hi, y.hi)) + bit_count(xor(x.lo, y.lo))
        |      AS BIGINT) AS hamming
        |  FROM cand JOIN hs x ON x.doc_id = id1 JOIN hs y ON y.doc_id = id2)
        |SELECT id1, id2, hamming FROM ver WHERE hamming <= 6
        |ORDER BY id1, id2""".stripMargin,

    // square wave: every window is ±A throughout, so rms = A exactly; zero
    // crossings are the half-period multiples interior to the window
    "x65_audio_features" ->
      """WITH d AS (SELECT doc_id,
        |    1000 + (doc_id % 50) * 100 AS amp,
        |    8 + doc_id % 8 AS half,
        |    2048 + (doc_id % 4) * 512 AS n
        |  FROM documents),
        |w AS (SELECT doc_id, amp, half, n,
        |    unnest(range(0, (n + 1023) // 1024)) AS wi FROM d),
        |f AS (SELECT doc_id, CAST(wi AS BIGINT) AS window_idx,
        |    CAST(least(1024, n - wi * 1024) AS BIGINT) AS n_samples,
        |    CAST(amp AS DOUBLE) AS rms,
        |    CAST(amp AS BIGINT) AS peak,
        |    CAST((wi * 1024 + least(1024, n - wi * 1024) - 1) // half
        |      - (wi * 1024) // half AS BIGINT) AS zero_crossings
        |  FROM w)
        |SELECT doc_id, window_idx, n_samples, rms, peak, zero_crossings
        |FROM f ORDER BY doc_id, window_idx""".stripMargin)
}
