package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Round-5 additions, part 8: the real-resize stage of the multimodal
  * family — x40 proved encode+decode, x64 near-dup'd the pixels, x110
  * closes the decode → transform → feature contract with an actual
  * nearest-neighbor scaler whose output the oracle predicts in closed
  * form. */
object Ext30 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X5d REAL IMAGE RESIZE: executors encode the deterministic gradient
    // corpus (PNG even ids / BMP odd — x40's payloads), then DECODE and
    // nearest-neighbor downsample every image to 4×4 and reduce the
    // resized raster to channel sums plus a position-weighted checksum
    // (sums alone are permutation-blind; the checksum pins each output
    // pixel's value AND place, so a wrong sampling offset hash-mismatches).
    // Both stages are partition-local mapPartitions — no shuffle, linear
    // executor scaling, the canonical thumbnail pass of a crawl ingest.
    "x110_image_resize" -> ((s, d) => {
      graft.ext.Multimodal.imageResizeStats(
        graft.ext.Multimodal.synthImagePayloads(
          documents(s, d).select(col("doc_id"))), 4, 4)
        .toDF()
        .select(col("doc_id"), col("width"), col("height"),
          col("sum_r"), col("sum_g"), col("sum_b"), col("chk"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    // closed-form replay: source dims from the id, nearest-neighbor source
    // coordinate sx=⌊x·w/4⌋, sy=⌊y·h/4⌋, channels from the generative
    // linear forms — no decoding, only the generator's arithmetic
    "x110_image_resize" ->
      """WITH d AS (SELECT doc_id, 8 + doc_id % 5 AS w, 8 + doc_id % 7 AS h
        |  FROM documents),
        |xs AS (SELECT doc_id, w, h, unnest(range(0, 4)) AS x FROM d),
        |ys AS (SELECT doc_id, w, h, x, unnest(range(0, 4)) AS y FROM xs),
        |p AS (SELECT doc_id, x, y,
        |  (x * w // 4) AS sx, (y * h // 4) AS sy FROM ys),
        |c AS (SELECT doc_id, x, y,
        |  (sx * 3 + sy * 5 + doc_id) % 256 AS r,
        |  (sx + sy * 2 + doc_id * 7) % 256 AS g,
        |  (sx * 11 + sy + doc_id * 13) % 256 AS b FROM p)
        |SELECT doc_id, CAST(4 AS INT) AS width, CAST(4 AS INT) AS height,
        |  CAST(sum(r) AS BIGINT) AS sum_r,
        |  CAST(sum(g) AS BIGINT) AS sum_g,
        |  CAST(sum(b) AS BIGINT) AS sum_b,
        |  CAST(sum((r * 65536 + g * 256 + b) * (y * 4 + x + 1)) AS BIGINT)
        |    AS chk
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin)
}
