package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

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
    }),

    // X2j REPETITION-LENGTH PROFILE: x84's span-digest dedup swept over
    // window lengths {8,16,32,64} (stride L/2 each) — per length, how many
    // distinct windows repeat, how often, and the hottest count. The
    // largest L with repeats bounds the corpus's longest repeated run —
    // the answer a suffix-automaton would give, in the fixed-window form a
    // distributed engine can shuffle (digests only, 16 B/window; each
    // length is one partial-aggregable groupBy off the shared cached
    // token frame). Every length reports a row (zeros when clean).
    "x111_repeat_profile" -> ((s, d) => {
      val lens = Seq(8, 16, 32, 64)
      val w = documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), col("w"), size(col("w")).as("n"))
        .persistTracked()
      val spans = lens.map { l =>
        w.filter(col("n") >= l)
          .select(col("doc_id"), col("w"),
            explode(sequence(lit(1), col("n") - (l - 1), lit(l / 2))).as("i"))
          .select(lit(l).as("len"), col("doc_id"),
            md5(array_join(slice(col("w"), col("i"), lit(l)), " ")).as("h"))
      }.reduce(_.union(_))
      val dup = spans.groupBy(col("len"), col("h"))
        .agg(count(lit(1)).as("n_occ"))
        .filter(col("n_occ") > 1)
        .groupBy(col("len"))
        .agg(count(lit(1)).as("n_dup_windows"),
          sum(col("n_occ")).as("n_dup_occ"),
          max(col("n_occ")).as("max_occ"))
      import s.implicits._
      lens.toDF("len").join(dup, Seq("len"), "left")
        .select(col("len"),
          coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"),
          coalesce(col("n_dup_occ"), lit(0L)).as("n_dup_occ"),
          coalesce(col("max_occ"), lit(0L)).as("max_occ"))
        .orderBy(col("len"))
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
        |FROM c GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x111_repeat_profile" -> {
      val blocks = Seq(8, 16, 32, 64).map { l =>
        s"""SELECT $l AS len, doc_id,
          |    md5(array_to_string(w[i:i+${l - 1}], ' ')) AS h
          |  FROM (SELECT doc_id, w, unnest(range(1, n - ${l - 1} + 1, ${l / 2})) AS i
          |    FROM ww WHERE n >= $l)""".stripMargin
      }.mkString("\n|  UNION ALL\n|")
      s"""WITH ww AS (SELECT doc_id, string_split(text, ' ') AS w,
        |  len(string_split(text, ' ')) AS n FROM documents),
        |sp AS (
        |$blocks),
        |g AS (SELECT len, h, count(*) AS n_occ FROM sp GROUP BY 1, 2),
        |d AS (SELECT len, CAST(count(*) AS BIGINT) AS n_dup_windows,
        |    CAST(sum(n_occ) AS BIGINT) AS n_dup_occ,
        |    CAST(max(n_occ) AS BIGINT) AS max_occ
        |  FROM g WHERE n_occ > 1 GROUP BY 1)
        |SELECT l.len, coalesce(n_dup_windows, 0) AS n_dup_windows,
        |  coalesce(n_dup_occ, 0) AS n_dup_occ,
        |  coalesce(max_occ, 0) AS max_occ
        |FROM (VALUES (8), (16), (32), (64)) l(len) LEFT JOIN d USING (len)
        |ORDER BY l.len""".stripMargin
    })
}
