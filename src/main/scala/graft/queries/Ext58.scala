package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Round-10 batch 8: x181 Hopkins statistic (Hopkins & Skellam 1954;
  * Lawson & Jurs 1990 form) — the CLUSTERING-TENDENCY test run before
  * any clustering pipeline (x37/x98 k-means, x124/x177 quality): does
  * the embedding cloud differ from spatial randomness at all? H
  * compares nearest-neighbor distances from m real probe points (w_j)
  * against those from m synthetic uniform points (u_j):
  * H = Σu / (Σu + Σw) → ~0.5 for uniform data, → 1 for clustered.
  *
  * Exactness: SQUARED integer L2 distances on the shared quantization
  * (documented variant — classic H uses d^dim-power weighting or raw
  * distances; squared keeps every value an integer and both engines
  * bit-equal; the ½-for-uniform calibration shifts but the
  * uniform-vs-clustered ordering is preserved), one ppm floor. Probes
  * are the m = [[HopkinsM]] md5-least vec_ids (the x19 hash-sample
  * discipline, self-excluded from their own NN search); synthetic
  * points derive per (j, d) from the SAME md5-integer convention as
  * every other hash in the catalog (hash32(j ++ '_' ++ d) mod 2001) —
  * derivational in BOTH engines, no baked tables.
  *
  * Scale shape: ONE corpus scan — the 2m probe+synth rows broadcast
  * into a cross join, per-row native graft_idist2 (codegen), then a
  * 2m-group partial-aggregable min and a 1-row rollup. At 100 TB the
  * scan cost is 2m distance kernels per vector; m is the documented
  * constant lever.
  */
object Ext58 {

  /** Probe/synthetic sample size (surfaced in the output as m). */
  val HopkinsM = 32

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x181_hopkins" -> ((s, d) => {
      val qv = Ext43.quantized(s, d)
      val probes = qv
        .orderBy(md5(col("vec_id").cast("string").cast("binary")),
          col("vec_id"))
        .limit(HopkinsM)
        .select(col("vec_id").as("pid"), col("q").as("pq"),
          lit(false).as("is_synth"))
      val synth = s.range(HopkinsM.toLong)
        .select((-col("id") - 1L).as("pid"),
          transform(sequence(lit(0), lit(63)), dd =>
            pmod(TextOps.hash32(
              concat(col("id").cast("string"), lit("_"),
                dd.cast("string"))), lit(2001L))).as("pq"),
          lit(true).as("is_synth"))
      val pts = probes.unionByName(synth)
      val mins = qv.crossJoin(broadcast(pts))
        .filter(col("is_synth") || col("vec_id") =!= col("pid"))
        .select(col("pid"), col("is_synth"),
          graft.ext.Similarity.idist2(col("pq"), col("q")).as("d2"))
        .groupBy(col("pid"), col("is_synth"))
        .agg(min(col("d2")).as("nn"))
      mins.agg(
          sum(when(!col("is_synth"), col("nn")).otherwise(0L)).as("sw"),
          sum(when(col("is_synth"), col("nn")).otherwise(0L)).as("su"))
        .select(lit(HopkinsM.toLong).as("m"),
          col("sw").as("sum_w_d2"), col("su").as("sum_u_d2"),
          expr("1000000L * su div greatest(su + sw, 1L)")
            .as("hopkins_ppm"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x181_hopkins" ->
      s"""WITH qv AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), x ->
         |      CAST(floor((x + 1.0) * 1000.0) AS BIGINT)) AS q
         |  FROM embeddings),
         |pr AS (SELECT vec_id AS pid, q AS pq FROM qv
         |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
         |  LIMIT $HopkinsM),
         |sy AS (SELECT j, list_transform(range(1, 65), d ->
         |    CAST(CAST(concat('0x', substr(md5(CAST(j AS VARCHAR) || '_'
         |      || CAST(d - 1 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001
         |      AS BIGINT)) AS sq
         |  FROM (SELECT unnest(range(0, $HopkinsM)) AS j)),
         |wmin AS (SELECT pid, min(${Ext43.idist2Sql("pq", "q")})
         |    AS w
         |  FROM pr, qv WHERE qv.vec_id <> pr.pid GROUP BY pid),
         |umin AS (SELECT j, min(${Ext43.idist2Sql("sq", "q")}) AS u
         |  FROM sy, qv GROUP BY j),
         |ag AS (SELECT (SELECT CAST(sum(w) AS BIGINT) FROM wmin) AS sw,
         |    (SELECT CAST(sum(u) AS BIGINT) FROM umin) AS su)
         |SELECT ${HopkinsM}::BIGINT AS m, sw AS sum_w_d2,
         |  su AS sum_u_d2,
         |  CAST(1000000 * su // greatest(su + sw, 1) AS BIGINT)
         |    AS hopkins_ppm
         |FROM ag""".stripMargin)
}
