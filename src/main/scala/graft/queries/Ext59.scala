package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 batch 9: x182 Adjusted Rand Index + Fowlkes–Mallows — the
  * two standard CHANCE-AWARE partition-agreement scores between the
  * IVF Voronoi cells and the label clustering, completing the external
  * cluster-evaluation family next to x106 (purity + plain Rand: both
  * inflate as cluster count grows; ARI corrects by the hypergeometric
  * expectation, FM by the geometric mean of the marginal pair counts).
  *
  * Pure pair-counting combinatorics on the shared (cell, label)
  * contingency ([[Ext28.cellLabelContingency]] — one helper, never a
  * copy). With T = C(n,2), TP = Σ_ij C(n_ij,2), RowP = Σ C(a_i,2),
  * ColP = Σ C(b_j,2):
  *
  *   ARI = 2·(T·TP − RowP·ColP) / (T·(RowP + ColP) − 2·RowP·ColP)
  *   FM  = TP / sqrt(RowP·ColP)
  *
  * — ARI exact rational in ONE signed ppm floor (sign handled
  * explicitly: BigInt / truncates toward zero while DuckDB // floors,
  * so negatives take the x160 −((−num)·1e6 div den) spelling); FM via
  * one 1e12-space floor + the exact integer sqrt pair (driver BigInt
  * Newton / the shared [[Ext49.newtonIsqrtCtes]] HUGEINT chain).
  *
  * Scale shape: the contingency groupBy is the only corpus-scale work
  * (K·|labels| groups); the closure is O(K·|labels|) driver BigInt.
  * Magnitudes: T·TP ≤ ~4e12 at sf0.1, ×1e6 borderline BIGINT —
  * BigInt/HUGEINT throughout (documented).
  */
object Ext59 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x182_adjusted_rand" -> ((s, d) => {
      val ct = Ext28.cellLabelContingency(s, d).collect()
      def c2(x: BigInt): BigInt = x * (x - 1) / 2
      val n = ct.map(r => BigInt(r.getLong(2))).sum
      val tp = ct.map(r => c2(BigInt(r.getLong(2)))).sum
      val rowP = ct.groupBy(_.getInt(0)).values
        .map(rs => c2(rs.map(r => BigInt(r.getLong(2))).sum)).sum
      val colP = ct.groupBy(_.getInt(1)).values
        .map(rs => c2(rs.map(r => BigInt(r.getLong(2))).sum)).sum
      val t = c2(n)
      val M = BigInt(1000000)
      val num = (t * tp - rowP * colP) * 2
      val den = (t * (rowP + colP) - 2 * rowP * colP).max(1)
      val ari =
        if (num < 0) -((-num) * M / den) else num * M / den
      val fmX = BigInt("1000000000000") * tp * tp / (rowP * colP).max(1)
      val fm = Ext49.isqrt(fmX)
      import s.implicits._
      Seq((n.toLong, tp.toLong, rowP.toLong, colP.toLong,
        ari.toLong, fm.toLong))
        .toDF("n", "tp_pairs", "rows_p", "cols_p", "ari_ppm", "fm_ppm")
    }))

  val oracleSql: Map[String, String] = Map(

    "x182_adjusted_rand" ->
      s"""WITH ${Ext28.cellContingencySql},
         |tp AS (SELECT CAST(sum(n_cl) AS HUGEINT) AS nn,
         |    CAST(sum(n_cl * (n_cl - 1) // 2) AS HUGEINT) AS tp FROM ct),
         |rp AS (SELECT CAST(sum(nc * (nc - 1) // 2) AS HUGEINT) AS rows_p
         |  FROM (SELECT sum(n_cl) AS nc FROM ct GROUP BY cell)),
         |cp AS (SELECT CAST(sum(nl * (nl - 1) // 2) AS HUGEINT) AS cols_p
         |  FROM (SELECT sum(n_cl) AS nl FROM ct GROUP BY label)),
         |dd AS (SELECT nn, tp, rows_p, cols_p,
         |    nn * (nn - 1) // 2 AS t,
         |    ((nn * (nn - 1) // 2) * tp - rows_p * cols_p) * 2 AS num,
         |    greatest((nn * (nn - 1) // 2) * (rows_p + cols_p)
         |      - 2 * rows_p * cols_p, 1) AS den
         |  FROM tp, rp, cp),
         |xx AS (SELECT *,
         |    1000000000000 * tp * tp // greatest(rows_p * cols_p, 1) AS x
         |  FROM dd),
         |${Ext49.newtonIsqrtCtes("xx", "x")}
         |SELECT CAST(nn AS BIGINT) AS n, CAST(tp AS BIGINT) AS tp_pairs,
         |  CAST(rows_p AS BIGINT) AS rows_p,
         |  CAST(cols_p AS BIGINT) AS cols_p,
         |  CAST(CASE WHEN num < 0 THEN -((-num) * 1000000 // den)
         |       ELSE num * 1000000 // den END AS BIGINT) AS ari_ppm,
         |  CAST(r AS BIGINT) AS fm_ppm
         |FROM rt3_""".stripMargin)
}
