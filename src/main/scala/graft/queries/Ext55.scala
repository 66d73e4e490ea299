package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._

/** Round-10 batch 5: x177 Calinski–Harabasz index (1974; the
  * variance-ratio criterion) over the embedding table's label
  * clustering — completes the clustering-quality family next to x124
  * silhouette (pairwise cohesion/separation) and x106 purity (label
  * agreement): CH = (B/(k−1)) / (W/(n−k)), the classic "is the
  * clustering tighter than the global scatter" summary every embedding
  * curation run reports.
  *
  * Exactness: on the shared integer quantization ([[Ext43.QuantizeSql]]
  * — the x137/x143/x168 family's space, so the number is comparable
  * across the catalog), both scatter terms reduce to integer sums via
  * the centroid identity
  *
  *   W = Σx² − Σ_c ‖S_c‖²/n_c,   B = Σ_c ‖S_c‖²/n_c − ‖ΣS_c‖²/n
  *
  * (S_c = per-cluster per-dim sums). The ONLY non-integers are the k
  * per-cluster divisions and the one global division — spelled as
  * DOCUMENTED ×1e6 floors (A6 = Σ_c (Q_c·1e6 div n_c); k+1 floors
  * total, each < 1 ulp, ≤ 1 ppm off the exact rational — measured
  * 1055642 vs 1055642.57 exact at sf0.01). Identical floor sequence in
  * DuckDB HUGEINT and driver BigInt.
  *
  * Scale shape: the corpus work is ONE posexplode + a (label, dim)
  * groupBy — group count is k·64, bounded by label domain × dimension,
  * never by rows — plus the k-row count frame; the closure is O(k·64)
  * driver BigInt (the x160/x168 exact-closure precedent). Output
  * w_x1e6/b_x1e6 stay BIGINT through sf0.1 with ~7× headroom
  * (T·1e6 ≤ 1.28e18 at 5k vectors); the internal math is
  * BigInt/HUGEINT, so past that only the OUTPUT scaling shifts.
  */
object Ext55 {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "x177_calinski_harabasz" -> ((s, d) => {
      val qv = Ext43.quantizedLabeled(s, d)
      // (label, dim) sums: k·64 groups, partial-aggregable
      val sc = qv
        .select(col("label"), posexplode(col("q")).as(Seq("dm", "x")))
        .groupBy(col("label"), col("dm"))
        .agg(sum(col("x")).as("sdc"), sum(expr("x * x")).as("s2"),
          count(lit(1)).as("cnt"))
        .collect()
      // n_c rides the same job: every vector contributes one row per
      // dim, so any single dim's count is the cluster size (one corpus
      // scan total, never a second count job)
      val nc = sc.filter(_.getInt(1) == 0)
        .map(r => r.getInt(0) -> r.getLong(4)).toMap
      val n = BigInt(nc.values.sum)
      val k = BigInt(nc.size)
      val t = sc.map(r => BigInt(r.getLong(3))).sum
      val qc = sc.groupBy(_.getInt(0)).map { case (lab, rs) =>
        lab -> rs.map(r => BigInt(r.getLong(2)) * BigInt(r.getLong(2))).sum
      }
      val rd = sc.groupBy(_.getInt(1)).map { case (_, rs) =>
        rs.map(r => BigInt(r.getLong(2))).sum
      }
      val u = rd.map(r => r * r).sum
      val M = BigInt(1000000)
      val a6 = qc.map { case (lab, q) => q * M / nc(lab) }.sum
      val w6 = t * M - a6
      val b6 = a6 - u * M / n
      val ch = b6 * (n - k) * M / (w6.max(1) * (k - 1).max(1))
      import s.implicits._
      Seq((n.toLong, k.toLong, w6.toLong, b6.toLong, ch.toLong))
        .toDF("n", "k", "w_x1e6", "b_x1e6", "ch_ppm")
    }))

  val oracleSql: Map[String, String] = Map(

    "x177_calinski_harabasz" ->
      """WITH qv AS (SELECT vec_id, label,
        |    list_transform(CAST(embedding AS DOUBLE[]), x ->
        |      CAST(floor((x + 1.0) * 1000.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |ex AS (SELECT label, unnest(range(1, len(q) + 1)) AS dm, q
        |  FROM qv),
        |xd AS (SELECT label, dm, q[CAST(dm AS INT)] AS x FROM ex),
        |sc AS (SELECT label, dm, CAST(sum(x) AS HUGEINT) AS sdc,
        |    CAST(sum(x * x) AS HUGEINT) AS s2
        |  FROM xd GROUP BY label, dm),
        |nc AS (SELECT label, CAST(count(*) AS HUGEINT) AS n_c FROM qv
        |  GROUP BY label),
        |qc AS (SELECT sc.label, sum(sdc * sdc) AS q_c, sum(s2) AS t_c
        |  FROM sc GROUP BY sc.label),
        |a6 AS (SELECT sum((q_c * 1000000) // n_c) AS a6, sum(t_c) AS t
        |  FROM qc JOIN nc ON qc.label = nc.label),
        |rd AS (SELECT dm, sum(sdc) AS r FROM sc GROUP BY dm),
        |u AS (SELECT sum(r * r) AS u FROM rd),
        |nn AS (SELECT CAST(count(*) AS HUGEINT) AS n,
        |    CAST(count(DISTINCT label) AS HUGEINT) AS k FROM qv)
        |SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
        |  CAST(t * 1000000 - a6 AS BIGINT) AS w_x1e6,
        |  CAST(a6 - (u * 1000000) // n AS BIGINT) AS b_x1e6,
        |  CAST(((a6 - (u * 1000000) // n) * (n - k) * 1000000)
        |    // (greatest(t * 1000000 - a6, 1) * greatest(k - 1, 1))
        |    AS BIGINT) AS ch_ppm
        |FROM a6, u, nn""".stripMargin)
}
