package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist
import graft.ext.Similarity

/** Round-5 additions, part 17: sign-random-projection sketch accuracy —
  * the embedding-side twin of x44's MinHash audit.
  */
object Ext39 {

  /** Deterministic signed projection vectors: r_p[j] =
    * ((p·64+j)·2654435761) mod 2001 − 1000 ∈ [−1000, 1000] — the same
    * Knuth-multiplier pseudo-randomness the catalog's other baked
    * constants use, identical literals on both engines. */
  private[graft] def plane(p: Int): Seq[Long] =
    (0 until 64).map(j => ((p * 64 + j) * 2654435761L) % 2001 - 1000)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X3i SRP SKETCH ACCURACY: 16-bit sign-random-projection codes over
    // integer-quantized embeddings (|dot| ≤ 64·2000·1000 ≪ 2⁶³), then —
    // over the same-label pair frame x14 verifies — the Hamming-distance
    // histogram split by whether the pair is a true near-dup (exact
    // cos6 ≥ 0.35, x14's threshold). Near pairs must concentrate at low
    // Hamming distance for SRP bucketing to be a valid 100 TB scale
    // path; this query IS that acceptance check. Codes are a per-row
    // fold (no shuffle); the pair join is label-bucketed like x14; the
    // rollup is ≤ 2·17 rows.
    "x137_srp_sketch" -> ((s, d) => {
      val e0 = embeddings(s, d)
        .select(col("vec_id"), col("label"),
          col("embedding").cast("array<double>").as("v"),
          expr("transform(CAST(embedding AS array<double>), x -> CAST(floor((x + 1.0D) * 1000.0D) AS BIGINT))")
            .as("q"))
        .withColumn("nv", Similarity.norm2(col("v")))
      val code = (0 until 16).map { p =>
        val dot = aggregate(
          zip_with(col("q"), typedLit(plane(p)), (x, r) => x * r),
          lit(0L), (acc, v) => acc + v)
        when(dot > 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _)
      val e = e0.withColumn("code", code)
        .select(col("vec_id"), col("label"), col("v"), col("nv"), col("code"))
        .persistTracked()
      val cos6 = Ext.trunc6(Similarity.dot(col("a.v"), col("b.v")) /
        sqrt(col("a.nv") * col("b.nv")))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select((cos6 >= 0.35).as("is_near"),
          bit_count(expr("a.code ^ b.code")).cast("long").as("hamming"))
        .groupBy(col("is_near"), col("hamming"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("is_near"), col("hamming"))
    }))

  val oracleSql: Map[String, String] = Map(

    // MATERIALIZED CTEs via Ext43.matCtes: c is read twice by the
    // self-join — unpinned, DuckDB re-inlines the 16-plane code
    // computation into both sides (6.7 s → 3.4 s at sf0.01, rows
    // identical; the round-10 CTE re-inlining finding).
    "x137_srp_sketch" -> Ext43.matCtes {
      // planes bound once per row via the pl CTE (round 12: a plane
      // list LITERAL inside the lambda is re-materialized per element
      // — the x143-oracle e0 finding; integer sums are order-free so
      // the fold is a native list_aggregate)
      def dotQ(p: Int) =
        s"CAST(list_aggregate(list_transform(range(1, 65), " +
          s"i -> q[i] * pl$p[i]), 'sum') AS BIGINT)"
      val code = (0 until 16)
        .map(p => s"(CASE WHEN ${dotQ(p)} > 0 THEN ${1L << p} ELSE 0 END)")
        .mkString(" + ")
      s"""WITH ${Ext43.planesCte(16)},
        |e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v,
        |    list_transform(CAST(embedding AS DOUBLE[]),
        |      x -> CAST(floor((x + 1.0) * 1000.0) AS BIGINT)) AS q
        |  FROM embeddings),
        |c AS (SELECT vec_id, label, v, CAST($code AS BIGINT) AS code
        |  FROM e CROSS JOIN pl),
        |p AS (SELECT
        |    (CAST(floor((list_reduce(list_prepend(0.0, list_transform(
        |        range(1, 65), i -> a.v[i] * b.v[i])), (x, y) -> x + y)
        |      / sqrt(list_reduce(list_prepend(0.0, list_transform(
        |        range(1, 65), i -> a.v[i] * a.v[i])), (x, y) -> x + y)
        |      * list_reduce(list_prepend(0.0, list_transform(
        |        range(1, 65), i -> b.v[i] * b.v[i])), (x, y) -> x + y)))
        |      * 1e6) AS DOUBLE) / 1e6 >= 0.35) AS is_near,
        |    CAST(bit_count(xor(a.code, b.code)) AS BIGINT) AS hamming
        |  FROM c a JOIN c b ON a.label = b.label AND a.vec_id < b.vec_id)
        |SELECT is_near, hamming, count(*) AS n FROM p
        |GROUP BY 1, 2 ORDER BY is_near, hamming""".stripMargin
    })
}
