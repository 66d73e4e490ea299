package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic corpora for the beam-ANN scale specs. */
object TestCorpora {

  /** 30k deterministic vectors in the x137 integer space: 32
    * well-separated cluster centers (inter-center dist² ~4e7) plus
    * per-vector offsets in [0, 100] per dim (intra-cluster dist²
    * ~1e5) — the same clustered shape as the shipped embeddings,
    * 15–60× the size. Center: ((c·73 + i·131 + c·i·37) mod 1901) —
    * prime modulus, the per-dim inter-center differences are an
    * equidistributed AP mod 1901, so no two clusters coincide in any
    * dim pattern (a composite-modulus multiplicative spelling tried
    * first merged clusters c and c+29 and created exact duplicate
    * vectors). Offset: the (id mod 89)·i term makes duplicate vectors
    * require id1 ≡ id2 mod lcm(32, 101, 89) ≈ 288k > corpus — none. */
  def clustered30k(spark: SparkSession): DataFrame = clustered(spark, 30000)

  /** Same construction at any n < lcm(32, 101, 89) ≈ 288k (beyond which
    * the duplicate-vector argument above stops holding). */
  def clustered(spark: SparkSession, n: Long): DataFrame = {
    require(n < 287768L, s"clustered corpus duplicate-freedom proven only below lcm(32,101,89); got $n")
    spark.range(n)
      .select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), i -> CAST(
          ((id % 32) * 73 + i * 131 + (id % 32) * i * 37) % 1901
          + (id * 13 + i * 7 + (id % 89) * i * 3) % 101 AS BIGINT))""")
          .as("q"))
  }
}
