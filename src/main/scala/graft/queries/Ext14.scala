package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** Round-5 batch 6: disjunctive-predicate join (TPC-H Q19 shape, q13),
  * interpolated median (w26 — the one percentile variant the catalog
  * lacked; exact because dyadic halves are lossless in IEEE doubles), and
  * per-dimension embedding feature statistics (x71 — the feature-scaling
  * stats a training pipeline computes before normalizing vectors).
  */
object Ext14 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q13 DISJUNCTIVE PREDICATE JOIN (TPC-H Q19 shape): OR-of-ANDs
    // coupling part attributes with lineitem quantity bands. Catalyst
    // keeps the disjunction as a residual on the broadcast join but
    // PUSHES the derivable prefix (brand IN (…)) to the part scan —
    // Ext14Spec pins that pushed filter. Revenue in exact decimal.
    "q13_disjunctive" -> ((s, d) => {
      val p = part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size"))
      val li = lineitem(s, d).select(col("l_partkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"))
      val arms =
        (col("p_brand") === "Brand#1" && col("p_size") <= 10 &&
          col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#2" && col("p_size") >= 5 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 35)
      li.join(broadcast(p.filter(col("p_brand").isin("Brand#1", "Brand#2"))),
          col("l_partkey") === col("p_partkey") && arms)
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("revenue"))
    }),

    // W26 INTERPOLATED MEDIAN (percentile_cont twin of w24's nearest-rank
    // median): for even group sizes the median is the MEAN OF THE TWO
    // MIDDLE VALUES — normally a float hazard, but (a+b)/2 over
    // milli-scaled integers is a dyadic half, exactly representable in a
    // double on both engines. Selection stays row_number-based (never a
    // percentile built-in, whose interpolation rules differ by engine);
    // one user_id shuffle serves both rank windows and the rollup.
    "w26_median_interp" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val e = events(s, d).select(col("user_id"), col("event_id"),
        floor(col("value") * 1000.0).cast("long").as("vm"))
        .withColumn("cnt", count(lit(1)).over(w))
        .withColumn("rn", row_number().over(
          w.orderBy(col("vm"), col("event_id"))))
      e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(when(col("rn") === expr("(cnt + 1) div 2"), col("vm")))
            .as("lo"),
          max(when(col("rn") === expr("cnt div 2 + 1"), col("vm")))
            .as("hi"))
        .select(col("user_id"), col("n"),
          ((col("lo") + col("hi")).cast("double") / 2.0).as("median"))
        .orderBy(col("user_id"))
    }),

    // X3d PER-DIMENSION FEATURE STATS: mean and variance of every
    // embedding dimension over the corpus — what a pipeline computes once
    // to z-score vectors before indexing/training. Elements are
    // micro-scaled to integers FIRST (floor(v·1e6) — float sums would be
    // order-dependent), so the sums are exact at any parallelism; the
    // final mean/variance emerge via the multiply-through integer moments
    // (n·Σx² − Σ², never a running float). posexplode is the only fan-out;
    // the rollup is one partial-aggregable shuffle on the 64 dims.
    "x71_feature_stats" -> ((s, d) => {
      embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "x")))
        .select(col("dim"),
          floor(col("x").cast("double") * 1e6).cast("long").as("xi"))
        .groupBy(col("dim"))
        .agg(count(lit(1)).as("n"),
          sum(col("xi")).as("s1"),
          sum((col("xi") * col("xi")).cast("decimal(38,0)")).as("s2"))
        .select(col("dim"), col("n"),
          Ext.trunc6(col("s1").cast("double") / col("n").cast("double"))
            .as("mean_u6"),
          // population variance in micro-units²: (n·Σx² − Σ²) / n²
          Ext.trunc6((col("s2") * col("n") -
            col("s1").cast("decimal(38,0)") * col("s1").cast("decimal(38,0)"))
            .cast("double") /
            (col("n") * col("n")).cast("double")).as("var_u6"))
        .orderBy(col("dim"))
    }))

  val oracleSql: Map[String, String] = Map(

    "q13_disjunctive" ->
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))))
        |    AS DOUBLE) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND p_size <= 10
        |    AND l_quantity >= 1 AND l_quantity <= 20)
        |  OR (p_brand = 'Brand#2' AND p_size >= 5
        |    AND l_quantity >= 10 AND l_quantity <= 35)""".stripMargin,

    "w26_median_interp" ->
      """WITH e AS (SELECT user_id, event_id,
        |    CAST(floor(value * 1000.0) AS BIGINT) AS vm FROM events),
        |r AS (SELECT user_id, vm,
        |    count(*) OVER (PARTITION BY user_id) AS cnt,
        |    row_number() OVER (PARTITION BY user_id ORDER BY vm, event_id)
        |      AS rn
        |  FROM e)
        |SELECT user_id, count(*) AS n,
        |  CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN vm END)
        |    + max(CASE WHEN rn = cnt // 2 + 1 THEN vm END) AS DOUBLE) / 2.0
        |    AS median
        |FROM r GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x71_feature_stats" ->
      """WITH x AS (SELECT unnest(range(1, len(embedding) + 1)) AS i,
        |    embedding FROM embeddings),
        |e AS (SELECT CAST(i - 1 AS INT) AS dim,
        |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS xi
        |  FROM x),
        |g AS (SELECT dim, count(*) AS n, sum(xi) AS s1,
        |    sum(CAST(xi AS DECIMAL(38,0)) * xi) AS s2
        |  FROM e GROUP BY dim)
        |SELECT dim, n,
        |  floor((CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * 1e6) / 1e6
        |    AS mean_u6,
        |  floor((CAST(s2 * n - CAST(s1 AS DECIMAL(38,0)) *
        |      CAST(s1 AS DECIMAL(38,0)) AS DOUBLE) /
        |    CAST(n * n AS DOUBLE)) * 1e6) / 1e6 AS var_u6
        |FROM g ORDER BY dim""".stripMargin)
}
