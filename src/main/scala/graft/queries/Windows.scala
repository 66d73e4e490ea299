package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._

/** Window-function operator queries (SURVEY §2.5: W1/W2 fill passes, J4
  * duplicate counts) plus the standard analytic family for coverage.
  *
  * Scale notes:
  *   - w1_gap_fill implements the reference's global feed-order semantics
  *     (SURVEY H1) via enrich/BoundaryFill: range partitioning on the order
  *     key, per-partition prefix/suffix non-null states, and an O(P)
  *     boundary exchange — never a single-partition window.
  *   - every PARTITION BY window shuffles once on its partition key and
  *     sorts within partitions — no global sort.
  *   - frame aggregates over DOUBLE go through DECIMAL(18,2) so the result
  *     does not depend on summation order (Spark's sliding-frame update vs
  *     DuckDB's segment tree would otherwise disagree in the last ulp).
  */
object Windows {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Skew mitigation: SALTED two-phase aggregation. A hot group key (here
    // l_returnflag: 3 values over the whole table — maximal skew) would pin
    // the entire partial-aggregate output of one key on one reducer; salting
    // splits each group 16 ways, the final phase merges 16 subtotals per
    // key. Decimal sums make the result bit-identical to the unsalted plan,
    // which is what the oracle runs.
    "a4_salted_agg" -> ((s, d) => {
      val salted = lineitem(s, d)
        .withColumn("salt", pmod(col("l_orderkey"), lit(16)))
        .groupBy(col("l_returnflag"), col("salt"))
        .agg(count(lit(1)).as("n_part"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("qty_part"))
      salted
        .groupBy(col("l_returnflag"))
        .agg(sum(col("n_part")).as("n"),
          sum(col("qty_part")).cast("double").as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // A5 exact percentiles (nearest-rank / percentile_disc method): the
    // value AT rank ceil(p·n) per group — pure value SELECTION, zero
    // interpolation arithmetic, so the result is bit-exact across engines
    // (interpolating percentile_cont would expose float-op-order freedom).
    // One window shuffle on the group key + a partial-aggregable final
    // groupBy; at scale the same shape, or approx_percentile for sketches.
    "a5_percentiles" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      def atRank(p: Double) =
        max(when(col("rn") === ceil(col("n") * p), col("o_totalprice")))
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy(col("o_orderpriority"))))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          min(col("o_totalprice")).as("lo"),
          atRank(0.5).as("p50"), atRank(0.9).as("p90"), atRank(0.99).as("p99"),
          max(col("o_totalprice")).as("hi"))
        .orderBy(col("o_orderpriority"))
    }),

    // W1 (main.py:950–993) re-expressed: nearest non-null value above/below
    // in global order; gap filled only when both neighbors agree, else a
    // conflict flag (the red fill of main.py:991–993). Runs the scale-safe
    // boundary-exchange plan (range shuffle + O(P) boundary collect) rather
    // than a single-partition global window — BoundaryFillSpec proves the
    // two equivalent; the window twin stays in BoundaryFill.gapFillWindow.
    "w1_gap_fill" -> ((s, d) => {
      val base = events(s, d).select(
        col("event_id").as("seq"),
        when(col("value") >= 100, col("event_type")).as("value"))
      graft.enrich.BoundaryFill
        .gapFill(base, s.sparkContext.defaultParallelism)
        .select(col("seq").as("event_id"), col("filled"), col("flag_conflict"))
        .orderBy(col("event_id"))
    }),

    // J4 (main.py:958, :1004): per-key occurrence count as a window — the
    // O(n) replacement for the reference's O(n²) full-column rescans.
    "w4_dup_count" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          count(lit(1)).over(w).as("n_orders_of_cust"))
        .orderBy(col("o_orderkey"))
    }),

    // Ranking/analytic family over a deterministic total order per partition.
    "w5_rank_family" -> ((s, d) => {
      val full = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
      orders(s, d)
        .select(
          col("o_orderkey"),
          row_number().over(full).as("rn"),
          rank().over(byDate).as("rnk"),
          dense_rank().over(byDate).as("drnk"),
          lag(col("o_orderkey"), 1).over(full).as("prev_key"),
          lead(col("o_orderkey"), 1).over(full).as("next_key"),
          ntile(4).over(full).as("quartile"))
        .orderBy(col("o_orderkey"))
    }),

    // IGNORE NULLS first/last over a keyed frame — the per-key twin of the
    // reference's fill semantics (w1 runs the GLOBAL-order version through
    // the boundary-exchange plan; this one is an ordinary keyed window).
    "w9_ignore_nulls" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          when(col("value") >= 100, col("event_type")).as("cand"))
        .select(col("event_id"),
          last(col("cand"), ignoreNulls = true).over(w).as("prev_fill"),
          first(col("cand"), ignoreNulls = true).over(fwd).as("next_fill"))
        .orderBy(col("event_id"))
    }),

    // RANGE frames (vs w6's ROW frames): peers by ORDER-BY VALUE share the
    // frame, so ties aggregate together — the semantic difference from ROWS.
    // Decimal accumulation keeps the running sums bit-exact cross-engine.
    "w7_range_frames" -> ((s, d) => {
      val byDate = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
          col("o_totalprice").cast("decimal(18,2)").as("p"))
        .select(col("o_orderkey"),
          sum(col("p")).over(byDate).cast("double").as("run_sum_range"),
          count(lit(1)).over(byDate).as("n_peers_through"))
        .orderBy(col("o_orderkey"))
    }),

    // Distribution functions: percent_rank ((rank-1)/(n-1)) and cume_dist
    // (rows<=current / n) — both exact-integer ratios, IEEE-deterministic.
    "w8_dist_family" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderkey"),
          percent_rank().over(w).as("pr"),
          cume_dist().over(w).as("cd"),
          ntile(10).over(w).as("decile"))
        .orderBy(col("o_orderkey"))
    }),

    // Frame aggregates: running total + trailing-4 moving window, per user in
    // event-time order. Decimal accumulation ⇒ order-independent exactness.
    "w6_running_frames" -> ((s, d) => {
      // ts_ns (exact nanos) as the ordering key — matches DuckDB's
      // TIMESTAMP_NS sort; the truncated micros ts could merge ties.
      val ord = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
      val run = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = ord.rowsBetween(-3, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"), col("ts_ns"),
          col("value").cast("decimal(18,2)").as("v"))
        .select(
          col("event_id"),
          sum(col("v")).over(run).cast("double").as("run_sum"),
          sum(col("v")).over(mov).cast("double").as("mov_sum"),
          count(lit(1)).over(mov).as("mov_n"),
          (sum(col("v")).over(mov).cast("double") /
            count(lit(1)).over(mov)).as("mov_avg"))
        .orderBy(col("event_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "a5_percentiles" ->
      """WITH r AS (SELECT o_orderpriority, o_totalprice,
        |  row_number() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS rn,
        |  count(*) OVER (PARTITION BY o_orderpriority) AS n
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n,
        |  min(o_totalprice) AS lo,
        |  max(CASE WHEN rn = CAST(ceil(n*0.5) AS BIGINT) THEN o_totalprice END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n*0.9) AS BIGINT) THEN o_totalprice END) AS p90,
        |  max(CASE WHEN rn = CAST(ceil(n*0.99) AS BIGINT) THEN o_totalprice END) AS p99,
        |  max(o_totalprice) AS hi
        |FROM r GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // (DuckDB reads the TIMESTAMP_NS column as `ts` at full precision, so
    // ordering by ts there == ordering by ts_ns here)
    "w9_ignore_nulls" ->
      """WITH base AS (
        |  SELECT event_id, user_id, ts,
        |    CASE WHEN value >= 100 THEN event_type END AS cand
        |  FROM events)
        |SELECT event_id,
        |  last_value(cand IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_fill,
        |  first_value(cand IGNORE NULLS) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_fill
        |FROM base ORDER BY event_id""".stripMargin,

    "w7_range_frames" ->
      """SELECT o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    AS run_sum_range,
        |  count(*) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_peers_through
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "w8_dist_family" ->
      """SELECT o_orderkey,
        |  percent_rank() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS pr,
        |  cume_dist() OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS cd,
        |  ntile(10) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey) AS decile
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "a4_salted_agg" ->
      """SELECT l_returnflag,
        |  count(*) AS n,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "w1_gap_fill" ->
      """WITH base AS (
        |  SELECT event_id,
        |    CASE WHEN value >= 100 THEN event_type END AS cand
        |  FROM events
        |), nn AS (
        |  SELECT event_id, cand,
        |    last_value(cand IGNORE NULLS) OVER (ORDER BY event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_cand,
        |    first_value(cand IGNORE NULLS) OVER (ORDER BY event_id
        |      ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_cand
        |  FROM base
        |)
        |SELECT event_id,
        |  COALESCE(cand,
        |    CASE WHEN prev_cand = next_cand THEN prev_cand END, '') AS filled,
        |  (cand IS NULL AND NOT (prev_cand IS NOT NULL AND next_cand IS NOT NULL
        |     AND prev_cand = next_cand)) AS flag_conflict
        |FROM nn ORDER BY event_id""".stripMargin,

    "w4_dup_count" ->
      """SELECT o_orderkey, o_custkey,
        |  count(*) OVER (PARTITION BY o_custkey) AS n_orders_of_cust
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "w5_rank_family" ->
      """SELECT o_orderkey,
        |  row_number() OVER full_w AS rn,
        |  rank() OVER date_w AS rnk,
        |  dense_rank() OVER date_w AS drnk,
        |  lag(o_orderkey, 1) OVER full_w AS prev_key,
        |  lead(o_orderkey, 1) OVER full_w AS next_key,
        |  ntile(4) OVER full_w AS quartile
        |FROM orders
        |WINDOW full_w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |       date_w AS (PARTITION BY o_custkey ORDER BY o_orderdate)
        |ORDER BY o_orderkey""".stripMargin,

    "w6_running_frames" ->
      """SELECT event_id,
        |  CAST(sum(v) OVER run_w AS DOUBLE) AS run_sum,
        |  CAST(sum(v) OVER mov_w AS DOUBLE) AS mov_sum,
        |  count(*) OVER mov_w AS mov_n,
        |  CAST(sum(v) OVER mov_w AS DOUBLE) / count(*) OVER mov_w AS mov_avg
        |FROM (SELECT event_id, user_id, ts, CAST(value AS DECIMAL(18,2)) AS v
        |      FROM events)
        |WINDOW run_w AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |       mov_w AS (PARTITION BY user_id ORDER BY ts, event_id
        |         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin
  )
}
