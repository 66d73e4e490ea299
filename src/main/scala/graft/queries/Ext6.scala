package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.{Similarity, TextOps}

/** Round-4 batch 3: pre-aggregation join (the decorrelated TPC-H Q17
  * shape), time-grid resampling with forward fill, the cumulative-distinct
  * window decomposition, the PQ-ADC two-stage rerank (the full IVF-PQ
  * search path: asymmetric-distance shortlist → exact rerank), and a
  * balanced mixture sample with a runtime-computed quota.
  *
  * Determinism rules as everywhere in the catalog (ROUND_NOTES.md):
  * exact decimal sums; sequential-fold dots summed in a fixed order;
  * floor-trunc never round; codebooks baked as literals on both sides;
  * every result ordered by a unique key.
  */
object Ext6 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Q7 PRE-AGGREGATION JOIN (TPC-H Q17 shape): revenue from lineitems
    // whose quantity is below 20% of their part's average. The naive
    // spelling is a correlated per-row subquery; the scalable spelling
    // pre-aggregates per part (partial-aggregable, one shuffle on
    // l_partkey) and joins the one-row-per-part stats back. The predicate
    // is multiplied through (5·qty·cnt < sum_qty, exact decimals) so no
    // division or float appears on either engine.
    "q7_join_preagg" -> ((s, d) => {
      val li = lineitem(s, d)
      val stats = li.groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("l_quantity").cast("decimal(18,2)")).as("sq"))
      li.join(stats, "l_partkey")
        .join(part(s, d), col("p_partkey") === col("l_partkey"))
        .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt")
          < col("sq"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("p_brand"))
    }),

    // W15 TIME-GRID RESAMPLE + FORWARD FILL: each user's event timeline
    // re-sampled onto an hourly grid, carrying the last observed value
    // forward — the gap-filling every feature-store / time-series trainer
    // runs. Grid generation is a per-user explode (no driver loop); the
    // fill avoids IGNORE-NULLS portability concerns via the islands trick:
    // a running count of non-null values is the island id, and max() over
    // the island broadcasts the one non-null value to its gap rows. One
    // shuffle on user_id serves the per-hour pick, the islands window and
    // the final rollup.
    "w15_resample_ffill" -> ((s, d) => {
      val hrUs = 3600000000L
      val e = events(s, d).select(col("user_id"),
        expr(s"(ts_ns div 1000) div $hrUs").as("hr"),
        col("value"), expr("ts_ns div 1000").as("tus"), col("event_id"))
      // latest event within each user-hour wins (full ordering, no ties)
      val byHour = e.withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("hr"))
            .orderBy(col("tus").desc, col("event_id").desc)))
        .filter(col("rn") === 1).select(col("user_id"), col("hr"), col("value"))
      val grid = e.groupBy(col("user_id"))
        .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"))).as("hr"))
      val wOrd = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      grid.join(byHour, Seq("user_id", "hr"), "left")
        .withColumn("grp", count(col("value")).over(wOrd))
        .withColumn("v", max(col("value")).over(
          Window.partitionBy(col("user_id"), col("grp"))))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_hours"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_filled"),
          sum(floor(col("v") * 1000.0).cast("long")).as("sum_v_milli"))
        .orderBy(col("user_id"))
    }),

    // W16 CUMULATIVE DISTINCT: per user and active day, how many distinct
    // event types the user has seen so far. COUNT(DISTINCT) OVER a running
    // frame is unsupported (and inherently non-partial); the scalable
    // decomposition is min-first-day per (user, type) — one partial-
    // aggregable shuffle — then a running sum of first-appearances over the
    // day spine. The same trick turns any streaming "new uniques" metric
    // into two ordinary aggregations.
    "w16_cumulative_distinct" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        expr("(ts_ns div 1000) div 86400000000").as("day"), col("event_type"))
      val firstDay = e.groupBy(col("user_id"), col("event_type"))
        .agg(min(col("day")).as("day"))
        .groupBy(col("user_id"), col("day"))
        .agg(count(lit(1)).as("n_new"))
      val days = e.select(col("user_id"), col("day")).distinct()
      days.join(firstDay, Seq("user_id", "day"), "left")
        .withColumn("cum_types", sum(coalesce(col("n_new"), lit(0L))).over(
          Window.partitionBy(col("user_id")).orderBy(col("day"))))
        .select(col("user_id"), col("day"), col("cum_types"))
        .orderBy(col("user_id"), col("day"))
    }),

    // X3f PQ-ADC TWO-STAGE RERANK — the full IVF-PQ search path. Stage 1
    // scores every (query, vector) pair by asymmetric distance: the query
    // precomputes its dot with each codeword (M·Kc values — the "distance
    // table"), and a corpus vector's approximate score is the sum of the
    // table entries its PQ code selects (element_at — no 64-dim math per
    // pair). Stage 2 reranks only the top-20 shortlist with exact 64-dim
    // dots. At 100 TB the corpus side carries 4 small ints per vector
    // through stage 1 (codes precomputed at ingest), the query side is a
    // broadcast, and exact vectors are fetched for shortlist rows only —
    // the memory/IO asymmetry that makes PQ work. ADC sums add the M
    // per-subspace doubles in fixed order; both stages break ties on the
    // lower vec_id.
    "x45_pq_rerank" -> ((s, d) => {
      import graft.ext.PqCodebook.{M, SubDim, Kc, cw}
      val sub = (m: Int) => slice(col("v"), m * SubDim + 1, SubDim)
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      // corpus: staged codeword dots → argmax code per subspace (x42 rule)
      val withDots = e.select(Seq(col("vec_id"), col("v")) ++
        (for (m <- 0 until M; k <- 0 until Kc)
          yield Similarity.dot(sub(m), typedLit(cw(m)(k))).as(s"d${m}_$k")): _*)
      def cell(m: Int) = (0 until Kc).foldRight(lit(Kc - 1)) { (k, rest) =>
        if (k == Kc - 1) rest
        else when((k + 1 until Kc).map(j => col(s"d${m}_$k") >= col(s"d${m}_$j"))
          .reduce(_ && _), lit(k)).otherwise(rest)
      }
      val coded = withDots.select(Seq(col("vec_id")) ++
        (0 until M).map(m => cell(m).as(s"c$m")): _*)
      // queries: the distance table qd{m}_{k} per query vector
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(Seq(col("vec_id").as("q_id"), col("v").as("qv")) ++
          (for (m <- 0 until M; k <- 0 until Kc)
            yield Similarity.dot(sub(m), typedLit(cw(m)(k))).as(s"qd${m}_$k")): _*)
      val adc = (0 until M).map { m =>
        element_at(array((0 until Kc).map(k => col(s"qd${m}_$k")): _*),
          col(s"c$m") + 1)
      }.reduce(_ + _)
      // shortlist via the custom bounded-heap top-k plan (plans.TopKPerKey)
      // rather than a row_number window: a window would shuffle EVERY
      // (query, vector) score into |queries| partitions — the partial
      // top-k stage caps the exchange at 20 rows per (partition, query),
      // which is what survives a 100 TB corpus scan
      val scored = q.join(coded, col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("qv"), col("vec_id").as("n_id"), adc.as("adc"))
      val short = graft.ext.TopK.perKey(scored,
        keys = Seq(col("q_id")), order = Seq(col("adc").desc, col("n_id")), k = 20)
      short.join(e, col("n_id") === col("vec_id"))
        .select(col("q_id"), col("n_id"), Ext.trunc6(col("adc")).as("adc6"),
          Ext.trunc6(Similarity.dot(col("qv"), col("v"))).as("dot6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("dot6").desc, col("n_id"))))
        .filter(col("rnk") <= 5)
        .select(col("q_id"), col("rnk"), col("n_id"), col("adc6"), col("dot6"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // X4p BALANCED MIXTURE SAMPLE: undersample every source down to the
    // smallest source's size — the class-balancing step of dataset mixing.
    // Unlike x29's fixed top-N, the quota is COMPUTED from the data (min
    // per-source count) and applied via a scalar broadcast: one partial-
    // aggregable count, a one-row cross join (broadcast at any scale), and
    // a per-source hash-rank filter. Selection is the deterministic md5
    // order, so the sample is reproducible run-over-run and engine-over-
    // engine — rand() would be neither.
    "x46_balanced_sample" -> ((s, d) => {
      val h = TextOps.hash32(concat(lit("bal:"), col("doc_id").cast("string")))
      val quota = documents(s, d).groupBy(col("source"))
        .agg(count(lit(1)).as("n"))
        .agg(min(col("n")).as("quota"))
      val kept = documents(s, d)
        .select(col("doc_id"), col("source"), h.as("hv"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("source")).orderBy(col("hv"), col("doc_id"))))
        .join(broadcast(quota), col("rnk") <= col("quota"))
      kept.groupBy(col("source"))
        .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("sum_ids"),
          min(col("doc_id")).as("min_id"), max(col("doc_id")).as("max_id"))
        .orderBy(col("source"))
    }))

  val oracleSql: Map[String, String] = Map(

    "q7_join_preagg" ->
      """WITH a AS (SELECT l_partkey, count(*) AS cnt,
        |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
        |  FROM lineitem GROUP BY l_partkey)
        |SELECT p_brand, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |    AS sum_price
        |FROM lineitem JOIN a USING (l_partkey)
        |JOIN part ON p_partkey = l_partkey
        |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * cnt < sq
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "w15_resample_ffill" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 3600000000 AS hr,
        |    value, epoch_us(ts) AS tus, event_id FROM events),
        |bh AS (SELECT user_id, hr, value FROM (
        |    SELECT *, row_number() OVER (PARTITION BY user_id, hr
        |      ORDER BY tus DESC, event_id DESC) AS rn FROM e) WHERE rn = 1),
        |sp AS (SELECT user_id, min(hr) AS h0, max(hr) AS h1
        |  FROM e GROUP BY user_id),
        |g AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS hr FROM sp),
        |j AS (SELECT g.user_id, g.hr, bh.value FROM g
        |  LEFT JOIN bh ON g.user_id = bh.user_id AND g.hr = bh.hr),
        |i AS (SELECT user_id, hr, value,
        |    count(value) OVER (PARTITION BY user_id ORDER BY hr
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM j),
        |f AS (SELECT user_id, hr, value,
        |    max(value) OVER (PARTITION BY user_id, grp) AS v FROM i)
        |SELECT user_id, count(*) AS n_hours,
        |  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_filled,
        |  CAST(sum(CAST(floor(v * 1000.0) AS BIGINT)) AS BIGINT) AS sum_v_milli
        |FROM f GROUP BY user_id ORDER BY user_id""".stripMargin,

    "w16_cumulative_distinct" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) // 86400000000 AS day,
        |    event_type FROM events),
        |fd AS (SELECT user_id, min(day) AS day FROM (
        |    SELECT user_id, event_type, min(day) AS day
        |    FROM e GROUP BY user_id, event_type) GROUP BY user_id, day),
        |nn AS (SELECT user_id, day, count(*) AS n_new FROM (
        |    SELECT user_id, event_type, min(day) AS day
        |    FROM e GROUP BY user_id, event_type) GROUP BY user_id, day),
        |d AS (SELECT DISTINCT user_id, day FROM e)
        |SELECT d.user_id, d.day,
        |  CAST(sum(coalesce(n_new, 0)) OVER (PARTITION BY d.user_id
        |    ORDER BY d.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_types
        |FROM d LEFT JOIN nn ON d.user_id = nn.user_id AND d.day = nn.day
        |ORDER BY d.user_id, d.day""".stripMargin,

    "x45_pq_rerank" -> {
      import graft.ext.PqCodebook.{M, SubDim, Kc, cwSqlList}
      val cwCols = (for (m <- 0 until M; k <- 0 until Kc)
        yield s"${cwSqlList(m, k)} AS w${m}_$k").mkString(",\n|  ")
      def dot(m: Int, k: Int, vcol: String) = {
        val off = m * SubDim
        s"list_reduce(list_prepend(0.0, list_transform(range(1, ${SubDim + 1}), " +
          s"i -> $vcol[$off + i] * w${m}_$k[i])), (acc, x) -> acc + x)"
      }
      val dotCols = (for (m <- 0 until M; k <- 0 until Kc)
        yield s"${dot(m, k, "v")} AS d${m}_$k").mkString(",\n|  ")
      val qdotCols = (for (m <- 0 until M; k <- 0 until Kc)
        yield s"${dot(m, k, "qv")} AS qd${m}_$k").mkString(",\n|  ")
      def cellCase(m: Int) = (0 until Kc - 1).map(k =>
        "WHEN " + (k + 1 until Kc).map(j => s"d${m}_$k >= d${m}_$j").mkString(" AND ") +
          s" THEN $k").mkString("CASE ", " ", s" ELSE ${Kc - 1} END")
      val cellCols = (0 until M).map(m => s"${cellCase(m)} AS c$m").mkString(",\n|  ")
      val adc = (0 until M).map(m =>
        s"(CASE c$m ${(0 until Kc).map(k => s"WHEN $k THEN qd${m}_$k").mkString(" ")} END)")
        .mkString(" + ")
      val exactDot = s"list_reduce(list_prepend(0.0, list_transform(" +
        s"range(1, ${M * SubDim + 1}), i -> qv[i] * v[i])), (acc, x) -> acc + x)"
      s"""WITH cb AS (SELECT
        |  $cwCols),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ed AS (SELECT vec_id,
        |  $dotCols
        |  FROM e, cb),
        |ec AS (SELECT vec_id,
        |  $cellCols
        |  FROM ed),
        |q AS (SELECT vec_id AS q_id, v AS qv,
        |  $qdotCols
        |  FROM (SELECT vec_id, v FROM e WHERE vec_id % 100 = 0), cb),
        |pairs AS (SELECT q_id, qv, ec.vec_id AS n_id,
        |  $adc AS adc
        |  FROM q JOIN ec ON ec.vec_id <> q_id),
        |sl AS (SELECT q_id, qv, n_id, adc,
        |  row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, n_id) AS srnk
        |  FROM pairs),
        |rr AS (SELECT q_id, n_id,
        |  floor(adc * 1e6) / 1e6 AS adc6,
        |  floor($exactDot * 1e6) / 1e6 AS dot6
        |  FROM sl JOIN e ON e.vec_id = n_id WHERE srnk <= 20),
        |rk AS (SELECT q_id, n_id, adc6, dot6,
        |  row_number() OVER (PARTITION BY q_id ORDER BY dot6 DESC, n_id) AS rnk
        |  FROM rr)
        |SELECT q_id, CAST(rnk AS BIGINT) AS rnk, n_id, adc6, dot6
        |FROM rk WHERE rnk <= 5 ORDER BY q_id, rnk""".stripMargin
    },

    "x46_balanced_sample" ->
      """WITH h AS (SELECT doc_id, source,
        |    CAST(concat('0x', substr(md5('bal:' || CAST(doc_id AS VARCHAR)),1,8))
        |      AS BIGINT) AS hv
        |  FROM documents),
        |q AS (SELECT min(n) AS quota FROM (
        |    SELECT source, count(*) AS n FROM documents GROUP BY source)),
        |r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) AS rnk
        |  FROM h)
        |SELECT source, count(*) AS n_kept,
        |  CAST(sum(doc_id) AS BIGINT) AS sum_ids,
        |  min(doc_id) AS min_id, max(doc_id) AS max_id
        |FROM r, q WHERE rnk <= quota
        |GROUP BY source ORDER BY source""".stripMargin)
}
