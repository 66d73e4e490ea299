package graft.queries

import graft.GraftCaches.TrackedPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-4 batch 2: corpus n-gram novelty (the contamination/memorization
  * metric), product-quantization code assignment (the compression side of
  * ANN), an interval range join via bucket binning (the scalable spelling
  * of a date-overlap theta join), a salted skew join (the 3-key join that
  * would otherwise hot-spot 3 tasks), and time-weighted segment sums over
  * event streams.
  *
  * Determinism rules as everywhere in the catalog (ROUND_NOTES.md):
  * integer `div`; floor-after-one-IEEE-multiply fixed-point; decimal sums
  * for order-free totals; sequential-fold dots; codebooks baked as
  * literals on both sides; every result ordered by a unique key.
  */
object Ext5 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X4n N-GRAM NOVELTY: per document, how many of its distinct 5-grams
    // appear in NO other document — the memorization / cross-contamination
    // metric a training-data audit runs (the inverse of x25's
    // decontamination overlap). Shape: per-row gram generation (transform
    // over an index sequence — no self-join, no window), one shuffle on
    // gram for the document-frequency count, one shuffle back on doc_id.
    // Both aggregations are partial-aggregable, so the plan survives any
    // corpus size; gram cardinality is bounded by total token count.
    "x41_ngram_novelty" -> ((s, d) => {
      // native distinct-5-gram kernel: the emitted array is already a
      // per-doc set, so no row-level distinct (a full shuffle) is needed
      // after the explode
      val grams = documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .filter(size(col("w")) >= 5)
        .select(col("doc_id"),
          explode(TextOps.ngramsDistinct(col("w"), 5)).as("gram"))
      val df = grams.groupBy(col("gram"))
        .agg(count(lit(1)).as("df"))
      grams.join(df, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_novel"))
        .orderBy(col("doc_id"))
    }),

    // X3e PRODUCT-QUANTIZATION CODES: 64-dim embedding → 4 subspaces of 16
    // dims → nearest ±1 codeword per subspace (argmax sequential-fold dot,
    // ties to the lowest id — x37's rule) → corpus histogram over the
    // 4-tuple code. The assignment is scan-local (codebook is a plan
    // literal — on a cluster, a broadcast), the histogram partial-
    // aggregable; sum_qdot (fixed-point sum of the winning dots) audits
    // quantization quality the way a recall probe would. This is the
    // memory-side half of IVF-PQ: x23 picks the cell, this picks the code.
    "x42_pq_codes" -> ((s, d) => {
      import graft.ext.PqCodebook.{M, SubDim, Kc, cw}
      import graft.ext.Similarity
      val sub = (m: Int) => slice(col("v"), m * SubDim + 1, SubDim)
      val withDots = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .select(Seq(col("vec_id")) ++
          (for (m <- 0 until M; k <- 0 until Kc)
            yield Similarity.dot(sub(m), typedLit(cw(m)(k))).as(s"d${m}_$k")): _*)
      def cell(m: Int) = (0 until Kc).foldRight(lit(Kc - 1)) { (k, rest) =>
        if (k == Kc - 1) rest
        else when((k + 1 until Kc).map(j => col(s"d${m}_$k") >= col(s"d${m}_$j"))
          .reduce(_ && _), lit(k)).otherwise(rest)
      }
      def best(m: Int) = (0 until Kc).map(k => col(s"d${m}_$k")).reduce(greatest(_, _))
      withDots
        .select(Seq(col("vec_id")) ++ (0 until M).map(m => cell(m).as(s"c$m")) ++
          Seq((0 until M).map(m => floor(best(m) * lit(1000000.0)).cast("long"))
            .reduce(_ + _).as("qdot")): _*)
        .groupBy((0 until M).map(m => col(s"c$m")): _*)
        .agg(count(lit(1)).as("n"), sum(col("qdot")).as("sum_qdot"))
        .orderBy((0 until M).map(m => col(s"c$m")): _*)
    }),

    // J9 INTERVAL RANGE JOIN via bucket binning: high-value urgent orders
    // define 14-day windows; count (and price-sum) all orders landing in
    // each window. The naive spelling is a theta join (|L|×|R| compares —
    // the plan Spark gives a BETWEEN condition is BroadcastNestedLoop); the
    // scalable spelling bins both sides by interval-width buckets: each
    // window covers ≤2 buckets (explode), each right row exactly 1, so the
    // bucket equi-join bounds candidates and every true pair is matched
    // exactly once (buckets are disjoint — no post-dedup). Shuffles on the
    // bucket key only; survives any date range and any row count.
    "j9_interval_join" -> ((s, d) => {
      val dayUs = 86400000000L
      // o_orderdate arrives as TIMESTAMP_NTZ; the session pins UTC, so the
      // cast to instant is exact and matches DuckDB's epoch_us on the
      // naive value
      val win = orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 400000)
        .select(col("o_orderkey").as("k"),
          expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs").as("d"))
        .select(col("k"), col("d"),
          explode(sequence(expr("d div 14"), expr("(d + 13) div 14"))).as("bkt"))
      val r = orders(s, d)
        .select(col("o_orderkey").as("rk"),
          expr(s"unix_micros(cast(o_orderdate as timestamp)) div $dayUs").as("rd"),
          col("o_totalprice"))
        .select(col("rk"), col("rd"), col("o_totalprice"),
          expr("rd div 14").as("bkt"))
      win.join(r, "bkt")
        .filter(col("rd") >= col("d") && col("rd") < col("d") + 14)
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_in_window"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))
        .orderBy(col("k"))
    }),

    // J10 SALTED SKEW JOIN: lineitem keyed by l_returnflag has exactly 3
    // distinct keys — a plain shuffle join hot-spots 3 tasks however many
    // executors exist. Salting spreads it: the fact side derives salt =
    // l_orderkey % 16 (deterministic, no rand()), the 3-row dim side
    // explodes ×16, and the join key becomes (flag, salt) — 48 evenly-
    // sized partitions. The final rollup re-aggregates the partials, so
    // the result is identical to the unsalted join (which is what the
    // oracle runs). Same pattern as a4_salted_agg, applied to a join.
    "j10_salted_join" -> ((s, d) => {
      val dim = lineitem(s, d).select(col("l_returnflag").as("flag")).distinct()
        .select(col("flag"), ascii(col("flag")).cast("long").as("weight"))
        .select(col("flag"), col("weight"),
          explode(sequence(lit(0L), lit(15L))).as("salt"))
      val fact = lineitem(s, d)
        .select(col("l_returnflag").as("flag"), col("l_quantity"),
          (col("l_orderkey") % 16).as("salt"))
      fact.join(dim, Seq("flag", "salt"))
        .groupBy(col("flag"))
        .agg(count(lit(1)).as("n"),
          sum((col("l_quantity") * col("weight")).cast("decimal(18,2)"))
            .cast("double").as("weighted_qty"))
        .orderBy(col("flag"))
    }),

    // X2g SKETCH-ACCURACY AUDIT: for every LSH-banded candidate pair,
    // report the 8-permutation minhash agreement count NEXT TO the exact
    // shingle intersection/sizes — the measurement a pipeline owner reads
    // before trusting sketch-only dedup at full scale (sig_matches/8
    // estimates Jaccard; inter/(n1+n2-inter) is truth). All integers, so
    // the audit itself has zero float concerns; one extra join over x3's
    // plan, nothing quadratic.
    "x44_sketch_accuracy" -> ((s, d) => {
      val sh = Ext.docShingles(documents(s, d))
        .withColumn("sig", TextOps.minhashSig(col("ss")))
        .persistTracked()
      val banded = sh.select(col("doc_id"),
        explode(TextOps.bandKeys(col("sig"), 4)).as("bk"))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.bk") === col("b.bk") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      val sigMatches = aggregate(
        zip_with(col("x.sig"), col("y.sig"), (p, q) => (p === q).cast("long")),
        lit(0L), (acc, v) => acc + v)
      cand.join(sh.as("x"), col("id1") === col("x.doc_id"))
        .join(sh.as("y"), col("id2") === col("y.doc_id"))
        .select(col("id1"), col("id2"), sigMatches.as("sig_matches"),
          size(array_intersect(col("x.ss"), col("y.ss"))).cast("long").as("inter"),
          size(col("x.ss")).cast("long").as("n1"),
          size(col("y.ss")).cast("long").as("n2"))
        .orderBy(col("id1"), col("id2"))
    }),

    // W14 GAPS-AND-ISLANDS: per-user consecutive-active-day streaks via the
    // classic day − row_number() group key — one shuffle on user_id serves
    // both windows, both rollups partial-aggregable. The engagement-streak
    // shape every activity dashboard computes.
    "w14_streaks" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      events(s, d)
        .select(col("user_id"), expr("(ts_ns div 1000) div 86400000000").as("day"))
        .distinct()
        .withColumn("grp", col("day") - row_number().over(w))
        .groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"))
        .groupBy(col("user_id"))
        .agg(max(col("len")).as("longest_streak"),
          count(lit(1)).as("n_streaks"),
          sum(col("len")).as("n_active_days"))
        .orderBy(col("user_id"))
    }),

    // X4o DOC-PIPELINE E2E: the composed training-data flow — normalize →
    // exact-dedup (first-wins survivor per normalized text) → token count →
    // token-budget shard packing (ShardPack's distributed prefix sum, an
    // O(P) offset exchange) → per-shard manifest. Each stage is one of the
    // catalog's proven primitives; composing them in one plan is what the
    // real pipeline ships, and the manifest (doc count / token sum / id
    // range per shard) is what a trainer's data loader reads. Shuffles:
    // one on the dedup key, one range partition for packing, one partial-
    // aggregable rollup — nothing quadratic, nothing driver-bound.
    "x43_docpipe_e2e" -> ((s, d) => {
      val norm = trim(regexp_replace(lower(col("text")), "\\s+", " "))
      val surv = documents(s, d)
        .select(col("doc_id"), norm.as("norm"))
        .groupBy(col("norm")).agg(min(col("doc_id")).as("doc_id"))
      val toks = surv.select(col("doc_id"),
        size(split(col("norm"), " ")).cast("long").as("n_tokens"))
      graft.ext.ShardPack.pack(toks, "doc_id", "n_tokens", 1000L)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard_id"))
    }),

    // Q6 CORRELATED-SUBQUERY DECORRELATION: the catalog's SQL-entry
    // showcase — customers above their nation's average balance, written
    // as two correlated scalar subqueries. Catalyst decorrelates both into
    // aggregate+join (PlanSpec pins that no per-row subquery survives), so
    // the executed plan is the same shuffle-join shape a hand-written
    // DataFrame version produces. The predicate is spelled multiply-
    // through (bal·count > sum, exact decimals) so no float division or
    // summation-order concern exists on either engine.
    "q6_decorrelate" -> ((s, d) => {
      graft.tables.Tables.registerViews(s, d)
      s.sql("""
        SELECT c_custkey, c_acctbal
        FROM customer c
        WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
            (SELECT count(*) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
          > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
             WHERE c2.c_nationkey = c.c_nationkey)
        ORDER BY c_custkey""")
    }),

    // W13 TIME-WEIGHTED SEGMENT SUMS: each event's value held until the
    // user's next event (lead over the per-user timeline — one shuffle on
    // user_id); the weighted total Σ value·duration is the time-weighted-
    // average numerator every engagement/billing pipeline computes. Fixed
    // point: value → floor(value·1e3) (one IEEE multiply + floor), duration
    // in integer micros, products summed as DECIMAL(38,0) so no float
    // summation-order or bigint-overflow concerns at any scale.
    "w13_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
      events(s, d)
        .select(col("event_id"), col("user_id"), col("value"),
          expr("ts_ns div 1000").as("tus"))
        .withColumn("dur_us", lead(col("tus"), 1).over(w) - col("tus"))
        .filter(col("dur_us").isNotNull)
        .select(col("user_id"), col("dur_us"),
          (floor(col("value") * 1000.0).cast("long") * col("dur_us")).as("wv"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("dur_us")).as("sum_dur_us"),
          sum(col("wv").cast("decimal(38,0)")).cast("double").as("sum_wv"))
        .orderBy(col("user_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x41_ngram_novelty" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 5),
        |g AS (SELECT DISTINCT doc_id,
        |    unnest(list_transform(range(1, len(w) - 3),
        |      i -> array_to_string(w[i:i+4], ' '))) AS gram
        |  FROM w),
        |df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
        |FROM g JOIN df USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "x42_pq_codes" -> {
      import graft.ext.PqCodebook.{M, SubDim, Kc, cwSqlList}
      val cwCols = (for (m <- 0 until M; k <- 0 until Kc)
        yield s"${cwSqlList(m, k)} AS w${m}_$k").mkString(",\n|  ")
      def dot(m: Int, k: Int) = {
        val off = m * SubDim
        s"list_reduce(list_prepend(0.0, list_transform(range(1, ${SubDim + 1}), " +
          s"i -> v[$off + i] * w${m}_$k[i])), (acc, x) -> acc + x)"
      }
      val dotCols = (for (m <- 0 until M; k <- 0 until Kc)
        yield s"${dot(m, k)} AS d${m}_$k").mkString(",\n|  ")
      def cellCase(m: Int) = (0 until Kc - 1).map(k =>
        "WHEN " + (k + 1 until Kc).map(j => s"d${m}_$k >= d${m}_$j").mkString(" AND ") +
          s" THEN $k").mkString("CASE ", " ", s" ELSE ${Kc - 1} END")
      val cellCols = (0 until M).map(m => s"${cellCase(m)} AS c$m").mkString(",\n|  ")
      def best(m: Int) =
        s"greatest(${(0 until Kc).map(k => s"d${m}_$k").mkString(", ")})"
      val qdot = (0 until M)
        .map(m => s"CAST(floor(${best(m)} * 1000000.0) AS BIGINT)").mkString(" + ")
      s"""WITH cb AS (SELECT
        |  $cwCols),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ed AS (SELECT vec_id, v,
        |  $dotCols
        |  FROM e, cb),
        |ec AS (SELECT vec_id,
        |  $cellCols,
        |  $qdot AS qdot
        |  FROM ed)
        |SELECT c0, c1, c2, c3, count(*) AS n,
        |  CAST(sum(qdot) AS BIGINT) AS sum_qdot
        |FROM ec GROUP BY c0, c1, c2, c3 ORDER BY c0, c1, c2, c3""".stripMargin
    },

    // the bucket binning is transparent (exact containment re-checked), so
    // the oracle is the plain BETWEEN theta join
    "j9_interval_join" ->
      """WITH l AS (SELECT o_orderkey AS k,
        |    epoch_us(o_orderdate) // 86400000000 AS d
        |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 400000),
        |r AS (SELECT epoch_us(o_orderdate) // 86400000000 AS rd, o_totalprice
        |  FROM orders)
        |SELECT k, count(*) AS n_in_window,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        |FROM l JOIN r ON rd >= d AND rd < d + 14
        |GROUP BY k ORDER BY k""".stripMargin,

    // salting is transparent (partials re-aggregate), so the oracle is the
    // plain join
    "j10_salted_join" ->
      """WITH dim AS (SELECT DISTINCT l_returnflag AS flag FROM lineitem),
        |dw AS (SELECT flag, CAST(ascii(flag) AS BIGINT) AS weight FROM dim)
        |SELECT flag, count(*) AS n,
        |  CAST(sum(CAST(l_quantity * weight AS DECIMAL(18,2))) AS DOUBLE)
        |    AS weighted_qty
        |FROM lineitem JOIN dw ON l_returnflag = flag
        |GROUP BY flag ORDER BY flag""".stripMargin,

    "x44_sketch_accuracy" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w),
        |h AS (SELECT doc_id, ss,
        |  list_transform(ss, s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) AS hs FROM sh),
        |mh AS (SELECT doc_id, ss,
        |  list_min(list_transform(hs, x -> (7*x+3) % 2147483647)) AS m0,
        |  list_min(list_transform(hs, x -> (11*x+5) % 2147483647)) AS m1,
        |  list_min(list_transform(hs, x -> (13*x+7) % 2147483647)) AS m2,
        |  list_min(list_transform(hs, x -> (17*x+11) % 2147483647)) AS m3,
        |  list_min(list_transform(hs, x -> (19*x+13) % 2147483647)) AS m4,
        |  list_min(list_transform(hs, x -> (23*x+17) % 2147483647)) AS m5,
        |  list_min(list_transform(hs, x -> (29*x+19) % 2147483647)) AS m6,
        |  list_min(list_transform(hs, x -> (31*x+23) % 2147483647)) AS m7 FROM h),
        |bk AS (SELECT doc_id, unnest([
        |  concat_ws('_', 0, m0, m1), concat_ws('_', 1, m2, m3),
        |  concat_ws('_', 2, m4, m5), concat_ws('_', 3, m6, m7)]) AS bk FROM mh),
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id1, id2,
        |  CAST((CASE WHEN x.m0 = y.m0 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m1 = y.m1 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m2 = y.m2 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m3 = y.m3 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m4 = y.m4 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m5 = y.m5 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m6 = y.m6 THEN 1 ELSE 0 END) +
        |       (CASE WHEN x.m7 = y.m7 THEN 1 ELSE 0 END) AS BIGINT) AS sig_matches,
        |  CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) AS inter,
        |  CAST(len(x.ss) AS BIGINT) AS n1, CAST(len(y.ss) AS BIGINT) AS n2
        |FROM cand JOIN mh x ON x.doc_id = id1 JOIN mh y ON y.doc_id = id2
        |ORDER BY id1, id2""".stripMargin,

    "w14_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |g AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d),
        |st AS (SELECT user_id, grp, count(*) AS len FROM g GROUP BY user_id, grp)
        |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
        |  count(*) AS n_streaks, CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x43_docpipe_e2e" ->
      """WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents),
        |s AS (SELECT norm, min(doc_id) AS doc_id FROM n GROUP BY norm),
        |t AS (SELECT doc_id,
        |    CAST(len(string_split(norm, ' ')) AS BIGINT) AS n_tokens FROM s),
        |c AS (SELECT doc_id, n_tokens,
        |    CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM t),
        |sh AS (SELECT doc_id, n_tokens,
        |    GREATEST(CAST(0 AS BIGINT), CAST((cum - 1) // 1000 AS BIGINT))
        |      AS shard_id FROM c)
        |SELECT shard_id, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM sh GROUP BY shard_id ORDER BY shard_id""".stripMargin,

    "q6_decorrelate" ->
      """SELECT c_custkey, c_acctbal
        |FROM customer c
        |WHERE CAST(c_acctbal AS DECIMAL(18,2)) *
        |    (SELECT count(*) FROM customer c2
        |     WHERE c2.c_nationkey = c.c_nationkey)
        |  > (SELECT sum(CAST(c_acctbal AS DECIMAL(18,2))) FROM customer c2
        |     WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin,

    "w13_time_weighted" ->
      """WITH e AS (SELECT event_id, user_id, value,
        |    epoch_us(ts) AS tus FROM events),
        |l AS (SELECT user_id, value, tus,
        |    lead(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) - tus
        |      AS dur_us
        |  FROM e),
        |s AS (SELECT user_id, dur_us,
        |    CAST(floor(value * 1000.0) AS BIGINT) * dur_us AS wv
        |  FROM l WHERE dur_us IS NOT NULL)
        |SELECT user_id, count(*) AS n_segments,
        |  CAST(sum(dur_us) AS BIGINT) AS sum_dur_us,
        |  CAST(sum(CAST(wv AS DECIMAL(38,0))) AS DOUBLE) AS sum_wv
        |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin)
}
