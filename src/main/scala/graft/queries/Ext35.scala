package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist
import graft.ingest.GlobalSeq

/** Round-5 additions, part 13: four training-data curation operators —
  * an exact clustering-quality score (silhouette), a deterministic
  * per-epoch training shuffle, exact per-group winsorization, and a
  * distinct-n lexical-diversity audit.
  *
  * All rank/score arithmetic is exact integer fixed-point (the
  * established oracle-determinism discipline): quantize once, then only
  * +, −, ×, integer div on positives — so Spark and DuckDB agree to the
  * bit without any float-summation-order hazard.
  */
object Ext35 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X6f SIMPLIFIED SILHOUETTE: cluster-quality score of the `label`
    // assignment over embeddings, using centroid distances only (the
    // O(n·K) simplified silhouette, not the O(n²) original — THE
    // difference that lets it run at corpus scale). Dims are quantized
    // to integer milli-units, centroids are exact integer per-dim means
    // (sum div n), distances are exact Long squared distances, and the
    // per-point score is an exact ppm ratio: s = (b²−a²)/max(a²,b²) with
    // a = own centroid, b = nearest other centroid. Sign is computed
    // separately so integer division only ever sees positives (both
    // Spark `div` and DuckDB `//` truncate toward zero — verified
    // round 11, −7 // 2 = −3 — so this is the family's defensive
    // parity convention, not a semantic necessity).
    // Shuffles: one posexplode rollup for centroids (K·D rows), one
    // broadcast of K centroid rows, one keyed rollup — the corpus
    // never self-joins. Long bounds: q ∈ [0, 2000] ⇒ dist² ≤ 64·2000²
    // = 2.56e8, ×1e6 = 2.56e14 ≪ 2⁶³.
    "x124_silhouette" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("label"), expr(
          "transform(CAST(embedding AS array<double>), x -> CAST(floor((x + 1.0D) * 1000.0D) AS BIGINT))")
          .as("q"))
        .persistTracked()
      val cent = e.select(col("label").as("clabel"), posexplode(col("q")).as(Seq("dim", "x")))
        .groupBy(col("clabel"), col("dim"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .select(col("clabel"), col("dim"), expr("sx div n").as("m"))
        .groupBy(col("clabel"))
        .agg(sort_array(collect_list(struct(col("dim"), col("m")))).as("st"))
        .select(col("clabel"), expr("transform(st, t -> t.m)").as("cq"))
      val dist = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("clabel"), expr(
          "aggregate(zip_with(q, cq, (x, c) -> (x - c) * (x - c)), 0L, (acc, v) -> acc + v)")
          .as("d2"))
      val per = dist.groupBy(col("vec_id"), col("label"))
        .agg(min(when(col("clabel") === col("label"), col("d2"))).as("a2"),
          min(when(col("clabel") =!= col("label"), col("d2"))).as("b2"))
        .select(col("label"), col("a2"), col("b2"),
          (when(col("b2") >= col("a2"), 1L).otherwise(-1L) *
            expr("abs(b2 - a2) * 1000000L div greatest(a2, b2, 1L)")).as("s_ppm"))
      per.groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("s_ppm")).as("sum_s_ppm"),
          sum(when(col("b2") > col("a2"), 1L).otherwise(0L)).as("n_well"))
        .select(col("label"), col("n"), col("sum_s_ppm"),
          when(col("sum_s_ppm") >= 0, expr("sum_s_ppm div n"))
            .otherwise(-expr("(-sum_s_ppm) div n")).as("mean_s_ppm"),
          expr("n_well * 1000000L div n").as("well_ppm"))
        .orderBy(col("label"))
    }),

    // X2g DETERMINISTIC EPOCH SHUFFLE: the per-epoch global training
    // order every LM data loader needs — order docs by
    // md5(epoch ‖ doc_id) so each epoch is a different but REPRODUCIBLE
    // permutation, then assign dense positions and round-robin shards.
    // The position is NOT a global window (that funnels the corpus
    // through one task): GlobalSeq range-sorts on (epoch, key) and adds
    // per-partition offsets with one O(P) count exchange — the same
    // boundary-exchange shape as the ingest sequencer. Per-epoch
    // position falls out as seq − epoch·N because epoch leads the sort
    // key and every epoch carries all N docs.
    "x125_epoch_shuffle" -> ((s, d) => {
      val base = documents(s, d)
        .select(col("doc_id"), explode(array(lit(0), lit(1))).as("epoch"))
        .withColumn("k",
          md5(concat(col("epoch").cast("string"), lit(":"), col("doc_id").cast("string"))))
      val seqd = GlobalSeq.withSeq(base,
        Seq(col("epoch"), col("k"), col("doc_id")), "seq")
      val n = documents(s, d).agg(count(lit(1)).as("n_docs"))
      seqd.crossJoin(broadcast(n))
        .select(col("epoch").cast("int").as("epoch"), col("doc_id"),
          expr("seq - epoch * n_docs").as("pos"))
        .withColumn("shard", col("pos") % 8)
        .orderBy(col("epoch"), col("pos"))
    }),

    // X7f EXACT PER-GROUP WINSORIZATION: clamp events.value to its
    // group's exact nearest-rank [p05, p95] — the robust-scaling /
    // outlier-capping pass of a feature pipeline. The percentile is NOT
    // a per-group sort-window over the corpus (group sizes are
    // corpus-scale): bucket values to centi-unit bins, cumulate over the
    // BOUNDED bin frame (≤ ~49k bins — value-range resolution, not
    // corpus rows), locate the threshold bin, then rank only WITHIN that
    // one bin to recover the exact k-th value (the x120/x121
    // bucket-then-refine pattern extended with a refine stage). Clamped
    // sums go through DECIMAL so the rollup is order-independent.
    "x126_winsorize" -> ((s, d) => {
      val v = events(s, d).select(col("event_type"), col("value"))
      val binned = v.withColumn("bin", floor(col("value") * lit(100.0)).cast("long"))
        .persistTracked()
      val wb = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      val cum = binned.groupBy(col("event_type"), col("bin"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(wb))
        .persistTracked()
      val ks = cum.groupBy(col("event_type")).agg(sum(col("cnt")).as("n"))
        .select(col("event_type"),
          expr("(5 * n + 99) div 100").as("k05"),
          expr("(95 * n + 99) div 100").as("k95"))
      // the unique bin holding global rank k, and k's offset inside it
      def kth(k: String, out: String): DataFrame = {
        val hit = cum.join(ks, "event_type")
          .filter(col("cum") >= col(k) && col("cum") - col("cnt") < col(k))
          .select(col("event_type"), col("bin"),
            (col(k) - (col("cum") - col("cnt"))).as("off"))
        binned.join(broadcast(hit), Seq("event_type", "bin"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("event_type"), col("bin")).orderBy(col("value"))))
          .filter(col("rn") === col("off"))
          .select(col("event_type"), col("value").as(out))
      }
      val thr = kth("k05", "lo").join(kth("k95", "hi"), "event_type")
      // final rollup reads the persisted binned frame — not the raw
      // events scan a third time
      binned.join(broadcast(thr), "event_type")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          first(col("lo")).as("lo"), first(col("hi")).as("hi"),
          sum(when(col("value") < col("lo"), 1L).otherwise(0L)).as("n_lo"),
          sum(when(col("value") > col("hi"), 1L).otherwise(0L)).as("n_hi"),
          sum(least(greatest(col("value"), col("lo")), col("hi"))
            .cast("decimal(18,2)")).cast("double").as("win_sum"))
        .withColumn("win_mean", col("win_sum") / col("n"))
        .orderBy(col("event_type"))
    }),

    // X4g DISTINCT-N DIVERSITY: per source, the type/token ratio over
    // word bigrams plus the hapax share — the distinct-n diversity audit
    // that flags template-generated or looped text before training. The
    // distinct count is a two-level rollup (per-(source,gram) counts,
    // then per-source) — partial-aggregable at both levels, no
    // count(distinct) expand of the exploded frame.
    "x127_distinct_ngrams" -> ((s, d) => {
      val grams = documents(s, d)
        .select(col("source"), graft.ext.TextOps.words(col("text")).as("w"))
        .filter(size(col("w")) >= 2)
        .select(col("source"), explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => concat(a, lit(" "), b))).as("gram"))
      grams.groupBy(col("source"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("source"))
        .agg(sum(col("cnt")).as("total_2grams"),
          count(lit(1)).as("distinct_2grams"),
          sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax_2grams"))
        .select(col("source"), col("total_2grams"), col("distinct_2grams"),
          col("hapax_2grams"),
          // quotient/remainder split keeps the ×1e6 intermediates
          // Long-safe at web-crawl gram counts (> 9e12 bigrams/source)
          expr("(distinct_2grams div total_2grams) * 1000000L + " +
            "(distinct_2grams % total_2grams) * 1000000L div total_2grams")
            .as("ttr_ppm"),
          expr("(hapax_2grams div distinct_2grams) * 1000000L + " +
            "(hapax_2grams % distinct_2grams) * 1000000L div distinct_2grams")
            .as("hapax_ppm"))
        .orderBy(col("source"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x124_silhouette" ->
      """WITH e AS (SELECT vec_id, label, list_transform(CAST(embedding AS DOUBLE[]),
        |    x -> CAST(floor((x + 1.0) * 1000.0) AS BIGINT)) AS q FROM embeddings),
        |dims AS (SELECT unnest(range(1, 65)) AS dim),
        |md AS (SELECT label AS clabel, dim, sum(q[dim]) // count(*) AS m
        |  FROM e CROSS JOIN dims GROUP BY 1, 2),
        |c AS (SELECT clabel, list(m ORDER BY dim) AS cq FROM md GROUP BY 1),
        |dd AS (SELECT vec_id, label, clabel, list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(1, 65), i -> (q[i] - cq[i]) * (q[i] - cq[i]))),
        |    (acc, v) -> acc + v) AS d2
        |  FROM e CROSS JOIN c),
        |p AS (SELECT vec_id, label,
        |    min(CASE WHEN clabel = label THEN d2 END) AS a2,
        |    min(CASE WHEN clabel <> label THEN d2 END) AS b2
        |  FROM dd GROUP BY 1, 2),
        |sc AS (SELECT label, a2, b2,
        |    (CASE WHEN b2 >= a2 THEN 1 ELSE -1 END)
        |      * (abs(b2 - a2) * 1000000 // greatest(a2, b2, 1)) AS s_ppm
        |  FROM p)
        |SELECT label, count(*) AS n,
        |  CAST(sum(s_ppm) AS BIGINT) AS sum_s_ppm,
        |  CAST(CASE WHEN sum(s_ppm) >= 0 THEN sum(s_ppm) // count(*)
        |       ELSE -((-sum(s_ppm)) // count(*)) END AS BIGINT) AS mean_s_ppm,
        |  CAST(sum(CASE WHEN b2 > a2 THEN 1 ELSE 0 END) * 1000000 // count(*)
        |    AS BIGINT) AS well_ppm
        |FROM sc GROUP BY label ORDER BY label""".stripMargin,

    "x125_epoch_shuffle" ->
      """WITH ep AS (SELECT unnest([0, 1]) AS epoch),
        |d AS (SELECT epoch, doc_id,
        |    md5(CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS k
        |  FROM documents CROSS JOIN ep),
        |r AS (SELECT epoch, doc_id,
        |    row_number() OVER (PARTITION BY epoch ORDER BY k, doc_id) - 1 AS pos
        |  FROM d)
        |SELECT CAST(epoch AS INT) AS epoch, doc_id, CAST(pos AS BIGINT) AS pos,
        |  CAST(pos % 8 AS BIGINT) AS shard
        |FROM r ORDER BY epoch, pos""".stripMargin,

    "x126_winsorize" ->
      """WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        |k AS (SELECT event_type, (5 * n + 99) // 100 AS k05,
        |    (95 * n + 99) // 100 AS k95 FROM n),
        |r AS (SELECT event_type, value,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn
        |  FROM events),
        |lo AS (SELECT r.event_type, value AS lo FROM r JOIN k USING (event_type)
        |  WHERE rn = k05),
        |hi AS (SELECT r.event_type, value AS hi FROM r JOIN k USING (event_type)
        |  WHERE rn = k95)
        |SELECT e.event_type, count(*) AS n, any_value(lo) AS lo, any_value(hi) AS hi,
        |  CAST(sum(CASE WHEN value < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
        |  CAST(sum(CASE WHEN value > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
        |  CAST(sum(CAST(LEAST(GREATEST(value, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
        |    AS win_sum,
        |  CAST(sum(CAST(LEAST(GREATEST(value, lo), hi) AS DECIMAL(18,2))) AS DOUBLE)
        |    / count(*) AS win_mean
        |FROM events e JOIN lo USING (event_type) JOIN hi USING (event_type)
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,

    "x127_distinct_ngrams" ->
      """WITH w AS (SELECT source, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 2),
        |g AS (SELECT source, unnest(list_transform(range(1, len(w)),
        |    i -> w[i] || ' ' || w[i+1])) AS gram FROM w),
        |c AS (SELECT source, gram, count(*) AS cnt FROM g GROUP BY 1, 2)
        |SELECT source, CAST(sum(cnt) AS BIGINT) AS total_2grams,
        |  count(*) AS distinct_2grams,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_2grams,
        |  CAST((count(*) // sum(cnt)) * 1000000
        |    + (count(*) % sum(cnt)) * 1000000 // sum(cnt) AS BIGINT) AS ttr_ppm,
        |  CAST((sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) // count(*)) * 1000000
        |    + (sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) % count(*)) * 1000000
        |      // count(*) AS BIGINT) AS hapax_ppm
        |FROM c GROUP BY source ORDER BY source""".stripMargin)
}
