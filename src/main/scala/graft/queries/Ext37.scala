package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Round-5 additions, part 15: dedup-threshold sensitivity, quantile
  * normalization across sources, and a compression-ratio quality signal.
  */
object Ext37 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X1d DEDUP THRESHOLD SWEEP: how many near-dup pairs (and docs)
    // survive each Jaccard threshold — the sensitivity audit run before
    // committing a dedup threshold to a corpus. Reuses the x3 LSH
    // candidate machinery; each threshold test is the EXACT integer
    // cross-multiplication inter·100 ≥ t·(union) — no float compare can
    // flip a boundary pair. The sweep explodes the (bounded) candidate
    // pair frame 7×, never the corpus; zero-survivor thresholds are
    // restored by the left join from the literal threshold frame.
    // Zero-union candidates (two empty shingle sets colliding on the
    // all-NULL signature's band keys) are excluded on BOTH engines:
    // lshVerifiedPairs filters empty sets before banding (the 0/0
    // jaccard would THROW under ANSI), and the oracle mirrors with an
    // explicit union > 0 guard.
    "x132_threshold_sweep" -> ((s, d) => {
      import s.implicits._
      val thrs = Seq(30, 40, 50, 60, 70, 80, 90)
      val pairs = Ext.lshVerifiedPairs(s, d, 0.0)
        .select(col("id1"), col("id2"), col("inter"), col("n1"), col("n2"))
        .persistTracked()
      val surv = pairs
        .withColumn("thr_pct", explode(array(thrs.map(lit(_)): _*)))
        .filter(col("inter") * 100 >= col("thr_pct") * (col("n1") + col("n2") - col("inter")))
        .persistTracked()
      val nPairs = surv.groupBy(col("thr_pct")).agg(count(lit(1)).as("n_pairs"))
      val nDocs = surv
        .select(col("thr_pct"), explode(array(col("id1"), col("id2"))).as("doc"))
        .distinct()
        .groupBy(col("thr_pct")).agg(count(lit(1)).as("n_docs"))
      thrs.toDF("thr_pct")
        .join(nPairs, Seq("thr_pct"), "left")
        .join(nDocs, Seq("thr_pct"), "left")
        .na.fill(0L, Seq("n_pairs", "n_docs"))
        .orderBy(col("thr_pct"))
    }),

    // X7g QUANTILE NORMALIZATION: map each source's doc-length
    // distribution onto the pooled corpus distribution (rank-matching —
    // the classic cross-batch feature alignment). mapped_len for a
    // source length L is the smallest pooled length whose pooled
    // cumulative share ≥ the source's cumulative share at L, compared
    // as the exact cross-product cumP·n_src ≥ cumS·n_pool (Long-safe to
    // ~3e9 docs). Both cumulative windows run on BOUNDED length-
    // histogram frames (≤ distinct lengths, value-range-bounded — the
    // x120 discipline), and the inequality join multiplies two bounded
    // frames, never the corpus.
    "x133_quantile_norm" -> ((s, d) => {
      val docs = documents(s, d).select(col("source"), col("n_chars").as("len"))
      val srcH = docs.groupBy(col("source"), col("len"))
        .agg(count(lit(1)).as("n"))
        .withColumn("cum_src", sum(col("n")).over(
          Window.partitionBy(col("source")).orderBy(col("len"))))
        .persistTracked()
      val nSrc = srcH.groupBy(col("source")).agg(sum(col("n")).as("n_src"))
      val poolH = docs.groupBy(col("len")).agg(count(lit(1)).as("np"))
        .withColumn("cum_pool", sum(col("np")).over(Window.orderBy(col("len"))))
        .persistTracked()
      val nPool = poolH.agg(max(col("cum_pool")).as("n_pool"))
      srcH.join(nSrc, "source")
        .crossJoin(broadcast(nPool))
        .join(broadcast(poolH.select(col("len").as("plen"), col("cum_pool"))),
          col("cum_pool") * col("n_src") >= col("cum_src") * col("n_pool"))
        .groupBy(col("source"), col("len"), col("n"), col("cum_src"))
        .agg(min(col("plen")).as("mapped_len"))
        .orderBy(col("source"), col("len"))
    }),

    // X4h COMPRESSION-RATIO SIGNAL: DEFLATE each document and report
    // compressed/raw size — the Gopher/FineWeb-style "too compressible =
    // templated/looped, incompressible = binary junk" quality filter.
    // Partition-local mapPartitions with ONE Deflater reused (reset, not
    // reallocated) per partition and released on exhaustion — no
    // shuffle; scales linearly with executors. Rows-only by design: the
    // oracle has no zlib, so verification is the determinism + ordering
    // spec (repetitive ≪ shuffled-unique in ratio) rather than a SQL
    // replay.
    "x134_deflate_ratio" -> ((s, d) => {
      import s.implicits._
      val out = documents(s, d).select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .mapPartitions { it =>
          val defl = new java.util.zip.Deflater(6)
          val buf = new Array[Byte](64 * 1024)
          // release native zlib memory even when a downstream operator
          // stops early (limit/take) or the task fails — iterator
          // exhaustion alone never fires in those paths
          val inTask = Option(org.apache.spark.TaskContext.get())
          inTask.foreach(_.addTaskCompletionListener[Unit](_ => defl.end()))
          new Iterator[(Long, Long, Long)] {
            def hasNext: Boolean = {
              val h = it.hasNext
              // exhaustion fallback for driver-local runs with no task
              if (!h && inTask.isEmpty) defl.end()
              h
            }
            def next(): (Long, Long, Long) = {
              val (id, text) = it.next()
              val in = text.getBytes("UTF-8")
              defl.reset(); defl.setInput(in); defl.finish()
              var n = 0L
              while (!defl.finished()) n += defl.deflate(buf)
              (id, in.length.toLong, n)
            }
          }
        }
        .toDF("doc_id", "n_bytes", "comp_bytes")
      out.select(col("doc_id"), col("n_bytes"), col("comp_bytes"),
          expr("comp_bytes * 1000000L div greatest(n_bytes, 1L)").as("ratio_ppm"))
        .orderBy(col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(

    "x132_threshold_sweep" -> (Ext12.pairsCte +
      """,
        |thr AS (SELECT unnest([30, 40, 50, 60, 70, 80, 90]) AS thr_pct),
        |surv AS (SELECT thr_pct, id1, id2 FROM ver CROSS JOIN thr
        |  WHERE n1 + n2 - inter > 0
        |    AND inter * 100 >= thr_pct * (n1 + n2 - inter)),
        |np AS (SELECT thr_pct, count(*) AS n_pairs FROM surv GROUP BY 1),
        |nd AS (SELECT thr_pct, count(*) AS n_docs FROM (
        |    SELECT DISTINCT thr_pct, doc FROM (
        |      SELECT thr_pct, id1 AS doc FROM surv
        |      UNION ALL SELECT thr_pct, id2 FROM surv))
        |  GROUP BY 1)
        |SELECT CAST(thr.thr_pct AS INT) AS thr_pct,
        |  CAST(coalesce(n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs
        |FROM thr LEFT JOIN np USING (thr_pct) LEFT JOIN nd USING (thr_pct)
        |ORDER BY thr_pct""".stripMargin),

    "x133_quantile_norm" ->
      """WITH d AS (SELECT source, n_chars AS len FROM documents),
        |srch AS (SELECT source, len, count(*) AS n FROM d GROUP BY 1, 2),
        |srcc AS (SELECT source, len, n, CAST(sum(n) OVER (PARTITION BY source
        |    ORDER BY len ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS cum_src FROM srch),
        |ns AS (SELECT source, CAST(sum(n) AS BIGINT) AS n_src FROM srch GROUP BY 1),
        |poolh AS (SELECT len, count(*) AS np FROM d GROUP BY 1),
        |poolc AS (SELECT len AS plen, CAST(sum(np) OVER (ORDER BY len
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS cum_pool FROM poolh),
        |npool AS (SELECT max(cum_pool) AS n_pool FROM poolc)
        |SELECT s.source, s.len, CAST(s.n AS BIGINT) AS n, s.cum_src,
        |  CAST(min(p.plen) AS BIGINT) AS mapped_len
        |FROM srcc s JOIN ns USING (source) CROSS JOIN npool
        |JOIN poolc p ON p.cum_pool * n_src >= s.cum_src * n_pool
        |GROUP BY s.source, s.len, s.n, s.cum_src
        |ORDER BY s.source, s.len""".stripMargin)
}
