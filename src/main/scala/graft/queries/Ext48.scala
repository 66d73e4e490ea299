package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps
import graft.ingest.GlobalSeq

/** Round-8 batch 2: two more exact-integer eval statistics —
  *
  *   - x157 split-conformal coverage (Vovk et al.; the distribution-free
  *     calibration check an LLM-judge / quality-classifier pipeline
  *     runs before trusting its thresholds): calibrate the
  *     ceil((n+1)·0.9)-th smallest nonconformity score on one half of
  *     the corpus, measure empirical coverage of the induced bound on
  *     the held-out half. Exchangeability gives E[coverage] ∈
  *     [0.9, 0.9 + 1/(n_cal+1)] — the spec pins the planted arithmetic
  *     and the corpus run should sit near 900000 ppm.
  *   - x158 Spearman rank correlation between two document quality
  *     signals (char length vs distinct-token ratio) — ranks are the
  *     DETERMINISTIC total orders (row_number over (signal, doc_id);
  *     the tie convention is documented, matching the oracle exactly,
  *     rather than textbook average ranks).
  *
  * Scale shapes:
  *   - x157 is one scan → per-split counts + a VALUE-BOUNDED histogram
  *     (nonconformity is a ppm integer in [0, 1e6], so the cumulative
  *     window runs over ≤ 1e6 distinct values — bounded by the value
  *     domain, never by corpus rows; the x126-winsorize shape).
  *   - x158 ranks both signals with GlobalSeq (range sort + O(P) offset
  *     exchange — windowless, the x125 machinery) and joins the two
  *     narrow (doc_id, rank) frames; the statistic is one partial-
  *     aggregable Σd². BIGINT headroom: 6·Σd²·1e6 must fit, so the
  *     ppm is a documented TWO-STEP floor ((6Σd² div n)·1e6 div (n²−1),
  *     the x147 precedent) — exact-match across engines, ≤ 1 ppm from
  *     the one-step value; past ~2M rows shift the fixed point (the
  *     x151 rule) — at this corpus's 5k docs headroom is ~400×.
  */
object Ext48 {

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    queries1 ++ queries2

  private val queries1: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X157 SPLIT-CONFORMAL COVERAGE: nonconformity α = token density
    // (whitespace tokens per char, ppm). Calibration = even doc_id,
    // test = odd. q = k-th smallest calibration α with
    // k = ceil(0.9·(n_cal+1)) — spelled in EXACT integers as
    // (9·(n_cal+1) + 9) div 10 (never ceil(0.9·x) in floating point:
    // 0.9 is not binary-exact and rounds k up at exact multiples).
    // Coverage = fraction of test docs with α ≤ q.
    "x157_conformal_coverage" -> ((s, d) => {
      val scored = documents(s, d)
        .select(col("doc_id"),
          expr("""size(split(text, ' ')) * 1000000L
                 | div greatest(length(text), 1L)""".stripMargin).as("alpha"))
      val cal = scored.filter(col("doc_id") % 2 === 0)
      val tst = scored.filter(col("doc_id") % 2 === 1)
      // value-bounded histogram of calibration α + cumulative count;
      // the window orders ≤ 1e6 distinct ppm values, not corpus rows
      val hist = cal.groupBy(col("alpha")).agg(count(lit(1)).as("c"))
        .withColumn("cum", sum(col("c")).over(
          Window.orderBy(col("alpha"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val nCal = cal.agg(count(lit(1)).as("n_cal"))
      // q = min α with cum ≥ k; k > n_cal (tiny corpora) ⇒ no such α ⇒
      // the conformal bound is +∞ — spelled as Long.MaxValue
      val q = hist.crossJoin(nCal)
        .filter(col("cum") >= expr("(9L * (n_cal + 1L) + 9L) div 10L"))
        .agg(coalesce(min(col("alpha")), lit(Long.MaxValue)).as("q_alpha"))
      // groupBy on a constant, not a global agg (review fix): an EMPTY
      // test split must yield ZERO rows on both engines — the oracle's
      // GROUP BY does, and Spark's global .agg() would emit one
      // NULL-filled row instead.
      tst.crossJoin(broadcast(q)).crossJoin(nCal)
        .groupBy(lit(1).as("_g"))
        .agg(
          first(col("n_cal")).as("n_cal"),
          expr("(9L * (first(n_cal) + 1L) + 9L) div 10L").as("k"),
          first(col("q_alpha")).as("q_alpha_ppm"),
          count(lit(1)).as("n_test"),
          sum(when(col("alpha") <= col("q_alpha"), 1L).otherwise(0L))
            .as("n_covered"))
        .select(col("n_cal"), col("k"), col("q_alpha_ppm"), col("n_test"),
          col("n_covered"),
          expr("n_covered * 1000000L div greatest(n_test, 1L)")
            .as("coverage_ppm"))
    }),

    // X158 SPEARMAN RHO between s1 = char length and s2 = distinct-token
    // ratio (ppm). Ranks are 1-based row_numbers over (signal, doc_id)
    // — the deterministic-total-order convention, NOT average ranks
    // (documented; oracle identical). rho = 1 − 6Σd²/(n(n²−1)) in ppm
    // via the two-step floor (headroom note in the object doc).
    "x158_spearman" -> ((s, d) => {
      val scored = signals(s, d)
      val r1 = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s1")),
          Seq(col("s1"), col("doc_id")), "z1")
        .select(col("doc_id"), (col("z1") + 1L).as("r1"))
      val r2 = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s2")),
          Seq(col("s2"), col("doc_id")), "z2")
        .select(col("doc_id"), (col("z2") + 1L).as("r2"))
      r1.join(r2, Seq("doc_id"))
        .agg(count(lit(1)).as("n"),
          sum(expr("(r1 - r2) * (r1 - r2)")).as("sum_d2"))
        .select(col("n"), col("sum_d2"),
          expr("""1000000L - ((6L * sum_d2 div greatest(n, 1L)) * 1000000L
                 | div greatest(n * n - 1L, 1L))""".stripMargin)
            .as("rho_ppm"))
    }),
  )

  /** The signal pair shared by x158, x159 and x160 (the sign-agreement
    * specs rely on them being the SAME two definitions — one helper,
    * not copies): s1 = char length, s2 = distinct-token ratio (ppm). */
  private[graft] def signals(s: SparkSession, d: String): DataFrame =
    documents(s, d)
      .select(col("doc_id"),
        length(col("text")).cast("long").as("s1"),
        expr("""size(array_distinct(split(text, ' '))) * 1000000L
               | div greatest(size(split(text, ' ')), 1L)""".stripMargin)
          .as("s2"))

  /** The ORACLE's level source, derived from the data exactly like the
    * engine's [[tauLevelsFor]] (round-10 symmetry fix — VERDICT r9:
    * the oracle previously unrolled a FIXED 24 levels, which agreed
    * with the adaptive engine at every SF the oracle runs — extra
    * engine levels are all-zero no-ops below 2^24 rows — but would
    * silently UNDERCOUNT inversions on a >16M-row oracle corpus; now
    * both sides derive bits(cnt − 1) from the same count). `cntExpr`
    * is the aggregate whose bit length bounds the 0-based y-ranks —
    * count(*) over `sc` for x159's permutation ranks, count(DISTINCT
    * s2) for x160's dense ranks. Rendered as a derived-table level
    * source: bin(x) is DuckDB's integer→binary-string, so
    * length(bin(cnt−1)) IS the engine's 64 − nlz(cnt−1); the engine's
    * n ≤ 1 → 1-level floor is the CASE arm. */
  private[graft] def tauLevelsSqlFrom(cntExpr: String): String =
    s"""(SELECT unnest(range(0, (SELECT CASE WHEN $cntExpr <= 1 THEN 1
       |    ELSE length(bin(CAST($cntExpr - 1 AS BIGINT))) END
       |  FROM sc))) AS l)""".stripMargin

  /** Exact level count for an n-row 0-based rank permutation: the bit
    * length of n−1 (every y-rank fits in this many bits, and any pair
    * first differs at one of them). n ≤ 1 has no pairs — one level
    * keeps the explode shape valid. */
  def tauLevelsFor(n: Long): Int =
    if (n <= 1L) 1 else 64 - java.lang.Long.numberOfLeadingZeros(n - 1L)

  val queries2: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X159 KENDALL'S TAU — exact inversion counting WITHOUT the O(n²)
    // pair join: every discordant pair (pos_i < pos_j, y_i > y_j) first
    // differs at exactly ONE bit level ℓ of the 0-based y-ranks (they
    // share the prefix y >> (ℓ+1), and bit ℓ is 1 for the earlier/larger
    // element, 0 for the later/smaller), so
    //   inversions = Σ_ℓ Σ_{bit=0 elements} (# bit=1 elements earlier in
    //                pos order within the same (ℓ, prefix) group)
    // — i.e., EXPLODE each element into 24 (level, prefix) rows, then
    // per-partition linear passes + an O(P)-bounded boundary combine
    // (see the inline scale note — NOT a plain window: the top levels'
    // groups hold the whole corpus). This is a distributed merge sort:
    // n·24 rows, one range shuffle, one tiny combine window, one
    // aggregate — never the n² cross join the textbook implies. Ranks
    // are the same deterministic total orders as x158 (doc_id
    // tie-break), so the y-ranks form a permutation and tau-a needs no
    // tie terms. tau_ppm = 1e6 − 4·inv·1e6 div (n(n−1)) in ONE floor
    // (see the select's headroom note). Spearman (x158) and this must
    // agree in sign on the same signal pair — the spec asserts it.
    "x159_kendall_tau" -> ((s, d) => {
      val scored = signals(s, d)
      // Level count from n — ONE cheap count job before the explode
      // (round-9 fix): a fixed constant silently drops every inversion
      // whose y-ranks first differ above its top bit once n exceeds
      // 2^levels, and a shared oracle constant cannot catch it.
      val levels = tauLevelsFor(scored.count())
      val px = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s1")),
          Seq(col("s1"), col("doc_id")), "px")
        .select(col("doc_id"), col("px"))
      val y0 = GlobalSeq.withSeq(
          scored.select(col("doc_id"), col("s2")),
          Seq(col("s2"), col("doc_id")), "y0")
        .select(col("doc_id"), col("y0"))
      tauKernel(s, px.join(y0, Seq("doc_id")), levels)
    }),
  )

  /** The x159 inversion-counting kernel over a ranked frame with
    * columns `px` (position rank — ORDER-ONLY, any base: the kernel
    * never reads px values, only their sort order) and `y0` (0-based
    * value rank; may carry ties — tied pairs share every bit and
    * contribute zero), exploded over `levels` bit levels.
    * Exposed for the scale specs: `levels` MUST be ≥
    * [[tauLevelsFor]](n) for an exact count (the catalog entry derives
    * it; the spec's negative control forces one fewer to prove the
    * derivation is load-bearing). */
  private[graft] def tauKernel(s: SparkSession, ranked: DataFrame,
      levels: Int): DataFrame = {
      require(levels >= 1 && levels <= 62, s"tau levels out of range: $levels")
      val lv = ranked
        .select(col("px"), col("y0"),
          explode(expr(s"sequence(0, ${levels - 1})")).as("l"))
        .select(col("px").cast("long"), col("l").cast("int"),
          expr("shiftright(y0, l + 1)").as("grp"),
          expr("shiftright(y0, l) & 1L").as("bit"))
      // The top bit levels put the WHOLE corpus into a handful of (l,
      // grp) groups (level L−1 is literally one group of n rows), so a
      // plain running-sum window would funnel corpus-scale data through
      // one task (review finding, round 8). Exact distributed spelling
      // instead: range-partition by (l, grp, px) — within a group,
      // partition order IS px order — then ONE linear per-partition
      // pass emits (ones, zeros, local inversions) per (l, grp) run,
      // and the cross-partition term Σ_p zeros_p · (ones in earlier
      // partitions) needs a window over ≤ P rows per group — bounded by
      // PARTITION COUNT, never by corpus rows (the ChainFill/
      // BoundaryFill O(P) boundary-exchange family; mapPartitions is
      // justified here exactly as in ChainFill: a genuinely sequential
      // per-partition scan).
      import s.implicits._
      val parts = lv
        .repartitionByRange(col("l"), col("grp"), col("px"))
        .sortWithinPartitions(col("l"), col("grp"), col("px"))
        .select(col("l"), col("grp"), col("px"), col("bit"))
        .as[(Int, Long, Long, Long)]
        .mapPartitions { it =>
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(Int, Long, Int, Long, Long, Long)]
          var curL = -1; var curG = 0L
          var ones = 0L; var zeros = 0L; var inv = 0L
          def flush(): Unit =
            if (curL >= 0) out += ((curL, curG, pid, ones, zeros, inv))
          for ((l, g, _, bit) <- it) {
            if (l != curL || g != curG) {
              flush(); curL = l; curG = g; ones = 0L; zeros = 0L; inv = 0L
            }
            if (bit == 1L) ones += 1L
            else { zeros += 1L; inv += ones }
          }
          flush()
          out.iterator
        }.toDF("l", "grp", "pid", "ones", "zeros", "local_inv")
      val w = Window.partitionBy(col("l"), col("grp")).orderBy(col("pid"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      parts
        .withColumn("ones_before", sum(col("ones")).over(w) - col("ones"))
        .agg(
          sum(when(col("l") === 0, col("ones") + col("zeros"))
            .otherwise(0L)).as("n"),
          sum(col("local_inv") + col("zeros") * col("ones_before"))
            .as("n_inversions"))
        .select(col("n"), col("n_inversions"),
          // ONE-step floor (review fix): the x158-style two-step form
          // divides by n first and then by only (n−1), so its floor
          // error is up to 1e6/(n−1) ppm — material at small n (x158's
          // second divisor is n²−1, where the same trick costs ≤1 ppm).
          // 4·inv·1e6 ≤ 2e6·n² stays in BIGINT up to n ≈ 2.1M — the
          // family's documented fixed-point-shift boundary (x151 rule).
          expr("""1000000L - (4L * n_inversions * 1000000L
                 | div greatest(n * (n - 1L), 1L))""".stripMargin)
            .as("tau_ppm"))
  }

  val oracleSql: Map[String, String] = Map(
    "x159_kendall_tau" ->
      s"""WITH sc AS (SELECT doc_id,
         |    CAST(length(text) AS BIGINT) AS s1,
         |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
         |      * 1000000
         |      // greatest(len(string_split(text, ' ')), 1) AS s2
         |  FROM documents),
         |rk AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY s1, doc_id) AS BIGINT) AS px,
         |    CAST(row_number() OVER (ORDER BY s2, doc_id) - 1 AS BIGINT)
         |      AS y0
         |  FROM sc),
         |lv AS (SELECT px, l,
         |    y0 >> CAST(l + 1 AS INT) AS grp,
         |    (y0 >> CAST(l AS INT)) & 1 AS bit
         |  FROM rk, ${tauLevelsSqlFrom("count(*)")} ls),
         |cum AS (SELECT l, bit,
         |    sum(bit) OVER (PARTITION BY l, grp ORDER BY px
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - bit
         |      AS ones_before
         |  FROM lv),
         |ag AS (SELECT
         |    CAST(sum(CASE WHEN l = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN bit = 0 THEN ones_before ELSE 0 END)
         |      AS BIGINT) AS n_inversions
         |  FROM cum)
         |SELECT n, n_inversions,
         |  CAST(1000000 - (4 * n_inversions * 1000000
         |    // greatest(n * (n - 1), 1)) AS BIGINT) AS tau_ppm
         |FROM ag""".stripMargin,

    "x157_conformal_coverage" ->
      """WITH sc AS (SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) * 1000000
        |      // greatest(length(text), 1) AS alpha
        |  FROM documents),
        |cal AS (SELECT alpha FROM sc WHERE doc_id % 2 = 0),
        |tst AS (SELECT alpha FROM sc WHERE doc_id % 2 = 1),
        |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
        |hist AS (SELECT alpha, count(*) AS c,
        |    sum(count(*)) OVER (ORDER BY alpha
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM cal GROUP BY alpha),
        |q AS (SELECT coalesce(min(alpha), 9223372036854775807) AS q_alpha
        |  FROM hist, nc
        |  WHERE cum >= (9 * (n_cal + 1) + 9) // 10)
        |SELECT nc.n_cal,
        |  CAST((9 * (n_cal + 1) + 9) // 10 AS BIGINT) AS k,
        |  CAST(q_alpha AS BIGINT) AS q_alpha_ppm,
        |  CAST(count(*) AS BIGINT) AS n_test,
        |  CAST(sum(CASE WHEN tst.alpha <= q_alpha THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_covered,
        |  CAST(sum(CASE WHEN tst.alpha <= q_alpha THEN 1 ELSE 0 END)
        |    * 1000000 // greatest(count(*), 1) AS BIGINT) AS coverage_ppm
        |FROM tst, q, nc GROUP BY nc.n_cal, q_alpha""".stripMargin,

    "x158_spearman" ->
      """WITH sc AS (SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS s1,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |      * 1000000
        |      // greatest(len(string_split(text, ' ')), 1) AS s2
        |  FROM documents),
        |rk AS (SELECT doc_id,
        |    CAST(row_number() OVER (ORDER BY s1, doc_id) AS BIGINT) AS r1,
        |    CAST(row_number() OVER (ORDER BY s2, doc_id) AS BIGINT) AS r2
        |  FROM sc),
        |ag AS (SELECT CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum((r1 - r2) * (r1 - r2)) AS BIGINT) AS sum_d2
        |  FROM rk)
        |SELECT n, sum_d2,
        |  CAST(1000000 - ((6 * sum_d2 // greatest(n, 1)) * 1000000
        |    // greatest(n * n - 1, 1)) AS BIGINT) AS rho_ppm
        |FROM ag""".stripMargin,
  )
}
