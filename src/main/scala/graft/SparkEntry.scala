package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    *
    * SURVEY §7.5: the reference's core slice (cleaned name + category per
    * entity in feed order, main.py:572–636) re-shaped onto driver data:
    * customer ⨝ nation (broadcast) with normalized names, in key order.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val c = spark.read.parquet(s"$d/customer.parquet")
    val n = spark.read.parquet(s"$d/nation.parquet")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("c_custkey"),
        initcap(regexp_replace(trim(col("c_name")), "\\s+", " ")).as("full_name"),
        initcap(lower(col("n_name"))).as("nation"),
        col("c_mktsegment").as("category"))
      .orderBy(col("c_custkey"))
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every constructor is wrapped so that building a query first releases
    * the intra-query persists registered by previously built queries
    * ([[GraftCaches]]): running the catalog back-to-back keeps at most one
    * query's caches in storage without any caller-side clearCache
    * convention. (Interleaved construction stays correct — released
    * caches recompute on their next action.) */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, f) =>
      name -> { (s: SparkSession, d: String) =>
        GraftCaches.releasePrior()
        f(s, d)
      }
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++
      graft.queries.Windows.queries ++
      graft.queries.Relational.queries ++
      graft.queries.Ext.queries ++
      graft.queries.Ext2.queries ++
      graft.queries.Ext3.queries ++
      graft.queries.Ext4.queries ++
      graft.queries.Ext5.queries ++
      graft.queries.Ext6.queries ++
      graft.queries.Ext7.queries ++
      graft.queries.Ext8.queries ++
      graft.queries.Ext9.queries ++
      graft.queries.Ext10.queries ++
      graft.queries.Ext11.queries ++
      graft.queries.Ext12.queries ++
      graft.queries.Ext13.queries ++
      graft.queries.Ext14.queries ++
      graft.queries.Ext15.queries ++
      graft.queries.Ext16.queries ++
      graft.queries.Ext17.queries ++
      graft.queries.Ext18.queries ++
      graft.queries.Ext19.queries ++
      graft.queries.Ext20.queries ++
      graft.queries.Ext21.queries ++
      graft.queries.Ext22.queries ++
      graft.queries.Ext23.queries ++
      graft.queries.Ext24.queries ++
      graft.queries.Ext25.queries ++
      graft.queries.Ext26.queries ++
      graft.queries.Ext27.queries ++
      graft.queries.Ext28.queries ++
      graft.queries.Ext29.queries ++
      graft.queries.Ext30.queries ++
      graft.queries.Ext31.queries ++
      graft.queries.Ext32.queries ++
      graft.queries.Ext33.queries ++
      graft.queries.Ext34.queries ++
      graft.queries.Ext35.queries ++
      graft.queries.Ext36.queries ++
      graft.queries.Ext37.queries ++
      graft.queries.Ext38.queries ++
      graft.queries.Ext39.queries ++
      graft.queries.Ext40.queries ++
      graft.queries.Ext41.queries ++
      graft.queries.Ext42.queries ++
      graft.queries.Ext43.queries ++
      graft.queries.Ext44.queries ++
      graft.queries.Ext45.queries ++
      graft.queries.Ext46.queries ++
      graft.queries.Ext47.queries ++
      graft.queries.Ext48.queries ++
      graft.queries.Ext49.queries ++
      graft.queries.Ext50.queries ++
      graft.queries.Ext51.queries ++
      graft.queries.Ext52.queries ++
      graft.queries.Ext53.queries ++
      graft.queries.Ext54.queries ++
      graft.queries.Ext55.queries ++
      graft.queries.Ext56.queries ++
      graft.queries.Ext57.queries ++
      graft.queries.Ext58.queries ++
      graft.queries.Ext59.queries ++
      graft.queries.Ext60.queries ++
      graft.queries.Ext61.queries

  /** Oracles where FULL-CTE materialization measured ≥ ~2× faster at
    * sf0.1 (ORACLE_MAT_PROFILE.json, round 11 — DuckDB 1.x re-inlines a
    * CTE at every reference, so multi-consumer CTE chains re-execute):
    * applied as a rendering transform so the source SQL keeps the
    * readable inlined spelling. NOT blanket-applied — the same profile
    * measured j9_interval_join 10.7× SLOWER materialized (it defeats a
    * pushdown), x176/a5 2–4× slower; the allowlist is the measurement.
    * The injection regex is the profiler's (`name AS (` → `name AS
    * MATERIALIZED (`), which ran clean across all 273 oracles. */
  private[graft] val materializeAll: Set[String] = Set(
    "x94_semantic_dedup", "x17_dedup_groups", "x58_cluster_merge",
    "x118_pair_transitivity", "x102_containment", "x66_triangle_count",
    "x138_label_propagation", "x81_minhash_decontam", "x76_nfd_pack",
    "x132_threshold_sweep", "x44_sketch_accuracy", "x78_ffd_pack",
    "x61_seq_pack", "x60_bpe_merges",
    // second adoption pass — the >0.5 s-absolute measured wins the
    // first ≥2×-ratio cut left on the table (x4 alone is 15.6 s, the
    // largest single win in the profile; x156 re-gated on the k-limb
    // corpus after adoption)
    "x4_ngram_jaccard", "x156_wer", "x145_video_neardup",
    "x22_simhash_neardup", "x57_source_overlap", "x3_minhash_lsh",
    "x52_incremental_dedup",
    // round 13: the REM2-complete cols oracle chains ~28 CTEs with
    // several referenced twice (ds2, pname, fstat, fp2 output) —
    // re-inlined it costs 4.5–7.9 s on a 9-ROW fixture; materialized
    // 0.74 s, hash-identical (MATERIALIZED is accepted on the genuinely
    // self-referencing pscan/fp2/fp3 heads too; all 28 regex sites
    // hand-audited as real CTE heads, no WINDOW clause present)
    "pipeline_sanctions_cols",
    // round 14 (VERDICT r13 #1/#2): the e2e and unicode oracles are the
    // SAME CTE chain as the cols twin (wider projection / swapped
    // Unicode spellings) — identical 28 audited CTE heads, identical
    // materialization economics
    "pipeline_sanctions_e2e",
    "pipeline_sanctions_unicode")

  private[graft] def injectMat(sql: String): String =
    // (?i) matches the profiler's CTE_HEAD regex (case-insensitive) so
    // a lowercase/mixed-case CTE head can't be measured materialized by
    // the profile yet ship un-materialized.
    sql.replaceAll("""(?i)\b([A-Za-z_][A-Za-z0-9_]*\s+AS)\s*\(""",
      "$1 MATERIALIZED (")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = oracleSqlRaw.map { case (k, v) =>
    k -> (if (materializeAll(k)) injectMat(v) else v)
  }

  private[graft] def oracleSqlRaw: Map[String, String] =
    graft.queries.Core.oracleSql ++
      graft.queries.Windows.oracleSql ++
      graft.queries.Relational.oracleSql ++
      graft.queries.Ext.oracleSql ++
      graft.queries.Ext2.oracleSql ++
      graft.queries.Ext3.oracleSql ++
      graft.queries.Ext4.oracleSql ++
      graft.queries.Ext5.oracleSql ++
      graft.queries.Ext6.oracleSql ++
      graft.queries.Ext7.oracleSql ++
      graft.queries.Ext8.oracleSql ++
      graft.queries.Ext9.oracleSql ++
      graft.queries.Ext10.oracleSql ++
      graft.queries.Ext11.oracleSql ++
      graft.queries.Ext12.oracleSql ++
      graft.queries.Ext13.oracleSql ++
      graft.queries.Ext14.oracleSql ++
      graft.queries.Ext15.oracleSql ++
      graft.queries.Ext16.oracleSql ++
      graft.queries.Ext17.oracleSql ++
      graft.queries.Ext18.oracleSql ++
      graft.queries.Ext19.oracleSql ++
      graft.queries.Ext20.oracleSql ++
      graft.queries.Ext21.oracleSql ++
      graft.queries.Ext22.oracleSql ++
      graft.queries.Ext23.oracleSql ++
      graft.queries.Ext24.oracleSql ++
      graft.queries.Ext25.oracleSql ++
      graft.queries.Ext26.oracleSql ++
      graft.queries.Ext27.oracleSql ++
      graft.queries.Ext28.oracleSql ++
      graft.queries.Ext29.oracleSql ++
      graft.queries.Ext30.oracleSql ++
      graft.queries.Ext31.oracleSql ++
      graft.queries.Ext32.oracleSql ++
      graft.queries.Ext33.oracleSql ++
      graft.queries.Ext34.oracleSql ++
      graft.queries.Ext35.oracleSql ++
      graft.queries.Ext36.oracleSql ++
      graft.queries.Ext37.oracleSql ++
      graft.queries.Ext38.oracleSql ++
      graft.queries.Ext39.oracleSql ++
      graft.queries.Ext40.oracleSql ++
      graft.queries.Ext41.oracleSql ++
      graft.queries.Ext42.oracleSql ++
      graft.queries.Ext43.oracleSql ++
      graft.queries.Ext44.oracleSql ++
      graft.queries.Ext45.oracleSql ++
      graft.queries.Ext46.oracleSql ++
      graft.queries.Ext47.oracleSql ++
      graft.queries.Ext48.oracleSql ++
      graft.queries.Ext49.oracleSql ++
      graft.queries.Ext50.oracleSql ++
      graft.queries.Ext51.oracleSql ++
      graft.queries.Ext52.oracleSql ++
      graft.queries.Ext53.oracleSql ++
      graft.queries.Ext54.oracleSql ++
      graft.queries.Ext55.oracleSql ++
      graft.queries.Ext56.oracleSql ++
      graft.queries.Ext57.oracleSql ++
      graft.queries.Ext58.oracleSql ++
      graft.queries.Ext59.oracleSql ++
      graft.queries.Ext60.oracleSql ++
      graft.queries.Ext61.oracleSql
}
