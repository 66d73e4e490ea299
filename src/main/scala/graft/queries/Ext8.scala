package graft.queries

import graft.GraftCaches.TrackedPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.TextOps

/** Round-4 batches 5–7: BM25 relevance scoring (log-free, bit-portable),
  * co-occurrence mining (native pair kernel), EXISTS/NOT-EXISTS and
  * Q21-style decorrelation showcases (q8/q9), OHLC downsampling, the
  * custom per-key top-k catalog entry (w18), sequence pattern matching
  * (w19), trailing-window anomaly flags (w20), fuzzy-match join (j11),
  * and the tail of the dedup lifecycle — incremental probe (x52),
  * Gopher-rule gate (x53), verbatim-substring decontamination (x54),
  * boilerplate scoring (x55), cross-source overlap matrix (x57) and
  * cluster merge / gold record (x58).
  *
  * Determinism rules as everywhere in the catalog (ROUND_NOTES.md):
  * integer multiply-through predicates; exact decimal sums; float
  * formulas cast every leaf to double with the identical IEEE op
  * sequence on both engines; every result ordered by a unique key.
  */
object Ext8 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X4s BM25 TOP-K: per document, the 3 highest-BM25 terms. The classic
    // formula is idf·tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) with k1=1.2,
    // b=0.75; the idf factor uses the catalog's log-free N/df substitute
    // (x18's rule — log is not bit-portable across engines, ranking is
    // monotone either way). Plan shape = x18 plus one extra broadcast
    // (the 1-row corpus avgdl): tf and df aggregations shuffle on their
    // keys (both partial-aggregable), document length joins back on
    // doc_id, and the top-3 is a per-doc window — no global sort.
    "x50_bm25_topk" -> ((s, d) => {
      val docs = documents(s, d)
      val tok = docs.repartition(col("doc_id"))
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tfreq"))
      val dl = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val g = docs.agg(count(lit(1)).as("n"),
        sum(size(TextOps.words(col("text"))).cast("long")).as("toks"))
        .select(col("n"), (col("toks").cast("double") / col("n")).as("avgdl"))
      val tfd = col("tfreq").cast("double")
      val score = tfd * lit(2.2) /
        (tfd + lit(1.2) * (lit(0.25) +
          lit(0.75) * (col("dl").cast("double") / col("avgdl")))) *
        col("n").cast("double") / col("df").cast("double")
      tf.join(dl, "doc_id").join(dfq, "term").crossJoin(broadcast(g))
        .select(col("doc_id"), col("term"), score.as("bm25"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("bm25").desc, col("term"))))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("rnk"), col("term"),
          Ext.trunc6(col("bm25")).as("bm25_6"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // Q8 EXISTS / NOT-EXISTS DECORRELATION: the other half of q6's
    // showcase — correlated EXISTS predicates, which Catalyst rewrites to
    // semi/anti joins (PlanSpec pins that no per-row subquery survives).
    // Customers with a 1995 urgent order but no low-priority order ever:
    // one semi + one anti join, both equi on the customer key.
    "q8_exists_anti" -> ((s, d) => {
      graft.tables.Tables.registerViews(s, d)
      s.sql("""
        SELECT c_custkey, c_mktsegment
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
              AND year(o.o_orderdate) = 1995)
          AND NOT EXISTS (SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '5-LOW')
        ORDER BY c_custkey""")
    }),

    // W17 OHLC DOWNSAMPLING: per user and 6-hour bucket, the
    // open/high/low/close candle every time-series store materializes.
    // Open/close pick the first/last event by the unique (tus, event_id)
    // ordering via row_number (portable — no min_by/arg_min tie
    // ambiguity); high/low are plain partial-aggregable min/max. One
    // shuffle on (user_id, bucket) serves both windows and the rollup.
    "w17_ohlc" -> ((s, d) => {
      val bkt = 21600000000L // 6h in micros
      val e = events(s, d).select(col("user_id"), col("value"),
        expr("ts_ns div 1000").as("tus"), col("event_id"))
        .withColumn("bucket", expr(s"tus div $bkt"))
      val wAsc = Window.partitionBy(col("user_id"), col("bucket"))
        .orderBy(col("tus"), col("event_id"))
      val wDesc = Window.partitionBy(col("user_id"), col("bucket"))
        .orderBy(col("tus").desc, col("event_id").desc)
      e.withColumn("rna", row_number().over(wAsc))
        .withColumn("rnd", row_number().over(wDesc))
        .groupBy(col("user_id"), col("bucket"))
        .agg(count(lit(1)).as("n"),
          max(when(col("rna") === 1, col("value"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max(when(col("rnd") === 1, col("value"))).as("close"))
        .orderBy(col("user_id"), col("bucket"))
    }),

    // W18 NATIVE PER-KEY TOP-K — the catalog entry for the custom
    // whole-operator plan (plans.TopKPerKey: logical node + planner
    // strategy + partial/final bounded-heap SparkPlan, injected via
    // SparkSessionExtensions). Top-3 lineitems per return flag by
    // (price desc, orderkey, linenumber — a total order, so the k
    // boundary is deterministic). Unlike the window spelling the
    // oracle uses, no partition is ever sorted and the shuffle carries
    // at most k rows per (upstream partition, key).
    "w18_topk_native" -> ((s, d) => {
      val src = lineitem(s, d).select(col("l_returnflag"), col("l_orderkey"),
        col("l_linenumber"), col("l_extendedprice"))
      graft.ext.TopK.perKey(src,
          keys = Seq(col("l_returnflag")),
          order = Seq(col("l_extendedprice").desc, col("l_orderkey"),
            col("l_linenumber")),
          k = 3)
        .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
    }),

    // X2k CLUSTER MERGE (gold record): the last step of the dedup
    // lifecycle — after pairs (x3) cluster into groups (x17) and a
    // canonical survives (x31), the group's ATTRIBUTES merge into one
    // record: member count, canonical id (min), the sorted distinct
    // source list, total/max token counts. Multi-doc clusters only. Every
    // aggregate is partial-aggregable except the bounded source list
    // (collect_set over a handful of feeds); the cluster ids come from
    // the same distributed min-label components as x17.
    "x58_cluster_merge" -> ((s, d) => {
      import graft.ext.Components
      val pairs = Ext.lshVerifiedPairs(s, d, 0.5).select(col("id1"), col("id2"))
      val nodes = documents(s, d).select(col("doc_id").as("id"))
      val clusters = Components.connectedComponents(nodes, pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
      clusters.join(documents(s, d), "doc_id")
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          min(col("doc_id")).as("canonical_id"),
          concat_ws(",", array_sort(collect_set(col("source")))).as("sources"),
          sum(size(TextOps.words(col("text"))).cast("long")).as("total_tokens"),
          max(size(TextOps.words(col("text"))).cast("long")).as("max_tokens"))
        .filter(col("n_members") >= 2)
        .orderBy(col("cluster_id"))
    }),

    // X2j CROSS-SOURCE OVERLAP MATRIX: near-dup pair counts bucketed by
    // the (source, source) pair — the contamination matrix a curation
    // team reads to decide which feeds double-ingest each other. Reuses
    // the x3 LSH candidate+verify machinery (banded equi join, exact
    // Jaccard ≥ 0.5), then one broadcast-size source lookup per side and
    // a partial-aggregable rollup over the unordered source pair.
    "x57_source_overlap" -> ((s, d) => {
      val src = documents(s, d).select(col("doc_id"), col("source"))
      Ext.lshVerifiedPairs(s, d, 0.5)
        .join(src.select(col("doc_id").as("id1"), col("source").as("s1")), "id1")
        .join(src.select(col("doc_id").as("id2"), col("source").as("s2")), "id2")
        .select(least(col("s1"), col("s2")).as("src_a"),
          greatest(col("s1"), col("s2")).as("src_b"))
        .groupBy(col("src_a"), col("src_b"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("src_a"), col("src_b"))
    }),

    // Q9 MULTI-CORRELATED SELF-JOIN (TPC-H Q21 shape): suppliers who were
    // the SOLE late shipper on a multi-supplier order — one EXISTS and one
    // NOT EXISTS over the same fact table with different correlations,
    // which Catalyst turns into a semi + anti self-join pair (no per-row
    // subquery survives). "Late" = shipped more than 60 days after the
    // order date (exact integer day arithmetic on epoch micros — no
    // engine-specific date functions).
    // Round 14 (optimization, guide §2.4): the former SQL spelling's
    // `late` CTE was INLINED at both references (Catalyst does not
    // materialize WITH), so the plan scanned lineitem 3× and orders 2×
    // (plans/r14/q9_sole_late_supplier_before.txt). The DataFrame
    // spelling persists `late` once: 2 lineitem scans + 1 orders scan,
    // anti side reads the cache — at 100 TB that removes one full pass
    // over the fact table. Semi/anti conditions and output are
    // byte-identical to the SQL form (same oracle, re-gated;
    // BENCH_AB_r14_sharedsubtrees.json).
    "q9_sole_late_supplier" -> ((s, d) => {
      val late = lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey") &&
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) - " +
              "unix_micros(CAST(o_orderdate AS TIMESTAMP)) > 60 * 86400000000"))
        .select(col("l_orderkey"), col("l_suppkey"))
        .persistTracked()
      late
        .join(lineitem(s, d)
            .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls")),
          col("l_orderkey") === col("lo") && col("l_suppkey") =!= col("ls"),
          "left_semi")
        .join(late.select(col("l_orderkey").as("ro"), col("l_suppkey").as("rs")),
          col("l_orderkey") === col("ro") && col("l_suppkey") =!= col("rs"),
          "left_anti")
        .groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("numwait"))
        .select(col("l_suppkey").as("suppkey"), col("numwait"))
        .orderBy(col("numwait").desc, col("suppkey"))
    }),

    // X4v BOILERPLATE / FAMILIARITY SCORE: score each document by how
    // corpus-common its bigrams are — high scorers are templated or
    // boilerplate text (every bigram appears everywhere), low scorers are
    // novel prose. The LM-lite cousin of perplexity with no log and no
    // model: the corpus bigram document-frequency table (one shuffle,
    // partial-aggregable — x39's stat) joins back to each doc's distinct
    // bigrams, and the score is the exact integer mean df (sum·1 div
    // count). Top-15 most boilerplate docs, ties to the lower id.
    "x55_boilerplate_score" -> ((s, d) => {
      val w = TextOps.words(col("text"))
      val bigrams = documents(s, d)
        .select(col("doc_id"), explode(TextOps.ngramsDistinct(w, 2)).as("bg"))
      val dfq = bigrams.groupBy(col("bg"))
        .agg(count(lit(1)).as("df"))
      bigrams.join(dfq, "bg")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("sum_df"))
        .select(col("doc_id"), col("n_bigrams"),
          expr("sum_df div n_bigrams").as("mean_df"))
        .orderBy(col("mean_df").desc, col("doc_id"))
        .limit(15)
    }),

    // X2i VERBATIM-SUBSTRING DECONTAMINATION: find training docs that
    // contain a benchmark string VERBATIM — the exact-match sweep run
    // after x25's shingle-overlap pass (overlap finds paraphrases;
    // verbatim finds quotes). Needles are word-aligned spans of a
    // deterministic held-out set (docs id%50=0, words 3..7). The naive
    // spelling is contains() over all (needle, doc) pairs — a nested
    // loop; the scalable spelling blocks on the needle's leading 3-gram
    // against the doc's 3-gram SET (the same native shingle kernel the
    // dedup family uses), so only docs sharing the leading gram are
    // contains()-verified. Self-matches excluded; integer output.
    "x54_substring_decontam" -> ((s, d) => {
      val w = TextOps.words(col("text"))
      val needles = documents(s, d)
        .filter(col("doc_id") % 50 === 0 && size(w) >= 7)
        .select(col("doc_id").as("needle_id"),
          array_join(slice(w, 3, 5), " ").as("needle"),
          array_join(slice(w, 3, 3), " ").as("lead3"))
      val grams = documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(TextOps.shingles3(w)).as("g"))
      grams.join(needles,
          col("g") === col("lead3") && col("doc_id") =!= col("needle_id"))
        .filter(col("text").contains(col("needle")))
        .select(col("needle_id"), col("doc_id")).distinct()
        .groupBy(col("needle_id"))
        .agg(count(lit(1)).as("n_contaminated"),
          min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
        .orderBy(col("needle_id"))
    }),

    // J11 FUZZY-MATCH JOIN (entity resolution): match corrupted record
    // titles back to their sources with an edit-distance verify — the
    // approximate-string join under every dedup/linkage system (and the
    // sanctions matcher's cousin: blocking key ≈ the F5 name variants).
    // The dirty side is derived deterministically (1 in 3 titles gets its
    // last char replaced, re-keyed +1e6) and replayed by the oracle. The
    // join is NEVER all-pairs: candidates come from equality on a 12-char
    // blocking prefix (the perturbation only touches the tail), then
    // levenshtein — identical classic edit distance in both engines —
    // verifies within the block. Integer output only.
    "j11_fuzzy_match" -> ((s, d) => {
      val titles = documents(s, d)
        .select(col("doc_id"), substring(col("text"), 1, 40).as("title"))
      val dirty = titles.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + 1000000L).as("dirty_id"),
          concat(substring(col("title"), 1, 39), lit("x")).as("dtitle"))
      val cand = titles
        .join(dirty, substring(col("title"), 1, 12) === substring(col("dtitle"), 1, 12))
      cand.select(col("doc_id"), col("dirty_id"),
          levenshtein(col("title"), col("dtitle")).cast("long").as("dist"))
        .filter(col("dist") <= 2)
        .groupBy(col("dist"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(col("doc_id")).as("src_id_sum"),
          sum(col("dirty_id")).as("dirty_id_sum"))
        .orderBy(col("dist"))
    }),

    // W20 TRAILING-WINDOW ANOMALY FLAG: each event compared against the
    // mean/variance of its user's previous 10 events — the online outlier
    // gate every metrics pipeline runs. All math is exact integers on
    // milli-scaled values: the 2σ test (v−μ)² > 4σ² is multiplied through
    // to (v·n−Σ)² > 4·(n·Σx²−Σ²) over bigint/decimal sums, so no float
    // division, sqrt, or summation order exists on either engine. One
    // shuffle on user_id; the trailing frame is a ROWS window.
    "w20_trailing_anomaly" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("tus"), col("event_id"))
        .rowsBetween(-10, -1)
      val e = events(s, d).select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("tus"),
        floor(col("value") * 1000.0).cast("long").as("vm"))
      e.withColumn("n", count(col("vm")).over(w))
        .withColumn("sv", sum(col("vm")).over(w))
        .withColumn("svv", sum((col("vm") * col("vm")).cast("decimal(38,0)")).over(w))
        .filter(col("n") >= 3)
        .withColumn("dev", (col("vm") * col("n") - col("sv")).cast("decimal(38,0)"))
        .withColumn("anom",
          col("dev") * col("dev") >
            (col("svv") * col("n") - col("sv").cast("decimal(38,0)") *
              col("sv").cast("decimal(38,0)")) * 4)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_tested"),
          sum(when(col("anom"), 1L).otherwise(0L)).as("n_anomalies"),
          sum(when(col("anom"), col("event_id")).otherwise(0L)).as("anom_id_sum"))
        .orderBy(col("user_id"))
    }),

    // X4u GOPHER-STYLE RULE FILTER: the absolute-threshold quality gate
    // every web-scale text pipeline runs before training (word-count
    // bounds, mean word length bounds, type-token ratio floor, stopword
    // presence) — the rule-flag counterpart of x21's per-source percentile
    // gate. Every predicate is multiplied through to integers (len·n
    // comparisons, never a float ratio), so the flags are bit-stable; the
    // whole thing is one scan of per-row expressions plus the final
    // rollup — no shuffle before the aggregate at any corpus size.
    "x53_gopher_rules" -> ((s, d) => {
      val stops = Seq("the", "and", "of", "to", "a")
      val w = TextOps.words(col("text"))
      documents(s, d)
        .select(col("doc_id"), w.as("w"), length(col("text")).as("nc"))
        .select(col("doc_id"),
          size(col("w")).cast("long").as("n_tokens"),
          size(array_distinct(col("w"))).cast("long").as("n_distinct"),
          size(filter(col("w"), x => x.isInCollection(stops))).cast("long")
            .as("n_stop"),
          col("nc").cast("long").as("n_chars"))
        .select(col("doc_id"), col("n_tokens"),
          (col("n_tokens") >= 5 && col("n_tokens") <= 100000).as("ok_count"),
          // mean word length in [3, 10]: chars include separators, so
          // compare total chars to token-count multiples (exact integers)
          (col("n_chars") >= col("n_tokens") * 3 &&
            col("n_chars") <= col("n_tokens") * 10).as("ok_wordlen"),
          // type-token ratio ≥ 0.2 ⇔ 5·distinct ≥ tokens
          (col("n_distinct") * 5 >= col("n_tokens")).as("ok_ttr"),
          (col("n_stop") >= 2).as("ok_stop"))
        .withColumn("pass",
          col("ok_count") && col("ok_wordlen") && col("ok_ttr") && col("ok_stop"))
        .groupBy(col("pass"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(when(col("ok_count"), 0L).otherwise(1L)).as("fail_count"),
          sum(when(col("ok_wordlen"), 0L).otherwise(1L)).as("fail_wordlen"),
          sum(when(col("ok_ttr"), 0L).otherwise(1L)).as("fail_ttr"),
          sum(when(col("ok_stop"), 0L).otherwise(1L)).as("fail_stop"))
        .orderBy(col("pass"))
    }),

    // X2h INCREMENTAL DEDUP: the production flow a batch pipeline actually
    // runs — a NEW batch (hash-sampled 10% of the corpus, x19's md5 rule)
    // probed against the EXISTING index (the other 90%), never
    // batch-vs-batch all-pairs. Candidates come from the shared LSH band
    // keys (an equi join of the small new side against the index — at
    // 100 TB the index side is the precomputed, bucketed store and only
    // the new batch is signed fresh); verification is the exact shingle
    // containment of the new doc in the old (inter = |new ∩ old|,
    // containment vs the NEW doc's size — the asymmetric measure that
    // catches a new doc quoting an indexed one). Integer output only.
    "x52_incremental_dedup" -> ((s, d) => {
      val h = TextOps.hash32(concat(lit("sample:"), col("doc_id").cast("string")))
      val sh = Ext.docShingles(documents(s, d))
        .withColumn("sig", TextOps.minhashSig(col("ss")))
        .withColumn("bucket", pmod(h, lit(100)))
        .persistTracked()
      val newB = sh.filter(col("bucket") < 10)
      val oldB = sh.filter(col("bucket") >= 10)
      val newKeys = newB.select(col("doc_id"),
        explode(TextOps.bandKeys(col("sig"), 4)).as("bk"))
      val oldKeys = oldB.select(col("doc_id").as("old_id"),
        explode(TextOps.bandKeys(col("sig"), 4)).as("bk"))
      val cand = newKeys.join(oldKeys, "bk")
        .select(col("doc_id").as("new_id"), col("old_id"))
        .distinct()
      cand
        .join(sh.select(col("doc_id").as("new_id"), col("ss").as("nss")), "new_id")
        .join(sh.select(col("doc_id").as("old_id"), col("ss").as("oss")), "old_id")
        .select(col("new_id"), col("old_id"),
          size(array_intersect(col("nss"), col("oss"))).cast("long").as("inter"),
          size(col("nss")).cast("long").as("n_new"),
          size(col("oss")).cast("long").as("n_old"))
        .filter(col("inter") * 2 >= col("n_new")) // containment ≥ 50% of new
        .orderBy(col("new_id"), col("old_id"))
    }),

    // W19 SEQUENCE PATTERN MATCH (MATCH_RECOGNIZE-lite): reconstruct each
    // user's time-ordered event-type sequence as a compact string (one
    // initial per event — sort_array over (tus, event_id) structs keeps
    // the order total and engine-independent) and match the
    // view→click→purchase subsequence with a plain LIKE pattern (LIKE
    // '%v%c%p%' = subsequence containment, identical semantics on both
    // engines — no regex dialect risk). Per-user state is bounded by the
    // user's event count, the same envelope as any sessionization; the
    // single shuffle is the groupBy on user_id.
    "w19_sequence_match" -> ((s, d) => {
      val e = events(s, d).select(col("user_id"),
        struct(expr("ts_ns div 1000").as("tus"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("ev"))
      e.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          array_join(transform(sort_array(collect_list(col("ev"))),
            x => x.getField("c")), "").as("seq"))
        .select(col("user_id"), col("n_events"),
          substring(col("seq"), 1, 20).as("seq20"),
          col("seq").like("%v%c%p%").as("has_funnel"))
        .orderBy(col("user_id"))
    }),

    // X4t CO-OCCURRENCE MINING: corpus-wide counts of token pairs that
    // appear in the same document — the PMI / word-association precursor
    // statistic. Pair generation is ROW-LOCAL (an indexed HOF over the
    // sorted distinct-token array — max d·(d−1)/2 pairs for d distinct
    // tokens, no self-join, no shuffle before the count), so the only
    // shuffle is the partial-aggregable pair count. The oracle spells the
    // same semantics as a within-doc self-join — transparent, since pairs
    // are deduped per doc and ordered t1 < t2 on both sides.
    "x51_cooccurrence" -> ((s, d) => {
      // pairs travel as "t1 t2" strings (tokens are space-split, so the
      // separator is safe) and split back AFTER the count — the split runs
      // once per distinct pair (vocab-bounded), not once per generated
      // row. Generation is the native one-pass graft_cooccur_pairs kernel
      // (dedup+sort+pair loop, codegen'd — the interpreted HOF chain it
      // replaces dominated this query's time).
      documents(s, d)
        .select(explode(TextOps.cooccurPairs(TextOps.words(col("text")))).as("p"))
        .groupBy(col("p"))
        .agg(count(lit(1)).as("n_docs"))
        .select(substring_index(col("p"), " ", 1).as("t1"),
          substring_index(col("p"), " ", -1).as("t2"), col("n_docs"))
        .orderBy(col("n_docs").desc, col("t1"), col("t2"))
        .limit(20)
    }))

  val oracleSql: Map[String, String] = Map(

    "x50_bm25_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tfreq FROM tok
        |  GROUP BY doc_id, term),
        |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |g AS (SELECT count(*) AS n,
        |    CAST(sum(len(string_split(text, ' '))) AS DOUBLE) / count(*)
        |      AS avgdl
        |  FROM documents),
        |sc AS (SELECT doc_id, tf.term AS term,
        |    CAST(tfreq AS DOUBLE) * 2.2 /
        |      (CAST(tfreq AS DOUBLE) + 1.2 *
        |        (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))
        |      * CAST(n AS DOUBLE) / CAST(df AS DOUBLE) AS bm25
        |  FROM tf JOIN dl USING (doc_id) JOIN dfq ON tf.term = dfq.term, g),
        |r AS (SELECT doc_id, term, bm25,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY bm25 DESC, term) AS rnk
        |  FROM sc)
        |SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
        |  floor(bm25 * 1e6) / 1e6 AS bm25_6
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,

    "q8_exists_anti" ->
      """SELECT c_custkey, c_mktsegment
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '1-URGENT'
        |      AND year(o.o_orderdate) = 1995)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_orderpriority = '5-LOW')
        |ORDER BY c_custkey""".stripMargin,

    "w17_ohlc" ->
      """WITH e AS (SELECT user_id, value, epoch_us(ts) AS tus, event_id,
        |    epoch_us(ts) // 21600000000 AS bucket FROM events),
        |r AS (SELECT user_id, bucket, value,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY tus, event_id) AS rna,
        |    row_number() OVER (PARTITION BY user_id, bucket
        |      ORDER BY tus DESC, event_id DESC) AS rnd
        |  FROM e)
        |SELECT user_id, bucket, count(*) AS n,
        |  max(CASE WHEN rna = 1 THEN value END) AS open,
        |  max(value) AS high, min(value) AS low,
        |  max(CASE WHEN rnd = 1 THEN value END) AS close
        |FROM r GROUP BY user_id, bucket ORDER BY user_id, bucket""".stripMargin,

    // the oracle spells the same semantics as the window formulation the
    // operator replaces
    "w18_topk_native" ->
      """WITH r AS (SELECT l_returnflag, l_orderkey, l_linenumber,
        |    l_extendedprice,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
        |  FROM lineitem)
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
        |FROM r WHERE rnk <= 3
        |ORDER BY l_returnflag, l_extendedprice DESC, l_orderkey, l_linenumber""".stripMargin,

    "x58_cluster_merge" ->
      """WITH RECURSIVE w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w WHERE len(w) >= 3),
        |h AS (SELECT doc_id, ss,
        |  list_transform(ss, s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) AS hs FROM sh),
        |mh AS (SELECT doc_id,
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
        |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |ver AS (SELECT id1, id2, len(list_intersect(x.ss, y.ss)) AS inter,
        |    len(x.ss) AS n1, len(y.ss) AS n2
        |  FROM cand JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2),
        |pairs AS (SELECT id1, id2 FROM ver
        |  WHERE CAST(inter AS DOUBLE)/(n1+n2-inter) >= 0.5),
        |edges AS (SELECT id1 AS a, id2 AS b FROM pairs
        |  UNION ALL SELECT id2 AS a, id1 AS b FROM pairs),
        |reach AS (
        |  SELECT doc_id AS id, doc_id AS lab FROM documents
        |  UNION
        |  SELECT e.b AS id, r.lab AS lab FROM reach r JOIN edges e ON e.a = r.id),
        |lab AS (SELECT id, min(lab) AS cluster_id FROM reach GROUP BY id)
        |SELECT cluster_id, count(*) AS n_members,
        |  min(d.doc_id) AS canonical_id,
        |  array_to_string(list_sort(list_distinct(list(d.source))), ',') AS sources,
        |  CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS total_tokens,
        |  CAST(max(len(string_split(d.text, ' '))) AS BIGINT) AS max_tokens
        |FROM lab JOIN documents d ON d.doc_id = lab.id
        |GROUP BY cluster_id HAVING count(*) >= 2
        |ORDER BY cluster_id""".stripMargin,

    "x57_source_overlap" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w WHERE len(w) >= 3),
        |h AS (SELECT doc_id, ss,
        |  list_transform(ss, s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) AS hs FROM sh),
        |mh AS (SELECT doc_id,
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
        |  FROM bk a JOIN bk b ON a.bk = b.bk AND a.doc_id < b.doc_id GROUP BY 1, 2),
        |ver AS (SELECT id1, id2, len(list_intersect(x.ss, y.ss)) AS inter,
        |    len(x.ss) AS n1, len(y.ss) AS n2
        |  FROM cand JOIN sh x ON x.doc_id = id1 JOIN sh y ON y.doc_id = id2),
        |pairs AS (SELECT id1, id2 FROM ver
        |  WHERE CAST(inter AS DOUBLE)/(n1+n2-inter) >= 0.5),
        |lab AS (SELECT id1, id2, da.source AS s1, db.source AS s2
        |  FROM pairs JOIN documents da ON da.doc_id = id1
        |  JOIN documents db ON db.doc_id = id2)
        |SELECT least(s1, s2) AS src_a, greatest(s1, s2) AS src_b,
        |  count(*) AS n_pairs
        |FROM lab GROUP BY 1, 2 ORDER BY src_a, src_b""".stripMargin,

    "q9_sole_late_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders
        |    ON l_orderkey = o_orderkey
        |  WHERE epoch_us(l_shipdate) - epoch_us(o_orderdate)
        |        > 60 * 86400000000
        |)
        |SELECT l1.l_suppkey AS suppkey, count(*) AS numwait
        |FROM late l1
        |WHERE EXISTS (SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY l1.l_suppkey
        |ORDER BY numwait DESC, suppkey""".stripMargin,

    "x55_boilerplate_score" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT DISTINCT doc_id,
        |    unnest(CASE WHEN len(w) >= 2
        |      THEN list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
        |      ELSE [] END) AS bg
        |  FROM w),
        |dfq AS (SELECT bg, count(*) AS df FROM bg GROUP BY bg),
        |sc AS (SELECT doc_id, count(*) AS n_bigrams,
        |    CAST(sum(df) AS BIGINT) AS sum_df
        |  FROM bg JOIN dfq USING (bg) GROUP BY doc_id)
        |SELECT doc_id, n_bigrams, sum_df // n_bigrams AS mean_df
        |FROM sc ORDER BY mean_df DESC, doc_id LIMIT 15""".stripMargin,

    // the blocking is transparent (a doc containing the needle necessarily
    // contains its leading 3-gram), so the oracle is the plain contains join
    "x54_substring_decontam" ->
      """WITH w AS (SELECT doc_id, text, string_split(text, ' ') AS w
        |  FROM documents),
        |n AS (SELECT doc_id AS needle_id,
        |    array_to_string(w[3:7], ' ') AS needle
        |  FROM w WHERE doc_id % 50 = 0 AND len(w) >= 7),
        |hits AS (SELECT DISTINCT needle_id, d.doc_id
        |  FROM n JOIN w d ON d.doc_id <> needle_id
        |    AND position(needle IN d.text) > 0)
        |SELECT needle_id, count(*) AS n_contaminated,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM hits GROUP BY needle_id ORDER BY needle_id""".stripMargin,

    "j11_fuzzy_match" ->
      """WITH t AS (SELECT doc_id, substr(text, 1, 40) AS title FROM documents),
        |dirty AS (SELECT doc_id + 1000000 AS dirty_id,
        |    substr(title, 1, 39) || 'x' AS dtitle
        |  FROM t WHERE doc_id % 3 = 0),
        |cand AS (SELECT doc_id, dirty_id,
        |    CAST(levenshtein(title, dtitle) AS BIGINT) AS dist
        |  FROM t JOIN dirty ON substr(title, 1, 12) = substr(dtitle, 1, 12))
        |SELECT dist, count(*) AS n_pairs,
        |  CAST(sum(doc_id) AS BIGINT) AS src_id_sum,
        |  CAST(sum(dirty_id) AS BIGINT) AS dirty_id_sum
        |FROM cand WHERE dist <= 2
        |GROUP BY dist ORDER BY dist""".stripMargin,

    "w20_trailing_anomaly" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
        |    CAST(floor(value * 1000.0) AS BIGINT) AS vm FROM events),
        |t AS (SELECT user_id, event_id, vm,
        |    count(vm) OVER w AS n,
        |    sum(vm) OVER w AS sv,
        |    sum(CAST(vm AS DECIMAL(38,0)) * vm) OVER w AS svv
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tus, event_id
        |    ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)),
        |f AS (SELECT user_id, event_id,
        |    CAST(vm * n - sv AS DECIMAL(38,0)) AS dev, n, sv, svv
        |  FROM t WHERE n >= 3),
        |a AS (SELECT user_id, event_id,
        |    (dev * dev > (svv * n - CAST(sv AS DECIMAL(38,0)) *
        |      CAST(sv AS DECIMAL(38,0))) * 4) AS anom
        |  FROM f)
        |SELECT user_id, count(*) AS n_tested,
        |  CAST(sum(CASE WHEN anom THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies,
        |  CAST(sum(CASE WHEN anom THEN event_id ELSE 0 END) AS BIGINT)
        |    AS anom_id_sum
        |FROM a GROUP BY user_id ORDER BY user_id""".stripMargin,

    "x53_gopher_rules" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS w,
        |    CAST(len(text) AS BIGINT) AS n_chars FROM documents),
        |m AS (SELECT doc_id,
        |    CAST(len(w) AS BIGINT) AS n_tokens,
        |    CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct,
        |    CAST(len(list_filter(w, x -> x IN ('the','and','of','to','a')))
        |      AS BIGINT) AS n_stop,
        |    n_chars
        |  FROM t),
        |f AS (SELECT doc_id, n_tokens,
        |    (n_tokens >= 5 AND n_tokens <= 100000) AS ok_count,
        |    (n_chars >= n_tokens * 3 AND n_chars <= n_tokens * 10) AS ok_wordlen,
        |    (n_distinct * 5 >= n_tokens) AS ok_ttr,
        |    (n_stop >= 2) AS ok_stop
        |  FROM m),
        |p AS (SELECT *, (ok_count AND ok_wordlen AND ok_ttr AND ok_stop) AS pass
        |  FROM f)
        |SELECT pass, count(*) AS n_docs,
        |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
        |  CAST(sum(CASE WHEN ok_count THEN 0 ELSE 1 END) AS BIGINT) AS fail_count,
        |  CAST(sum(CASE WHEN ok_wordlen THEN 0 ELSE 1 END) AS BIGINT) AS fail_wordlen,
        |  CAST(sum(CASE WHEN ok_ttr THEN 0 ELSE 1 END) AS BIGINT) AS fail_ttr,
        |  CAST(sum(CASE WHEN ok_stop THEN 0 ELSE 1 END) AS BIGINT) AS fail_stop
        |FROM p GROUP BY pass ORDER BY pass""".stripMargin,

    "x52_incremental_dedup" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w),
        |h AS (SELECT doc_id, ss,
        |  list_transform(ss, s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT)) AS hs,
        |  CAST(concat('0x', substr(md5('sample:' || CAST(doc_id AS VARCHAR)),1,8))
        |    AS BIGINT) % 100 AS bucket FROM sh),
        |mh AS (SELECT doc_id, ss, bucket,
        |  list_min(list_transform(hs, x -> (7*x+3) % 2147483647)) AS m0,
        |  list_min(list_transform(hs, x -> (11*x+5) % 2147483647)) AS m1,
        |  list_min(list_transform(hs, x -> (13*x+7) % 2147483647)) AS m2,
        |  list_min(list_transform(hs, x -> (17*x+11) % 2147483647)) AS m3,
        |  list_min(list_transform(hs, x -> (19*x+13) % 2147483647)) AS m4,
        |  list_min(list_transform(hs, x -> (23*x+17) % 2147483647)) AS m5,
        |  list_min(list_transform(hs, x -> (29*x+19) % 2147483647)) AS m6,
        |  list_min(list_transform(hs, x -> (31*x+23) % 2147483647)) AS m7 FROM h),
        |bk AS (SELECT doc_id, bucket, unnest([
        |  concat_ws('_', 0, m0, m1), concat_ws('_', 1, m2, m3),
        |  concat_ws('_', 2, m4, m5), concat_ws('_', 3, m6, m7)]) AS bk FROM mh),
        |cand AS (SELECT n.doc_id AS new_id, o.doc_id AS old_id
        |  FROM bk n JOIN bk o ON n.bk = o.bk
        |  WHERE n.bucket < 10 AND o.bucket >= 10 GROUP BY 1, 2)
        |SELECT new_id, old_id,
        |  CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) AS inter,
        |  CAST(len(x.ss) AS BIGINT) AS n_new, CAST(len(y.ss) AS BIGINT) AS n_old
        |FROM cand JOIN mh x ON x.doc_id = new_id JOIN mh y ON y.doc_id = old_id
        |WHERE CAST(len(list_intersect(x.ss, y.ss)) AS BIGINT) * 2
        |  >= CAST(len(x.ss) AS BIGINT)
        |ORDER BY new_id, old_id""".stripMargin,

    "w19_sequence_match" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus, event_id,
        |    substr(event_type, 1, 1) AS c FROM events),
        |s AS (SELECT user_id, count(*) AS n_events,
        |    string_agg(c, '' ORDER BY tus, event_id) AS seq
        |  FROM e GROUP BY user_id)
        |SELECT user_id, n_events, substr(seq, 1, 20) AS seq20,
        |  seq LIKE '%v%c%p%' AS has_funnel
        |FROM s ORDER BY user_id""".stripMargin,

    "x51_cooccurrence" ->
      """WITH t AS (SELECT DISTINCT doc_id,
        |    unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT a.tok AS t1, b.tok AS t2, count(*) AS n_docs
        |FROM t a JOIN t b ON a.doc_id = b.doc_id AND a.tok < b.tok
        |GROUP BY a.tok, b.tok
        |ORDER BY n_docs DESC, t1, t2 LIMIT 20""".stripMargin)
}
