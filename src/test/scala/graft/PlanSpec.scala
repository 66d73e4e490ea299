package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FormattedMode

/** Physical-plan regression guards: these assert the plan SHAPES that make
  * the queries scale — pushdown, pruning, broadcast vs nested-loop, top-k
  * without a global sort, single-shuffle as-of, and no duplicated expensive
  * expression subtrees. A correctness-preserving edit that breaks one of
  * these would silently cost 10–100× at cluster scale. */
class PlanSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    SparkEntry.queries(name)(TestSpark.spark, sf)
      .queryExecution.explainString(FormattedMode)

  private def count(hay: String, needle: String): Int =
    hay.sliding(needle.length).count(_ == needle)

  test("q3: filter pushed to scan, columns pruned, top-k avoids global sort") {
    val p = plan("q3_topk_revenue")
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "filter not pushed to scan")
    assert(p.contains("struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>"),
      "lineitem scan reads more than the 3 needed columns")
    assert(p.contains("TakeOrderedAndProject"), "LIMIT after ORDER BY must not global-sort")
  }

  test("p4: dimension joined via broadcast, left outer preserved") {
    val p = plan("p4_unknown_sentinel")
    assert(p.contains("BroadcastHashJoin LeftOuter"), "expected broadcast left join")
  }

  test("q1: partial (map-side) aggregation before the exchange") {
    val p = plan("q1_agg")
    assert(count(p, "HashAggregate") >= 2, "missing partial aggregate")
  }

  test("j8: range join rewritten as bucket equi-join, not nested loop") {
    val p = plan("j8_range_bucket")
    assert(p.contains("BroadcastHashJoin"), "expected broadcast hash join")
    assert(!p.contains("BroadcastNestedLoopJoin"), "range join degenerated to BNLJ")
  }

  test("j7 as-of: exactly one hash-partition shuffle (on user_id)") {
    val p = plan("j7_asof")
    assert(count(p, "hashpartitioning(user_id") == 1,
      s"as-of join should shuffle once on user_id:\n$p")
  }

  test("x5 simhash: single native one-pass expression, no duplicated subtree") {
    val p = plan("x5_simhash")
    assert(count(p, "graft_simhash16(") == 1,
      "simhash should be one native graft_simhash16 call")
    assert(count(p, "graft_hash32(") == 0,
      "token hashing should happen inside the kernel, not as a plan subtree")
  }

  test("x6 cosine top-k: broadcast join, no cartesian product") {
    val p = plan("x6_cosine_topk")
    assert(p.contains("Broadcast"), "query set should broadcast")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
  }

  test("x7 IVF (the 100 TB default): equi-join on the bucket key") {
    val p = plan("x7_ivf_topk")
    // the posting-list prune must be an equi hash join on the bucket key —
    // never a nested-loop over the corpus (x6 is the verification baseline)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"bucket join should be an equi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "corpus must be pruned by the bucket key, not scanned pairwise")
  }

  test("x16 LSH ANN: equi-join on the bucket code, projection codegen'd") {
    val p = plan("x16_lsh_ann")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"LSH candidate join should be an equi join on the bucket code:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "corpus must be pruned by the LSH bucket, not scanned pairwise")
  }

  test("x18 tf-idf: corpus-size frame broadcast, aggregations partial") {
    val p = plan("x18_tfidf_topk")
    // the 1-row N frame must arrive as a broadcast, never shuffle the
    // tf frame against it; tf/df groupBys must map-side combine
    assert(p.contains("Broadcast"), s"corpus size should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
    assert(count(p, "HashAggregate") >= 4, "tf/df aggregation lost the partial phase")
  }

  test("x19 hash sample: pure per-row filter, no shuffle before the sort") {
    val p = plan("x19_hash_sample")
    // exactly the output-ordering exchange — the filter itself must not
    // repartition anything
    assert(count(p, "+- Exchange") <= 1,
      s"sampling filter introduced a shuffle:\n$p")
  }

  test("x22 simhash near-dup: band join is equi, verify has no cartesian") {
    val p = plan("x22_simhash_neardup")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"band candidate join should be an equi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "candidates must come from band-key equality, not an all-pairs scan")
    assert(count(p, "graft_simhash48(") == 1,
      "fingerprints should be computed once (persisted frame reused)")
  }

  test("x23 centroid IVF: cell assignment inline, probe is an equi join") {
    val p = plan("x23_ivf_centroid_topk")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"cell probe should be an equi join on the cell id:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "corpus must be pruned by the Voronoi cell, not scanned pairwise")
  }

  test("x25 decontamination: candidates by shingle equality, no cartesian") {
    val p = plan("x25_decontamination")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"candidate join should be equi on the shared shingle:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "corpus x benchmark must never be an all-pairs scan")
  }

  test("x27 multi-probe LSH: probe join is equi on the bucket code") {
    val p = plan("x27_lsh_multiprobe")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"probe join should be an equi join:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "multi-probe must stay bucket-pruned, not pairwise")
  }

  test("g3 cube: expand feeds a partial-then-final aggregate") {
    val p = plan("g3_cube")
    assert(p.contains("Expand"), "cube should use an Expand of grouping sets")
    assert(count(p, "HashAggregate") >= 2, "cube lost the partial aggregate phase")
  }

  test("w9 ignore-nulls: one hash shuffle on the window key") {
    val p = plan("w9_ignore_nulls")
    assert(count(p, "hashpartitioning(user_id") >= 1,
      s"keyed window should shuffle on user_id:\n$p")
    assert(!p.contains("SinglePartition"),
      "ignore-nulls fill must stay keyed, never a global window")
  }

  test("w10 sessionize: both window passes share one user_id shuffle") {
    val p = plan("w10_sessionize")
    assert(count(p, "hashpartitioning(user_id") >= 1,
      s"session windows should shuffle on user_id:\n$p")
    assert(!p.contains("SinglePartition"),
      "sessionization must stay per-user, never a global window")
    assert(count(p, "Exchange hashpartitioning(user_id") <= 1,
      s"lag and running-sum windows should reuse one user_id exchange:\n$p")
  }

  test("x28 repetition: pure per-row expressions, no shuffle before the sort") {
    val p = plan("x28_repetition")
    assert(!p.contains("hashpartitioning"), // only the final range sort exchange
      s"repetition ratio must not hash-shuffle:\n$p")
    assert(count(p, "graft_shingles3(") == 1,
      "distinct-trigram set should be one native one-pass expression")
  }

  test("g4 grouping sets: expand feeds a partial-then-final aggregate") {
    val p = plan("g4_grouping_sets")
    assert(p.contains("Expand"), "grouping sets should use an Expand")
    assert(count(p, "HashAggregate") >= 2, "lost the partial aggregate phase")
  }

  test("f17 unpivot: single Expand over one scan, no union of re-scans") {
    val p = plan("f17_unpivot")
    assert(p.contains("Expand"), "unpivot should lower to Expand")
    assert(count(p, "Location: InMemoryFileIndex") == 1,
      s"unpivot must read the table once, not per measure:\n$p")
    assert(!p.contains("Union"), "unpivot must not be a UNION ALL of scans")
  }

  test("x29 stratified sample: one shuffle on the stratum key, rank pruned") {
    val p = plan("x29_stratified_sample")
    assert(count(p, "hashpartitioning(source") >= 1,
      s"per-stratum rank should shuffle on source:\n$p")
    assert(!p.contains("SinglePartition"),
      "stratified rank must stay per-stratum, never a global window")
  }

  test("w11 funnel: three stage windows layer over one user_id exchange") {
    val p = plan("w11_funnel")
    assert(count(p, "hashpartitioning(user_id") >= 1,
      s"funnel windows should shuffle on user_id:\n$p")
    assert(!p.contains("SinglePartition"),
      "funnel must stay per-user, never a global window")
    assert(count(p, "Exchange hashpartitioning") <= 1 &&
      count(p, "Arguments: hashpartitioning(user_id") <= 1,
      s"stage windows + final agg should reuse one user_id exchange:\n$p")
  }

  test("x30 CMS: counters partial-aggregated, top-k never a global sort") {
    val p = plan("x30_cms_heavy_hitters")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k by estimate must be TakeOrderedAndProject, not sort+limit")
    assert(!p.contains("SinglePartition"),
      "sketch build must not funnel through one partition")
    assert(count(p, "HashAggregate") >= 2, "counter build lost partial agg")
  }

  test("j9 interval join: bucket equi-join, never a nested loop") {
    val p = plan("j9_interval_join")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "interval join degenerated to BNLJ — bucket binning lost")
    assert(!p.contains("CartesianProduct"), "interval join went cartesian")
    assert(p.contains("TIMESTAMP") || p.contains("o_orderdate"), "scan lost")
  }

  test("j10 salted join: no broadcast of the exploded dim, partial agg kept") {
    val p = plan("j10_salted_join")
    // the final rollup re-aggregates salted partials map-side first
    assert(count(p, "HashAggregate") >= 2, "salted rollup lost partial agg")
    assert(!p.contains("CartesianProduct"), "salt join went cartesian")
  }

  test("x41 novelty: gram fan-out is per-row generate, no self-join") {
    val p = plan("x41_ngram_novelty")
    assert(p.contains("Generate") && p.contains("explode("),
      "grams must explode per-row")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "novelty must not compare documents pairwise")
  }

  test("x42 pq codes: scan-local assignment, histogram partial-aggregated") {
    val p = plan("x42_pq_codes")
    // formatted mode prints each node in the tree AND the details section,
    // so 2 real exchanges (groupBy + orderBy) appear 4 times
    assert(count(p, "Exchange") == 4,
      s"pq assignment should shuffle only at the histogram:\n$p")
    assert(count(p, "HashAggregate") >= 2, "histogram lost partial agg")
  }

  test("q6 decorrelate: scalar subqueries become aggregate+join") {
    val p = plan("q6_decorrelate")
    assert(!p.contains("Subquery"), "correlated subquery not decorrelated")
    assert(count(p, "HashAggregate") >= 2, "per-nation stats lost partial agg")
  }

  test("q7 pre-agg join: per-part stats partial-aggregated, no subquery") {
    val p = plan("q7_join_preagg")
    assert(!p.contains("Subquery"), "stats must come from a pre-aggregation, not a subquery")
    assert(count(p, "HashAggregate") >= 4,
      "per-part stats and the final rollup should both keep partial aggregation")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "both joins must stay equi joins")
  }

  test("x45 PQ rerank: stage-1 corpus carries codes only, queries broadcast") {
    val p = plan("x45_pq_rerank")
    assert(p.contains("Broadcast"), "the query/distance-table side should broadcast")
    assert(!p.contains("CartesianProduct"), "unexpected cartesian product")
    // stage 2 fetches exact vectors through an equi join on the vector id
    assert(p.contains("vec_id"), "rerank join must key on vec_id")
  }

  test("x47 sparse cosine: candidate and dot joins stay equi, no cartesian") {
    val p = plan("x47_sparse_cosine")
    assert(!p.contains("CartesianProduct") ||
      p.sliding("CartesianProduct".length).count(_ == "CartesianProduct") <= 1,
      "only the 1-row N broadcast may cross")
    assert(!p.contains("BroadcastNestedLoopJoin") || p.contains("BuildRight"),
      "pair generation must not nested-loop the corpus")
    assert(p.contains("hashpartitioning(term") || p.contains("term"),
      "inverted index should shuffle on the term key")
  }

  test("x48 snapshot diff: one full-outer join on the doc key") {
    val p = plan("x48_snapshot_diff")
    assert(p.contains("FullOuter"), "diff must be a full outer join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "diff join must stay an equi join")
  }

  test("j11 fuzzy match: blocking join stays equi, no nested loop") {
    val p = plan("j11_fuzzy_match")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"blocking must make the fuzzy join an equi join:\n$p")
    assert(p.contains("levenshtein"), "edit-distance verify must be in-plan")
  }

  test("x52 incremental dedup: band probe is an equi join on the bucket key") {
    val p = plan("x52_incremental_dedup")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"the new-batch probe must join on the band key:\n$p")
  }

  test("x53 gopher rules: pure per-row flags, partial-aggregated rollup") {
    val p = plan("x53_gopher_rules")
    assert(!p.contains("Join"), "rule flags must not join")
    assert(count(p, "HashAggregate") >= 2, "rollup should keep partial aggregation")
  }

  test("w20 anomaly: one user_id shuffle serves the frame and the rollup") {
    val p = plan("w20_trailing_anomaly")
    assert(count(p, "hashpartitioning(user_id") == 1,
      s"trailing window and rollup should share one exchange:\n$p")
  }

  test("entry: nation dim broadcast into customer scan") {
    val p = SparkEntry.entry(TestSpark.spark)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"))
  }

  test("x35 pagerank: broadcast edge build, no window, bounded top-k") {
    val p = plan("x35_pagerank")
    // round-5 shape: orders side broadcasts into the lineitem scan, the
    // per-side degree aggregates broadcast back onto the cached edges, and
    // no window operator appears anywhere (the old degree-window exchange
    // is gone); final top-100 never global-sorts
    assert(p.contains("BroadcastHashJoin"), "edge build should broadcast")
    assert(!p.contains("Window"), s"degree must not use a window:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must not global-sort")
    GraftCaches.releasePrior()
  }

  test("x79 vocab coverage: bounded top-k per point, no global sort") {
    val p = plan("x79_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"each coverage point must be a bounded top-k:\n$p")
    GraftCaches.releasePrior()
  }

  test("x83 priority sample: per-row scoring, bounded top-k, no global sort") {
    val p = plan("x83_priority_sample")
    assert(p.contains("TakeOrderedAndProject"),
      s"the sample must come from a bounded top-k:\n$p")
    assert(!p.contains("CartesianProduct"), "tau attach must broadcast")
    GraftCaches.releasePrior()
  }

  test("x84 dup spans: joinless — span explode + two partial-agg shuffles") {
    val p = plan("x84_dup_spans")
    assert(!p.contains("Join"), s"span dedup must not join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "report is a bounded top-k")
    // "Exchange (" matches tree nodes only (the details section prints
    // "(10) Exchange", which this pattern skips)
    assert(count(p, "Exchange (") == 2,
      s"exactly the digest groupBy + dedup shuffles expected:\n$p")
  }

  test("x81 decontam audit: candidate join equi on band key, no cartesian") {
    val p = plan("x81_minhash_decontam")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"LSH candidates must come from an equi join:\n$p")
    GraftCaches.releasePrior()
  }

  test("x85 bigram LM: one materialized bigram frame feeds counts and score") {
    val p = plan("x85_bigram_lm_score")
    // bg's persist (exchange-less explode) serves the c2 build and the
    // doc join; c2 is PERSIST-FREE since round 15 (exchange-topped —
    // AQE stage reuse dedupes the c1 rollup and the score join at
    // runtime, BENCH_AB_r15_x85.json)
    assert(count(p, "InMemoryTableScan (") >= 2,
      s"the bg persist must serve both its readers:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"score join must stay equi on (l, r):\n$p")
    GraftCaches.releasePrior()
  }

  test("x86 temp mixture: one corpus scan; total is a scalar broadcast") {
    val p = plan("x86_temp_mixture")
    assert(p.contains("InMemoryTableScan"),
      s"per-source aggregate must persist so the total reuses it:\n$p")
    assert(p.contains("partial_count"), "groupBy must partial-aggregate")
    GraftCaches.releasePrior()
  }

  test("x87 winnowing: joinless — window mins per row, bounded top-k") {
    val p = plan("x87_winnowing")
    assert(!p.contains("Join"), s"fingerprint rollup must not join:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "report is a bounded top-k")
  }

  test("x88 scrub: one materialized span frame; digest joins stay equi") {
    val p = plan("x88_boilerplate_scrub")
    assert(count(p, "InMemoryTableScan (") == 2,
      s"span persist must serve the flag groupBy and the join back:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"digest and doc joins must stay equi:\n$p")
    GraftCaches.releasePrior()
  }

  test("x89 provenance: ONE content-key shuffle serves all three windows") {
    val p = plan("x89_dedup_provenance")
    assert(count(p, "hashpartitioning(h") == 1,
      s"rank, survivor and size must share the h shuffle:\n$p")
    assert(!p.contains("Join"), s"the trail needs no join:\n$p")
  }

  test("x90 recall audit: both arms read ONE persisted embedding frame") {
    val p = plan("x90_ann_recall")
    assert(count(p, "InMemoryTableScan (") >= 4,
      s"gt and ivf arms must reuse the persisted scan, not re-read parquet:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"the brute arm must broadcast the query sample:\n$p")
    GraftCaches.releasePrior()
  }

  test("x91 copy matrix: joinless — pair expansion is per-digest generate") {
    val p = plan("x91_source_copy_matrix")
    assert(!p.contains("Join"), s"pair expansion must not self-join:\n$p")
    assert(p.contains("partial_count"), "pair count must partial-aggregate")
  }

  test("x92 hard negatives: query sample broadcasts, corpus persisted") {
    val p = plan("x92_hard_negatives")
    assert(!p.contains("CartesianProduct"),
      s"the label-mismatch join must broadcast the sample:\n$p")
    assert(count(p, "InMemoryTableScan (") >= 2,
      s"sample and corpus arms must reuse the persisted scan:\n$p")
    GraftCaches.releasePrior()
  }

  test("q14 promo share: part dim broadcasts; one partial-agg pass") {
    val p = plan("q14_promo_share")
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
    assert(p.contains("partial_sum"), "revenue sums must map-side combine")
  }

  test("q18 large orders: quantity rollup filters BEFORE the wide joins") {
    val p = plan("q18_large_orders")
    // the HAVING-filtered aggregate must sit below both attribute joins —
    // if a join ran first, the plan would carry orders×lineitem width
    val aggIdx = p.indexOf("HashAggregate")
    val joinIdx = p.indexOf("Join")
    assert(aggIdx >= 0 && joinIdx >= 0 && joinIdx < aggIdx,
      s"joins must consume the filtered rollup (tree prints top-down):\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("x93 SQ8: per-dim stats partial-aggregate; codec is scan-local") {
    val p = plan("x93_sq8_quantize")
    assert(p.contains("partial_min") && p.contains("partial_max"),
      s"per-dim stats must map-side combine:\n$p")
    assert(p.contains("BroadcastNestedLoopJoin Cross") ||
      p.contains("BroadcastExchange"),
      s"the 64-element stat arrays must broadcast back:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no corpus-scale shuffle join belongs in the codec:\n$p")
  }

  test("x95 SymSpell: candidate join is EQUI on the delete key, no cartesian") {
    val p = plan("x95_spelling_variants")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"spelling-variant candidates must come from the delete-key equi join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"expected a hash/sort equi join on the delete key:\n$p")
  }

  test("x97 backoff LM: n-gram joins stay equi; only the scalar broadcasts") {
    val p = plan("x97_backoff_lm")
    assert(!p.contains("CartesianProduct"),
      s"no cartesian belongs in the LM joins:\n$p")
    // the single allowed nested-loop is the 1-row n_train scalar attach
    // (count the tree spelling — the details section repeats node names)
    assert(count(p, "BroadcastNestedLoopJoin Cross") <= 1,
      s"only the n_train scalar may nested-loop:\n$p")
    assert(count(p, "partial_count") >= 3,
      s"n-gram counts must map-side combine:\n$p")
  }

  test("x98 Lloyd: corpus never shuffles for assignment — k-row broadcast " +
    "fan-out twice; updates partial-aggregate") {
    val p = plan("x98_kmeans_lloyd")
    assert(count(p, "BroadcastNestedLoopJoin Cross") == 2,
      s"each of the 2 assignment rounds is a k-row broadcast fan-out:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("SortMergeJoin"),
      s"the corpus must not shuffle-join during Lloyd rounds:\n$p")
    assert(count(p, "partial_sum") >= 2,
      s"centroid updates must map-side combine:\n$p")
  }

  test("x99 l-diversity: joinless — two keyed aggregations") {
    val p = plan("x99_l_diversity")
    assert(!p.contains("Join"), s"l-diversity needs no join:\n$p")
    assert(count(p, "HashAggregate") >= 2,
      s"expected the two-level keyed aggregation:\n$p")
  }

  test("x100 t-closeness: margins broadcast; the fact aggregates once") {
    val p = plan("x100_t_closeness")
    assert(count(p, "BroadcastNestedLoopJoin Cross") <= 1,
      s"only the 1-row total may nested-loop:\n$p")
    assert(p.contains("partial_count"),
      s"the QI-cell counts must map-side combine:\n$p")
    // round 15: the cell rollup is persist-free (exchange-topped — AQE
    // stage reuse dedupes the margins at runtime, BENCH_AB_r15_rollups.json)
    assert(count(p, "InMemoryTableScan (") == 0,
      s"x100 must stay persist-free after the r15 reversal:\n$p")
    GraftCaches.releasePrior()
  }

  test("x101 MRL audit: both arms read ONE persisted embedding frame") {
    val p = plan("x101_mrl_truncation")
    assert(count(p, "InMemoryTableScan (") >= 4,
      s"full and prefix arms must reuse the persisted scan:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"both arms must broadcast the query sample:\n$p")
    GraftCaches.releasePrior()
  }

  test("w32 windowed top-k: rank stays keyed by day, never a global window") {
    val p = plan("w32_window_topk")
    assert(!p.contains("SinglePartition"),
      s"per-day rank must partition by the day window:\n$p")
    assert(p.contains("partial_count"),
      s"the per-(day,type) counts must map-side combine:\n$p")
  }

  test("x102 containment: bucketed equi-joins only, shingle frame persisted") {
    val p = plan("x102_containment")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"),
      s"candidate generation must stay an inverted-index equi-join:\n$p")
    assert(count(p, "InMemoryTableScan (") >= 2,
      s"the hashed-shingle frame must be computed once and reused:\n$p")
    assert(p.contains("partial_count"),
      s"the df counts must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("x104 soft dedup: exactly one hash shuffle (on the bow key)") {
    val p = plan("x104_soft_dedup")
    assert(count(p, "hashpartitioning(bow_key") == 1,
      s"the weight window should shuffle once on the cluster key:\n$p")
    assert(!p.contains("SinglePartition") || p.contains("rangepartitioning"),
      s"no global single-partition window:\n$p")
  }

  test("x105 fertility: map-side combine; only the 1-row min nested-loops") {
    val p = plan("x105_tokenizer_fertility")
    assert(p.contains("partial_count"),
      s"the per-lang aggregate must map-side combine:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin Cross") <= 1,
      s"only the 1-row min may nested-loop:\n$p")
  }

  test("x106 cluster eval: ONE corpus-scale aggregate; contingency " +
    "persist-free since round 15 (exchange-topped, stage reuse dedupes)") {
    val p = plan("x106_cluster_purity")
    assert(p.contains("partial_count"),
      s"the (cell,label) contingency must map-side combine:\n$p")
    assert(count(p, "InMemoryTableScan (") == 0,
      s"x106 must stay persist-free after the r15 reversal " +
        s"(BENCH_AB_r15_rollups2.json):\n$p")
    assert(!p.contains("CartesianProduct"),
      s"only broadcast nested-loop for the 1-row frames:\n$p")
    GraftCaches.releasePrior()
  }

  test("x107 token budget: corpus aggregates once; the apportion window " +
    "runs on the tiny per-source frame") {
    val p = plan("x107_token_budget")
    assert(p.contains("partial_sum"),
      s"the token count must map-side combine:\n$p")
    assert(count(p, "InMemoryTableScan (") >= 2,
      s"the total must reuse the persisted per-source frame:\n$p")
    GraftCaches.releasePrior()
  }

  test("x108 code-switch: pure per-row expressions, no shuffle before the " +
    "output sort") {
    val p = plan("x108_code_switch")
    assert(!p.contains("Join"), s"half-voting needs no join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"only the final sort's range exchange is allowed:\n$p")
  }

  test("x109 group split: exactly one hash shuffle (on the cluster key)") {
    val p = plan("x109_group_split")
    assert(count(p, "hashpartitioning(bow_key") == 1,
      s"the cluster-size window should shuffle once on the bow key:\n$p")
    assert(!p.contains("Join"), s"the split needs no join:\n$p")
  }

  test("q15: shipdate filter reaches the scan; max is a 1-row broadcast, " +
    "no second lineitem pass") {
    val p = plan("q15_top_supplier")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"shipdate null-guard should reach the parquet scan:\n$p")
    assert(count(p, "InMemoryTableScan (") >= 2,
      s"the max must reuse the persisted revenue frame, not re-scan:\n$p")
    assert(p.contains("partial_sum"), s"revenue must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("q16: complaint exclusion is an ANTI join; part dim broadcasts") {
    val p = plan("q16_supplier_breadth")
    assert(p.contains("LeftAnti"), s"exclusion must be a left-anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim should broadcast:\n$p")
  }

  test("q17: correlated avg decorrelates to ONE pre-aggregate — lineitem " +
    "scans exactly twice, never per-row") {
    val p = plan("q17_small_quantity")
    assert(count(p, "Scan parquet  (") == 2,
      s"base + stats passes only (tree-form node count):\n$p")
    assert(p.contains("partial_sum"),
      s"the per-part stats must map-side combine:\n$p")
  }

  test("q22: scalar average broadcasts; dormancy is a left-anti join") {
    val p = plan("q22_dormant_customers")
    assert(p.contains("LeftAnti"), s"recency leg must be anti-join:\n$p")
    assert(count(p, "BroadcastNestedLoopJoin Cross") <= 1,
      s"only the 1-row average may nested-loop:\n$p")
  }

  test("x111 repeat profile: digests shuffle, never window text; all four " +
    "lengths read the ONE cached token frame") {
    val p = plan("x111_repeat_profile")
    assert(count(p, "InMemoryTableScan (") >= 4,
      s"each length must reuse the cached token frame:\n$p")
    assert(p.contains("partial_count"),
      s"the digest counts must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("q4: the EXISTS decorrelates to a semi join, no per-row subquery") {
    val p = plan("q4_priority_count")
    assert(p.contains("LeftSemi"), s"lateness must be a left-semi join:\n$p")
    assert(p.contains("partial_count"), s"the rollup must map-side combine:\n$p")
  }

  test("q13: outer join preserved; both aggregations partial") {
    val p = plan("q13_custdist")
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"zero-order customers need an outer join:\n$p")
    assert(count(p, "partial_count") >= 2,
      s"both rollups must map-side combine:\n$p")
  }

  test("x112: stats and totals broadcast back — the corpus never " +
    "shuffles after the (label, dim) pass") {
    val p = plan("x112_embedding_outliers")
    assert(count(p, "BroadcastHashJoin") >= 2,
      s"centroids and per-label totals must broadcast:\n$p")
    assert(p.contains("partial_sum"),
      s"the centroid sums must map-side combine:\n$p")
  }

  test("x114: joinless and shuffle-free before the output sort") {
    val p = plan("x114_gini_diversity")
    assert(!p.contains("Join"), s"the per-row fold needs no join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"only the final sort's range exchange is allowed:\n$p")
  }

  test("x115: df joins stay equi on the bigram key — no cartesian") {
    val p = plan("x115_importance_resample")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"all joins must be equi:\n$p")
    assert(p.contains("partial_count"), s"df counts must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("x116: bucketing reuses the persisted score frame; thresholds are " +
    "literals, never a global window") {
    val p = plan("x116_perplexity_buckets")
    assert(p.contains("InMemoryTableScan"),
      s"the bucket pass must reuse the persisted score frame:\n$p")
    assert(!p.contains("Window"),
      s"tercile thresholds must come from the selection pass, not a window:\n$p")
    GraftCaches.releasePrior()
  }

  test("x117: joinless and shuffle-free before the output sort") {
    val p = plan("x117_hashed_classifier")
    assert(!p.contains("Join"), s"classifier inference needs no join:\n$p")
    assert(!p.contains("hashpartitioning"),
      s"only the final sort's range exchange is allowed:\n$p")
  }

  test("x119: one partial-aggregable shuffle; the estimator is join-free " +
    "per-row arithmetic") {
    val p = plan("x119_pass_at_k")
    assert(!p.contains("Join"), s"pass@k needs no join:\n$p")
    assert(count(p, "hashpartitioning") == 1,
      s"exactly the problem rollup may hash-shuffle:\n$p")
    assert(p.contains("partial_count"),
      s"trial counts must map-side combine:\n$p")
  }

  test("x120/x121: the corpus shuffles once into the bucket rollup; the " +
    "cumulative window runs on the bounded bucket frame") {
    val p120 = plan("x120_ks_drift")
    assert(p120.contains("InMemoryTableScan"),
      s"the totals must reuse the persisted cumulative frame:\n$p120")
    assert(p120.contains("partial_sum"),
      s"bucket counts must map-side combine:\n$p120")
    val p121 = plan("x121_classifier_auc")
    assert(count(p121, "hashpartitioning") == 1,
      s"exactly the bucket rollup may hash-shuffle:\n$p121")
    assert(p121.contains("partial_sum"),
      s"bucket counts must map-side combine:\n$p121")
    GraftCaches.releasePrior()
  }

  test("x118: only the 1-row triangle total nested-loops; wedge side is " +
    "join-free aggregation") {
    val p = plan("x118_pair_transitivity")
    // two 1-row scalar attaches: wedges×triangles here, plus one inside
    // the shared lshVerifiedPairs builder — never a row-scaling cross
    assert(count(p, "BroadcastNestedLoopJoin") <= 2,
      s"only the 1-row scalar attachments may nested-loop:\n$p")
    assert(p.contains("partial_count"),
      s"degree counts must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("q19 returned items: both filters reach the scans, nation " +
    "broadcasts, top-20 avoids a global sort") {
    val p = plan("q19_returned_items")
    assert(p.contains("EqualTo(l_returnflag,R)"),
      s"R-flag filter not pushed to the lineitem scan:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      s"date-range filter not pushed to the orders scan:\n$p")
    assert(p.contains("LessThan(o_orderdate"),
      s"date upper bound not pushed to the orders scan:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"nation must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"LIMIT after ORDER BY must not global-sort:\n$p")
  }

  test("x124 silhouette: corpus meets only the broadcast K-row centroid " +
    "frame — no self-join, partial aggregation everywhere") {
    val p = plan("x124_silhouette")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // formatted plans name each operator twice (tree + detail):
    // one physical BNLJ — the K-row centroid attach — is the budget
    assert(count(p, "BroadcastNestedLoopJoin") <= 2,
      s"only the K-row centroid attach may nested-loop:\n$p")
    assert(p.contains("partial_sum"), s"rollups must map-side combine:\n$p")
    GraftCaches.releasePrior()
  }

  test("x125 epoch shuffle: position assignment has NO window operator " +
    "(range-sort + offset exchange instead)") {
    val p = plan("x125_epoch_shuffle")
    assert(!p.contains("Window"),
      s"global sequencing must not use a window (single-partition risk):\n$p")
    assert(p.contains("rangepartitioning"),
      s"expected a range sort feeding the offset exchange:\n$p")
  }

  test("x126 winsorize: bin rollup map-side combines; thresholds return " +
    "to the corpus via broadcast") {
    val p = plan("x126_winsorize")
    assert(p.contains("partial_count"), s"bin counts must map-side combine:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the 5-row threshold frame must broadcast, not shuffle the corpus:\n$p")
    GraftCaches.releasePrior()
  }

  test("x131 lift: basket self-join is keyed on user_id; only the 1-row " +
    "user-count attaches via nested loop") {
    val p = plan("x131_cooccurrence_lift")
    assert(!p.contains("CartesianProduct"), s"no cartesian:\n$p")
    // one physical BNLJ (the 1-row user-count attach), twice in the text
    assert(count(p, "BroadcastNestedLoopJoin") <= 2,
      s"only the 1-row scalar attach may nested-loop:\n$p")
    assert(p.contains("hashpartitioning(user_id"),
      s"pair generation must shuffle on user_id:\n$p")
    GraftCaches.releasePrior()
  }
}
