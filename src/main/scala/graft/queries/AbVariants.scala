package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Alternate query implementations kept callable for same-boot A/B
  * benchmarking ([[graft.BenchAB]]). Entries here are NOT part of the
  * Verify/oracle catalog; key convention "<query>__<tag>". A perf
  * change lands as: old path preserved here under "__pre", new path in
  * the catalog, and a committed BENCH_AB_*.json proving the delta in
  * one boot. Variants may be deleted once their claim is recorded.
  *
  * The x35 entries below are RETAINED NEGATIVE RESULTS (round 6): three
  * plausible pagerank replans that all LOSE to the catalog plan in
  * same-boot interleaved min-of-N runs (BENCH_AB_r06_x35.json) — kept
  * callable so the comparison stays reproducible. */
object AbVariants {
  import graft.GraftCaches.TrackedPersist
  import graft.tables.Tables._

  def variants: Map[String, (SparkSession, String) => DataFrame] = Map(

    // x174 interpreted-HOF (m, k) fold (round 10): the pre-native
    // bitmask-fold spelling — O(la·lb) boxed lambda evaluations per
    // pair; kept callable as the same-boot cost control for the
    // graft_jaro_mk codegen kernel adoption (hash-identical output,
    // parity spec-pinned in Ext53Spec).
    "x174_jaro_winkler__hoffold" -> ((s, d) =>
      Ext53.jaroQuery(s, d, nativeMk = false)),

    // x178 phonetic-key blocking (round 11, VERDICT r10 #5): the same
    // Fellegi-Sunter EM over pairs blocked on x175's Soundex of the
    // first token instead of exact token count — the scale lever the
    // scaladoc names. Kept callable so the cross-blocking parameter
    // comparison (Ext56Spec) stays reproducible; NOT an oracle entry
    // (different pair population by design).
    "x178_fellegi_sunter__sdxblock" -> ((s, d) =>
      Ext56.fellegiSunter(s, d, sdxBlock = true)),

    // x183 persist-free form (round 11, ADVICE r10): without the pair
    // persist the nPairs count re-runs the documents scan + pair
    // equi-join before the ranked aggregation. Kept callable as the
    // same-boot cost control for the adopted persist
    // (BENCH_AB_r11_x183persist.json).
    "x183_wilcoxon_signed_rank__nopersist" -> ((s, d) =>
      Ext59.wilcoxon(s, d, persist = false)),

    // x187/x189 persisted forms: the r11 catalog choice, REVERSED in
    // round 15 (BENCH_AB_r15_r11persists.json — the frames are
    // exchange-topped, so stage reuse dedupes their consumers and the
    // persists were pure materialization barriers; the r11 "corpus
    // re-scan" rationale predated the r14 stage-reuse insight). Kept
    // callable as the same-boot controls.
    "x187_kruskal_wallis__persist" -> ((s, d) =>
      Ext60.kruskalWallis(s, d, persist = true)),
    "x189_meteor_lite__persist" -> ((s, d) =>
      Ext61.meteorLite(s, d, persist = true)),

    // x64 persist-free form (round 10): without the hash-frame persist
    // the REAL PNG/BMP encode+decode pipeline runs three times (band
    // explode + both verify joins). Kept callable as the same-boot cost
    // control for the adopted persist (BENCH_AB_r10_x64persist.json).
    "x64_image_ahash__nopersist" -> ((s, d) =>
      Ext11.imageAhash(s, d, persist = false)),

    // x143 scheduled form (round 7): the BeamSchedule layered search
    // with scheduleFor(n) knobs on the real corpus — at sf0.1 (n=2000)
    // that is 2 layers like the catalog, but Murmur-hashed layer
    // sampling and the WHOLE top layer as the entry set (exact top-4
    // over ≤ topCap nodes). Kept callable so the catalog-vs-scheduled
    // cost comparison stays same-boot reproducible.
    // x143 round-7 knobs (round 8): the PRE-knob form — sparser graph
    // (block 64, 12-NN) and narrower search (widths 12/6/4) — whose
    // held-out recall@3 measured 0.70 at sf0.1 (the r7 recall valley).
    // Kept callable as the same-boot cost control for the round-8
    // catalog knobs (block 128, 16-NN, widths 32/12/8, recall 0.95+);
    // BENCH_AB_r08_x143_knobs.json records the comparison.
    "x143_beam_ann__pre" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, bFull = 12, bCoarse = 6, bEntry = 4,
      blkFull = 64, mFull = 12)),

    // x143 construction-persist probes (round 8, VERDICT r7 #3): the
    // rank chain re-executes its input for range sampling + zipWithIndex
    // counts, so these cache (a) the quantized SRP projection, (b) also
    // the inner ranked frame. MEASURED NEUTRAL same-boot
    // (BENCH_AB_r08_x143_persist.json: persistqr 11.93 s vs catalog
    // 12.03 s min-of-5; the 3-arm probe run read 12.98/13.65/13.57) —
    // at toy scale the construction is stage-latency-bound, not
    // recompute-bound, so the catalog keeps the persist-free form (two
    // fewer cached corpus-scale frames in executor memory at 100 TB).
    // Hash-neutral either way — persists change execution, not results.
    "x143_beam_ann__persistq" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, persistQuant = true)),
    "x143_beam_ann__persistqr" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, persistQuant = true, persistRank = true)),

    // r14 optimization probes on the FLAT catalog form (the r8 persist
    // probe above predates the r12 flat adoption): (a) cache the
    // quantized+SRP projection so the rank chain's eager re-executions
    // (GlobalSeq's range sampling + zipWithIndex count jobs, then the
    // persist materialization) stop recomputing the 18 interpreted HOF
    // projections from parquet per pass; (b) also cache the inner
    // ranked frame; (c) per-hop logical lineage cut (BeamSchedule's
    // round-14 pattern) on top. All three are execution-only knobs —
    // row-identical by construction.
    "x143_beam_ann__pqflat" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, coarseLayer = false, persistQuant = true)),
    "x143_beam_ann__pqrflat" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, coarseLayer = false, persistQuant = true,
      persistRank = true)),
    "x143_beam_ann__pqrlincut" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, coarseLayer = false, persistQuant = true,
      persistRank = true, lineageCutHops = true)),
    "x143_beam_ann__lincut" -> ((s, d) => Ext43.beamAnn(s, d,
      twoBands = true, coarseLayer = false, lineageCutHops = true)),

    // r14 shared-subtree probes (guide §2.4), same-boot evidence in
    // BENCH_AB_r14_sharedsubtrees.json: q9's twice-inlined late CTE
    // (exchange-less shared subtree — genuinely recomputed; the persist
    // form won 1.60 vs 2.16 s and was adopted), x66's thrice-read pair
    // set and x138's twice-read union source (both end at identical
    // exchanges AQE stage reuse already shares — wash/regression,
    // persist-free forms kept).
    "q9_sole_late_supplier__sqlcte" -> ((s, d) => {
      graft.tables.Tables.registerViews(s, d)
      s.sql("""
        WITH late AS (
          SELECT l_orderkey, l_suppkey FROM lineitem JOIN orders
            ON l_orderkey = o_orderkey
          WHERE unix_micros(CAST(l_shipdate AS TIMESTAMP)) -
                unix_micros(CAST(o_orderdate AS TIMESTAMP))
                > 60 * 86400000000
        )
        SELECT l1.l_suppkey AS suppkey, count(*) AS numwait
        FROM late l1
        WHERE EXISTS (SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
            WHERE l3.l_orderkey = l1.l_orderkey
              AND l3.l_suppkey <> l1.l_suppkey)
        GROUP BY l1.l_suppkey
        ORDER BY numwait DESC, suppkey""")
    }),
    "x66_triangle_count__nopersist" -> ((s, d) => {
      val e = Ext.lshVerifiedPairs(s, d, 0.5).select(col("id1"), col("id2"))
      val wedge = e.select(col("id1").as("a"), col("id2").as("b"))
        .join(e.select(col("id1").as("b"), col("id2").as("c")), "b")
      wedge.join(e.select(col("id1").as("a"), col("id2").as("c")),
          Seq("a", "c"), "left_semi")
        .select(col("a"), col("b"), col("c"))
        .orderBy(col("a"), col("b"), col("c"))
    }),
    "x138_label_propagation__pairpersist" -> ((s, d) =>
      Ext40.labelPropagation(s, d, persistPairs = true)),

    // r14: x47 WITH the pre-r14 up-front doc_id repartition (the catalog
    // dropped it — a wash at sf0.1; r15 correction: NOT a saved shuffle,
    // the aggregation re-inserts its own exchange — see Ext7. Kept
    // callable for single-unsplittable-file sources and as the A/B
    // control)
    "x47_sparse_cosine__repart" -> ((s, d) =>
      Ext7.sparseCosineTopK(graft.tables.Tables.documents(s, d),
        dfLo = 2, dfHi = 4, k = 25, repartitionByDoc = true)),

    // r14: j12 with the pre-r14 SERIAL physical-design writes (guide
    // §2.6 overlap adopted in the catalog; this is the control)
    "j12_bucketed_join__serialwrite" -> ((s, d) =>
      Ext9.bucketedJoin(s, d, parallelWrites = false)),

    // x155 single-pass side-flag form (union both sides into ONE
    // (pair, n, gram) groupBy, clip = least with no join) — the round-8
    // NEGATIVE result: 9.76 vs 5.26 s min-of-3 same-boot at sf0.1
    // (BENCH_AB_r08_x155.json). Per-gram multiplicity ~1 means map-side
    // combine saves nothing, so the union only fattens the exchange.
    // Catalog keeps the x152-shaped join-clip form.
    "x155_chrf__singlepass" -> ((s, d) => Ext47.chrF(s, d, joinClip = false)),

    // x154/x156 round-8 two-limb 124-token forms (round 9): the cost
    // controls for the k-limb array-state generalization that lifted
    // LcsCap to 992. On this corpus (max ~110 tokens) the outputs are
    // identical; the k-limb form actually does LESS bit work for m <= 62
    // (one limb instead of a forced two) at the price of the inner
    // carry-fold bookkeeping. BENCH_AB_r09_lcscap.json records the
    // same-boot comparison.
    "x154_rouge_l__2limb" -> ((s, d) => Ext47.rougeL(s, d, kLimb = false)),
    "x156_wer__2limb" -> ((s, d) => Ext47.wer(s, d, kLimb = false)),

    // x155 packed-key form (round 9, VERDICT #3): shuffle grams as
    // 48-bit BIGINT keys instead of ≤6-char strings — halves the key
    // width through the three big exchanges at the price of per-char
    // ascii() extraction during generation. NEGATIVE result, decisively:
    // 13.36 vs 4.59 s min-of-5 same-boot at sf0.1
    // (BENCH_AB_r09_x155.json) — the O(n) single-char substring calls
    // inside the packing aggregate cost ~3× what the narrower exchange
    // saves. Codegen'd substring(tc, i, n) emits ONE arraycopy per gram;
    // per-char extraction emits n allocations plus a fold. Same family
    // as the r8 single-pass negative: the exchange is not where x155's
    // time goes. Value-identical on ASCII corpora (Ext47Spec pins it).
    "x155_chrf__packedkeys" ->
      ((s, d) => Ext47.chrF(s, d, joinClip = true, packKeys = true)),

    // x155/x161 HOF-gram controls (round 10, VERDICT #6): the catalog
    // ADOPTED the native GraftCharGrams generator — 0.76 vs 4.82 s
    // min-of-5 same-boot at sf0.1 (BENCH_AB_r10_chrgram.json; x161's
    // twin decision in BENCH_AB_r10_chrgram161.json) — after the r8/r9
    // exchange-shrink negatives proved the time was compute: the
    // interpreted named_struct pyramid plus an O(len) substring re-walk
    // PER GRAM. These controls keep the original HOF spelling callable;
    // Ext47Spec/Ext49Spec pin hash-equality of the two paths.
    "x155_chrf__hofgrams" ->
      ((s, d) => Ext47.chrF(s, d, joinClip = true)),
    "x161_chrf_pp__hofgrams" ->
      ((s, d) => Ext49.chrFpp(s, d, nativeGrams = false)),

    // x152/x171 HOF word-gram controls (round 10, late): the catalog
    // ADOPTED the native GraftWordGrams generator — the chrF finding's
    // word-gram edition (prefix-digit flat strings replace the
    // interpreted named_struct pyramid; order = ascii(g)-48, key =
    // md5(substring(g, 2))). BENCH_AB_r10_wordgram.json records the
    // same-boot decision; Ext46/Ext51 specs pin path equality.
    "x152_bleu_precision__hofgrams" ->
      ((s, d) => Ext46.bleuPrecision(s, d, nativeGrams = false)),
    "x171_self_bleu__hofgrams" ->
      ((s, d) => Ext51.selfBleu(s, d, nativeGrams = false)),

    // x160 rescan control (round 9): the catalog ADOPTED the persist —
    // the narrow (doc_id, s1, s2) signals frame feeds SEVEN scalar
    // jobs with the SAME projection (the x150 green-light case, unlike
    // x152's differing projections) and the persist won 1.36 vs 1.99 s
    // min-of-5 same-boot (BENCH_AB_r09_x160.json). Hash-neutral.
    "x160_kendall_tau_b__nopersist" ->
      ((s, d) => Ext49.kendallTauB(s, d, persist = false)),

    // x163 persisted-histogram control: the r9 catalog choice, REVERSED
    // in round 15 (same rule as x187/x189 above — the histogram is
    // exchange-topped; no consumer re-scans the corpus persist-free).
    "x163_wasserstein_drift__persist" ->
      ((s, d) => Ext49.wasserstein(s, d, persist = true)),

    "x143_beam_ann__scheduled" -> ((s, d) => {
      val eQ = Ext43.quantized(s, d)
      val n = eQ.count()
      BeamSchedule.beamAnnLayered(eQ, 50L, BeamSchedule.scheduleFor(n))
    }),

    // x146 scheduled twin (round 7): held-out recall@3 of the
    // SCHEDULED beam form (same perturbed non-member queries and
    // brute-force ground truth as the catalog x146) — closes the loop
    // on the recall-at-scale contract: BeamScheduleSpec shows the
    // schedule restores SELF-recall at 30k vectors; this measures what
    // the schedule does for HELD-OUT queries on the shipped corpus.
    "x146_beam_recall__scheduled" -> ((s, d) => {
      val e0 = Ext43.quantized(s, d).persistTracked()
      val n = e0.count()
      val qs = e0.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"), expr(Ext43.PerturbSql).as("qq"))
      val gt = e0.crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id"),
          Ext43.idist2Hof(col("qq"), col("q")).as("dist2"))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("q_id"))
            .orderBy(col("dist2"), col("vec_id"))))
        .filter(col("rn") <= 3).select(col("q_id"), col("vec_id"))
      val beam3 = BeamSchedule.beamAnnLayered(e0, 50L,
          BeamSchedule.scheduleFor(n), perturb = true)
        .select(col("q_id"), col("vec_id"))
      val hits = beam3.join(gt, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      qs.select(col("q_id")).join(hits, Seq("q_id"), "left")
        .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          expr("coalesce(n_hits, 0L) * 1000 div 3").as("recall_pm"))
        .orderBy(col("q_id"))
    }),

    // x151 controls (round 7): fully DISTRIBUTED MM rounds — broadcast
    // and SMJ spellings. Both ~3.2 s same-boot at sf0.1 vs ~1 s for
    // the catalog's driver-rounds form (the iteration is arms²-bounded;
    // distributing it is pure sequential stage overhead).
    "x151_bradley_terry__dist" -> ((s, d) =>
      Ext46.bradleyTerry(s, d, broadcastRounds = true)),
    "x151_bradley_terry__smj" -> ((s, d) =>
      Ext46.bradleyTerry(s, d, broadcastRounds = false)),

    // x152 retained negative result (round 7): persisting the pair
    // frame loses same-boot (1.92 vs 1.70 s at sf0.1,
    // BENCH_AB_r07_x152.json) — the three consumers prune different
    // columns, so pruned rescans beat one full-width cached frame.
    "x152_bleu_precision__persist" -> ((s, d) =>
      Ext46.bleuPrecision(s, d, persistPairs = true)),

    // x35 candidate: cache the doubled edge set ALREADY PARTITIONED on
    // src (the degree join's own exchange provides the layout), so the
    // per-iteration rank joins stream cached edges with ZERO exchange —
    // only the O(nodes) rank frame moves each round. shuffle_hash hints
    // skip the per-round sort of the 2·|E| cached side.
    "x35_pagerank__v2" -> ((s, d) => {
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val doubled = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b").as("src"), col("a").as("dst")))
      val deg = doubled.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      val edd = doubled.join(deg.hint("shuffle_hash"), "src").persistTracked()
      var r = edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      for (_ <- 2 to 3) {
        r = edd.join(r.hint("shuffle_hash"), col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x35 candidate: v1 shape with STATIC broadcast hints on the degree
    // and rank frames (all O(nodes)) — no AQE re-plan detour, no edge
    // exchange anywhere after the distinct.
    "x35_pagerank__v3" -> ((s, d) => {
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val degA = e0.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val degB = e0.groupBy(col("b")).agg(count(lit(1)).as("outdeg"))
      val edd = e0.join(broadcast(degA), "a")
          .select(col("a").as("src"), col("b").as("dst"), col("outdeg"))
        .union(e0.join(broadcast(degB), "b")
          .select(col("b").as("src"), col("a").as("dst"), col("outdeg")))
        .persistTracked()
      var r = edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      for (_ <- 2 to 3) {
        r = edd.join(broadcast(r), col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x35 candidate: degrees live on the O(nodes) frame, not the edge
    // frame — the edge cache is a map-only union of the cached pair set
    // (no degree joins at all), and each round joins edges with a tiny
    // node-level contribution frame c = r div outdeg (AQE broadcasts it)
    // before the partial-aggregable dst rollup.
    "x35_pagerank__v4" -> ((s, d) => {
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val doubled = e0.select(col("a").as("src"), col("b").as("dst"))
        .union(e0.select(col("b").as("src"), col("a").as("dst")))
      val deg = doubled.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
        .select(col("src").as("nid"), col("outdeg"))
        .persistTracked()
      // uniform start rank folds into a node-level contribution frame, so
      // every round has the same shape: edge ⨝ contribution → dst rollup
      var c = deg.select(col("nid"), expr("1000000 div outdeg").as("c"))
      var r = c // placeholder; overwritten in round 1
      for (i <- 1 to 3) {
        r = doubled.join(c, col("src") === col("nid"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
        if (i < 3)
          c = r.join(deg, col("id") === col("nid"))
            .select(col("nid"), expr("r div outdeg").as("c"))
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),


    // x35 round-13 probe (VERDICT r12 #5): the Components cadence —
    // per-round persist + count + LogicalRDD freeze + unpersist of the
    // prior round — applied to the rank frame. At 3 fixed rounds the
    // lineage is only 3 joins deep, so the hypothesis is that the extra
    // per-round materialization actions COST more than the truncation
    // saves; measured to adopt-or-close.
    // RETAINED NEGATIVE (round 13, BENCH_AB_r13_x35.json +
    // _confirm.json, X35ProbeCheck rank-equality gate): __trunc is a
    // wash (5.44 vs 5.39 min-of-5 same-boot), __conv read 12% FASTER
    // on a noisy boot (4.76 vs 5.39) but 12% SLOWER on the cleaner
    // confirmation boot (4.76 vs 4.25 min-of-7, controls ~at-ref) —
    // boot noise, not signal. The catalog's fixed-round lazy chain
    // stays; truncation earns its cost only at Components-scale round
    // counts, exactly as the r6 probe concluded for deeper variants.
    "x35_pagerank__trunc" -> ((s, d) => {
      import org.apache.spark.sql.types.{StructType, StructField, LongType}
      val rankSchema = StructType(Seq(
        StructField("id", LongType, nullable = true),
        StructField("r", LongType, nullable = true)))
      def frozen(df: org.apache.spark.sql.DataFrame) =
        s.createDataFrame(df.select(col("id"), col("r")).rdd, rankSchema)
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val degA = e0.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val degB = e0.groupBy(col("b")).agg(count(lit(1)).as("outdeg"))
      val edd = e0.join(degA, "a")
          .select(col("a").as("src"), col("b").as("dst"), col("outdeg"))
        .union(e0.join(degB, "b")
          .select(col("b").as("src"), col("a").as("dst"), col("outdeg")))
        .persistTracked()
      var cached = edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
        .persistTracked()
      cached.count()
      var r = frozen(cached)
      for (_ <- 2 to 3) {
        val next = edd.join(r, col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
          .persistTracked()
        next.count()
        cached.unpersist(blocking = false)
        cached = next
        r = frozen(next)
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x143/x146 round-15 probe: construction with AQE disabled — the
    // per-hop lineage cut's .rdd normally triggers AQE's EAGER stage-by-
    // stage materialization at construction (each hop = several
    // sequential driver-orchestrated jobs; the listener probe counted 53
    // for one x143 run). With adaptive off during construction the hop
    // RDDs compile LAZILY and the whole search executes under the final
    // action, where independent arms overlap. Results are AQE-invariant.
    // Outcome (BENCH_AB_r15_noaqecons{,_confirm}.json): x146 ADOPTED the
    // lazy construction (~1.4× — its brute-force gt arm overlaps the
    // beam); x143 measured ~2× SLOWER lazily (no independent arm, and
    // the lazy hop chain loses AQE coalescing) — retained negative here.
    "x143_beam_ann__noaqecons" -> ((s, d) => {
      val prev = s.conf.get("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.enabled", "false")
      try Ext43.beamAnn(s, d, twoBands = true, coarseLayer = false,
        lineageCutHops = true)
      finally s.conf.set("spark.sql.adaptive.enabled", prev)
    }),
    // the pre-r15 EAGER x146 construction (AQE on throughout) — the
    // same-boot control for the catalog's lazy-construction adoption
    "x146_beam_recall__aqecons" -> ((s, d) => Ext43.x146Body(s, d)),

    // x4 round-15 probe (VERDICT r14 #6): the window-free prefix-rank
    // spelling — sort_array(collect_list) + slice + posexplode instead of
    // row_number over the per-doc window. RETAINED NEGATIVE: same-boot
    // wash both ways (BENCH_AB_r15_x4prefix{,_confirm}.json) and no
    // at-scale edge (see Ext.ngramJaccard); catalog keeps the window.
    "x4_ngram_jaccard__aggprefix" -> ((s, d) =>
      Ext.ngramJaccard(s, d, windowPrefix = false)),
    // x4 probe: prefix un-persisted — the self-join's two references
    // share the window's doc_id exchange; the window+filter re-run 2×.
    "x4_ngram_jaccard__nopersistprefix" -> ((s, d) =>
      Ext.ngramJaccard(s, d, windowPrefix = true, persistPrefix = false)),

    // x85/x167/x97 round-15 controls: the pre-r15 forms with their count
    // tables persisted (the catalog dropped those persists — every
    // consumer pair shares the table's own groupBy exchange, so AQE
    // stage reuse dedupes the heavy work persist-free; the x116 twin,
    // BENCH_AB_r15_{x85,c2persists}.json).
    "x85_bigram_lm_score__persistc2" -> ((s, d) =>
      Ext20.bigramLmScore(s, d, persistC2 = true)),
    "x167_min_k_prob__persistc2" -> ((s, d) =>
      Ext49.minKProb(s, d, persistC2 = true)),
    "x97_backoff_lm__persisttables" -> ((s, d) =>
      Ext25.backoffLm(s, d, persistTables = true)),

    // r15: value-bounded rollup persists dropped in the catalog (same
    // rule; BENCH_AB_r15_rollups.json) — these controls keep the
    // persisted forms callable.
    "x100_t_closeness__persistrollup" -> ((s, d) =>
      Ext26.tCloseness(s, d, persistRollup = true)),
    "x122_chi2_independence__persistrollup" -> ((s, d) =>
      Ext34.chi2Independence(s, d, persistRollup = true)),
    "x129_dataset_merkle__persistrollup" -> ((s, d) =>
      Ext36.datasetMerkle(s, d, persistRollup = true)),
    "x136_filter_waterfall__persistrollup" -> ((s, d) =>
      Ext38.filterWaterfall(s, d, persistRollup = true)),
    "x79_vocab_coverage__persistrollup" -> ((s, d) =>
      Ext19.vocabCoverage(s, d, persistFreq = true)),
    "x96_skew_audit__persistrollup" -> ((s, d) =>
      Ext24.skewAudit(s, d, persistCounts = true)),
    // x172: the drop REVERSED (0.66 vs 0.52 persisted — GlobalSeq's
    // eager zip jobs read freq 3+ times); catalog keeps the persist and
    // this control is the persist-free arm.
    "x172_zipf_buckets__nopersistrollup" -> ((s, d) =>
      Ext52.zipfBuckets(s, d, persistFreq = false)),
    "x106_cluster_purity__persistrollup" -> ((s, d) => {
      val ct = Ext28.cellLabelContingency(s, d, persist = true)
      Ext28.clusterPurityFrom(ct)
    }),
    "x131_cooccurrence_lift__persistrollup" -> ((s, d) =>
      Ext36.cooccurrenceLift(s, d, persistBaskets = true)),
    // x47 control: the pre-r15 form WITH the weighted-index persist
    // (the catalog dropped it — 2.24 vs 4.15 s min same-boot,
    // BENCH_AB_r15_x47w.json).
    "x47_sparse_cosine__persistw" -> ((s, d) =>
      Ext7.sparseCosineTopK(graft.tables.Tables.documents(s, d),
        dfLo = 2, dfHi = 4, k = 25, repartitionByDoc = false,
        persistW = true)),

    // x35 round-15 control: the pre-r15 form WITH the e0 persist (the
    // catalog dropped it — 3.72 vs 4.45 s min same-boot,
    // BENCH_AB_r15_rollups3.json; edd's exchange-less persist stays).
    "x35_pagerank__e0persist" -> ((s, d) => {
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val degA = e0.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val degB = e0.groupBy(col("b")).agg(count(lit(1)).as("outdeg"))
      val edd = e0.join(degA, "a")
          .select(col("a").as("src"), col("b").as("dst"), col("outdeg"))
        .union(e0.join(degB, "b")
          .select(col("b").as("src"), col("a").as("dst"), col("outdeg")))
        .persistTracked()
      var r = edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      for (_ <- 2 to 3) {
        r = edd.join(r, col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x116 round-15 probes (VERDICT r14 #5): __rangesel is the pre-r15
    // form (terciles via ext/Quantile's range-sort selection, 2 jobs +
    // an RDD persist); the catalog adopted the integer-histogram
    // selection (one partial-agg job over the value-bounded score
    // rollup). __nopersistc2 additionally drops the c2 persist (its two
    // consumers share the groupBy exchange — the r14 stage-reuse rule).
    "x116_perplexity_buckets__rangesel" -> ((s, d) =>
      Ext32.perplexityBuckets(s, d, histSel = false, persistC2 = true)),
    "x116_perplexity_buckets__nopersistc2" -> ((s, d) =>
      Ext32.perplexityBuckets(s, d, histSel = true, persistC2 = false)),

    // x35 round-15 probe (VERDICT r14 #4): the PURE per-round lineage
    // cut — x143's createDataFrame(rdd, schema) pattern with NO per-round
    // persist/count (r13's __trunc bundled those and measured a wash).
    // x35's rank plan is linear (each round references the previous rank
    // frame once), so the expected win is small; measured to
    // adopt-or-close per the verdict.
    "x35_pagerank__lincut" -> ((s, d) => {
      import org.apache.spark.sql.types.{StructType, StructField, LongType}
      val rankSchema = StructType(Seq(
        StructField("id", LongType, nullable = true),
        StructField("r", LongType, nullable = true)))
      def frozen(df: org.apache.spark.sql.DataFrame) =
        s.createDataFrame(df.select(col("id"), col("r")).rdd, rankSchema)
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val degA = e0.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val degB = e0.groupBy(col("b")).agg(count(lit(1)).as("outdeg"))
      val edd = e0.join(degA, "a")
          .select(col("a").as("src"), col("b").as("dst"), col("outdeg"))
        .union(e0.join(degB, "b")
          .select(col("b").as("src"), col("a").as("dst"), col("outdeg")))
        .persistTracked()
      var r = frozen(edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r")))
      for (_ <- 2 to 3) {
        r = frozen(edd.join(r, col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r")))
      }
      r.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x35 round-13 probe: convergence detection instead of a fixed round
    // count — each round persists the rank frame and counts ranks that
    // moved vs the previous round, stopping early when none did. The
    // fixture graph does not converge inside 3 rounds, so this measures
    // the pure DETECTION overhead (per-round persist + count + compare
    // join) against the catalog's fixed-round lazy chain.
    "x35_pagerank__conv" -> ((s, d) => {
      val e0 = lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
        .join(orders(s, d).select(col("o_orderkey"), col("o_custkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
        .select((col("ck") * 2).as("a"), (col("sk") * 2 + 1).as("b"))
        .persistTracked()
      val degA = e0.groupBy(col("a")).agg(count(lit(1)).as("outdeg"))
      val degB = e0.groupBy(col("b")).agg(count(lit(1)).as("outdeg"))
      val edd = e0.join(degA, "a")
          .select(col("a").as("src"), col("b").as("dst"), col("outdeg"))
        .union(e0.join(degB, "b")
          .select(col("b").as("src"), col("a").as("dst"), col("outdeg")))
        .persistTracked()
      var prev = edd
        .select(col("dst"), expr("1000000 div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
        .select(col("dst").as("id"),
          (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
        .persistTracked()
      var round = 1
      var converged = false
      while (!converged && round < 3) {
        val next = edd.join(prev, col("src") === col("id"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("cs"))
          .select(col("dst").as("id"),
            (lit(150000L) + expr("(85 * cs) div 100")).as("r"))
          .persistTracked()
        val moved = next.as("n")
          .join(prev.select(col("id").as("pid"), col("r").as("pr")),
            col("id") === col("pid"), "left")
          .filter(col("pr").isNull || col("pr") =!= col("r"))
          .count()
        prev.unpersist(blocking = false)
        prev = next
        converged = moved == 0
        round += 1
      }
      prev.select(col("id"), col("r").as("rank"))
        .orderBy(col("rank").desc, col("id")).limit(100)
    }),

    // x143 candidate: single ranking band for full-layer construction
    // (half the candidates, one less GlobalSeq sort) — A/B for recall+time
    "x143_beam_ann__oneband" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = false)),

    // x143 round-12 ADOPTION control (VERDICT r11 #2): the two-layer
    // coarse-descent form that WAS the catalog through round 11 —
    // same-boot min-of-5 12.38 s vs the adopted flat form's 7.78 s at
    // sf0.1 with IDENTICAL held-out recall@3 at all 3 SFs
    // (0.950/1.000/1.000, RecallProbe; BENCH_AB_r12_x143cost.json).
    // Layered navigation re-enters at real scale via BeamSchedule
    // (__scheduled below), where log n layers earn their construction.
    "x143_beam_ann__coarse" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, coarseLayer = true)),
    "x143_beam_ann__flat1" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = false, coarseLayer = false)),

    // x143 round-12 cost-decision candidates (VERDICT r11 #2): cheaper
    // graph construction — rank blocks of 32/64 instead of 128 (the
    // candidate-pair count scales with blk). REJECTED: blk 32/64
    // regress held-out recall@3 to 0.833/0.908 at sf0.1 (catalog
    // 0.950) for ≤ 0.5 s over the adopted flat form; the record is
    // BENCH_AB_r12_x143cost.json + the RecallProbe round-12 sweep.
    "x143_beam_ann__blk32" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, blkFull = 32)),
    "x143_beam_ann__blk64" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, blkFull = 64)),
    "x143_beam_ann__flatblk32" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, coarseLayer = false,
        blkFull = 32)),

    // x143 narrow-shuffle construction (ids-only block join, q attached
    // by key): the 100 TB spelling, but MEASURED SLOWER at sf0.1 (21 s
    // vs 14 s same-boot, BENCH_AB_r06_x143.json) — retained negative
    // result; the catalog keeps the payload-carrying form at this scale
    "x143_beam_ann__narrow" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, coarseLayer = true,
        narrowShuffles = true)),

    // x143 hybrid: narrow RANK sorts (cached base, seqs joined back by
    // key) but the payload-carrying band join kept — ALSO measured
    // slower at sf0.1 (34 s vs 17 s same boot): joining the rank frames
    // back costs more than sorting the 512 B rows twice at this scale.
    // Retained negative result #2 for the x143 construction.
    "x143_beam_ann__narrowrank" -> ((s, d) =>
      Ext43.beamAnnNarrowRank(s, d)),

    // x143 without per-hop beam persistence: the round-6 pre-fix path
    // whose logical plan doubles per hop (A/B baseline for the lineage
    // truncation now in the catalog)
    "x143_beam_ann__nohoppersist" -> ((s, d) =>
      Ext43.beamAnn(s, d, twoBands = true, hopPersist = false)),

    // r15: GlobalSeq "one child execution" probes (VERDICT r14 #1) —
    // BOTH RETAINED NEGATIVES, measured same-boot at sf0.1
    // (BENCH_AB_r15_globalseq.json; catalog keeps the zipWithIndex
    // spelling). __offsetseq is the fully-lazy SQL form (range exchange +
    // per-partition count offsets + broadcast join): ~2× wall on the beam
    // queries — it forfeits the zip spelling's LogicalRDD lineage cut and
    // pays two extra exchanges' driver orchestration per call; wash on
    // the simple consumers. __zippersistseq persists the sorted Row RDD
    // across zipWithIndex's two passes (the Quantile pattern): 1.2–1.7× —
    // Row-object cache churn exceeds the saved reduce-side re-run.
    // Value identity of all three spellings is pinned by GlobalSeqSpec.
    "x143_beam_ann__offsetseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withOffsets(Ext43.beamAnn(s, d,
        twoBands = true, coarseLayer = false, lineageCutHops = true))),
    "x146_beam_recall__offsetseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withOffsets(
        Ext43.queries("x146_beam_recall")(s, d))),
    "x125_epoch_shuffle__offsetseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withOffsets(
        Ext35.queries("x125_epoch_shuffle")(s, d))),
    "x159_kendall_tau__offsetseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withOffsets(
        Ext48.queries2("x159_kendall_tau")(s, d))),
    "x143_beam_ann__zippersistseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withZipPersist(Ext43.beamAnn(s, d,
        twoBands = true, coarseLayer = false, lineageCutHops = true))),
    "x146_beam_recall__zippersistseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withZipPersist(
        Ext43.queries("x146_beam_recall")(s, d))),
    "x125_epoch_shuffle__zippersistseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withZipPersist(
        Ext35.queries("x125_epoch_shuffle")(s, d))),
    "x159_kendall_tau__zippersistseq" -> ((s, d) =>
      graft.ingest.GlobalSeq.withZipPersist(
        Ext48.queries2("x159_kendall_tau")(s, d))),
  )
}
