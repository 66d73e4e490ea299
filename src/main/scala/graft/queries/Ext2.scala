package graft.queries

import graft.GraftCaches.TrackedPersist
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.tables.Tables._
import graft.ext.{Components, Quantile, ShardPack, Similarity, TextOps}
import graft.queries.Ext.{docShinglesHashed, trunc6}

/** Round-3 LLM-data-pipeline additions (SURVEY §2.12 continued): the steps a
  * training-data pipeline runs AFTER pair finding — clustering near-dup
  * pairs into groups, TF-IDF term salience, reproducible hash sampling,
  * token-budget shard packing, and per-source quality-percentile filtering.
  * Every query keeps the catalog's determinism rules: md5-prefix hashes on
  * both engines, ratios of exact integers, nearest-rank (never interpolated)
  * percentiles, and no transcendentals (TF-IDF uses the rational tf·N/df
  * form rather than log-idf so both engines do the identical two IEEE ops).
  */
object Ext2 {

  private val stops = Seq("the", "a", "of", "and", "to", "in", "is")

  /** X2f SimHash near-dup PAIRS, end to end: 48-bit fingerprints (16 bits
    * saturate on a shared-vocabulary corpus — whole duplicate groups land at
    * Hamming 0 with unrelated docs), banded into 2 × 24-bit halves. By
    * pigeonhole, Hamming ≤ 1 pairs share at least one exact half, so the
    * band equi-join is COMPLETE for the threshold, never a recall heuristic
    * — and candidate cost tracks band collisions, not n². Verification is
    * one xor+popcount per candidate. Shared by x22 (pair listing) and x31
    * (survivorship pick over the clustered pairs). */
  private[queries] def simhashPairs(s: SparkSession, d: String): DataFrame = {
    val f = documents(s, d)
      .repartition(col("doc_id"))
      .select(col("doc_id"),
        array_distinct(TextOps.words(col("text"))).as("toks"))
      // empty-token docs carry no signal: simhash48([]) is a degenerate
      // all-ones sentinel that would collide every such doc at Hamming 0,
      // and the oracle's unnest+GROUP BY drops them anyway — exclude on
      // both sides (unreachable via split() tokens, guards future
      // tokenizers)
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), TextOps.simhash48(col("toks")).as("fp"))
      .persistTracked()
    val lo = f.select(col("doc_id"), col("fp"), lit(0).as("bi"),
      col("fp").bitwiseAND(lit((1L << 24) - 1)).as("bv"))
    val hi = f.select(col("doc_id"), col("fp"), lit(1).as("bi"),
      shiftright(col("fp"), 24).as("bv"))
    val bands = lo.union(hi)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bi") === col("b.bi") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    cand.join(f.as("x"), col("id1") === col("x.doc_id"))
      .join(f.as("y"), col("id2") === col("y.doc_id"))
      .select(col("id1"), col("id2"),
        bit_count(col("x.fp").bitwiseXOR(col("y.fp"))).as("hamming"))
      .filter(col("hamming") <= 1)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X2e near-dup GROUPS: LSH-verified pairs (x3's exact output) clustered
    // into connected components by distributed min-label propagation
    // (ext/Components) — pairs → transitive dedup groups → stable cluster id
    // (= min doc_id), plus the group size. Isolated docs are singletons.
    // NOTE: like x24, this constructor EXECUTES work (the propagation loop
    // is inherently iterative actions); plan-only callers should skip it.
    "x17_dedup_groups" -> ((s, d) => {
      val pairs = Ext.lshVerifiedPairs(s, d, 0.5).select(col("id1"), col("id2"))
      val nodes = documents(s, d).select(col("doc_id").as("id"))
      Components.connectedComponents(nodes, pairs)
        .select(col("id").as("doc_id"), col("cluster_id"))
        .withColumn("n_members",
          count(lit(1)).over(Window.partitionBy(col("cluster_id"))))
        .orderBy(col("doc_id"))
    }),

    // X4d TF-IDF top terms: rational scoring tfreq·N/df (exactly two IEEE
    // double ops, identical on both engines — log-idf would be
    // transcendental), top 3 per doc with term-order tie-break. All three
    // aggregations are partial-aggregable hash groupBys; the corpus size N
    // is a broadcast 1-row frame, never a driver constant baked at plan
    // time.
    "x18_tfidf_topk" -> ((s, d) => {
      val docs = documents(s, d)
      val tok = docs.repartition(col("doc_id"))
        .select(col("doc_id"), explode(TextOps.words(col("text"))).as("term"))
      val tf = tok.groupBy(col("doc_id"), col("term"))
        .agg(count(lit(1)).as("tfreq"))
      val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n"))
      tf.join(dfq, Seq("term")).crossJoin(broadcast(n))
        .select(col("doc_id"), col("term"),
          (col("tfreq").cast("double") * col("n") / col("df")).as("tfidf"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term"))))
        .filter(col("rnk") <= 3)
        .select(col("doc_id"), col("term"), col("rnk"), col("tfidf"))
        .orderBy(col("doc_id"), col("rnk"))
    }),

    // X4e reproducible sampling: keep ~10% of the corpus by md5-prefix hash
    // of a salted id — bit-identical on every engine and every run (unlike
    // rand()-based sampling), stable under corpus growth (a doc's bucket
    // never changes), and trivially re-seedable by changing the salt. Pure
    // per-row filter: no shuffle, pushes down to the scan at 100 TB.
    "x19_hash_sample" -> ((s, d) => {
      val h = TextOps.hash32(concat(lit("sample:"), col("doc_id").cast("string")))
      documents(s, d)
        .select(col("doc_id"), col("source"), pmod(h, lit(100)).as("bucket"))
        .filter(col("bucket") < 10)
        .orderBy(col("doc_id"))
    }),

    // X4f token-budget shard packing: global running token total in doc
    // order via ext/ShardPack (range sort + O(P) offset exchange — never a
    // single-partition window), shard = (cum-1) / budget.
    "x20_shard_pack" -> ((s, d) =>
      ShardPack.pack(
        documents(s, d).select(col("doc_id"),
          size(TextOps.words(col("text"))).as("n_tokens")),
        "doc_id", "n_tokens", budget = 1000L)
        .orderBy(col("doc_id"))),

    // X2f SimHash near-dup PAIRS, end to end: 48-bit fingerprints (16 bits
    // saturate on a shared-vocabulary corpus — whole duplicate groups land
    // at Hamming 0 with unrelated docs), banded into 2 × 24-bit halves. By
    // pigeonhole, Hamming ≤ 1 pairs share at least one exact half, so the
    // band equi-join is COMPLETE for the threshold, never a recall
    // heuristic — and candidate cost tracks band collisions, not n².
    // Verification is one xor+popcount per candidate.
    "x22_simhash_neardup" -> ((s, d) =>
      simhashPairs(s, d).orderBy(col("id1"), col("id2"))),

    // X3d true-IVF ANN: every vector assigned to its NEAREST anchor
    // direction (argmax dot over K baked Rademacher anchors, first-index
    // tie-break — a Voronoi cell per anchor, the real inverted-file coarse
    // quantizer; x7 bucketed by a pre-existing label, x16 by LSH codes).
    // The anchor dots are staged into columns so each is computed once;
    // the probe is an equi-join on the cell id, exact cosine re-ranks
    // in-cell. Same plan at any corpus size.
    "x23_ivf_centroid_topk" -> ((s, d) => {
      import graft.ext.IvfCentroids.{K, c}
      val withDots = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", Similarity.norm2(col("v")))
        .select(Seq(col("vec_id"), col("v"), col("nv")) ++
          (0 until K).map(k =>
            Similarity.dot(col("v"), typedLit(c(k))).as(s"d$k")): _*)
      // first index achieving the max — deterministic under ties
      val cell = (0 until K).foldRight(lit(K - 1)) { (k, rest) =>
        if (k == K - 1) rest
        else when((k + 1 until K).map(j => col(s"d$k") >= col(s"d$j")).reduce(_ && _),
          lit(k)).otherwise(rest)
      }
      val e = withDots.select(col("vec_id"), col("v"), col("nv"), cell.as("cell"))
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("cell").as("q_cell"),
          col("v").as("qv"), col("nv").as("qnv"))
      val cos6 = trunc6(
        Similarity.dot(col("qv"), col("v")) / sqrt(col("qnv") * col("nv")))
      q.join(e, col("q_cell") === col("cell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("n_id"), col("rnk"), col("cos6"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // X6b approx quantiles: the sketch twin of x24 (exact global
    // percentiles) — approx_percentile is a mergeable partial aggregate,
    // the scale path when an epsilon-exact answer suffices. No SQL oracle
    // (sketch internals differ across engines → rows-only driver check);
    // the accuracy bound is spec-tested against the exact x24 machinery.
    "x26_approx_quantiles" -> ((s, d) => {
      lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000))
            .as("p50_approx"),
          percentile_approx(col("l_extendedprice"), lit(0.9), lit(10000))
            .as("p90_approx"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // X2g benchmark DECONTAMINATION: directional containment of each
    // corpus doc against a benchmark set (here: doc_id % 100 == 0, the
    // same held-out convention as the ANN queries) — containment =
    // |shared shingles| / |benchmark shingles|, the asymmetric measure a
    // training pipeline uses to drop eval-set leaks (Jaccard under-counts
    // when the corpus doc is much longer than the benchmark item).
    // Candidates come from an inverted index over the BENCHMARK side only
    // (the small side — at 100 TB the benchmark is KBs-MBs, so the
    // candidate join prunes the corpus by shared-shingle equality and the
    // benchmark index broadcasts). Verify is the native sorted-merge
    // intersection on md5-hashed shingle sets.
    "x25_decontamination" -> ((s, d) => {
      val t = 0.05 // the synthetic corpus has no heavy cross-split leaks; a
                   // real deployment sets this near 0.8
      val sh = docShinglesHashed(documents(s, d)).persistTracked()
      val bench = sh.filter(col("doc_id") % 100 === 0)
        .select(col("doc_id").as("bench_id"), col("hs").as("bench_hs"))
      val corpus = sh.filter(col("doc_id") % 100 =!= 0)
      // index the HASHED shingles (hs), not the strings: verification (and
      // the oracle) intersect hashed sets, so candidate generation must use
      // the same key space — a 32-bit collision that contributes to `inter`
      // must also be able to produce the candidate, or engine and oracle
      // could disagree on threshold-edge pairs
      val inv = bench.select(col("bench_id"),
        explode(col("bench_hs")).as("sh32"))
      val cand = corpus.select(col("doc_id"), explode(col("hs")).as("sh32"))
        .join(inv, Seq("sh32"))
        .select(col("doc_id"), col("bench_id"))
        .distinct()
      cand.join(corpus.select(col("doc_id"), col("hs")), Seq("doc_id"))
        .join(bench.select(col("bench_id"), col("bench_hs")), Seq("bench_id"))
        .select(col("doc_id"), col("bench_id"),
          TextOps.intersectCard(col("hs"), col("bench_hs")).cast("int").as("inter"),
          size(col("bench_hs")).as("nb"))
        .filter(col("nb") > 0)
        .select(col("doc_id"), col("bench_id"),
          (col("inter").cast("double") / col("nb")).as("containment"))
        .filter(col("containment") >= t)
        .orderBy(col("doc_id"), col("bench_id"))
    }),

    // X3e MULTI-PROBE LSH ANN: x16's sign-code bucketing, but each query
    // also probes its P one-bit-neighbor codes (the standard recall lever —
    // a near neighbor that fell one hyperplane to the other side is still
    // found). Candidates from the 1+P probes union by bucket equality, then
    // exact cosine re-ranks; plan stays an equi join at any corpus size.
    "x27_lsh_multiprobe" -> ((s, d) => {
      import graft.ext.Lsh
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nv", Similarity.norm2(col("v")))
        .withColumn("bucket",
          (0 until Lsh.Planes).map(p =>
            when(Similarity.dot(col("v"), typedLit(Lsh.signs(p))) > 0,
              lit(1 << p)).otherwise(lit(0))).reduce(_ + _))
      val probes = array(Seq(col("bucket")) ++
        (0 until Lsh.Planes).map(p => col("bucket").bitwiseXOR(lit(1 << p))): _*)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), explode(probes).as("probe"),
          col("v").as("qv"), col("nv").as("qnv"))
      val cos6 = trunc6(
        Similarity.dot(col("qv"), col("v")) / sqrt(col("qnv") * col("nv")))
      q.join(e, col("probe") === col("bucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"), cos6.as("cos6"))
        .distinct() // a neighbor can surface via several probes
        .withColumn("rnk", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("cos6").desc, col("n_id"))))
        .filter(col("rnk") <= 3)
        .select(col("q_id"), col("n_id"), col("rnk"), col("cos6"))
        .orderBy(col("q_id"), col("rnk"))
    }),

    // X4h GLOBAL exact percentiles of the quality score: distributed
    // nearest-rank selection (ext/Quantile — range sort + O(P) count
    // exchange + one narrow extract job; never a single-partition window,
    // never a driver-side sort). The per-group twin is a5_percentiles.
    // NOTE: this constructor EXECUTES the selection jobs (scalar results
    // are inherently actions) and returns the scalars as a local 1-row
    // frame — plan-only callers should skip it (x17 is the other eager
    // entry; everything else returns an unexecuted plan).
    "x24_global_percentiles" -> ((s, d) => {
      import s.implicits._
      val scored = documents(s, d)
        .select(col("doc_id"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"),
          size(col("w")).as("n_tokens"),
          size(array_distinct(col("w"))).as("n_distinct"),
          size(filter(col("w"), x => x.isInCollection(stops))).as("n_stop"))
        .select(col("doc_id"),
          ((col("n_distinct").cast("double") / col("n_tokens")) -
            (col("n_stop").cast("double") / col("n_tokens")) * 0.5).as("q"))
      val (n, vs) = Quantile.nearestRank(scored, col("q"),
        Seq(0.0, 0.5, 0.9, 0.99, 1.0))
      Seq((n, vs(0), vs(1), vs(2), vs(3), vs(4)))
        .toDF("n", "lo", "p50", "p90", "p99", "hi")
    }),

    // X4g quality-percentile filter: x8's quality score, thresholded at each
    // source's nearest-rank p90 (a5's percentile_disc method — pure value
    // selection, zero interpolation arithmetic). Windows partition by
    // source, so the shape scales like any keyed window; the threshold rides
    // the same window (no second scan, no driver round-trip).
    "x21_quality_filter" -> ((s, d) => {
      val bySrc = Window.partitionBy(col("source"))
      val ord = bySrc.orderBy(col("q"), col("doc_id"))
      documents(s, d)
        .select(col("doc_id"), col("source"), TextOps.words(col("text")).as("w"))
        .select(col("doc_id"), col("source"),
          size(col("w")).as("n_tokens"),
          size(array_distinct(col("w"))).as("n_distinct"),
          size(filter(col("w"), x => x.isInCollection(stops))).as("n_stop"))
        .select(col("doc_id"), col("source"),
          ((col("n_distinct").cast("double") / col("n_tokens")) -
            (col("n_stop").cast("double") / col("n_tokens")) * 0.5).as("q"))
        .withColumn("rn", row_number().over(ord))
        .withColumn("n", count(lit(1)).over(bySrc))
        .withColumn("thr",
          max(when(col("rn") === ceil(col("n") * 0.9), col("q"))).over(bySrc))
        .filter(col("q") >= col("thr"))
        .select(col("doc_id"), col("source"), col("q").as("quality_score"),
          col("thr").as("p90_threshold"))
        .orderBy(col("doc_id"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // x3's CTE chain to verified pairs, then transitive closure by a
    // recursive CTE (set-semantics UNION terminates it); cluster id = min
    // reachable label.
    "x17_dedup_groups" ->
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
        |SELECT id AS doc_id, cluster_id,
        |  count(*) OVER (PARTITION BY cluster_id) AS n_members
        |FROM lab ORDER BY doc_id""".stripMargin,

    "x18_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tfreq FROM tok GROUP BY doc_id, term),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT count(*) AS n FROM documents),
        |sc AS (SELECT doc_id, tf.term AS term,
        |    (CAST(tfreq AS DOUBLE) * n) / df AS tfidf
        |  FROM tf JOIN dfq ON tf.term = dfq.term, n),
        |r AS (SELECT doc_id, term, tfidf,
        |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM sc)
        |SELECT doc_id, term, rnk, tfidf FROM r WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,

    "x19_hash_sample" ->
      """WITH b AS (SELECT doc_id, source,
        |  CAST(concat('0x', substr(md5('sample:' || CAST(doc_id AS VARCHAR)),1,8)) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT doc_id, source, bucket FROM b WHERE bucket < 10
        |ORDER BY doc_id""".stripMargin,

    "x20_shard_pack" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
        |  FROM t)
        |SELECT doc_id, n_tokens, cum_tokens,
        |  GREATEST(CAST(0 AS BIGINT), CAST((cum_tokens - 1) // 1000 AS BIGINT)) AS shard_id
        |FROM c ORDER BY doc_id""".stripMargin,

    "x27_lsh_multiprobe" -> {
      import graft.ext.Lsh
      def dot(a: String, b: String) =
        s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (acc,x) -> acc+x)"
      val planeCols = (0 until Lsh.Planes)
        .map(p => s"${Lsh.planeSqlList(p)} AS s$p").mkString(",\n|  ")
      val bucket = (0 until Lsh.Planes)
        .map(p => s"(CASE WHEN ${dot("v", s"s$p")} > 0 THEN ${1 << p} ELSE 0 END)")
        .mkString(" + ")
      val probeList = (Seq("q_bucket") ++
        (0 until Lsh.Planes).map(p => s"xor(q_bucket, ${1 << p})")).mkString("[", ", ", "]")
      s"""WITH planes AS (SELECT
        |  $planeCols),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |eb AS (SELECT vec_id, v, $bucket AS bucket FROM e, planes),
        |q AS (SELECT vec_id AS q_id, bucket AS q_bucket, v AS qv FROM eb WHERE vec_id % 100 = 0),
        |qp AS (SELECT q_id, qv, unnest($probeList) AS probe FROM q),
        |p AS (SELECT DISTINCT q_id, vec_id AS n_id,
        |  CAST(floor((${dot("qv", "v")}/sqrt(${dot("qv", "qv")}*${dot("v", "v")}))*1e6) AS DOUBLE)/1e6 AS cos6
        |  FROM qp JOIN eb ON probe = bucket AND vec_id <> q_id),
        |r AS (SELECT q_id, n_id, cos6,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, n_id) AS rnk FROM p)
        |SELECT q_id, n_id, rnk, cos6 FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
    },

    // the oracle verifies pairwise (bench side is 1% of docs — trivial
    // single-node); the engine's inverted-index candidate pruning provably
    // loses nothing: containment >= t with nb > 0 implies inter >= 1.
    "x25_decontamination" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w),
        |hsets AS (SELECT doc_id, list_distinct(list_transform(ss,
        |    s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT))) AS hs FROM sh),
        |ver AS (SELECT c.doc_id AS doc_id, b.doc_id AS bench_id,
        |    len(list_intersect(c.hs, b.hs)) AS inter, len(b.hs) AS nb
        |  FROM hsets c JOIN hsets b ON c.doc_id % 100 <> 0 AND b.doc_id % 100 = 0)
        |SELECT doc_id, bench_id, CAST(inter AS DOUBLE) / nb AS containment
        |FROM ver WHERE nb > 0 AND CAST(inter AS DOUBLE) / nb >= 0.05
        |ORDER BY doc_id, bench_id""".stripMargin,

    "x24_global_percentiles" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) -
        |  CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(w) * 0.5 AS q
        |  FROM w),
        |r AS (SELECT q, row_number() OVER (ORDER BY q) AS rn, count(*) OVER () AS n FROM s)
        |SELECT max(n) AS n,
        |  max(CASE WHEN rn = 1 THEN q END) AS lo,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN q END) AS p50,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN q END) AS p90,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.99) AS BIGINT) THEN q END) AS p99,
        |  max(CASE WHEN rn = n THEN q END) AS hi
        |FROM r""".stripMargin,

    "x23_ivf_centroid_topk" -> {
      import graft.ext.IvfCentroids.{K, anchorSqlList}
      def dot(a: String, b: String) =
        s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])), (acc,x) -> acc+x)"
      val anchorCols = (0 until K)
        .map(k => s"${anchorSqlList(k)} AS c$k").mkString(",\n|  ")
      val dotCols = (0 until K).map(k => s"${dot("v", s"c$k")} AS d$k").mkString(",\n|  ")
      val cellCase = (0 until K - 1).map(k =>
        "WHEN " + (k + 1 until K).map(j => s"d$k >= d$j").mkString(" AND ") +
          s" THEN $k").mkString("CASE ", " ", s" ELSE ${K - 1} END")
      s"""WITH anchors AS (SELECT
        |  $anchorCols),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |ed AS (SELECT vec_id, v, $dotCols FROM e, anchors),
        |ec AS (SELECT vec_id, v, $cellCase AS cell FROM ed),
        |q AS (SELECT vec_id AS q_id, cell AS q_cell, v AS qv FROM ec WHERE vec_id % 100 = 0),
        |p AS (SELECT q_id, vec_id AS n_id,
        |  ${dot("qv", "v")} AS d,
        |  ${dot("qv", "qv")} AS na,
        |  ${dot("v", "v")} AS nb
        |  FROM q JOIN ec ON q_cell = cell AND vec_id <> q_id),
        |c AS (SELECT q_id, n_id, CAST(floor((d/sqrt(na*nb))*1e6) AS DOUBLE)/1e6 AS cos6 FROM p),
        |r AS (SELECT q_id, n_id, cos6,
        |  row_number() OVER (PARTITION BY q_id ORDER BY cos6 DESC, n_id) AS rnk FROM c)
        |SELECT q_id, n_id, rnk, cos6 FROM r WHERE rnk <= 3 ORDER BY q_id, rnk""".stripMargin
    },

    "x22_simhash_neardup" -> {
      val sums = (0 until 48).map(i =>
        s"sum(CASE WHEN (wh >> $i) & 1 = 1 THEN 1 ELSE -1 END) AS s$i").mkString(",\n|  ")
      val fp = (0 until 48).map(i =>
        s"(CASE WHEN s$i >= 0 THEN ${1L << i} ELSE 0 END)").mkString(" + ")
      s"""WITH t AS (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        |  FROM documents),
        |h AS (SELECT doc_id, CAST(concat('0x', substr(md5(w),1,12)) AS BIGINT) AS wh FROM t),
        |b AS (SELECT doc_id,
        |  $sums
        |  FROM h GROUP BY doc_id),
        |f AS (SELECT doc_id, $fp AS fp FROM b),
        |bands AS (SELECT doc_id, fp, 0 AS bi, fp & ${(1L << 24) - 1} AS bv FROM f
        |  UNION ALL SELECT doc_id, fp, 1 AS bi, fp >> 24 AS bv FROM f),
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ver AS (SELECT id1, id2, CAST(bit_count(xor(x.fp, y.fp)) AS INT) AS hamming
        |  FROM cand JOIN f x ON x.doc_id = id1 JOIN f y ON y.doc_id = id2)
        |SELECT id1, id2, hamming FROM ver WHERE hamming <= 1
        |ORDER BY id1, id2""".stripMargin
    },

    "x21_quality_filter" ->
      """WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |s AS (SELECT doc_id, source,
        |  CAST(len(list_distinct(w)) AS DOUBLE) / len(w) -
        |  CAST(len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(w) * 0.5 AS q
        |  FROM w),
        |r AS (SELECT doc_id, source, q,
        |  row_number() OVER (PARTITION BY source ORDER BY q, doc_id) AS rn,
        |  count(*) OVER (PARTITION BY source) AS n FROM s),
        |t AS (SELECT doc_id, source, q,
        |  max(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN q END)
        |    OVER (PARTITION BY source) AS thr FROM r)
        |SELECT doc_id, source, q AS quality_score, thr AS p90_threshold
        |FROM t WHERE q >= thr ORDER BY doc_id""".stripMargin
  )
}
