package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ext.{Similarity, TextOps}
import graft.tables.Tables._
import graft.GraftCaches.TrackedPersist

/** Round-5 additions, part 5 — four curation ops the dedup/selection
  * families still lacked:
  *
  *  - x102 Jaccard-CONTAINMENT audit: symmetric dedup (x3/x4) misses
  *    subset/quote relations where a short doc sits inside a long one —
  *    containment C(A→B)=|A∩B|/|A| is the standard asymmetric measure
  *    (Broder's resemblance/containment pair).
  *  - x103 greedy k-center coreset (Gonzalez farthest-point): the
  *    diversity-maximizing data-selection primitive behind coreset
  *    training-subset pickers.
  *  - x104 soft dedup: instead of DROPPING duplicates, down-WEIGHT each
  *    copy by 1/cluster-size so the training distribution matches the
  *    deduped one without losing documents (SoftDeDup-style reweighting).
  *  - x105 tokenizer-fertility parity: bytes-per-token by language and
  *    each language's premium over the cheapest — the audit behind
  *    "tokenizers price languages differently" fairness findings.
  */
object Ext27 {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // X2i CONTAINMENT AUDIT: candidates from the df∈[2,4] rare-shingle
    // inverted index (x47's AllPairs convention — fan-out tracks rare-term
    // collisions, never n²; the cap is the same documented recall knob),
    // then EXACT set arithmetic per pair: containment both directions and
    // Jaccard, all in integer ppm (multiply before `div`). Pairs where the
    // two directions diverge are the subset relations symmetric near-dup
    // thresholds miss. Shuffles: one explode+groupBy for df, one equi-join
    // on rare terms, two hash joins to fetch the sorted shingle sets
    // (intersected by the native linear-merge kernel).
    "x102_containment" -> ((s, d) => {
      val sh = Ext.docShinglesHashed(documents(s, d))
        .select(col("doc_id"), col("hs"), size(col("hs")).cast("long").as("n"))
        .persistTracked()
      val inv = sh.select(col("doc_id"), explode(col("hs")).as("term"))
      val rareTerms = inv.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df").between(2, 4))
        .select(col("term"))
      val rare = inv.join(rareTerms, Seq("term"))
      val cand = rare.as("a").join(rare.as("b"),
          col("a.term") === col("b.term") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
        .distinct()
      val x = sh.select(col("doc_id").as("id1"), col("hs").as("hs1"), col("n").as("n1"))
      val y = sh.select(col("doc_id").as("id2"), col("hs").as("hs2"), col("n").as("n2"))
      cand.join(x, Seq("id1")).join(y, Seq("id2"))
        .withColumn("n_inter", TextOps.intersectCard(col("hs1"), col("hs2")).cast("long"))
        .select(col("id1"), col("id2"), col("n1"), col("n2"), col("n_inter"),
          expr("n_inter * 1000000L div n1").as("cont12_ppm"),
          expr("n_inter * 1000000L div n2").as("cont21_ppm"),
          expr("n_inter * 1000000L div (n1 + n2 - n_inter)").as("jac_ppm"))
        .filter(greatest(col("cont12_ppm"), col("cont21_ppm")) >= 500000L)
        .orderBy(col("id1"), col("id2"))
    }),

    // X3g K-CENTER CORESET (greedy farthest-point, k=4, seed = min vec_id):
    // each round broadcasts the k selected centers as literals and takes
    // the argmax of min-distance-to-selected via TakeOrderedAndProject —
    // O(k) jobs, one row collected per round, nothing driver-side scales
    // with the corpus. Distance is the sequential fold of squared
    // differences ([[Similarity.dist2]]) so the unrolled oracle CTE chain
    // reproduces every double bit-for-bit; ties break on vec_id. NOTE:
    // like x17/x31, this constructor EXECUTES work (the greedy selection
    // is inherently iterative actions).
    "x103_kcenter_coreset" -> ((s, d) => {
      val e = embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .persistTracked()
      val seedRows = e.orderBy(col("vec_id")).limit(1).collect()
      require(seedRows.nonEmpty, "x103: embeddings table is empty")
      val seed = seedRows(0)
      var sel = Vector((seed.getLong(0), seed.getSeq[Double](1).toArray, 0.0))
      var exhausted = false
      while (sel.size < 4 && !exhausted) {
        val dm = sel.map { case (_, cv, _) =>
          Similarity.dist2(col("v"), typedLit(cv.toSeq)) }.reduce(least(_, _))
        val ids = sel.map(_._1)
        val nxt = e.filter(!col("vec_id").isInCollection(ids))
          .withColumn("dm", dm)
          .orderBy(col("dm").desc, col("vec_id"))
          .limit(1).collect()
        if (nxt.isEmpty) exhausted = true   // corpus smaller than k
        else sel = sel :+
          ((nxt(0).getLong(0), nxt(0).getSeq[Double](1).toArray, nxt(0).getDouble(2)))
      }
      val rows = sel.zipWithIndex.map { case ((id, _, dsel), i) =>
        (i + 1L, id, math.floor(dsel * 1e6) / 1e6)
      }
      s.createDataFrame(rows).toDF("sel_rank", "vec_id", "d2_sel")
        .orderBy(col("sel_rank"))
    }),

    // X1c SOFT DEDUP: x2's bag-of-words cluster key, but the decision is a
    // WEIGHT, not a drop — weight_ppm = ⌊1e6 / n_copies⌋ per member, so a
    // cluster's total sampling mass is ~1 document regardless of copy
    // count. One shuffle (window over the 32-byte md5 key); every doc
    // survives with its provenance (canonical flag = x2's min-id pick).
    "x104_soft_dedup" -> ((s, d) => {
      val key = md5(concat_ws(" ",
        array_sort(array_distinct(TextOps.words(col("text"))))).cast("binary"))
      val w = Window.partitionBy(col("bow_key"))
      documents(s, d)
        .select(col("doc_id"), key.as("bow_key"))
        .withColumn("n_copies", count(lit(1)).over(w))
        .withColumn("keep_id", min(col("doc_id")).over(w))
        .select(col("doc_id"), col("n_copies"),
          expr("1000000L div n_copies").as("weight_ppm"),
          (col("doc_id") === col("keep_id")).as("is_canonical"))
        .orderBy(col("doc_id"))
    }),

    // X4s TOKENIZER FERTILITY: bytes-per-token by language in exact
    // integer ppm, plus each language's premium over the corpus-cheapest
    // language — one partial-aggregable groupBy and a broadcast 1-row min.
    // The int64 products hold to ~9e12 corpus bytes; past that the same
    // shape runs in decimal(38,0) (x100's note).
    "x105_tokenizer_fertility" -> ((s, d) => {
      val agg = documents(s, d)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(octet_length(col("text")).cast("long")).as("n_bytes"),
          sum(size(TextOps.words(col("text"))).cast("long")).as("n_tokens"))
        .withColumn("bpt_ppm", expr("n_bytes * 1000000L div n_tokens"))
      val m = agg.agg(min(col("bpt_ppm")).as("min_bpt"))
      agg.crossJoin(broadcast(m))
        .select(col("lang"), col("n_docs"), col("n_bytes"), col("n_tokens"),
          col("bpt_ppm"),
          expr("bpt_ppm * 1000000L div min_bpt").as("premium_ppm"))
        .orderBy(col("lang"))
    }))

  private def dist2Sql(a: String, b: String) =
    s"list_reduce(list_prepend(0.0, list_transform(range(1, len($a)+1), " +
      s"i -> ($a[i]-$b[i])*($a[i]-$b[i]))), (x,y) -> x+y)"

  val oracleSql: Map[String, String] = Map(

    "x102_containment" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(w) >= 3 THEN list_distinct(list_transform(range(1, len(w)-1),
        |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) ELSE [] END AS ss FROM w),
        |hsets AS (SELECT doc_id, list_distinct(list_transform(ss,
        |    s -> CAST(concat('0x', substr(md5(s),1,8)) AS BIGINT))) AS hs FROM sh),
        |inv AS (SELECT doc_id, unnest(hs) AS term FROM hsets),
        |rareterms AS (SELECT term FROM inv GROUP BY term
        |  HAVING count(*) BETWEEN 2 AND 4),
        |rare AS (SELECT doc_id, term FROM inv JOIN rareterms USING (term)),
        |cand AS (SELECT a.doc_id AS id1, b.doc_id AS id2
        |  FROM rare a JOIN rare b ON a.term = b.term AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |ver AS (SELECT id1, id2, CAST(len(x.hs) AS BIGINT) AS n1,
        |    CAST(len(y.hs) AS BIGINT) AS n2,
        |    CAST(len(list_intersect(x.hs, y.hs)) AS BIGINT) AS n_inter
        |  FROM cand JOIN hsets x ON x.doc_id = id1 JOIN hsets y ON y.doc_id = id2)
        |SELECT id1, id2, n1, n2, n_inter,
        |  CAST(n_inter * 1000000 // n1 AS BIGINT) AS cont12_ppm,
        |  CAST(n_inter * 1000000 // n2 AS BIGINT) AS cont21_ppm,
        |  CAST(n_inter * 1000000 // (n1 + n2 - n_inter) AS BIGINT) AS jac_ppm
        |FROM ver
        |WHERE greatest(n_inter * 1000000 // n1, n_inter * 1000000 // n2) >= 500000
        |ORDER BY id1, id2""".stripMargin,

    "x103_kcenter_coreset" -> {
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |c1 AS (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 1),
        |d1 AS (SELECT e.vec_id, e.v, ${dist2Sql("e.v", "c1.v")} AS dm
        |  FROM e, c1 WHERE e.vec_id <> c1.vec_id),
        |c2 AS (SELECT vec_id, v, dm FROM d1 ORDER BY dm DESC, vec_id LIMIT 1),
        |d2 AS (SELECT d1.vec_id, d1.v, LEAST(d1.dm, ${dist2Sql("d1.v", "c2.v")}) AS dm
        |  FROM d1, c2 WHERE d1.vec_id <> c2.vec_id),
        |c3 AS (SELECT vec_id, v, dm FROM d2 ORDER BY dm DESC, vec_id LIMIT 1),
        |d3 AS (SELECT d2.vec_id, d2.v, LEAST(d2.dm, ${dist2Sql("d2.v", "c3.v")}) AS dm
        |  FROM d2, c3 WHERE d2.vec_id <> c3.vec_id),
        |c4 AS (SELECT vec_id, v, dm FROM d3 ORDER BY dm DESC, vec_id LIMIT 1)
        |SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, CAST(0.0 AS DOUBLE) AS d2_sel FROM c1
        |UNION ALL SELECT 2, vec_id, CAST(floor(dm*1e6) AS DOUBLE)/1e6 FROM c2
        |UNION ALL SELECT 3, vec_id, CAST(floor(dm*1e6) AS DOUBLE)/1e6 FROM c3
        |UNION ALL SELECT 4, vec_id, CAST(floor(dm*1e6) AS DOUBLE)/1e6 FROM c4
        |ORDER BY sel_rank""".stripMargin
    },

    "x104_soft_dedup" ->
      """WITH k AS (SELECT doc_id,
        |  md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS bow_key
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(count(*) OVER (PARTITION BY bow_key) AS BIGINT) AS n_copies,
        |  CAST(1000000 // count(*) OVER (PARTITION BY bow_key) AS BIGINT) AS weight_ppm,
        |  doc_id = min(doc_id) OVER (PARTITION BY bow_key) AS is_canonical
        |FROM k ORDER BY doc_id""".stripMargin,

    "x105_tokenizer_fertility" ->
      """WITH a AS (SELECT lang, count(*) AS n_docs,
        |  CAST(sum(strlen(text)) AS BIGINT) AS n_bytes,
        |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |b AS (SELECT lang, n_docs, n_bytes, n_tokens,
        |  n_bytes * 1000000 // n_tokens AS bpt_ppm FROM a),
        |m AS (SELECT min(bpt_ppm) AS min_bpt FROM b)
        |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs, n_bytes, n_tokens,
        |  CAST(bpt_ppm AS BIGINT) AS bpt_ppm,
        |  CAST(bpt_ppm * 1000000 // min_bpt AS BIGINT) AS premium_ppm
        |FROM b, m ORDER BY lang""".stripMargin)
}
