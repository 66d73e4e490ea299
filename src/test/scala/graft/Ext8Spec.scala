package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 5: BM25 scoring and co-occurrence mining over hand-built
  * corpora small enough to verify by hand. The BM25 expectation re-derives
  * the score with the same IEEE op sequence the engine declares, so the
  * test pins both the ranking and the exact fixed-point output.
  */
class Ext8Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def docs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8").toString
    rows.map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  private def bm25(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Double =
    tf.toDouble * 2.2 /
      (tf.toDouble + 1.2 * (0.25 + 0.75 * (dl.toDouble / avgdl))) *
      n.toDouble / df.toDouble

  test("x50_bm25_topk: hand corpus — rare terms outrank frequent ones") {
    val d = docs(Seq((1L, "a a b"), (2L, "a c")))
    val out = SparkEntry.queries("x50_bm25_topk")(spark, d)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getDouble(3)))
    val avgdl = 5.0 / 2
    def t6(x: Double) = math.floor(x * 1e6) / 1e6
    // doc 1: b (tf1, df1) beats a (tf2, df2 — common term, discounted)
    assert(out.toSeq === Seq(
      (1L, 1, "b", t6(bm25(1, 3, 1, 2, avgdl))),
      (1L, 2, "a", t6(bm25(2, 3, 2, 2, avgdl))),
      (2L, 1, "c", t6(bm25(1, 2, 1, 2, avgdl))),
      (2L, 2, "a", t6(bm25(1, 2, 2, 2, avgdl)))))
  }

  test("x51_cooccurrence: within-doc distinct pairs, corpus-wide counts") {
    val d = docs(Seq((1L, "b a b"), (2L, "a b"), (3L, "c a")))
    val out = SparkEntry.queries("x51_cooccurrence")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // d1 dedups "b a b" to {a,b}; pairs: (a,b)×2 docs, (a,c)×1
    assert(out.toSeq === Seq(("a", "b", 2L), ("a", "c", 1L)))
  }

  test("q8_exists_anti: equals the hand-written semi/anti DataFrame plan") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val c = graft.tables.Tables.customer(spark, sf)
    val o = graft.tables.Tables.orders(spark, sf)
    val urgent95 = o.filter(col("o_orderpriority") === "1-URGENT" &&
      year(col("o_orderdate")) === 1995)
    val low = o.filter(col("o_orderpriority") === "5-LOW")
    val expected = c
      .join(urgent95, col("c_custkey") === urgent95("o_custkey"), "left_semi")
      .join(low, col("c_custkey") === low("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey")).collect().toSeq
    val got = SparkEntry.queries("q8_exists_anti")(spark, sf).collect().toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = SparkEntry.queries("q8_exists_anti")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Subquery"), s"EXISTS not decorrelated:\n$plan")
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected semi+anti joins:\n$plan")
  }

  test("w17_ohlc: open/close pick by full time order, high/low plain extremes") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8w").toString
    val bktUs = 21600000000L
    def ts(bkt: Long, off: Long) = new java.sql.Timestamp((bkt * bktUs + off) / 1000)
    Seq(
      // user 1, bucket 10: open 2.0 (earliest), high 9.0, low 1.0,
      // close 4.0 (latest; same-ts tie broken by event_id)
      (0L, ts(10, 0), 1L, "a", 2.0, "{}"),
      (1L, ts(10, 1000000), 1L, "a", 9.0, "{}"),
      (2L, ts(10, 2000000), 1L, "a", 1.0, "{}"),
      (3L, ts(10, 3000000), 1L, "a", 3.5, "{}"),
      (4L, ts(10, 3000000), 1L, "a", 4.0, "{}"),
      // user 1, bucket 11: single event — all four fields equal
      (5L, ts(11, 0), 1L, "a", 7.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w17_ohlc")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
    assert(out.toSeq === Seq(
      (1L, 10L, 5L, 2.0, 9.0, 1.0, 4.0),
      (1L, 11L, 1L, 7.0, 7.0, 7.0, 7.0)))
  }

  test("w19_sequence_match: order reconstruction and subsequence flag") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8s").toString
    val t0 = 1700000000000000L
    def ts(off: Long) = new java.sql.Timestamp((t0 + off) / 1000)
    Seq(
      // user 1: v, c, x, p in time order (ids shuffled) → funnel hit
      (10L, ts(3000), 1L, "purchase", 1.0, "{}"),
      (11L, ts(1000), 1L, "click", 1.0, "{}"),
      (12L, ts(0), 1L, "view", 1.0, "{}"),
      (13L, ts(2000), 1L, "x-other", 1.0, "{}"),
      // user 2: p before c before v → no funnel
      (14L, ts(0), 2L, "purchase", 1.0, "{}"),
      (15L, ts(1000), 2L, "click", 1.0, "{}"),
      (16L, ts(2000), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w19_sequence_match")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getBoolean(3)))
    assert(out.toSeq === Seq((1L, 4L, "vcxp", true), (2L, 3L, "pcv", false)))
  }

  test("x58_cluster_merge: transitive cluster merges attributes, singletons drop") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8m").toString
    val t = "alpha beta gamma delta epsilon"
    Seq(
      // docs 1-2-3 near-dup transitively (identical) across three feeds
      (1L, t, "en", "feedC", t.length.toLong),
      (2L, t, "en", "feedA", t.length.toLong),
      (3L, t, "en", "feedA", t.length.toLong),
      // doc 9 is a singleton — excluded from the merge output
      (9L, "totally unrelated text body here now", "en", "feedB", 36L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x58_cluster_merge")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4), r.getLong(5)))
    assert(out.toSeq === Seq((1L, 3L, 1L, "feedA,feedC", 15L, 5L)))
  }

  test("x57_source_overlap: dup pair lands in the unordered source bucket") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8o").toString
    val dup = "alpha beta gamma delta epsilon"
    Seq(
      (1L, dup, "en", "feedB", dup.length.toLong),
      (2L, dup, "en", "feedA", dup.length.toLong),   // near-dup across feeds
      (3L, "totally unrelated text body here", "en", "feedA", 33L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x57_source_overlap")(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // least/greatest makes the bucket unordered: (feedA, feedB)
    assert(out.toSeq === Seq(("feedA", "feedB", 1L)))
  }

  test("q9_sole_late_supplier: equals the hand-built semi/anti self-join") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val li = graft.tables.Tables.lineitem(spark, sf)
    val o = graft.tables.Tables.orders(spark, sf)
    val late = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(unix_micros(col("l_shipdate").cast("timestamp")) -
        unix_micros(col("o_orderdate").cast("timestamp")) > 60L * 86400000000L)
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
    val others = li.select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = late.select(col("ok").as("ok3"), col("sk").as("sk3"))
    val expected = late
      .join(others, col("ok") === col("ok2") && col("sk") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("ok") === col("ok3") && col("sk") =!= col("sk3"), "left_anti")
      .groupBy(col("sk")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("sk"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val got = SparkEntry.queries("q9_sole_late_supplier")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.nonEmpty)
    val plan = SparkEntry.queries("q9_sole_late_supplier")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi") && plan.contains("LeftAnti"),
      s"expected decorrelated semi+anti self-joins:\n$plan")
  }

  test("x55_boilerplate_score: templated doc outranks novel prose") {
    val d = docs(Seq(
      (1L, "click here to buy now"),   // bigrams shared with 2 and 3
      (2L, "click here to buy now"),   // exact template copy
      (3L, "click here to see more"),  // partial template
      (4L, "completely novel prose about nothing")))
    val out = SparkEntry.queries("x55_boilerplate_score")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // docs 1/2: bigrams {click here(3), here to(3), to buy(2), buy now(2)}
    // → mean 10 div 4 = 2; doc 3: {3,3,1,1} → 2; doc 4: all df 1 → 1
    assert(out.toSeq === Seq(
      (1L, 4L, 2L), (2L, 4L, 2L), (3L, 4L, 2L), (4L, 4L, 1L)))
  }

  test("x54_substring_decontam: verbatim quote found, paraphrase is not") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8x").toString
    // needle doc 50: words 3..7 = "carol dave erin frank grace"
    Seq(
      (50L, "alice bob carol dave erin frank grace heidi ivan"),
      // doc 1 quotes the needle verbatim mid-text → contaminated
      (1L, "intro words then carol dave erin frank grace and more"),
      // doc 2 paraphrases (one word changed) → NOT flagged
      (2L, "intro words then carol dave erin frank judy and more"),
      // doc 3 contains the leading 3-gram but not the full needle →
      // blocked in, verified out
      (3L, "prefix carol dave erin zzz yyy xxx"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x54_substring_decontam")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((50L, 1L, 1L, 1L)))
  }

  test("j11_fuzzy_match: blocking prefix prunes, distances bucket exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8f").toString
    // titles are the first 40 chars; ids %3==0 spawn the dirty twin
    val t1 = "alpha beta gamma delta epsilon zeta etx" // 39 chars + pad
    Seq(
      // id 3 → dirty 1000003; its 40-char title ends in a char that the
      // corruption replaces with 'x' → dist 1 vs its own source
      (3L, t1 + "Q tail tail tail"),
      // id 6's title already ends (at char 40) with 'x' → dist 0 twin
      (6L, t1 + "x tail tail tail"),
      // id 9 shares NO 12-char prefix with the others → its dirty twin
      // matches only itself
      (9L, "completely different title text here longer"),
      // id 2: no dirty twin (not %3), but same prefix as 3/6 — it may
      // match their dirty twins within dist 2
      (2L, t1 + "Q tail tail tail"))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("j11_fuzzy_match")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // dist 0: corruption maps both title(3) and title(6) onto t1+"x", so
    // dirty(6) AND dirty(3) hit source 6 exactly
    // dist 1: dirty(3) vs {3, 2}, dirty(6) vs {3, 2}, dirty(9) vs 9
    val byDist = out.map(r => r._1 -> r._2).toMap
    assert(byDist(0L) === 2L, s"dist-0 bucket: ${out.toSeq}")
    assert(byDist(1L) === 5L, s"dist-1 bucket: ${out.toSeq}")
  }

  test("w20_trailing_anomaly: spike flagged, steady stream is not") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8a").toString
    val t0 = 1700000000000000L
    def ts(i: Long) = new java.sql.Timestamp((t0 + i * 1000000) / 1000)
    // user 1: values 1.0 ×5 then a 100.0 spike (dev² > 4·var=0 → anomaly),
    // then 1.0 again (trailing window now has variance; |1-μ| small — but
    // μ jumped, so check only the spike assertion via id sum)
    val rows = (0L to 4L).map(i => (i, ts(i), 1L, "a", 1.0, "{}")) ++
      Seq((5L, ts(5), 1L, "a", 100.0, "{}")) ++
      // user 2: strictly steady — zero variance, zero deviation, no flags
      (10L to 16L).map(i => (i, ts(i), 2L, "a", 7.5, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w20_trailing_anomaly")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 1: events 3,4,5 tested (need n>=3 prior); only id 5 anomalous
    // user 2: events 13..16 tested, none anomalous
    assert(out.toSeq === Seq((1L, 3L, 1L, 5L), (2L, 4L, 0L, 0L)))
  }

  test("x53_gopher_rules: each rule trips independently, rollup exact") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext8g").toString
    Seq(
      (1L, "the and of to a normal looking doc here"), // passes all
      (2L, "one two three"),                           // fails count (<5) + stop
      (3L, "the and " + Seq.fill(20)("ab").mkString(" ")), // mean wordlen < 3
      (4L, "the and " + Seq.fill(30)("xy").mkString(" ")))  // ttr + wordlen fail
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x53_gopher_rules")(spark, d)
      .collect().map(r => (r.getBoolean(0), r.getLong(1)))
    // doc 1 passes; docs 2-4 fail
    assert(out.toSeq === Seq((false, 3L), (true, 1L)))
  }

  test("x52_incremental_dedup: new-batch copy of an indexed doc is caught") {
    import spark.implicits._
    import org.apache.spark.unsafe.types.UTF8String
    def bucket(id: Long): Long =
      graft.functions.HashKernels.hash32(
        UTF8String.fromString(s"sample:$id")) % 100
    // pick a "new" id (bucket < 10) and an "old" id (bucket >= 10) by
    // scanning — the rule is the deterministic md5 sample split
    val newId = (1L to 500L).find(bucket(_) < 10).get
    val oldId = (1L to 500L).find(bucket(_) >= 10).get
    val text = "alpha beta gamma delta epsilon zeta"
    val d = java.nio.file.Files.createTempDirectory("graft-ext8i").toString
    Seq((newId, text), (oldId, text))
      .map { case (id, t) => (id, t, "en", "s", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x52_incremental_dedup")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // identical docs: 4 shingles, full containment
    assert(out.toSeq === Seq((newId, oldId, 4L, 4L, 4L)))
  }

  test("x51_cooccurrence: pair generation is row-local — no join in the plan") {
    import org.apache.spark.sql.execution.FormattedMode
    val p = SparkEntry.queries("x51_cooccurrence")(spark, "/root/testdata/sf0.001")
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("Join"), s"pair generation must not self-join:\n$p")
  }
}
