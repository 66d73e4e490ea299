package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{explode, expr}
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.{Event, Session}

/** Streaming semantics: the same transform over readStream (MemoryStream)
  * must agree with its batch run, watermarks must drop late data, and the
  * custom sessionizer must split on gaps and flush on timeout. */
class StreamingSpec extends AnyFunSuite {

  private def ts(minute: Int, second: Int = 0): Timestamp =
    Timestamp.valueOf(f"2026-01-01 10:$minute%02d:$second%02d")

  private val events = Seq(
    Event(1, ts(0, 10), "click", 1.0),
    Event(1, ts(0, 40), "click", 2.0),
    Event(2, ts(1, 5), "view", 3.0),
    Event(1, ts(2, 0), "click", 4.0),
    Event(2, ts(8, 0), "view", 5.0))   // > 5 min gap for user 2

  test("tumbling window agg: streaming result equals batch result") {
    val spark = TestSpark.spark
    import spark.implicits._

    val batch = EventStreams.tumblingCounts(events.toDF())
      .orderBy("w_start", "event_type").collect().toSeq

    val input = MemoryStream[Event](spark)
    input.addData(events: _*)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("tumbling")
      .orderBy("w_start", "event_type").collect().toSeq

    assert(streamed == batch)
    assert(batch.exists(r => r.getAs[String]("event_type") == "click" &&
      r.getAs[Long]("n") == 2)) // two clicks in minute 0
  }

  test("session_window agg: streaming result equals batch result (w25 parity twin)") {
    val spark = TestSpark.spark
    import spark.implicits._
    // exercise the merge boundary too: an event at EXACTLY gap distance
    // must merge (break only when strictly exceeded) — same semantics the
    // w25 batch oracle spells as `> gap`
    val corpus = events ++ Seq(
      Event(1, ts(7, 0), "click", 6.0),   // exactly 5:00 after 02:00 ⇒ merges
      Event(1, ts(12, 1), "click", 7.0),  // 5:01 after 07:00 ⇒ new session
      Event(3, ts(3, 0), "view", 8.0))

    val batch = EventStreams.sessionCounts(corpus.toDF())
      .orderBy("user_id", "s_start").collect().toSeq

    val input = MemoryStream[Event](spark)
    input.addData(corpus: _*)
    val q = EventStreams.sessionCounts(input.toDF())
      .writeStream.format("memory").queryName("sessions_parity")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("sessions_parity")
      .orderBy("user_id", "s_start").collect().toSeq

    assert(streamed == batch)
    // user 1: [00:10 .. 07:00+gap] merged (4 events), then [12:01] alone
    val u1 = batch.filter(_.getAs[Long]("user_id") == 1L)
    assert(u1.map(_.getAs[Long]("n_events")) == Seq(4L, 1L))
  }

  test("watermark drops data later than 10 minutes behind the max event time") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("late")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(30), "click", 1.0)) // advances watermark to :20
      q.processAllAvailable()
      input.addData(Event(1, ts(1), "late", 9.0))   // :01 < :20 ⇒ dropped
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("late").collect()
    assert(!out.exists(_.getAs[String]("event_type") == "late"))
    assert(out.exists(_.getAs[String]("event_type") == "click")) // :00 window closed
  }

  test("custom sessionizer splits on gap and flushes on timeout") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      // push event time far forward so open sessions time out
      input.addData(Event(99, ts(59), "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("sessions").as[Session].collect().toSeq

    // user 1: one session :00:10–:02:00 with 3 events, sum 7.0
    val u1 = out.filter(_.user_id == 1)
    assert(u1.map(s => (s.n_events, s.sum_value)) == Seq((3, 7.0)))
    assert(u1.head.start == ts(0, 10) && u1.head.end == ts(2, 0))
    // user 2: the >5-min gap split into two 1-event sessions
    val u2 = out.filter(_.user_id == 2).sortBy(_.start.getTime)
    assert(u2.map(_.n_events) == Seq(1, 1))
    assert(u2.map(_.sum_value) == Seq(3.0, 5.0))
  }

  test("file-source stream over the real events parquet equals the batch run") {
    val spark = TestSpark.spark
    // the file stream source requires a DIRECTORY; stage the single file
    val src = java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet")
    val dirP = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(src, dirP.resolve("part-0.parquet"))
    val dir = dirP.toString
    val batchDf = graft.tables.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = EventStreams.tumblingCounts(batchDf)
      .orderBy("w_start", "event_type").collect().toSeq

    val streamRaw = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(dir)
    val q = EventStreams.tumblingCounts(graft.tables.Tables.eventsFrom(streamRaw))
      .writeStream.format("memory").queryName("filesrc")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("filesrc")
      .orderBy("w_start", "event_type").collect().toSeq

    assert(streamed == batch)
    assert(batch.nonEmpty)
  }

  test("mapGroupsWithState running totals accumulate across micro-batches") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("totals")
      .outputMode(OutputMode.Update).start()
    try {
      input.addData(Event(1, ts(0), "click", 1.0), Event(1, ts(1), "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(2), "click", 4.0))
      q.processAllAvailable()
    } finally q.stop()
    // update mode: the LAST row for user 1 carries the accumulated state
    val rows = spark.table("totals").as[EventStreams.UserTotals].collect()
    assert(rows.exists(r => r.user_id == 1 && r.n_events == 3 && r.sum_value == 7.0))
  }

  test("streaming dedup drops exact repeats, keeps distinct events") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val q = EventStreams.dedupStream(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0, 10), "click", 1.0),
        Event(1, ts(0, 10), "click", 1.0), // same batch duplicate
        Event(1, ts(0, 40), "click", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts(0, 10), "click", 1.0)) // cross-batch duplicate
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("dedup").collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Timestamp]("ts")).toSet == Set(ts(0, 10), ts(0, 40)))
  }

  test("stream-stream interval join pairs views within 5 minutes of a click") {
    val spark = TestSpark.spark
    import spark.implicits._
    val input = MemoryStream[Event](spark)
    val df = input.toDF()
    val q = EventStreams.clickViewJoin(df, df)
      .writeStream.format("memory").queryName("cvjoin")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Event(1, ts(0), "click", 1.0),
        Event(1, ts(3), "view", 2.0),   // within 5 min → joins
        Event(1, ts(9), "view", 3.0),   // 9 min later → outside interval
        Event(2, ts(1), "view", 4.0))   // other user → no click
      q.processAllAvailable()
      input.addData(Event(9, ts(40), "click", 0.0)) // advance watermark
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("cvjoin").collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("c_user") == 1L &&
      out.head.getAs[Double]("v_value") == 2.0)
  }

  test("stream-static join enriches events from a broadcast dimension") {
    val spark = TestSpark.spark
    import spark.implicits._
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "segment")
    val input = MemoryStream[Event](spark)
    val q = EventStreams.enrichWithDim(input.toDF(), dim)
      .writeStream.format("memory").queryName("enrich")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(Event(1, ts(0), "click", 1.0), Event(3, ts(1), "view", 2.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("enrich").collect()
    assert(out.length == 2)
    val byUser = out.map(r => r.getAs[Long]("user_id") -> r.getAs[String]("segment")).toMap
    assert(byUser(1L) == "gold")
    assert(byUser(3L) == null) // left join preserves unmatched stream rows
  }

  test("built-in session_window agrees with the custom sessionizer on counts") {
    val spark = TestSpark.spark
    import spark.implicits._
    val batch = EventStreams.sessionCounts(events.toDF())
      .orderBy("user_id", "s_start").collect().toSeq
    assert(batch.map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))) ==
      Seq((1L, 3L), (2L, 1L), (2L, 1L)))
  }

  test("doc stream: fingerprint dedup drops token-reordered near-copies") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val input = MemoryStream[Doc](spark)
    val q = DocStreams.dedupByFingerprint(input.toDF())
      .writeStream.format("memory").queryName("doc_fp_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Doc(1, ts(0, 10), "s0", "alpha beta gamma delta"),
        Doc(2, ts(0, 20), "s0", "delta gamma beta alpha"), // reordered repeat
        Doc(3, ts(0, 30), "s1", "totally different words here"))
      q.processAllAvailable()
      input.addData(
        Doc(4, ts(1, 0), "s1", "beta alpha delta gamma")) // cross-batch repeat
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("doc_fp_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L)) // byte-hash dedup would have kept 2 and 4 too
  }

  test("doc stream: decontamination drops span-matching docs, zero state") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    // a 40-token benchmark doc; its stride-16 32-token span digests form
    // the static index (same spelling as the x84 batch catalog entry)
    val benchText = (1 to 40).map(i => s"b$i").mkString(" ")
    val benchSpans = Seq(benchText).toDF("text")
      .select(explode(expr(
        """transform(sequence(1, size(split(text, ' ')) - 31, 16),
          |  i -> md5(cast(concat_ws(' ', slice(split(text, ' '), i, 32))
          |       as binary)))""".stripMargin)).as("h"))
    // contaminated = carries the bench's first 32-token window verbatim,
    // placed so the STREAM doc's second stride-16 window (start 17) lines
    // up with it digest-for-digest; clean = same length, own text;
    // short = under 32 tokens (no spans, must pass)
    val contaminated = ((1 to 16).map(i => s"c$i") ++
      (1 to 32).map(i => s"b$i")).mkString(" ")
    val clean = (1 to 48).map(i => s"k$i").mkString(" ")
    val short = (1 to 10).map(i => s"s$i").mkString(" ")
    val input = MemoryStream[Doc](spark)
    val q = DocStreams.decontamFilter(input.toDF(), benchSpans)
      .writeStream.format("memory").queryName("doc_decontam")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Doc(1, ts(0, 10), "s0", contaminated),
        Doc(2, ts(0, 20), "s0", clean),
        Doc(3, ts(0, 30), "s1", short))
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("doc_decontam").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
    // batch twin over the same rows must agree (stream == batch)
    val batchKept = DocStreams.decontamFilter(
      Seq(Doc(1, ts(0, 10), "s0", contaminated),
        Doc(2, ts(0, 20), "s0", clean),
        Doc(3, ts(0, 30), "s1", short)).toDF(), benchSpans)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(batchKept == kept)
  }

  test("doc stream: content dedup keeps reorderings that fingerprints drop") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val input = MemoryStream[Doc](spark)
    val q = DocStreams.dedupByContent(input.toDF())
      .writeStream.format("memory").queryName("doc_content_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(
        Doc(1, ts(0, 10), "s0", "alpha beta gamma delta"),
        Doc(2, ts(0, 20), "s0", "alpha beta gamma delta"),  // exact repeat
        Doc(3, ts(0, 30), "s0", "delta gamma beta alpha"))  // different bytes
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("doc_content_dedup").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }

  test("doc stream: per-line dedup (x141 twin) drops repeated 10-token " +
    "lines in-batch and across batches; kept set equals the batch " +
    "min-position keeper on the bounded, arrival-ordered replay") {
    val spark = TestSpark.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    def line(p: String) = (1 to 10).map(i => s"$p$i").mkString(" ")
    val a = line("a"); val b = line("b"); val c = line("c")
    val d = (1 to 5).map(i => s"d$i").mkString(" ") // partial final line
    val doc1 = Doc(1, ts(0, 10), "s0", s"$a $b")
    val doc2 = Doc(2, ts(0, 20), "s0", s"$a $c")   // line A repeats in-batch
    val doc3 = Doc(3, ts(1, 0), "s0", s"$b $d")    // line B repeats cross-batch
    val input = MemoryStream[Doc](spark)
    val q = DocStreams.dedupLines(input.toDF())
      .writeStream.format("memory").queryName("doc_line_dedup")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(doc1, doc2)
      q.processAllAvailable()
      input.addData(doc3)
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("doc_line_dedup")
      .select("doc_id", "line_no").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((1L, 0L), (1L, 1L), (2L, 1L), (3L, 1L)))
    // bounded equivalence: arrival order == position order here, so the
    // batch x141 keeper (global min doc_id*1e6+line_no per line key)
    // selects the same lines
    val batchKept = Seq(doc1, doc2, doc3).toDF()
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), col("w"), size(col("w")).as("n"))
      .select(col("doc_id"), col("w"),
        explode(org.apache.spark.sql.functions.sequence(
          lit(0), expr("(n - 1) div 10"))).as("line_no"))
      .select(col("doc_id"), col("line_no").cast("long").as("line_no"),
        md5(concat_ws(" ",
          slice(col("w"), (col("line_no") * 10 + 1).cast("int"), lit(10)))
          .cast("binary")).as("lk"))
      .withColumn("pos", col("doc_id") * 1000000L + col("line_no"))
      .groupBy("lk").agg(min(col("pos")).as("keep"))
      .select((col("keep") / 1000000L).cast("long").as("doc_id"),
        pmod(col("keep"), lit(1000000L)).as("line_no"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchKept == kept)
  }

  test("doc stream: foreachBatch upsert sink is idempotent under replay") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val out = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/sink"
    val input = MemoryStream[Doc](spark)
    val deduped = DocStreams.dedupByContent(input.toDF())
    val q = DocStreams.upsertSink(deduped, out).start()
    try {
      input.addData(
        Doc(1, ts(0, 10), "s0", "alpha beta"),
        Doc(2, ts(0, 20), "s0", "gamma delta"))
      q.processAllAvailable()
      // second micro-batch REPLAYS doc 1's content (new id, same bytes —
      // outside the first batch, so the in-stream dedup has dropped state)
      // plus one genuinely new doc; the sink's anti join must keep the
      // landed copy and admit only the new content
      input.addData(
        Doc(3, ts(40, 0), "s0", "alpha beta"),
        Doc(4, ts(40, 1), "s0", "epsilon zeta"))
      q.processAllAvailable()
    } finally q.stop()
    val landed = spark.read.parquet(out).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(landed.map(_._2).distinct.length === landed.length, "duplicate content landed")
    assert(landed.map(_._1).toSet === Set(1L, 2L, 4L), s"landed: ${landed.toSeq}")
  }

  test("doc stream: upsert sink fails the micro-batch on a transient " +
    "read error, then the checkpoint replay lands exactly-once") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val base = java.nio.file.Files.createTempDirectory("graft-upsert-inj")
    val out = base.resolve("sink").toString
    val ckpt = base.resolve("ckpt").toString
    val input = MemoryStream[Doc](spark)
    def start() = DocStreams.upsertSink(DocStreams.dedupByContent(input.toDF()), out)
      .option("checkpointLocation", ckpt).start()

    // batch 0 lands clean
    val q0 = start()
    try {
      input.addData(
        Doc(1, ts(0, 10), "s0", "alpha beta"),
        Doc(2, ts(0, 20), "s0", "gamma delta"))
      q0.processAllAvailable()
    } finally q0.stop()
    assert(spark.read.parquet(out).count() === 2)

    // inject a transient sink-read failure: a corrupt footer in the sink
    // dir makes the landed-side read throw — the batch must FAIL (a
    // swallowing sink would treat it as "nothing landed" and double-write
    // the replayed content)
    val corrupt = java.nio.file.Paths.get(out, "zzz-corrupt.parquet")
    java.nio.file.Files.write(corrupt, "not a parquet file".getBytes)
    input.addData(
      Doc(3, ts(40, 0), "s0", "alpha beta"),   // replay of doc 1's bytes
      Doc(4, ts(40, 1), "s0", "epsilon zeta")) // genuinely new
    val q1 = start()
    val failed = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
    }
    q1.stop()
    assert(failed.getMessage != null)
    // the failed batch must not have written anything (read precedes write)
    java.nio.file.Files.delete(corrupt)
    assert(spark.read.parquet(out).count() === 2,
      "failed micro-batch leaked a partial write")

    // recovery: same checkpoint replays the failed batch; anti join drops
    // the replayed content, admits only the new doc — exactly once
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val landed = spark.read.parquet(out).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(landed.map(_._2).distinct.length === landed.length,
      s"duplicate content landed: ${landed.toSeq}")
    assert(landed.map(_._1).toSet === Set(1L, 2L, 4L), s"landed: ${landed.toSeq}")
  }

  test("doc stream: per-source token throughput equals the batch aggregate") {
    val spark = TestSpark.spark
    import spark.implicits._
    import graft.streaming.DocStreams
    import graft.streaming.DocStreams.Doc
    val docs = Seq(
      Doc(1, ts(0, 10), "s0", "one two three"),
      Doc(2, ts(0, 50), "s0", "four five"),
      Doc(3, ts(0, 30), "s1", "six"),
      Doc(4, ts(1, 10), "s0", "seven eight nine ten"))
    val batch = DocStreams.tokenThroughput(docs.toDF())
      .orderBy("win_start", "source").collect().toSeq
    val input = MemoryStream[Doc](spark)
    val q = DocStreams.tokenThroughput(input.toDF())
      .writeStream.format("memory").queryName("doc_tput")
      .outputMode(OutputMode.Append).start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      input.addData(Doc(9, ts(30, 0), "s0", "advance the watermark"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("doc_tput")
      .filter($"win_start" < ts(20, 0))
      .orderBy("win_start", "source").collect().toSeq
    assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
    assert(batch.map(r => (r.getAs[String]("source"), r.getAs[Long]("n_tokens"))) ==
      Seq(("s0", 5L), ("s1", 1L), ("s0", 4L)))
  }

  test("windowed top-k: stream counts + batch finisher equal w32 exactly") {
    import graft.streaming.DocStreams
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("w32_window_topk")(spark, sf)
      .collect().toSeq

    val src = java.nio.file.Paths.get(s"$sf/events.parquet")
    val dirP = java.nio.file.Files.createTempDirectory("events-topk")
    java.nio.file.Files.copy(src, dirP.resolve("part-0.parquet"))
    val streamRaw = spark.readStream
      .schema(spark.read.parquet(src.toString).schema)
      .parquet(dirP.toString)
    val q = DocStreams.windowedTypeCounts(graft.tables.Tables.eventsFrom(streamRaw))
      .writeStream.format("memory").queryName("win_topk")
      .outputMode(OutputMode.Complete).start()
    try q.processAllAvailable() finally q.stop()
    val streamed = DocStreams.topKFinish(spark.table("win_topk"), 3)
      .collect().toSeq

    assert(streamed.map(_.toSeq) == batch.map(_.toSeq))
    assert(batch.nonEmpty &&
      batch.map(_.getAs[Int]("rk")).forall(rk => rk >= 1 && rk <= 3))
  }
}
