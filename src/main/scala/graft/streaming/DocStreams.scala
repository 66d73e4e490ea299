package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ext.TextOps

/** Streaming twins of the dedup/curation operators over a DOCUMENT stream
  * (doc_id, ts, source, text) — the shapes an online ingestion pipeline
  * runs while training data arrives, each with state bounded by a
  * watermark (never O(all history)):
  *
  *   - exact-content dedup      = streaming x1 (key: md5 of the bytes)
  *   - fingerprint dedup        = streaming x22 at Hamming 0 (key: the
  *     48-bit SimHash — catches token-REORDERED repeats that the byte
  *     hash misses, since the fingerprint is order-free)
  *   - per-source token throughput = the monitoring aggregate behind x20's
  *     shard budgeting (how many tokens/minute each source contributes)
  *
  * All three run the SAME expressions as their batch twins (TextOps), so
  * batch backfill and the live stream cannot diverge.
  */
object DocStreams {

  final case class Doc(doc_id: Long, ts: Timestamp, source: String, text: String)

  /** Streaming exact-content dedup: drops byte-identical repeats within the
    * watermark horizon; seen-key state evicts as event time advances. */
  def dedupByContent(docs: DataFrame): DataFrame =
    docs
      .withColumn("content_key", md5(col("text").cast("binary")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_key")

  /** Streaming near-dup suppression at Hamming 0: key = the order-free
    * 48-bit SimHash over the distinct token set, so shuffled/reordered
    * near-copies collapse onto one key. Higher Hamming thresholds need the
    * banded pair join (x22) over a windowed batch instead — pairwise
    * verification is not expressible as a streaming key-dedup. */
  def dedupByFingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", array_distinct(TextOps.words(col("text"))))
      // empty-token docs carry no fingerprint signal: simhash48([]) is a
      // degenerate all-ones sentinel that would collide every such doc at
      // Hamming 0 — pass them through the filter-out path rather than
      // false-dedup them (unreachable via split() tokens; guards future
      // tokenizers that can return [])
      .filter(size(col("toks")) > 0)
      .withColumn("fp", TextOps.simhash48(col("toks")))
      .drop("toks")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("fp")

  /** Streaming per-line dedup — x141's analogue: explode each document
    * into 10-token lines keyed by the same md5 spelling as the batch
    * catalog, and keep the FIRST ARRIVAL of each line key within the
    * watermark horizon. Batch x141's keeper rule (global min position)
    * is order-dependent and not expressible as bounded streaming state;
    * first-arrival-within-watermark is the honest streaming analogue,
    * and on a bounded replay whose event-time order matches position
    * order the two rules provably agree (the StreamingSpec case pins
    * that equivalence with in-batch AND cross-batch duplicate lines).
    * State = one 16-byte key per distinct line inside the horizon. */
  def dedupLines(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("ts"), TextOps.words(col("text")).as("w"))
      .select(col("doc_id"), col("ts"), col("w"), size(col("w")).as("n"))
      .select(col("doc_id"), col("ts"), col("w"),
        explode(sequence(lit(0), expr("(n - 1) div 10"))).as("line_no"))
      .select(col("doc_id"), col("ts"),
        col("line_no").cast("long").as("line_no"),
        md5(concat_ws(" ",
          slice(col("w"), (col("line_no") * 10 + 1).cast("int"), lit(10)))
          .cast("binary")).as("lk"))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("lk")

  /** The x84/x88 span digest as a per-row expression: md5 of each
    * 32-token window at stride 16 (1-based starts, matching the batch
    * catalog spelling exactly, so stream and backfill agree on every
    * digest). Docs under 32 tokens carry no spans (empty array). */
  private def spanDigests(text: org.apache.spark.sql.Column) = {
    val w = TextOps.words(text)
    when(size(w) >= 32,
      transform(sequence(lit(1), size(w) - 31, lit(16)),
        i => md5(concat_ws(" ", slice(w, i, lit(32))).cast("binary"))))
      .otherwise(array().cast("array<string>"))
  }

  /** Stream-static decontamination (the streaming twin of x25/x84): drop
    * any arriving doc that shares a 32-token span digest with the static
    * benchmark set. The benchmark index collapses to ONE static row
    * holding the digest set — a stream-static join Spark broadcasts, so
    * per-trigger cost is the batch's span expression plus a set probe;
    * state is zero (pure filter, no watermark needed). */
  def decontamFilter(docs: DataFrame, benchSpanDigests: DataFrame): DataFrame = {
    val idx = benchSpanDigests.agg(collect_set(col("h")).as("bench_hs"))
    docs
      .withColumn("spans", spanDigests(col("text")))
      .crossJoin(idx)
      .filter(!arrays_overlap(col("spans"), col("bench_hs")))
      .drop("spans", "bench_hs")
  }

  /** Idempotent parquet upsert sink via foreachBatch — the exactly-once
    * write pattern a production ingestion stream uses: each micro-batch
    * dedups against the rows ALREADY LANDED (left-anti join on the
    * content key against the sink's current state), so replayed batches
    * (restart/retry) cannot double-write. At scale the landed-side read
    * prunes to the keys' partitions; here the contract (anti join +
    * append, batch id available for write-ahead bookkeeping) is what the
    * spec pins. Returns the DataStreamWriter ready to start. */
  def upsertSink(deduped: DataFrame, outDir: String)
  : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    deduped.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // Only the first-batch missing-sink case may yield an empty landed
        // set; any OTHER read failure (corrupt footer, FS hiccup) must fail
        // the micro-batch so the retry preserves the anti-join's
        // idempotence — swallowing it would let a replay double-write.
        val sinkPath = new org.apache.hadoop.fs.Path(outDir)
        val fs = sinkPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val landed =
          if (fs.exists(sinkPath) && fs.listStatus(sinkPath)
                .exists(_.getPath.getName.endsWith(".parquet")))
            spark.read.parquet(outDir).select(col("content_key"))
          else // first batch: nothing landed yet
            spark.emptyDataFrame.select(lit("").as("content_key")).limit(0)
        batch.join(landed, Seq("content_key"), "left_anti")
          .write.mode("append").parquet(outDir)
      }

  /** Windowed counts feeding the streaming top-k: per tumbling event-time
    * day and event type, the event count — watermarked so closed windows
    * emit once in append mode. Rank-truncation is NOT expressible inside
    * a streaming aggregation (no windows-over-aggregates in a stream), so
    * the stream emits the keyed counts and [[topKFinish]] applies the
    * rank per closed window — in foreachBatch, or over the sink table.
    * The batch catalog twin is w32_window_topk, and the StreamingSpec
    * pins stream == batch over the same corpus. */
  def windowedTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 day")
      .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(to_date(col("w.start")).as("day"), col("event_type"), col("n"))

  /** Batch finisher for [[windowedTypeCounts]]: top-k event types per day
    * (rank by count desc, type asc — w32's exact tie-break). The window
    * partitions by day, so the shape stays keyed at any scale. */
  def topKFinish(counts: DataFrame, k: Int): DataFrame =
    counts
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("day")).orderBy(col("n").desc, col("event_type"))))
      .filter(col("rk") <= k)
      .orderBy(col("day"), col("rk"))

  /** Per-source tumbling-minute token throughput: partial-aggregable sum +
    * count per (window, source); watermark closes windows for append
    * emission. */
  def tokenThroughput(docs: DataFrame): DataFrame =
    docs
      .withColumn("n_tokens", size(TextOps.words(col("text"))))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))
      .select(col("window.start").as("win_start"), col("source"),
        col("n_docs"), col("n_tokens"))
}
