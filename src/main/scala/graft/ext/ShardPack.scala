package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget shard packing (SURVEY §2.12 X4 extension): assign documents
  * to training shards so each shard holds ~`budget` tokens in stable doc
  * order — the "pack the corpus into fixed-size shards" step every
  * large-scale training-data pipeline runs before writing tfrecord/parquet
  * shards.
  *
  * The running token total is a GLOBAL prefix sum, which a naive window
  * (`sum over (order by id)`) would funnel through one task. This is the
  * scale path instead, same boundary-exchange shape as ingest/GlobalSeq and
  * enrich/BoundaryFill: range-sort on the id, one O(P) job collecting
  * per-partition token totals, driver-side exclusive scan over P longs, then
  * a narrow map adds each partition's offset to its local running sum. The
  * sort shuffle's MAP output is written once and reused by both jobs (same
  * RDD object; the post-shuffle local sort re-runs in the output job — a
  * caller that persists the result avoids even that, and the totals pass
  * is sum-only), and only P longs ever cross the driver.
  */
object ShardPack {

  /** df: any frame with an id column (global order key) and a token-count
    * column. Returns (doc_id, n_tokens, cum_tokens, shard_id) where
    * cum_tokens is the inclusive running total in id order and
    * shard_id = (cum_tokens - 1) / budget (first `budget` tokens → shard 0). */
  def pack(df: DataFrame, idCol: String, tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    val sorted = df
      .select(col(idCol).cast("long").as("id"), col(tokensCol).cast("long").as("v"))
      .repartitionByRange(col("id"))
      .sortWithinPartitions(col("id"))
    val rdd = sorted.rdd.map(r => (r.getLong(0), r.getLong(1)))
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L; it.foreach(s += _._2); Iterator.single((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(0L)(_ + _) // offsets(pid) = tokens before pid
    val offB = spark.sparkContext.broadcast(offsets)
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = offB.value(pid)
      it.map { case (id, v) =>
        // max(0, …): leading zero-token docs (cum still 0) belong in shard
        // 0, not floor((-1)/budget) = -1
        run += v; Row(id, v, run, math.max(0L, Math.floorDiv(run - 1, budget))) }
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("n_tokens", LongType, nullable = false),
      StructField("cum_tokens", LongType, nullable = false),
      StructField("shard_id", LongType, nullable = false)))
    spark.createDataFrame(out, schema)
  }
}
