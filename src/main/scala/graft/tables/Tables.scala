package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's parquet test tables (TESTDATA.md).
  *
  * All reads go through here so column pruning / predicate pushdown can be
  * asserted in one place and so a future cluster deployment can swap the
  * path scheme (e.g. s3://) without touching query code.
  */
object Tables {
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects; sessions set spark.sql.legacy.parquet.nanosAsLong=true so it
    * arrives as a LongType of epoch-nanoseconds. Expose both the exact
    * nanosecond key (`ts_ns`, for ordering — matches DuckDB's TIMESTAMP_NS
    * order) and a micros-truncated TimestampType `ts` (for formatting and
    * event-time windows). */
  def events(s: SparkSession, d: String): DataFrame = eventsFrom(table(s, d, "events"))

  /** Shared by batch and readStream paths (streaming: pass
    * `spark.readStream.schema(batchSchema).parquet(dir)` through here). */
  def eventsFrom(raw: DataFrame): DataFrame =
    if (raw.schema("ts").dataType == LongType)
      // integer `div`, NOT floor(ns / 1000.0): epoch nanos ≈ 1.7e18 exceed
      // a double's 53-bit mantissa, so the float path lands ±1 µs off the
      // exact truncation DuckDB applies when it reads the same column
      raw.withColumn("ts_ns", col("ts"))
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts_ns", unix_micros(col("ts")) * 1000)
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Register every test table as a temp view so the whole catalog is
    * reachable from `spark.sql(...)` (events via the loader, so `ts_ns` and
    * the micros `ts` are available in SQL too). */
  def registerViews(s: SparkSession, d: String): Unit =
    for (n <- names) {
      val df = if (n == "events") events(s, d) else table(s, d, n)
      df.createOrReplaceTempView(n)
    }
}
