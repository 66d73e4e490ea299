package graft.enrich

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The 100 TB formulation of the global-order gap fill (SURVEY H1): the
  * single-partition `Window.orderBy(seq)` with ignoreNulls `last`/`first`
  * becomes range partitioning + per-partition prefix/suffix scans + a
  * driver-side exchange of ONE boundary row per partition.
  *
  * Semantics (identical to the `w1_gap_fill` window query): for each row in
  * global `seq` order, `prev` = nearest non-null value above, `next` =
  * nearest non-null value below; a null value is filled iff prev == next.
  *
  * Cost model: one range shuffle of (seq, value) + one O(P) collect of
  * per-partition summaries + a local O(rows) pass — versus the window
  * form's single task holding ALL rows. P×2 strings cross the driver, never
  * the data. `BoundaryFillSpec` proves equivalence on random inputs.
  */
object BoundaryFill {

  /** df must have an orderable `seq` (long, globally unique) and a nullable
    * string `value`. Returns (seq, filled, flag_conflict) — same contract as
    * the w1_gap_fill query. */
  def gapFill(df: DataFrame, numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    // ONE .rdd materialization shared by both jobs: calling .rdd twice
    // builds two lineages, so the source scan, the range-sampler pass and
    // the shuffle WRITE would all run twice. With a single shared RDD the
    // fill job reuses the boundary job's shuffle map output (skipped
    // stage): one scan + one shuffle write, two cheap shuffle reads — no
    // cache storage needed.
    val narrowed = df.select(col("seq").cast("long"), col("value").cast("string"))
      .repartitionByRange(numPartitions, col("seq"))
      .sortWithinPartitions(col("seq"))
      .rdd

    // pass A: per-partition (partitionId, firstNonNull, lastNonNull)
    val summaries: Array[(Int, String, String)] = narrowed
      .mapPartitionsWithIndex { (pid, it) =>
        var first: String = null
        var last: String = null
        for (r <- it) {
          val v = r.getString(1)
          if (v != null) { if (first == null) first = v; last = v }
        }
        Iterator.single((pid, first, last))
      }
      .collect()
      .sortBy(_._1)

    // driver: prefix of lastNonNull (value entering each partition from
    // above) and suffix of firstNonNull (value entering from below)
    val p = summaries.length
    val prevIn = new Array[String](p)
    val nextIn = new Array[String](p)
    var run: String = null
    for (i <- 0 until p) {
      prevIn(i) = run
      if (summaries(i)._3 != null) run = summaries(i)._3
    }
    run = null
    for (i <- (p - 1) to 0 by -1) {
      nextIn(i) = run
      if (summaries(i)._2 != null) run = summaries(i)._2
    }
    val prevB = spark.sparkContext.broadcast(prevIn)
    val nextB = spark.sparkContext.broadcast(nextIn)

    // pass B: local fill with injected boundary state
    val outSchema = StructType(Seq(
      StructField("seq", LongType, nullable = false),
      StructField("filled", StringType, nullable = false),
      StructField("flag_conflict", BooleanType, nullable = false)))
    val outRdd = narrowed.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val n = rows.length
      val seqs = new Array[Long](n)
      val vals = new Array[String](n)
      var i = 0
      while (i < n) { seqs(i) = rows(i).getLong(0); vals(i) = rows(i).getString(1); i += 1 }
      val nextArr = new Array[String](n)
      var nv: String = if (pid < nextB.value.length) nextB.value(pid) else null
      i = n - 1
      while (i >= 0) { nextArr(i) = nv; if (vals(i) != null) nv = vals(i); i -= 1 }
      var prev: String = if (pid < prevB.value.length) prevB.value(pid) else null
      val out = new Array[Row](n)
      i = 0
      while (i < n) {
        val v = vals(i)
        if (v != null) {
          out(i) = Row(seqs(i), v, false)
          prev = v
        } else {
          val nx = nextArr(i)
          val agree = prev != null && nx != null && prev == nx
          out(i) = Row(seqs(i), if (agree) prev else "", !agree)
        }
        i += 1
      }
      out.iterator
    }
    spark.createDataFrame(outRdd, outSchema)
  }

  /** The single-partition window twin (what `w1_gap_fill` uses) — kept here
    * so the equivalence is testable side by side. */
  def gapFillWindow(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wPrev = Window.orderBy(col("seq")).rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.orderBy(col("seq")).rowsBetween(1, Window.unboundedFollowing)
    df.select(col("seq").cast("long"), col("value").cast("string"))
      .withColumn("prev", last(col("value"), ignoreNulls = true).over(wPrev))
      .withColumn("next", first(col("value"), ignoreNulls = true).over(wNext))
      .select(col("seq"),
        coalesce(col("value"),
          when(col("prev") === col("next"), col("prev")), lit("")).as("filled"),
        (col("value").isNull &&
          !(col("prev").isNotNull && col("next").isNotNull &&
            col("prev") === col("next"))).as("flag_conflict"))
  }
}
