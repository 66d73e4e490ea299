package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** AQE skew handling: the runtime half of the 100 TB skew story. The
  * catalog's STATIC mitigations (a4/j10 salting) rewrite the query; this
  * spec proves the engine config ALSO lets AQE split a skewed partition at
  * runtime with no query rewrite — the path a production job takes when
  * skew appears in data it didn't expect. */
class SkewJoinSpec extends AnyFunSuite {

  test("AQE splits the skewed partition in a sort-merge join (skew=true)") {
    val spark = TestSpark.spark
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // shrink the thresholds so a ~MB-scale test partition counts as skewed
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

      // left: one pathological key (0) with 200k rows, 31 normal keys
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .union(spark.range(3100).select((col("id") % 31 + 1).as("k"), col("id").as("v")))
      val right = spark.range(32).select(col("id").as("k"), (col("id") * 10).as("w"))
        .union(spark.range(32).select(col("id").as("k"), (col("id") * 11).as("w")))

      // aggregate WITHOUT the join key: a groupBy(k) downstream would
      // require the join's hash partitioning and block the skew split
      val joined = left.join(right, "k").agg(count(lit(1)).as("n"))
      val rows = joined.collect() // run it so AQE finalizes the plan
      assert(rows(0).getLong(0) == (200000L + 3100L) * 2)

      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE should mark the skewed SMJ side:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
