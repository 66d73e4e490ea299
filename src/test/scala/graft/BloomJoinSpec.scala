package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: the OTHER runtime filter (besides
  * AQE skew/coalesce) a 100 TB deployment leans on — a selective dim-side
  * predicate materializes a Bloom filter that is pushed into the fact-side
  * scan as `might_contain`, so the big side drops non-joining rows BEFORE
  * the shuffle. x38 spells the same idea manually; this spec proves the
  * engine config path. */
class BloomJoinSpec extends AnyFunSuite {

  test("selective dim join injects a might_contain runtime filter") {
    val spark = TestSpark.spark
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // shuffle join
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10MB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")

      val sf = "/root/testdata/sf0.001"
      val fact = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_extendedprice"))
      val dim = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT") // selective
        .select(col("o_orderkey"))
      val joined = fact.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter should prune the fact scan:\n$plan")

      // and the filter is semantics-preserving
      val n = joined.collect()(0).getLong(0)
      val expect = fact.join(
        spark.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey")).hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
