package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Bucketing: the pre-shuffle story for repeated big joins. Writing both
  * fact tables bucketed+sorted by the join key lets the join run with NO
  * exchange on either side — at 100 TB this converts every downstream
  * orders⋈lineitem into a zero-shuffle merge. */
class BucketingSpec extends AnyFunSuite {

  test("join over bucketed tables runs without a shuffle exchange") {
    val spark = TestSpark.spark
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")

    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("orders_b")
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("lineitem_b")

    val joined = spark.table("orders_b")
      .join(spark.table("lineitem_b"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    // force a merge join so the bucket layout (not a broadcast) is what
    // the planner exploits
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning(o_orderkey"),
        "orders side should be pre-bucketed, no shuffle")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"),
        "lineitem side should be pre-bucketed, no shuffle")

      // and the result matches the plain (shuffling) join
      val viaBuckets = joined.orderBy("o_orderstatus").collect().toSeq
      val plain = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(viaBuckets == plain)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
