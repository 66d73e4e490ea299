package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-5 batch 8: the injected optimizer rule, the scale-safe share-of-
  * total spelling, and small-file compaction. */
class Ext16Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("SmallDimBroadcast rule: dim joins broadcast with stats disabled") {
    val sf = "/root/testdata/sf0.001"
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // no hint anywhere — only the injected rule can choose broadcast
      val dimJoin = spark.read.parquet(s"$sf/customer.parquet")
        .join(spark.read.parquet(s"$sf/nation.parquet"),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(count(lit(1)).as("n"))
      val plan = dimJoin.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"nation join should broadcast via the rule:\n$plan")

      // a fact-fact join must NOT be touched by the rule
      val factJoin = spark.read.parquet(s"$sf/orders.parquet")
        .join(spark.read.parquet(s"$sf/lineitem.parquet"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val factPlan = factJoin.queryExecution.executedPlan.toString
      assert(!factPlan.contains("BroadcastHashJoin"), factPlan)

      // and the rule preserves semantics
      val viaRule = dimJoin.orderBy("n_name").collect().toSeq
      conf.unset("spark.sql.autoBroadcastJoinThreshold")
      val normal = dimJoin.orderBy("n_name").collect().toSeq
      assert(viaRule == normal)
    } finally saved match {
      case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("SmallDimBroadcast rule: name-collision table with a foreign schema is NOT hinted") {
    // an unrelated user table whose directory merely happens to be called
    // nation.parquet must not be force-broadcast (OOM risk) — the rule
    // additionally requires the known dim key column in the scan schema
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    val wh = new java.net.URI(conf.get("spark.sql.warehouse.dir"))
    val impostor = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(wh), "ext16_impostor/nation.parquet").toString
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.range(1000)
        .select(col("id").as("k"), (col("id") % 7).as("v"))
        .write.mode("overwrite").parquet(impostor)
      val left = spark.range(1000).select(col("id").as("k"), lit("x").as("tag"))
      val j = left.join(spark.read.parquet(impostor), Seq("k"))
        .groupBy(col("v")).agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"impostor nation.parquet must not be broadcast by the rule:\n$plan")
    } finally {
      saved match {
        case Some(v) => conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None    => conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
      val p = new org.apache.hadoop.fs.Path(impostor).getParent
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  test("w28_share_of_total: no unpartitioned window anywhere in the plan") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("w28_share_of_total")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"share-of-total must not window:\n$plan")
    val out = df.collect().map(r => (r.getLong(1), r.getLong(2)))
    val total = out.map(_._1).sum
    out.foreach { case (cents, pm) =>
      assert(pm == cents * 1000 / total)
    }
    // shares sum to ~1000 (floor rounding loses at most n_groups per-mille)
    val pmSum = out.map(_._2).sum
    assert(pmSum <= 1000 && pmSum >= 1000 - out.length)
  }

  test("compaction: many small files coalesce without changing the data") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val src = s"$base/small"
    val dst = s"$base/compacted"
    spark.range(10000).select(col("id"), (col("id") % 97).as("v"))
      .repartition(64).write.parquet(src)
    val nSmall = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nSmall == 64, s"expected 64 small files, got $nSmall")
    // compact: coalesce avoids a shuffle (narrow dependency)
    val df = spark.read.parquet(src)
    df.coalesce(4).write.parquet(dst)
    val nBig = new java.io.File(dst).listFiles().count(_.getName.endsWith(".parquet"))
    assert(nBig <= 4, s"expected <=4 compacted files, got $nBig")
    val a = spark.read.parquet(src).orderBy("id").collect().toSeq
    val b = spark.read.parquet(dst).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
