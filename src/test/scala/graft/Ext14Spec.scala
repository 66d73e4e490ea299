package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Round-5 batch 6: disjunctive join pushdown, interpolated median,
  * feature scaling stats. */
class Ext14Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("q13_disjunctive: brand prefix of the OR reaches the part scan") {
    val sf = "/root/testdata/sf0.001"
    val df = SparkEntry.queries("q13_disjunctive")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      (plan.contains("In(p_brand") || plan.contains("p_brand#")), plan)
    // result equals a filter-after-join spelling
    val p = spark.read.parquet(s"$sf/part.parquet")
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val expect = li.join(p, col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size") <= 10 &&
          col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#2" && col("p_size") >= 5 &&
          col("l_quantity") >= 10 && col("l_quantity") <= 35))
      .agg(count(lit(1)),
        sum(col("l_extendedprice").cast("decimal(18,2)") *
          (lit(BigDecimal(1)) - col("l_discount").cast("decimal(18,2)")))
          .cast("double"))
      .collect()(0)
    val got = df.collect()(0)
    assert(got.getLong(0) == expect.getLong(0) &&
      got.getDouble(1) == expect.getDouble(1))
  }

  test("w26_median_interp: odd groups select, even groups average exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext14").toString
    val t0 = 1700000000000000L
    Seq(
      (0L, t0, 1L, "a", 1.0), (1L, t0 + 1, 1L, "a", 2.0),
      (2L, t0 + 2, 1L, "a", 9.0),                        // odd: median 2000
      (3L, t0, 2L, "a", 1.0), (4L, t0 + 1, 2L, "a", 2.0),
      (5L, t0 + 2, 2L, "a", 4.0), (6L, t0 + 3, 2L, "a", 9.0)) // even: 3000
      .map { case (id, tus, uid, et, v) =>
        (id, new Timestamp(tus / 1000), uid, et, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w26_median_interp")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 3L, 2000.0), (2L, 4L, 3000.0)))
  }

  test("x71_feature_stats: hand vectors give exact integer moments") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-ext14f").toString
    // dim 0: values 1.0, 3.0 → micro 1e6, 3e6 → mean 2e6, var 1e12
    // dim 1: values 2.0, 2.0 → mean 2e6, var 0
    Seq((1L, Array(1.0f, 2.0f), 0), (2L, Array(3.0f, 2.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$d/embeddings.parquet")
    val out = SparkEntry.queries("x71_feature_stats")(spark, d)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.toSeq === Seq((0, 2L, 2000000.0, 1.0e12), (1, 2L, 2000000.0, 0.0)))
  }
}
