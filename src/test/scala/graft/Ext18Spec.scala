package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Round-6 batch 2: CDC merge, null-routed skew join, last-touch
  * attribution, date spine, regex tokenization. */
class Ext18Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("j13: merge preserves row accounting (base - deletes + inserts)") {
    import spark.implicits._
    val base = spark.read.parquet(s"$sf/customer.parquet")
    val h = expr("pmod(conv(substring(md5(cast(concat('cdc:', " +
      "cast(c_custkey as string)) as binary)), 1, 8), 16, 10), 10)")
    val routed = base.select(h.cast("long").as("h"))
      .groupBy("h").count().collect().map(r => (r.getLong(0), r.getLong(1)))
      .toMap
    val expected = base.count() - routed.getOrElse(0L, 0L) +
      routed.getOrElse(3L, 0L)
    val merged = SparkEntry.queries("j13_cdc_merge")(spark, sf)
      .agg(sum("n")).collect()(0).getLong(0)
    assert(merged == expected,
      s"merged rows $merged != base - deletes + inserts = $expected")
  }

  test("j14: null keys are routed around the join (plan has no null side)") {
    val df = SparkEntry.queries("j14_null_skew_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    // the join input must filter nulls out — the routed rows come back
    // through the union, never through the join's shuffle
    assert(plan.contains("Union"), s"expected a union-routed plan:\n$plan")
    // the k.isNotNull filter collapses into the scan as a CASE over the
    // source columns — assert the pushed shape, not the alias name
    assert(plan.contains("ELSE isnotnull(o_custkey"),
      s"join side must pre-filter null keys at the scan:\n$plan")
    // and the null bucket survives with the right share (~30%)
    val rows = df.collect().map(r =>
      (Option(r.getString(0)).getOrElse("(null)"), r.getLong(1)))
    val nNull = rows.collectFirst { case ("(null)", n) => n }.get
    val total = rows.map(_._2).sum
    assert(nNull > total / 5 && nNull < total / 2,
      s"null bucket $nNull of $total outside the expected ~30% band")
  }

  test("w30: purchases never self-attribute; channels are non-purchase") {
    val rows = SparkEntry.queries("w30_last_touch")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (channel, n, users) =>
      assert(channel != "purchase", "a purchase must not attribute to itself")
      assert(users <= n)
    }
  }

  test("w31: spine is gap-free and totals match the raw event count") {
    val rows = SparkEntry.queries("w31_date_spine")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val weeks = rows.map(_._1).distinct.sorted.toSeq
    assert(weeks == (weeks.head to weeks.last).toSeq,
      "every week between min and max must appear")
    val types = rows.map(_._2).distinct.length
    assert(rows.length == weeks.length * types,
      "spine must be the full week x type grid")
    val total = rows.map(_._3).sum
    val nEvents = graft.tables.Tables.events(spark, sf).count()
    assert(total == nEvents, "zero-fill must not change the total")
  }

  test("x77: class counts are consistent and split a known string") {
    import spark.implicits._
    // pin the splitting rule itself on a hand value via the same exprs
    val df = Seq((1L, "ab12 cd, x9!!y")).toDF("doc_id", "text")
    def n(pat: String) =
      size(regexp_extract_all(col("text"), lit(pat), lit(0))).cast("long")
    val r = df.select(n("[A-Za-z]+").as("a"), n("[0-9]+").as("d"),
      n("[^A-Za-z0-9 ]+").as("o")).collect()(0)
    // runs: ab, cd, x, y | 12, 9 | ",", "!!"
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((4L, 2L, 2L)))

    val rows = SparkEntry.queries("x77_regex_tokens")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { row =>
      assert(row.getLong(4) ==
        row.getLong(1) + row.getLong(2) + row.getLong(3))
    }
  }
}
