package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 batch 3: pre-aggregation join, time-grid resample + forward
  * fill, cumulative distinct, PQ-ADC two-stage rerank, balanced mixture
  * sample. Semantic tests run the actual catalog queries over hand-built
  * parquet tables or the sf0.001 driver tables; q7 is additionally checked
  * against its naive window spelling so the pre-aggregation rewrite is
  * provably transparent.
  */
class Ext6Spec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-ext6").toString

  test("q7_join_preagg: equals the per-row window-average spelling") {
    import org.apache.spark.sql.expressions.Window
    val li = graft.tables.Tables.lineitem(spark, sf)
    val w = Window.partitionBy(col("l_partkey"))
    val naive = li
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sq", sum(col("l_quantity").cast("decimal(18,2)")).over(w))
      .filter(col("l_quantity").cast("decimal(18,2)") * 5 * col("cnt") < col("sq"))
      .join(graft.tables.Tables.part(spark, sf),
        col("p_partkey") === col("l_partkey"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("sum_price"))
      .orderBy(col("p_brand")).collect().toSeq
    val got = SparkEntry.queries("q7_join_preagg")(spark, sf).collect().toSeq
    assert(got === naive)
    assert(got.nonEmpty)
  }

  test("w15_resample_ffill: gaps carry the last value, hour boundaries exact") {
    import spark.implicits._
    val d = tmpDir()
    val hrUs = 3600000000L
    def ts(hr: Long, off: Long = 0) = new Timestamp((hr * hrUs + off) / 1000)
    Seq(
      // user 1: events in hours 10 and 13 → grid 10..13, hours 11/12
      // filled with 1.5; hour 13's later event (2.75) wins over 2.25
      (0L, ts(10), 1L, "a", 1.5, "{}"),
      (1L, ts(13), 1L, "a", 2.25, "{}"),
      (2L, ts(13, 5000000L), 1L, "a", 2.75, "{}"),
      // user 2: single event — 1-hour grid, nothing filled
      (3L, ts(20), 2L, "a", 9.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w15_resample_ffill")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // user 1: 4 hours, 2 filled, sum = 1500 + 1500 + 1500 + 2750
    assert(out.toSeq === Seq((1L, 4L, 2L, 7250L), (2L, 1L, 0L, 9000L)))
  }

  test("w16_cumulative_distinct: repeat types don't re-count, days accumulate") {
    import spark.implicits._
    val d = tmpDir()
    val dayUs = 86400000000L
    def ts(day: Long, off: Long = 0) = new Timestamp((day * dayUs + off) / 1000)
    Seq(
      // user 1: day 1 types a,b; day 2 type a again (no new); day 4 type c
      (0L, ts(1), 1L, "a", 1.0, "{}"),
      (1L, ts(1, 5000000L), 1L, "b", 1.0, "{}"),
      (2L, ts(2), 1L, "a", 1.0, "{}"),
      (3L, ts(4), 1L, "c", 1.0, "{}"),
      // user 2: one day, one type
      (4L, ts(7), 2L, "z", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$d/events.parquet")
    val out = SparkEntry.queries("w16_cumulative_distinct")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq(
      (1L, 1L, 2L), (1L, 2L, 2L), (1L, 4L, 3L), (2L, 7L, 1L)))
  }

  test("x45_pq_rerank: 5 ranked rows per query, exact dots descending") {
    val rows = SparkEntry.queries("x45_pq_rerank")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((q, rs) <- byQ) {
      assert(rs.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4, 5),
        s"query $q missing ranks")
      val dots = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b },
        s"query $q dot6 not descending: ${dots.toSeq}")
      assert(rs.forall(_.getLong(2) != q), "query itself must be excluded")
    }
  }

  test("x45_pq_rerank: ADC score equals the hand-computed distance-table sum") {
    import graft.ext.PqCodebook.{M, SubDim, Kc, cw}
    // hand-compute for the first (query, neighbor) row: code of the
    // neighbor via argmax dots, then ADC = sum of query-side table entries
    val first = SparkEntry.queries("x45_pq_rerank")(spark, sf)
      .orderBy(col("q_id"), col("rnk")).limit(1).collect()(0)
    val (qId, nId, adc6) = (first.getLong(0), first.getLong(2), first.getDouble(3))
    val vecs = graft.tables.Tables.embeddings(spark, sf)
      .filter(col("vec_id").isin(qId, nId))
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (qv, nv) = (vecs(qId), vecs(nId))
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.indices.foldLeft(0.0)((acc, i) => acc + a(i) * b(i))
    val adc = (0 until M).map { m =>
      val sub = nv.slice(m * SubDim, (m + 1) * SubDim)
      val dots = (0 until Kc).map(k => dot(sub, cw(m)(k)))
      val code = (0 until Kc)
        .find(k => (k + 1 until Kc).forall(j => dots(k) >= dots(j))).get
      dot(qv.slice(m * SubDim, (m + 1) * SubDim), cw(m)(code))
    }.sum
    assert(math.abs(math.floor(adc * 1e6) / 1e6 - adc6) < 1e-9,
      s"ADC mismatch: engine $adc6, hand $adc")
  }

  test("x46_balanced_sample: every source keeps exactly the min source count") {
    import spark.implicits._
    val d = tmpDir()
    // sources: a×5, b×3, c×7 → quota 3 each
    val rows = (1L to 5L).map(i => (i, s"text $i", "en", "a", 6L)) ++
      (6L to 8L).map(i => (i, s"text $i", "en", "b", 6L)) ++
      (9L to 15L).map(i => (i, s"text $i", "en", "c", 6L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    val out = SparkEntry.queries("x46_balanced_sample")(spark, d).collect()
    assert(out.map(_.getString(0)).toSeq === Seq("a", "b", "c"))
    assert(out.forall(_.getLong(1) == 3L), "every source must keep quota rows")
    // source b kept all 3 of its rows — ids 6..8 regardless of hash order
    val b = out.find(_.getString(0) == "b").get
    assert(b.getLong(2) === 21L && b.getLong(3) === 6L && b.getLong(4) === 8L)
  }
}
