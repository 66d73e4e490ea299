package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom per-key top-k operator (plans.TopKPerKey): equivalence to
  * the window spelling it replaces, boundary/tie behavior, plan shape
  * (partial + final exec pair around exactly one exchange, no Sort, no
  * Window), and the global (no-keys) form.
  */
class TopKSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("perKey equals the window row_number spelling on driver data") {
    import org.apache.spark.sql.expressions.Window
    val src = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"))
    for (k <- Seq(1, 3, 10)) {
      val expected = src.withColumn("rnk", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("l_extendedprice").desc, col("l_orderkey"),
              col("l_linenumber"))))
        .filter(col("rnk") <= k).drop("rnk")
        .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
        .collect().toSeq
      val got = graft.ext.TopK.perKey(src, Seq(col("l_returnflag")),
          Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber")), k)
        .orderBy(col("l_returnflag"), col("l_extendedprice").desc,
          col("l_orderkey"), col("l_linenumber"))
        .collect().toSeq
      assert(got === expected, s"k=$k")
      assert(got.nonEmpty)
    }
  }

  test("keys with fewer than k rows keep all rows; ties break by the id column") {
    import spark.implicits._
    val df = Seq(
      ("a", 5.0, 1L), ("a", 5.0, 2L), ("a", 5.0, 3L), ("a", 1.0, 4L),
      ("b", 9.0, 5L)).toDF("key", "v", "id")
    val got = graft.ext.TopK.perKey(df, Seq(col("key")),
        Seq(col("v").desc, col("id")), 2)
      .orderBy(col("key"), col("id")).collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    // a: the two LOWEST ids among the 5.0 ties; b: its only row
    assert(got.toSeq === Seq(("a", 5.0, 1L), ("a", 5.0, 2L), ("b", 9.0, 5L)))
  }

  test("plan: partial+final pair, one exchange between, no sort, no window") {
    val src = graft.tables.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_extendedprice"))
    val df = graft.ext.TopK.perKey(src, Seq(col("l_returnflag")),
      Seq(col("l_extendedprice").desc, col("l_orderkey")), 3)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyPartial"), s"missing partial stage:\n$p")
    assert(p.contains("TopKPerKeyFinal"), s"missing final stage:\n$p")
    assert(p.contains("hashpartitioning(l_returnflag"),
      s"final stage must cluster on the key:\n$p")
    assert(!p.contains("WindowExec") && !p.contains("SortExec"),
      s"the operator must not sort or window:\n$p")
  }

  test("empty keys = global top-k (single AllTuples final stage)") {
    import spark.implicits._
    val df = (1L to 100L).toDF("id").withColumn("v", col("id") % 17)
    val got = graft.ext.TopK.perKey(df, Seq.empty,
        Seq(col("v").desc, col("id")), 4)
      .orderBy(col("v").desc, col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // v = id % 17: max v = 16 at ids 16, 33, 50, 67
    assert(got.toSeq === Seq((16L, 16L), (33L, 16L), (50L, 16L), (67L, 16L)))
  }

  test("scale sanity: 1M rows / 100k keys complete with bounded per-key state") {
    import spark.implicits._
    val df = spark.range(1000000L).toDF("id")
      .withColumn("key", col("id") % 100000)
      .withColumn("v", (col("id") * 2654435761L) % 1000003)
      .repartition(8)
    val got = graft.ext.TopK.perKey(df, Seq(col("key")),
      Seq(col("v").desc, col("id")), 2)
    assert(got.count() === 200000L) // every key has 10 rows, keeps 2
    // spot-check one key against the window spelling
    import org.apache.spark.sql.expressions.Window
    val expect = df.filter(col("key") === 12345)
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))))
      .filter(col("rnk") <= 2).drop("rnk")
      .orderBy(col("id")).collect().toSeq
    val one = got.filter(col("key") === 12345).orderBy(col("id")).collect().toSeq
    assert(one === expect)
  }

  test("property: random corpora with heavy ties equal the window spelling") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.scalacheck.Gen
    val gen = for {
      n <- Gen.choose(0, 400)
      rows <- Gen.listOfN(n, for {
        key <- Gen.choose(0, 5)      // few keys → deep groups
        v <- Gen.choose(0, 8)        // few values → constant ties
      } yield (key, v))
      k <- Gen.choose(1, 5)
    } yield (rows, k)
    val seed = org.scalacheck.rng.Seed(42L)
    var cur = seed
    for (_ <- 1 to 8) {
      val (rows, k) = gen.pureApply(Gen.Parameters.default, cur)
      cur = cur.next
      val df = rows.zipWithIndex
        .map { case ((key, v), id) => (key, v, id.toLong) }
        .toDF("key", "v", "id").repartition(5)
      val expected = df.withColumn("rnk", row_number().over(
          Window.partitionBy(col("key")).orderBy(col("v").desc, col("id"))))
        .filter(col("rnk") <= k).drop("rnk")
        .orderBy(col("key"), col("id")).collect().toSeq
      val got = graft.ext.TopK.perKey(df, Seq(col("key")),
          Seq(col("v").desc, col("id")), k)
        .orderBy(col("key"), col("id")).collect().toSeq
      assert(got === expected, s"k=$k rows=${rows.size}")
    }
  }

  test("catalog w18 matches the window spelling and never sorts input") {
    val got = SparkEntry.queries("w18_topk_native")(spark, sf)
    val p = got.queryExecution.executedPlan.toString
    assert(p.contains("TopKPerKeyFinal"))
    // the single SortExec allowed is the FINAL output orderBy (12 rows),
    // never below the top-k stages
    val finalIdx = p.indexOf("TopKPerKeyFinal")
    val sortIdx = p.indexOf("Sort ")
    assert(sortIdx < finalIdx, s"sort must only be the output ordering:\n$p")
    assert(got.collect().length === 9) // 3 flags × k=3
  }
}
