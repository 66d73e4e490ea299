package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.queries.Ext

/** Extension-operator properties that the DuckDB oracle can't express:
  * HLL error bounds, and the prefix-filter completeness guarantee. */
class ExtSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct at rsd=0.01 stays within 5% of exact") {
    val spark = TestSpark.spark
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = li.agg(countDistinct(col("l_orderkey")).as("n"))
      .collect()(0).getLong(0)
    // rsd is the sketch's relative STANDARD DEVIATION (default 0.05 can
    // legitimately land outside 5%); pin it to 1% and allow 5σ
    val approx = li.agg(approx_count_distinct(col("l_orderkey"), 0.01).as("n"))
      .collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("prefix-filtered n-gram Jaccard finds exactly the naive join's pairs") {
    val spark = TestSpark.spark
    val fast = Ext.queries("x4_ngram_jaccard")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    // naive quadratic reference: all pairs, exact Jaccard on hashed shingles
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val w = split(col("text"), " ")
    val ss = when(size(w) >= 3,
      array_distinct(transform(sequence(lit(1), size(w) - 2), i =>
        concat_ws(" ", element_at(w, i), element_at(w, i + 1), element_at(w, i + 2)))))
      .otherwise(array().cast("array<string>"))
    val sets = docs.select(col("doc_id"),
      array_distinct(transform(ss, s => graft.ext.TextOps.hash32(s))).as("hs"))
    val naive = sets.as("x").crossJoin(sets.as("y"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id1"), col("y.doc_id").as("id2"),
        size(array_intersect(col("x.hs"), col("y.hs"))).as("inter"),
        size(col("x.hs")).as("n1"), size(col("y.hs")).as("n2"))
      .select(col("id1"), col("id2"),
        (col("inter").cast("double") / (col("n1") + col("n2") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq

    assert(fast.sorted == naive.sorted)
    assert(naive.nonEmpty) // the fixture data plants near-duplicates
  }

  test("cosine top-k: self excluded, k rows per query, ranks contiguous") {
    val spark = TestSpark.spark
    val out = Ext.queries("x6_cosine_topk")(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    for ((q, rows) <- byQ) {
      assert(rows.length == 5)
      assert(rows.map(_.getInt(2)).sorted.sameElements(1 to 5))
      assert(!rows.exists(_.getLong(1) == q))
      // descending similarity
      val sims = rows.sortBy(_.getInt(2)).map(_.getDouble(3))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }
}
