package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-independent cache hygiene: catalog queries register their
  * intra-query persists with [[GraftCaches]], and constructing the next
  * catalog query releases the previous one's — so a third-party caller
  * running queries back-to-back WITHOUT any clearCache convention keeps a
  * bounded storage footprint. */
class CacheHygieneSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("3 heavy queries back-to-back without clearCache keep storage bounded") {
    val sf = "/root/testdata/sf0.001"
    // heavy = the catalog's persist-using constructors (pagerank caches the
    // edge set twice, canonical-pick runs CC, sparse-cosine caches the
    // rare-term index)
    val names = Seq("x35_pagerank", "x31_canonical_pick", "x47_sparse_cosine",
      "x35_pagerank", "x31_canonical_pick", "x47_sparse_cosine")
    // measure relative to whatever other suites left in the shared
    // session's storage — this spec owns only its own delta
    val base = spark.sparkContext.getPersistentRDDs.size
    val sizes = names.map { n =>
      assert(SparkEntry.queries(n)(spark, sf).count() > 0, n)
      spark.sparkContext.getPersistentRDDs.size - base
    }
    // at most one query's generation of caches is ever live: the count
    // right after a query's action includes only ITS persists (prior ones
    // were released at construction), so it must not grow run-over-run
    assert(sizes.max <= 6, s"persistent RDDs grew: $sizes (base=$base)")
    assert(sizes.last <= sizes.head + 1, s"storage accumulated: $sizes")
    // explicit final release leaves the shared session clean for others
    GraftCaches.releasePrior()
    // one more construction proves release is idempotent with a prior sweep
    spark.catalog.clearCache()
    assert(SparkEntry.queries("x35_pagerank")(spark, sf).count() > 0)
    GraftCaches.releasePrior()
  }
}
