package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 13 (VERDICT r12 #1 "What's wrong" item): the partition-less
  * window inventory, made a CLOSED WORLD.
  *
  * Convention (documented per site since round ~8): a `Window` with no
  * partition spec serializes its input through one task, so the catalog
  * only ever applies one to a VALUE-BOUNDED frame — an input whose row
  * count is bounded by distinct values / group counts / literals, never
  * by corpus rows (the x187/x120-class histogram rollups). Until this
  * spec, that convention was prose: a future query could add a global
  * window over corpus rows and nothing would fail. Now:
  *
  *  1. every catalog query carrying a partition-less window must be
  *     enrolled in the allowlist below (a new offender fails loudly and
  *     forces the author to justify the frame), and
  *  2. every enrolled window's input subtree must machine-check as
  *     value-bounded ([[WindowInventory.valueBounded]]: all leaf paths
  *     pass an Aggregate / Limit / literal relation / literal Range
  *     before any scan; Generate is not pass-through; cached subtrees
  *     judged through their cached physical plan), and
  *  3. the allowlist itself must stay tight (no stale entries).
  *
  * Walks the optimized logical plan at sf0.001 — plan SHAPE is what is
  * asserted and it is scale-independent at this altitude.
  */
class GlobalWindowInventorySpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.001"

  /** The closed inventory (round-13 walk of all 278 catalog queries):
    * each entry's global window orders a value-bounded rollup —
    * w29 source-interleave (per-source counts), x73/x107 mixture
    * apportionment (per-source remainders), x120/x163/x164 drift
    * statistics (value histograms), x121 AUC (score buckets),
    * x136 waterfall (stage counts), x157 conformal alphas,
    * x162 Heaps vocab (doc-count curve), x172 Zipf buckets.
    *
    * (Round 15 note: GlobalSeq's A/B-only "offsets" spelling carries a
    * cumsum window over its per-partition count rollup — bounded by the
    * shuffle partition count. It is NOT the catalog spelling — it lost
    * the same-boot A/B — so no consumer enrolls for it; if it is ever
    * adopted, unpersisted consumers x125/x158/x159 must enroll here.) */
  private val allowlist: Set[String] = Set(
    "w29_interleave", "x73_mixture_apportion", "x107_token_budget",
    "x120_ks_drift", "x121_classifier_auc", "x136_filter_waterfall",
    "x157_conformal_coverage", "x162_heaps_vocab",
    "x163_wasserstein_drift", "x164_mann_whitney", "x172_zipf_buckets")

  test("every partition-less window sits on a value-bounded frame and " +
    "the inventory is closed-world") {
    val spark = TestSpark.spark
    val seen = scala.collection.mutable.Set.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      val df = SparkEntry.queries(name)(spark, sf)
      val wins = WindowInventory.globalWindows(df.queryExecution.optimizedPlan)
      if (wins.nonEmpty) {
        seen += name
        assert(allowlist.contains(name),
          s"$name carries a partition-less window but is not enrolled in " +
            "the closed inventory — either repartition the window or " +
            "justify the value-bounded frame and enroll it here")
        for (w <- wins)
          assert(WindowInventory.valueBounded(w.child),
            s"$name: partition-less window over a NON-value-bounded " +
              s"input — this serializes corpus rows through one task:\n" +
              w.child.treeString.take(4000))
      }
      // eager entries (pipeline, bucketed writes) may have registered
      // intra-query persists; release before the next construction
      GraftCaches.releasePrior()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    val stale = allowlist -- seen
    assert(stale.isEmpty,
      s"allowlist entries with no partition-less window anymore: $stale — " +
        "prune them so the inventory stays tight")
  }
}
