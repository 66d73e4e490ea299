package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.queries.BeamSchedule

/** VERDICT r13 #4: the wall-time leg of the BeamSchedule at-scale
  * contract. The schedule's RECALL is pinned at 30k
  * (BeamScheduleSpec/Spec2); what was never measured is whether the
  * layered form actually PAYS at an n beyond every prior probe. This
  * spec runs a 100k-vector clustered corpus (TestCorpora.clustered,
  * 3.3× the prior largest, same duplicate-free construction) through
  * the scheduled 4-layer form and the flat 1-layer walk, on HELD-OUT
  * perturbed queries against brute-force ground truth (self-recall is
  * too easy at this scale — the first cut of this spec measured flat
  * self-recall 0.92; held-out is where the flat walk's fixed entry set
  * genuinely degrades, exactly as the r6 30k probe showed for the
  * fixed form). It asserts the scheduled form's held-out recall@1 ≥
  * 0.9 with the flat form as the trailing control, and records both
  * end-to-end wall times (graph build + entries + hops + rescore) via
  * info() — the committed numbers land in ROUND_NOTES.
  *
  * This spec's first run also caught a real at-scale defect: at the
  * schedule's 9 hops the per-hop persist alone left tree-shaped plan
  * walks exponential (2^hops InMemoryRelation renders — ~14 min of
  * driver-side Catalyst and an explainString OOM at 100k). The
  * per-hop logical lineage cut in BeamSchedule.hop is the fix this
  * spec now regression-pins by virtue of finishing at all.
  */
class BeamWallTimeScaleSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  test("100k vectors, held-out queries: scheduled (4-layer) search " +
    "keeps recall@1 >= 0.9 at bounded end-to-end wall time; the flat " +
    "1-layer walk degrades — the layer schedule, not brute width, is " +
    "what scales") {
    val n = 100000L
    val step = 2000L // 50 held-out queries
    val e0 = TestCorpora.clustered(spark, n).persist()
    e0.count() // materialize the corpus outside every timing window
    // brute-force ground truth over the SAME perturbed queries the
    // search derives internally (deterministic PerturbSql)
    val qs = e0.filter(col("vec_id") % step === 0)
      .select(col("vec_id").as("q_id"),
        expr(graft.queries.Ext43.PerturbSql).as("qq"))
    val gt = e0.crossJoin(broadcast(qs))
      .select(col("q_id"), col("vec_id"),
        graft.queries.Ext43.idist2Hof(col("qq"), col("q")).as("dist2"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("q_id")).orderBy(col("dist2"), col("vec_id"))))
      .filter(col("rn") === 1).select(col("q_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(gt.size == 50)
    def run(k: BeamSchedule.Knobs): (Double, Double) = {
      val t0 = System.nanoTime()
      val got = BeamSchedule.beamAnnLayered(e0, step, k, perturb = true)
        .filter(col("rank") === 1L)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      GraftCaches.releasePrior() // each form pays its own graph build
      (got.count(gt.contains).toDouble / gt.size, sec)
    }
    val sched = BeamSchedule.scheduleFor(n)
    assert(sched.layers == 4) // 100k/8^3 = 195 <= 500-node top layer
    val (rScheduled, tScheduled) = run(sched)
    val (rFlat, tFlat) = run(BeamSchedule.Knobs(layers = 1))
    info(f"100k held-out recall@1: scheduled(4L) = $rScheduled%.3f in " +
      f"$tScheduled%.1f s; flat(1L) = $rFlat%.3f in $tFlat%.1f s")
    assert(rScheduled >= 0.9, s"scheduled held-out recall@1 = $rScheduled")
    assert(rFlat < rScheduled,
      s"flat control should trail: $rFlat vs $rScheduled")
    // post-lineage-cut the layered form's extra cost is the upper-layer
    // builds + 6 bounded hops — a small constant over the shared base
    // build, never the pre-fix 20× driver-side blowup
    assert(tScheduled <= tFlat * 4 + 120.0,
      f"layered wall time $tScheduled%.1f s is out of proportion to " +
        f"flat $tFlat%.1f s — the plan-size pathology is back?")
    e0.unpersist()
    GraftCaches.releasePrior()
  }
}
