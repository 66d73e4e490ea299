package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Held-out recall of the SCHEDULED beam form (the AbVariants
  * x146_beam_recall__scheduled twin): same perturbed non-member queries
  * and brute-force ground truth as the catalog x146, but searched with
  * BeamSchedule.scheduleFor(n) instead of the fixed catalog knobs.
  */
class BeamScheduleSpec2 extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def meanRecallPm(sf: String): Double = {
    val rows = graft.queries.AbVariants
      .variants("x146_beam_recall__scheduled")(spark, s"/root/testdata/sf$sf")
      .select(col("recall_pm")).collect().map(_.getLong(0))
    rows.sum.toDouble / rows.length
  }

  test("scheduled-form held-out recall@3: 1.000 / 1.000 / 0.625 at " +
    "sf0.001 / 0.01 / 0.1 — beats the catalog knobs at small n (x146 " +
    "measured 0.93 at sf0.001) but trails them at 2000 vectors (0.70), " +
    "honestly recorded: scheduleFor is built to keep recall from " +
    "COLLAPSING as n grows (the 30k self-recall spec), not to beat " +
    "hand-tuned knobs at every toy scale") {
    val r001 = meanRecallPm("0.001")
    val r01 = meanRecallPm("0.01")
    val r1 = meanRecallPm("0.1")
    info(f"held-out recall@3 (permille): sf0.001=$r001%.0f sf0.01=$r01%.0f sf0.1=$r1%.0f")
    // deterministic pipeline (hash sampling, fixed perturbation, total
    // tie-breaks) — bounds carry slack only against corpus regeneration
    assert(r001 >= 900.0, s"sf0.001 regressed: $r001")
    assert(r01 >= 900.0, s"sf0.01 regressed: $r01")
    assert(r1 >= 550.0, s"sf0.1 regressed: $r1")
    GraftCaches.releasePrior()
  }
}
