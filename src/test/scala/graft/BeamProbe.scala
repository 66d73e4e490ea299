package graft

import org.apache.spark.sql.functions._
import graft.queries.BeamSchedule

/** Scratch diagnostic for the 100k beam wall-time investigation
  * (round 14): times each structural phase of the layered search so the
  * 857-vs-43 s gap in the first BeamWallTimeScaleSpec run can be
  * attributed. Run: sbt "Test/runMain graft.BeamProbe [layers]". */
object BeamProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val layers = if (args.nonEmpty) args(0).toInt else 4
    val e0 = TestCorpora.clustered(spark, 100000L).persist()
    e0.count()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROBE $label: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    // warmup: one flat run end to end (JIT + codegen paid here)
    t("warmup flat(1L)") {
      BeamSchedule.beamAnnLayered(e0, 2000L, BeamSchedule.Knobs(layers = 1))
        .filter(col("rank") === 1L).count()
    }
    GraftCaches.releasePrior()
    t("flat(1L) steady") {
      BeamSchedule.beamAnnLayered(e0, 2000L, BeamSchedule.Knobs(layers = 1))
        .filter(col("rank") === 1L).count()
    }
    GraftCaches.releasePrior()
    t(s"scheduled(${layers}L) steady") {
      BeamSchedule.beamAnnLayered(e0, 2000L,
        BeamSchedule.scheduleFor(100000L).copy(layers = layers))
        .filter(col("rank") === 1L).count()
    }
    GraftCaches.releasePrior()
    spark.stop()
  }
}
