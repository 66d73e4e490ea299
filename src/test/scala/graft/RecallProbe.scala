package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev harness (not a spec): sweep beamAnn knob settings against the
  * x146 held-out ground truth at each SF in ONE session, printing mean
  * recall@3 per setting. Drives the round-8 knob choice for closing the
  * sf0.1 recall valley (VERDICT r7 task #1). Run:
  *   sbt -batch "Test/runMain graft.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfs = if (args.nonEmpty) args.toSeq else Seq("0.1", "0.01", "0.001")
    for (sf <- sfs) {
      val d = s"/root/testdata/sf$sf"
      val e0 = graft.queries.Ext43.quantized(spark, d).persist()
      val qs = e0.filter(col("vec_id") % 50 === 0)
        .select(col("vec_id").as("q_id"),
          expr(graft.queries.Ext43.PerturbSql).as("qq"))
      val gt = e0.crossJoin(broadcast(qs))
        .select(col("q_id"), col("vec_id"),
          graft.queries.Ext43.idist2Hof(col("qq"), col("q")).as("dist2"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("q_id")).orderBy(col("dist2"), col("vec_id"))))
        .filter(col("rn") <= 3).select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def recall(tag: String)(run: => org.apache.spark.sql.DataFrame): Unit = {
        val t0 = System.nanoTime()
        val got = run.select(col("q_id"), col("vec_id"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val r = got.count(gt.contains).toDouble / gt.size
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"PROBE sf=$sf $tag%-40s recall@3=$r%.3f  ($secs%.1f s)")
        GraftCaches.releasePrior()
      }
      def ba(nE: Int, ch: Int, fh: Int, bF: Int, bC: Int, bE: Int,
          blk: Int = 64, m: Int = 12, b3: Boolean = false,
          coarse: Boolean = true) =
        graft.queries.Ext43.beamAnn(spark, d, twoBands = true,
          coarseLayer = coarse,
          nEntries = nE, coarseHops = ch, fullHops = fh, bFull = bF,
          bCoarse = bC, bEntry = bE, blkFull = blk, mFull = m,
          bands3 = b3, perturbQueries = true)
      // round-12 cost-decision sweep (VERDICT r11 #2): the catalog
      // setting vs the two ROUND_NOTES levers (flat form, block 32)
      // and their combination, plus blk 64 as the midpoint
      // labels track the r12 adoption: the FLAT form is the shipped
      // catalog x143 since round 12; the coarse two-layer variant is the
      // pre-r12 baseline kept callable as __coarse (ADVICE r12: a sweep
      // reading 'CATALOG' must compare against the shipped form)
      recall("coarse (pre-r12 catalog) blk128m16 w32/12/8")(
        ba(16, 2, 3, 32, 12, 8, blk = 128, m = 16))
      recall("CATALOG flat blk128m16 (4 full hops)")(
        ba(16, 2, 3, 32, 12, 8, blk = 128, m = 16, coarse = false))
      recall("blk32m16 coarse w32/12/8")(
        ba(16, 2, 3, 32, 12, 8, blk = 32, m = 16))
      recall("blk64m16 coarse w32/12/8")(
        ba(16, 2, 3, 32, 12, 8, blk = 64, m = 16))
      recall("flat blk32m16")(
        ba(16, 2, 3, 32, 12, 8, blk = 32, m = 16, coarse = false))
      e0.unpersist()
    }
    spark.stop()
  }
}
