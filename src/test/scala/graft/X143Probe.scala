package graft

/** Scratch diagnostic for the r14 optimization round: x146_beam_recall
  * runs a strict SUPERSET of x143_beam_ann's work (the same beamAnn call
  * plus a brute-force ground-truth arm) yet benches ~5× FASTER across
  * four committed sweeps (r12–r14: x143 8.0–12.0 s, x146 1.6–2.3 s at
  * sf0.1). This probe splits each query's wall into construction
  * (DataFrame build — GlobalSeq's zipWithIndex jobs run eagerly here),
  * planning (executedPlan render) and execution (count), same boot,
  * to attribute the gap before touching code.
  *
  * Run: sbt "Test/runMain graft.X143Probe [reps]".
  */
object X143Probe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def phase(name: String): Unit = {
      for (r <- 1 to reps) {
        var t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, d)
        val tCon = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = (System.nanoTime() - t0) / 1e9
        t0 = System.nanoTime()
        val n = df.count()
        val tCnt = (System.nanoTime() - t0) / 1e9
        println(f"PROBE $name rep$r: construct $tCon%.2f s, plan $tPlan%.2f s, " +
          f"count $tCnt%.2f s (rows $n)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        System.gc()
      }
    }
    phase("x143_beam_ann")
    phase("x146_beam_recall")
    phase("x143_beam_ann")
    spark.stop()
  }
}
