package graft
object SeqDebug {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    spark.sparkContext.setLogLevel("WARN")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def run(tag: String, legacy: Boolean, hops: Int): Unit = {
      for (r <- 1 to 2) {
        val t0 = System.nanoTime()
        def build = graft.queries.Ext43.beamAnn(spark, d, twoBands = true,
          coarseLayer = false, lineageCutHops = true, fullHops = hops)
        val df = if (legacy) graft.ingest.GlobalSeq.withLegacyZip(build) else build
        val n = df.count()
        val t = (System.nanoTime() - t0) / 1e9
        println(f"HOPS $tag hops=$hops rep$r: $t%.2f s (rows $n)")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
        GraftCaches.releasePrior(); System.gc()
      }
    }
    for (h <- Seq(0, 3)) { run("new", legacy = false, h); run("zip", legacy = true, h) }
    spark.stop()
  }
}
