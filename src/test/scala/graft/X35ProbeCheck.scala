package graft

/** Round-13 x35 probe sanity: the A/B variants (__trunc Components-cadence
  * truncation, __conv convergence detection) must produce EXACTLY the
  * catalog ranks before their timings mean anything.
  * Run: `sbt "Test/runMain graft.X35ProbeCheck [sfDir]"`. */
object X35ProbeCheck {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val base = SparkEntry.queries("x35_pagerank")(spark, d)
      .collect().map(_.toSeq).toSeq
    for (v <- Seq("x35_pagerank__trunc", "x35_pagerank__conv")) {
      GraftCaches.releasePrior()
      val got = BenchAB.variants(v)(spark, d).collect().map(_.toSeq).toSeq
      require(got == base, s"$v diverges from the catalog x35 ranks")
      println(s"OK $v == x35_pagerank (${base.size} rows)")
    }
    GraftCaches.releasePrior()
    spark.stop()
  }
}
