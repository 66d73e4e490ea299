package graft

/** Dev tool: dump formatted physical plans of the headline queries to
  * stdout (PLANS.md is generated from this — `sbt "runMain graft.Explain"`).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topk_revenue", "q5_region_revenue", "j7_asof",
        "j8_range_bucket", "w1_gap_fill", "x4_ngram_jaccard", "x6_cosine_topk")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
