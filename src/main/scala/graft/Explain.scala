package graft
import org.apache.spark.sql.functions._
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("explain")
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q3_topk_revenue", "p4_unknown_sentinel", "j8_range_bucket", "x5_simhash", "x6_cosine_topk")) {
      println(s"===== $name =====")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
