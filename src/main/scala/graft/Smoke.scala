package graft


/** Dev smoke runner: drives SparkEntry.entry exactly like the driver's t1
  * check (rows > 0) and prints a sample. Usage: sbt "runMain graft.Smoke".
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-smoke")
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n")
    df.show(5, truncate = false)
    require(n > 0, "entry returned 0 rows")
    spark.stop()
  }
}
