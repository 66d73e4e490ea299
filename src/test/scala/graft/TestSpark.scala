package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark-backed specs (sessions are
  * expensive; ScalaTest suites run sequentially in the forked JVM). */
object TestSpark {

  /** Temp dir registered for recursive deletion at JVM exit — the
    * bounded-residue rule for planted/scale corpora (the 200k-doc x159
    * corpus alone is non-trivial disk residue per run). Specs that
    * write parquet fixtures should use this instead of a bare
    * `Files.createTempDirectory`. */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    cleanupQueue.add(p)
    p.toString
  }

  private val cleanupQueue =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    import java.nio.file.{Files, Path}
    import java.util.Comparator
    cleanupQueue.forEach { root =>
      try {
        if (Files.exists(root)) {
          // close the walk stream before deleting — an open
          // DirectoryStream can make the deletes themselves fail
          val paths = {
            val st = Files.walk(root)
            try st.sorted(Comparator.reverseOrder[Path]())
              .toArray(new Array[Path](_))
            finally st.close()
          }
          paths.foreach(p =>
            try Files.delete(p) catch { case _: Exception => })
        }
      } catch { case _: Exception => }
    }
  }))

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
