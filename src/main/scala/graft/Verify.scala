package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Verify <sfDir> <outDir>")
    val sfDir = args(0)
    val outDir = args(1)
    val spark = Sessions.local("graft-verify")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val rowCounts = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    // dev-loop filter: an optional 3rd arg "q1,q2" restricts the dump to
    // those queries (the driver passes 2 args → full catalog)
    val only = args.drop(2).headOption
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name.parquet")
        rowCounts(name) = spark.read.parquet(s"$outDir/$name.parquet").count()
      }
      catch { case e: Throwable =>
        rowCounts(name) = -1L
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally {
        // drop intra-query persists: clearCache frees Dataset-level caches;
        // the explicit sweep also frees any RDD-level persist a query path
        // created (the round-2 leak class clearCache cannot see)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // The driver's CORRECTNESS keys carry the .parquet suffix while the
    // catalog names don't — emit every oracle entry under BOTH keys so
    // either lookup convention hits, plus a per-query .sql sidecar.
    val json = SparkEntry.oracleSql
      .flatMap { case (k, v) => Seq(k -> v, s"$k.parquet" -> v) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    SparkEntry.oracleSql.foreach { case (k, v) =>
      Files.writeString(Paths.get(s"$outDir/$k.sql"), v)
    }
    // One-line diagnostics so a future no_oracle round is debuggable
    // from the driver log alone.
    val counts = rowCounts.map { case (k, n) => s"${q(k)}: $n" }
      .mkString("{", ",", "}")
    val keys = SparkEntry.oracleSql.keys.toSeq.sorted.map(q).mkString("[", ",", "]")
    println(s"""{"verify_rows": $counts, "oracle_keys": $keys}""")
    spark.stop()
  }
}
