package graft

/** Driver-run benchmark: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line.
  *
  * Methodology: queries run in sorted name order; each query runs twice and
  * reports the faster run (steady-state: first pass pays JIT/codegen
  * compilation, which a long-lived cluster amortizes away); the cache is
  * cleared between queries so intra-query persist() calls can't subsidize a
  * later query or bloat the heap across the suite.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local("graft-bench")
    spark.sparkContext.setLogLevel("WARN")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); -1L }
      finally {
        // clearCache frees Dataset-level caches; the sweep also frees any
        // RDD-level persist (the round-2 leak class clearCache cannot see)
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
      val t = (System.nanoTime() - t0) / 1e9
      // settle the heap between measurements: interpreted-HOF queries
      // allocate heavily and a deferred GC otherwise lands inside a later
      // query's timing window
      System.gc()
      t
    }
    // dev-loop filter: SPARK_GRAFT_BENCH_ONLY=q1,q2 times just those
    // queries (driver never sets it → full suite)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      name -> math.min(once(name), once(name))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    // the driver's BENCH artifact keeps only the stdout tail, which loses
    // most per-query times once the catalog is large — also land the full
    // record on disk so round-over-round regression tracking covers every
    // query (commit a copy per round)
    val outPath = java.nio.file.Paths.get(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "target/bench_full.json"))
    Option(outPath.getParent).foreach(java.nio.file.Files.createDirectories(_))
    java.nio.file.Files.write(outPath,
      json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
