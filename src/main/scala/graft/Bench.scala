package graft

/** Driver-run benchmark: times every SparkEntry query at the given scale
  * factor and prints ONE JSON line.
  *
  * Methodology: queries run in sorted name order; each query runs twice and
  * reports the faster run (steady-state: first pass pays JIT/codegen
  * compilation, which a long-lived cluster amortizes away); the cache is
  * cleared between queries so intra-query persist() calls can't subsidize a
  * later query or bloat the heap across the suite.
  *
  * Self-normalization (round 13, VERDICT r12 #2): cross-boot host drift on
  * this machine reaches ~2× on identical code (r12's driver bench ran ~2×
  * its r11 values; the builder's same-round sweeps did not), so every bench
  * record now opens with a 3-class control panel — x9_lang_id (scan),
  * x40_image_decode (codec/CPU), x3_minhash_lsh (shuffle) — timed
  * warmup + min-of-3 BEFORE the sweep, plus a derived `boot_coeff`: the
  * median ratio of each control's min to its recorded round-12 reference
  * (min over the two bracketing r12 sweeps, sf0.1). A consumer comparing
  * bench records across rounds divides by boot_coeff to separate host
  * phase from code change; boot_coeff ≈ 1 on a nominal boot, > 1 on a slow
  * phase. Refs are sf0.1-specific, so boot_coeff is null at other SFs.
  */
object Bench {

  /** The 3-class control panel with its round-12 reference minima
    * (BENCH_FULL_r12.json / _run2.json, min of the two sweeps). */
  val ControlRefs: Seq[(String, Double)] = Seq(
    "x9_lang_id" -> 0.198908128,
    "x40_image_decode" -> 1.02470981,
    "x3_minhash_lsh" -> 0.660778765)

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

    // ---- control panel first: warmup + 3 recorded samples per control,
    // interleaved in rounds (BenchAB protocol) so a machine phase hits
    // all three classes equally. Skipped in the filtered dev loop —
    // a one-query iteration shouldn't pay ~12 control runs; every
    // full-suite record (the driver's, BENCH_FULL) always carries it.
    val runControls = only.isEmpty
    val controlNames = ControlRefs.map(_._1)
    val ctlSamples = scala.collection.mutable.Map
      .empty[String, Vector[Double]].withDefaultValue(Vector.empty)
    if (runControls) {
      controlNames.foreach(once)
      for (_ <- 1 to 3; n <- controlNames) ctlSamples(n) = ctlSamples(n) :+ once(n)
    }
    val atRefSf = sfDir.replaceAll("/+$", "").endsWith("sf0.1")
    val controlsJson =
      if (!runControls) "{}"
      else ControlRefs.map { case (n, ref) =>
        val ss = ctlSamples(n)
        s""""$n":{"min":${ss.min},"samples":[${ss.mkString(",")}],"ref_r12":$ref}"""
      }.mkString("{", ",", "}")
    val bootCoeffJson =
      if (!runControls || !atRefSf) "null"
      else {
        val ratios = ControlRefs.map { case (n, ref) => ctlSamples(n).min / ref }.sorted
        ratios(ratios.size / 2).toString
      }
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    val results = names.map { name =>
      name -> math.min(once(name), once(name))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // phase side-channel (BenchPhases): entries that fold a one-time
    // non-query phase (j12's bucketed-table write) into their wall time
    // report it here so the record separates operator cost from setup
    val phasesJson = BenchPhases.snapshot.toSeq.sortBy(_._1).map {
      case (q, ps) =>
        val inner = ps.toSeq.sortBy(_._1)
          .map { case (p, v) => s""""$p":$v""" }.mkString("{", ",", "}")
        s""""$q":$inner"""
    }.mkString("{", ",", "}")
    // VERDICT r14 #3 (additions-only): `value` stays the min-of-2 query
    // sum for round-over-round continuity; total_with_phases adds back
    // the phase seconds that min-of-2 discards (the memoized fixture
    // pipeline's one-time run) so totals keep counting that real work.
    // Phases already inside their entry's wall time (j12) are not re-added.
    val totalWithPhases = total + BenchPhases.excludedSeconds
    val json =
      s"""{"metric":"total","value":$total,"total_with_phases":$totalWithPhases,"unit":"sec","controls":$controlsJson,"boot_coeff":$bootCoeffJson,"phases":$phasesJson,"queries":$qs,"sf":"$sfDir"}"""
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
