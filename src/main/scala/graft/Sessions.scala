package graft

import org.apache.spark.sql.SparkSession

/** One place for local-session config so Verify/Bench/Smoke/tests agree.
  *
  * - shuffle.partitions tracks the core count (local[N] has N task slots;
  *   the default 200 would produce 200 tiny shuffle files per exchange)
  * - AQE stays on (default in Spark 4): runtime coalescing + skew splitting
  *   is part of the 100 TB design, so the test plans should run under it too
  * - nanosAsLong: the driver's events.parquet carries TIMESTAMP(NANOS),
  *   which the parquet reader otherwise rejects (see tables/Tables.events)
  * - ansi.enabled pinned true (the Spark 4 default, made explicit,
  *   ADVICE r10): several catalog queries ride LongType with documented
  *   headroom boundaries (e.g. x173's 1e6·(nd·s2 − s²) at ~2e4 docs)
  *   whose loud-overflow guarantee IS ANSI arithmetic — a deployment
  *   that flipped ansi off would silently wrap and diverge from the
  *   DuckDB oracle's overflow error
  */
object Sessions {
  def local(appName: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors(), 32).toString)
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }
}
