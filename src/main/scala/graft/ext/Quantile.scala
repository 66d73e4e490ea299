package graft.ext

import org.apache.spark.sql.{Column, DataFrame}

/** Exact GLOBAL nearest-rank selection (percentile_disc over the whole
  * frame) without a single-partition window and without sorting all rows to
  * the driver — the global twin of a5's per-group window method.
  *
  * Plan: range-partition + locally sort the value column (partition i holds
  * strictly smaller values than partition i+1), collect the P per-partition
  * counts, locate each requested rank's (partition, local offset) on the
  * driver, then one narrow job extracts just those offsets. Two jobs, O(P)
  * longs + O(#ranks) values over the wire, any number of ranks — the same
  * boundary-exchange family as GlobalSeq/ShardPack/ChainFill. At 100 TB the
  * sort shuffle is the only heavy step, and both jobs reuse it (same RDD).
  */
object Quantile {

  /** Nearest-rank values (1-based rank = ceil(p·n)) of `value` for each of
    * `ps`; also returns n. Ties/duplicates are fine (pure selection). */
  def nearestRank(df: DataFrame, value: Column, ps: Seq[Double]): (Long, Seq[Double]) = {
    // nulls are excluded, matching SQL aggregate/percentile semantics (a
    // null would otherwise NPE in the primitive-double extraction below)
    val sorted = df.select(value.cast("double").as("v"))
      .filter(org.apache.spark.sql.functions.col("v").isNotNull)
      .repartitionByRange(org.apache.spark.sql.functions.col("v"))
      .sortWithinPartitions("v")
    // persist across the two jobs: they share the shuffle map output
    // regardless (same RDD object), but the post-shuffle local sort would
    // otherwise re-run in the extract job; both jobs complete inside this
    // call, so the persist is released before returning
    val rdd = sorted.rdd.map(_.getDouble(0))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = rdd.mapPartitionsWithIndex { (pid, it) =>
      // Long accumulator: Iterator.size returns Int and would silently
      // overflow past 2^31 rows in one range partition (heavy-value skew)
      var n = 0L
      while (it.hasNext) { it.next(); n += 1 }
      Iterator.single((pid, n))
    }.collect().sortBy(_._1).map(_._2)
    val n = counts.sum
    require(n > 0, "nearestRank over an empty frame")
    val cum = counts.scanLeft(0L)(_ + _) // cum(pid) = rows before pid
    val ranks = ps.map(p => math.max(1L, math.ceil(p * n).toLong))
    // (pid, localIdx) per requested rank
    val wanted = ranks.map { r =>
      val pid = cum.indexWhere(_ >= r) - 1 // first pid with cum(pid+1) >= r
      (pid, r - cum(pid) - 1)
    }
    val byPid = wanted.zipWithIndex.groupBy(_._1._1)
    val byPidB = rdd.sparkContext.broadcast(
      byPid.map { case (pid, xs) => pid -> xs.map { case ((_, li), qi) => (li, qi) } })
    val picked = rdd.mapPartitionsWithIndex { (pid, it) =>
      byPidB.value.get(pid) match {
        case None => Iterator.empty
        case Some(xs) =>
          val need = xs.sortBy(_._1)
          val out = Seq.newBuilder[(Int, Double)]
          var next = 0
          var idx = 0L
          while (next < need.length && it.hasNext) {
            val v = it.next()
            while (next < need.length && need(next)._1 == idx) {
              out += ((need(next)._2, v)); next += 1
            }
            idx += 1
          }
          out.result().iterator
      }
    }.collect().sortBy(_._1).map(_._2)
    rdd.unpersist(blocking = false)
    (n, picked.toSeq)
  }
}
