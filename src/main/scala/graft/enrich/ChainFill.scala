package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT Rem2Fill (W1/W2, main.py:950–1028): the chain-function
  * decomposition sketched in [[Rem2Fill]]'s scaladoc, so the reference's
  * mutation-aware two-pass fill scales past one task.
  *
  * Why per-partition transfer functions stay tiny: scanning pass 2 forward,
  * the running `prevCand` state changes only at rows whose (possibly
  * overwritten) candidate is non-empty. Rows BEFORE a partition's first
  * non-empty original candidate can be consensus-filled, but a fill writes
  * the running prev back (`cands(i) = p`), leaving the state untouched. At
  * that first non-empty row k the state either stays `s` (dup row whose
  * overwrite fired, which requires `s == nextCand(k)` — a STATIC value) or
  * becomes the static `cands(k)`. Every later row then evolves from a
  * statically known value. Hence each partition's pass-2 transfer function
  * is exactly one of
  *   Identity | Const(out) | Branch(nextCand(k), outIfEqual, outOtherwise)
  * — O(1) bytes — and the driver composes P of them to recover every
  * partition's incoming state. Pass 3 is simpler still: it only fills EMPTY
  * cells (never overwrites non-empty ones), so its running state is just the
  * last non-empty pass-2 cell: Identity or Const.
  *
  * Execution: one shuffle for global duplicate-name counts, one range
  * shuffle on entity_seq, then 4 narrow jobs over the persisted partitions
  * with O(P) driver exchanges — no single-task funnel anywhere.
  * `ChainFillSpec` proves bit-equality with [[Rem2Fill.fillSeq]] on 1M rows
  * across many partitions.
  */
object ChainFill {

  import Rem2Fill.FillOut

  private final case class CRow(seq: Long, name: String, cand: String, isDup: Boolean)
  private final case class P2Row(seq: Long, name: String, isDup: Boolean,
      cell: String, yellow: Boolean, red: Boolean)

  private sealed trait Xfer extends Serializable
  private case object Ident extends Xfer
  private final case class Const(out: String) extends Xfer
  private final case class Branch(nxK: String, outIfEq: String, outElse: String)
      extends Xfer

  private def applyXfer(x: Xfer, s: String): String = x match {
    case Ident => s
    case Const(v) => v
    case Branch(nx, a, b) => if (s != null && s == nx) a else b
  }

  /** Exact pass 2 over one partition, with injected boundary state:
    * prevIn = mutated prevCand entering from above, nextIn = first non-empty
    * ORIGINAL candidate below this partition. Returns (cells, yellow, red,
    * outgoing prevCand). Mirrors Rem2Fill.fillSeq's first scan. */
  private def pass2(rows: Array[CRow], prevIn: String, nextIn: String)
      : (Array[String], Array[Boolean], Array[Boolean], String) = {
    val n = rows.length
    val nextCand = new Array[String](n)
    var nv = nextIn
    var i = n - 1
    while (i >= 0) { nextCand(i) = nv; if (rows(i).cand.nonEmpty) nv = rows(i).cand; i -= 1 }
    val cells = new Array[String](n)
    val yellow = new Array[Boolean](n)
    val red = new Array[Boolean](n)
    var prev = prevIn
    i = 0
    while (i < n) {
      val r = rows(i)
      var candI = r.cand
      if (r.name == "UNKNOWN") { cells(i) = ""; yellow(i) = true }
      else if (!r.isDup) {
        if (candI.nonEmpty) cells(i) = candI
        else { cells(i) = ""; yellow(i) = true }
      } else {
        val nx = nextCand(i)
        if (prev != null && nx != null && prev == nx) { cells(i) = prev; candI = prev }
        else { cells(i) = ""; red(i) = true }
      }
      if (candI.nonEmpty) prev = candI
      i += 1
    }
    (cells, yellow, red, prev)
  }

  /** Exact pass 3 over one partition of pass-2 output, with injected
    * boundary state (prevIn = last non-empty cell above after pass-3 fills —
    * which equals the last non-empty PASS-2 cell above, since fills write
    * the running prev back; nextIn = first non-empty pass-2 cell below). */
  private def pass3(rows: Array[P2Row], prevIn: String, nextIn: String)
      : Array[FillOut] = {
    val n = rows.length
    val nextCell = new Array[String](n)
    var nv = nextIn
    var i = n - 1
    while (i >= 0) { nextCell(i) = nv; if (rows(i).cell.nonEmpty) nv = rows(i).cell; i -= 1 }
    val out = new Array[FillOut](n)
    var prev = prevIn
    i = 0
    while (i < n) {
      val r = rows(i)
      var cell = r.cell
      var red = r.red
      if (r.name != "UNKNOWN" && cell.isEmpty && r.isDup) {
        val nx = nextCell(i)
        if (prev != null && nx != null && prev == nx) { cell = prev; red = false }
      }
      if (cell.nonEmpty) prev = cell
      out(i) = FillOut(r.seq, cell, r.yellow, red)
      i += 1
    }
    out
  }

  /** df: (entity_seq, full_name, rem2_candidate) →
    * (entity_seq, rem2, flag_rem2_missing, flag_rem2_conflict) — bit-equal
    * to Rem2Fill but distributed across range partitions on seq.
    * numPartitions <= 0 (the default) leaves the count to AQE: the range
    * exchange coalesces to one partition on a fixture-sized feed (the
    * O(P) machinery degenerates to a single local scan) and stays wide at
    * scale; a positive value pins it (specs exercise fixed seam shapes). */
  def apply(df: DataFrame, numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window

    val narrowed = df
      .select(col("entity_seq").cast("long").as("seq"),
        col("full_name").cast("string").as("name"),
        coalesce(col("rem2_candidate").cast("string"), lit("")).as("cand"))
      .withColumn("is_dup",
        count(lit(1)).over(Window.partitionBy(col("name"))) > 1)
    val ranged =
      if (numPartitions > 0) narrowed.repartitionByRange(numPartitions, col("seq"))
      else narrowed.repartitionByRange(col("seq"))
    val sorted = ranged.sortWithinPartitions(col("seq"))

    val data = sorted.rdd
      .map(r => CRow(r.getLong(0), r.getString(1), r.getString(2), r.getBoolean(3)))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val p = data.getNumPartitions

    // J1: first non-empty ORIGINAL candidate per partition → pass-2 nextIn
    val firstOrig = data.mapPartitionsWithIndex { (pid, it) =>
      Iterator.single((pid, it.collectFirst { case r if r.cand.nonEmpty => r.cand }.orNull))
    }.collect().sortBy(_._1).map(_._2)
    val nextIn2 = new Array[String](p)
    var run: String = null
    for (i <- (p - 1) to 0 by -1) {
      nextIn2(i) = run
      if (firstOrig(i) != null) run = firstOrig(i)
    }
    val nextIn2B = spark.sparkContext.broadcast(nextIn2)

    // J2: pass-2 transfer function per partition (≤2 local scans each)
    val xfers = data.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val nextIn = nextIn2B.value(pid)
      val k = rows.indexWhere(_.cand.nonEmpty)
      val xfer: Xfer =
        if (k < 0) Ident
        else {
          val b = pass2(rows, null, nextIn)._4
          val rk = rows(k)
          if (rk.name != "UNKNOWN" && rk.isDup) {
            // nextCand(k) = next non-empty orig cand after k, else nextIn
            var nxK = nextIn
            var j = rows.length - 1
            while (j > k) { if (rows(j).cand.nonEmpty) nxK = rows(j).cand; j -= 1 }
            if (nxK == null) Const(b)
            else Branch(nxK, pass2(rows, nxK, nextIn)._4, b)
          } else Const(b)
        }
      Iterator.single((pid, xfer))
    }.collect().sortBy(_._1).map(_._2)
    val prevIn2 = new Array[String](p)
    var s: String = null
    for (i <- 0 until p) { prevIn2(i) = s; s = applyXfer(xfers(i), s) }
    val prevIn2B = spark.sparkContext.broadcast(prevIn2)

    // J3: materialize pass-2 output cells (stays range-partitioned)
    val p2 = data.mapPartitionsWithIndex { (pid, it) =>
      val rows = it.toArray
      val (cells, yellow, red, _) = pass2(rows, prevIn2B.value(pid), nextIn2B.value(pid))
      rows.indices.iterator.map(i =>
        P2Row(rows(i).seq, rows(i).name, rows(i).isDup, cells(i), yellow(i), red(i)))
    }.persist(StorageLevel.MEMORY_AND_DISK)

    // J4: (first, last) non-empty pass-2 cell per partition → pass-3
    // boundary states (pass 3 never overwrites a non-empty cell, so its
    // running state IS the last non-empty pass-2 cell: Const/Ident only)
    val cellEnds = p2.mapPartitionsWithIndex { (pid, it) =>
      var first: String = null
      var last: String = null
      for (r <- it; if r.cell.nonEmpty) { if (first == null) first = r.cell; last = r.cell }
      Iterator.single((pid, first, last))
    }.collect().sortBy(_._1)
    val prevIn3 = new Array[String](p)
    val nextIn3 = new Array[String](p)
    run = null
    for (i <- 0 until p) { prevIn3(i) = run; if (cellEnds(i)._3 != null) run = cellEnds(i)._3 }
    run = null
    for (i <- (p - 1) to 0 by -1) { nextIn3(i) = run; if (cellEnds(i)._2 != null) run = cellEnds(i)._2 }
    val prevIn3B = spark.sparkContext.broadcast(prevIn3)
    val nextIn3B = spark.sparkContext.broadcast(nextIn3)

    // J5: exact local pass 3 with injected boundaries
    val out: Dataset[FillOut] = p2.mapPartitionsWithIndex { (pid, it) =>
      pass3(it.toArray, prevIn3B.value(pid), nextIn3B.value(pid)).iterator
    }.toDS()

    // Materialize the result as a Dataset-level cache, then release both RDD
    // persists here: catalog.clearCache() frees Dataset caches but NOT RDD
    // persists, so leaving p2 pinned would leak blocks across repeated runs.
    val outDf = out.toDF().persist(StorageLevel.MEMORY_AND_DISK)
    outDf.count()
    p2.unpersist(blocking = false)
    data.unpersist(blocking = false)
    outDf
  }
}
