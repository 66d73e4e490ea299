package graft.enrich

import org.apache.spark.sql.{DataFrame, Dataset}

/** W1/W2/W3: the order-dependent REM2 duplicate-resolution passes
  * (SURVEY §2.5, main.py:950–1028).
  *
  * The reference's semantics are genuinely SEQUENTIAL in feed order: pass 2
  * scans nearest non-empty candidates above/below while MUTATING the
  * candidate array (a filled or even overwritten candidate is visible to
  * later rows' backward scans, main.py:988–990); pass 3 repeats the scan
  * over pass-2 OUTPUT cells, again mutating as it goes. A pure two-window
  * formulation (`last/first ignoreNulls`) diverges when a duplicate row's
  * own non-empty candidate is overwritten by neighbor consensus — so for
  * parity this is implemented as an exact linear scan.
  *
  * Execution shape: [[apply]] delegates to [[ChainFill]], the distributed
  * exact form — range partitions on entity_seq, per-partition transfer
  * functions (Identity/Const/Branch) composed on the driver, O(P) exchanges
  * only. [[fillSeq]] below is the single-sequence reference implementation
  * (and the spec baseline); [[applyLocal]] wraps it for comparison. The
  * window-semantics twin (no candidate mutation) lives in [[BoundaryFill]].
  *
  * Unlike the reference's O(n²) rescans (main.py:958, :972–986), both
  * passes here are O(n): running prev values + precomputed next-non-empty
  * suffix arrays give identical results because mutations only ever happen
  * at or before the current row.
  */
object Rem2Fill {

  final case class FillIn(entity_seq: Long, full_name: String, cand: String)
  final case class FillOut(entity_seq: Long, rem2: String,
      flag_rem2_missing: Boolean, flag_rem2_conflict: Boolean)

  /** Exact reference semantics over one ordered run of rows. */
  private[enrich] def fillSeq(input: Array[FillIn]): Array[FillOut] = {
    val n = input.length
    val names = new Array[String](n)
    val cands = new Array[String](n)
    var i = 0
    while (i < n) {
      names(i) = input(i).full_name
      cands(i) = if (input(i).cand == null) "" else input(i).cand
      i += 1
    }
    val dupCnt = scala.collection.mutable.HashMap.empty[String, Int]
    names.foreach(nm => dupCnt.update(nm, dupCnt.getOrElse(nm, 0) + 1))

    val rem2 = new Array[String](n)
    val yellow = new Array[Boolean](n)
    val red = new Array[Boolean](n)

    // pass 2: nearest non-empty CANDIDATE above (mutated) / below (original)
    val nextCand = new Array[String](n)
    var nv: String = null
    i = n - 1
    while (i >= 0) { nextCand(i) = nv; if (cands(i).nonEmpty) nv = cands(i); i -= 1 }
    var prevCand: String = null
    i = 0
    while (i < n) {
      val fn = names(i)
      if (fn == "UNKNOWN") { rem2(i) = ""; yellow(i) = true }
      else if (dupCnt(fn) == 1) {
        if (cands(i).nonEmpty) rem2(i) = cands(i)
        else { rem2(i) = ""; yellow(i) = true }
      } else {
        val p = prevCand; val nx = nextCand(i)
        if (p != null && nx != null && p == nx) { rem2(i) = p; cands(i) = p }
        else { rem2(i) = ""; red(i) = true }
      }
      if (cands(i).nonEmpty) prevCand = cands(i)
      i += 1
    }

    // pass 3: same scan over pass-2 OUTPUT cells; a fill clears the red flag
    val cells = rem2.clone()
    val nextCell = new Array[String](n)
    nv = null
    i = n - 1
    while (i >= 0) { nextCell(i) = nv; if (cells(i).nonEmpty) nv = cells(i); i -= 1 }
    var prevCell: String = null
    i = 0
    while (i < n) {
      if (names(i) != "UNKNOWN" && cells(i).isEmpty && dupCnt(names(i)) > 1) {
        val p = prevCell; val nx = nextCell(i)
        if (p != null && nx != null && p == nx) { cells(i) = p; red(i) = false }
      }
      if (cells(i).nonEmpty) prevCell = cells(i)
      i += 1
    }

    val out = new Array[FillOut](n)
    i = 0
    while (i < n) {
      out(i) = FillOut(input(i).entity_seq, cells(i), yellow(i), red(i))
      i += 1
    }
    out
  }

  /** df: (entity_seq, full_name, rem2_candidate) →
    * (entity_seq, rem2, flag_rem2_missing, flag_rem2_conflict).
    *
    * Delegates to [[ChainFill]] — the distributed exact form (range
    * partitions + O(P) transfer-function composition, ChainFillSpec proves
    * bit-equality with [[fillSeq]]) — so the pipeline never funnels the
    * feed through one task. Feeds known (via `sizeHint`, usually a count of
    * an already-persisted upstream frame) to hold at most [[LocalThreshold]]
    * rows route through the exact single-task form instead: ChainFill's 5
    * distributed jobs + range sampling cost more than one local scan there —
    * the same size-switch logic as a broadcast-join threshold, and both
    * forms are bit-equal. sizeHint < 0 (unknown) always distributes. */
  def apply(df: DataFrame, sizeHint: Long = -1L): DataFrame =
    if (sizeHint >= 0 && sizeHint <= LocalThreshold) applyLocal(df)
    else ChainFill(df)

  /** Feeds at or below this many rows fill locally (one task, one scan). */
  val LocalThreshold = 65536

  /** The original single-task form, kept as the equivalence baseline. */
  def applyLocal(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds: Dataset[FillIn] = df
      .select(df("entity_seq"), df("full_name"), df("rem2_candidate").as("cand"))
      .as[FillIn]
    ds.repartition(1)
      .sortWithinPartitions("entity_seq")
      .mapPartitions(it => fillSeq(it.toArray).iterator)
      .toDF()
  }
}
