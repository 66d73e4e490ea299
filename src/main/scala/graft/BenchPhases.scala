package graft

/** Side-channel for queries whose catalog entry deliberately performs a
  * non-query phase (physical-design writes, index builds) inside the
  * entry: the entry records the phase's wall time here and the bench
  * emits it alongside the total, so the bench record separates "what the
  * operator costs" from "what the one-time table preparation costs"
  * without changing the entry's key, result frame, or oracle
  * (VERDICT r12 #3 — j12's 2.68 s read as a slow join when ~90% of it is
  * the in-query bucketed-table write).
  *
  * Last write wins per (query, phase): under Bench's min-of-2 protocol
  * the recorded value is the second run's, which is the steadier one.
  */
object BenchPhases {

  private val m =
    new scala.collection.concurrent.TrieMap[String, Map[String, Double]]
  private val excl =
    new scala.collection.concurrent.TrieMap[String, Boolean]

  /** `excludedFromQueryTime = true` marks a phase whose wall time is NOT
    * inside any per-query bench number (the session-memoized fixture
    * pipeline: min-of-2 keeps the memo-reading sample, discarding the
    * one-time run). The bench folds these into `total_with_phases`
    * (VERDICT r14 #3) so round-over-round totals keep counting that real
    * work; phases folded into their entry's own wall time (j12's
    * bucketed write) are informational only and NOT re-added. */
  def record(query: String, phases: Map[String, Double],
      excludedFromQueryTime: Boolean = false): Unit = {
    m.update(query, phases)
    excl.update(query, excludedFromQueryTime)
  }

  def get(query: String): Option[Map[String, Double]] = m.get(query)

  def snapshot: Map[String, Map[String, Double]] = m.readOnlySnapshot().toMap

  /** Sum of all phase seconds recorded with `excludedFromQueryTime`. */
  def excludedSeconds: Double = m.readOnlySnapshot().toMap.collect {
    case (q, ps) if excl.getOrElse(q, false) => ps.values.sum
  }.sum

  def clear(): Unit = { m.clear(); excl.clear() }
}
