package graft

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{SparkPlan, LeafExecNode, GlobalLimitExec, LocalLimitExec, LocalTableScanExec, RangeExec}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.columnar.{InMemoryRelation, InMemoryTableScanExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec

/** Dev tool (round 13, VERDICT r12 #4): walk every catalog query's
  * optimized logical plan and print each partition-less Window with the
  * shape of its input subtree — the raw material for
  * `GlobalWindowInventorySpec`'s closed-world allowlist.
  *
  * Usage: `sbt "runMain graft.WindowInventory [sfDir]"`.
  */
object WindowInventory {

  /** Row-count-bounded input judgment shared with the spec: true when
    * every path from `p` to a leaf passes a row-collapsing node — an
    * Aggregate (group-count-sized output), a Limit, a literal local
    * relation, or a literal-bounded Range. Joins/unions require all
    * inputs bounded. Generate (explode) is NOT treated as pass-through:
    * re-expanding a collapsed frame can restore corpus-scale row counts.
    * Cached frames (InMemoryRelation) are judged by the same walk over
    * their cached physical plan.
    *
    * KNOWN LIMITATION (ADVICE r13): "Aggregate ⇒ bounded" is a
    * CARDINALITY heuristic, not a proof — an Aggregate grouped on a
    * near-unique key (e.g. a raw doc_id) emits corpus-scale rows and
    * would still pass this machine check. Static plans carry no
    * group-count statistics, so that case is guarded by the HUMAN leg of
    * the closed-world protocol: every enrolled global window's grouping
    * keys are printed by [[main]] (GROUPS column) for allowlist review,
    * and `GlobalWindowInventorySpec`'s allowlist is the reviewed record.
    * An enrollment whose Aggregate groups on an id-like scan column must
    * be rejected there even though valueBounded says true. */
  def valueBounded(p: LogicalPlan): Boolean = p match {
    case _: Aggregate => true
    case _: GlobalLimit => true
    case _: LocalLimit => true
    case _: LocalRelation => true
    case _: OneRowRelation => true
    case _: Range => true
    case imr: InMemoryRelation => physBounded(imr.cachedPlan)
    case _: Generate => false
    case j: Join => valueBounded(j.left) && valueBounded(j.right)
    case u: Union => u.children.forall(valueBounded)
    case _: LeafNode => false
    case other => other.children.nonEmpty && other.children.forall(valueBounded)
  }

  /** The physical twin of [[valueBounded]], for cached subtrees. */
  def physBounded(p: SparkPlan): Boolean = p match {
    case _: BaseAggregateExec => true
    case _: GlobalLimitExec => true
    case _: LocalLimitExec => true
    case _: LocalTableScanExec => true
    case _: RangeExec => true
    case a: AdaptiveSparkPlanExec => physBounded(a.inputPlan)
    case s: InMemoryTableScanExec => physBounded(s.relation.cachedPlan)
    case _: org.apache.spark.sql.execution.GenerateExec => false
    case j: BaseJoinExec => physBounded(j.left) && physBounded(j.right)
    case _: LeafExecNode => false
    case other => other.children.nonEmpty && other.children.forall(physBounded)
  }

  def globalWindows(plan: LogicalPlan): Seq[Window] = {
    val all = plan +: plan.subqueriesAll
    all.flatMap(_.collect { case w: Window if w.partitionSpec.isEmpty => w })
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local("graft-window-inventory")
    spark.sparkContext.setLogLevel("ERROR")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    for (name <- SparkEntry.queries.keys.toSeq.sorted) {
      try {
        val df = SparkEntry.queries(name)(spark, d)
        val wins = globalWindows(df.queryExecution.optimizedPlan)
        for (w <- wins) {
          val exprs = w.windowExpressions.map(_.sql).mkString("; ").take(120)
          val chain = w.child.collect { case n => n.nodeName }.mkString(">")
          // grouping keys of every Aggregate under the window: the
          // manual-review input for the valueBounded Aggregate
          // limitation (a near-unique grouping key ⇒ reject enrollment)
          val groups = w.child.collect {
            case a: Aggregate =>
              a.groupingExpressions.map(_.sql).mkString("(", ",", ")")
          }.mkString(";")
          println(s"GW\t$name\tbounded=${valueBounded(w.child)}\t$exprs\t$chain\tGROUPS=$groups")
        }
      } catch {
        case e: Throwable => println(s"ERR\t$name\t${e.getMessage}")
      } finally {
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      }
    }
    spark.stop()
  }
}
