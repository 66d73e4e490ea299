package graft.plans

import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Optimizer rule (injected via SparkSessionExtensions): joins against the
  * bounded-cardinality dimension tables (nation, region — ≤ a few hundred
  * rows at ANY scale factor, fixed by the schema's key space) get a
  * broadcast hint even when file statistics are missing or the broadcast
  * threshold is disabled.
  *
  * Why a RULE and not per-query hints: at 100 TB the fact-side file sizes
  * dwarf every threshold, and ingest jobs routinely read dims through
  * views/filters that hide their size from the planner. Encoding the
  * schema-level knowledge ("these dims are small BY CONSTRUCTION") in one
  * optimizer rule fixes every query at once — the same reasoning a table
  * catalog encodes with table-level broadcast properties.
  *
  * The rule is conservative: it only fires when the join carries NO
  * existing hint, and only for scans recognizably over the dim files
  * (projections/filters/aliases above them included).
  */
object SmallDimBroadcast extends Rule[LogicalPlan] {

  /** basename → the key column that identifies the known dim schema. The
    * name alone is not enough (an unrelated user table in a directory that
    * happens to be called nation.parquet would get broadcast regardless of
    * size, risking OOM) — so the hint additionally requires the dim's key
    * column in the scan schema AND a hard on-disk size bound. */
  private val smallDims = Map(
    "nation.parquet" -> "n_nationkey",
    "region.parquet" -> "r_regionkey")

  /** 32 MiB on disk ≈ well under any sane broadcast budget once decoded;
    * the real dims are a few KiB at every scale factor. */
  private val maxDimBytes = 32L * 1024 * 1024

  private def isSmallDim(p: LogicalPlan): Boolean = p match {
    case Project(_, c)       => isSmallDim(c)
    case Filter(_, c)        => isSmallDim(c)
    case SubqueryAlias(_, c) => isSmallDim(c)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists { rp =>
          smallDims.get(rp.getName).exists { keyCol =>
            fs.dataSchema.fieldNames.contains(keyCol) &&
              fs.location.sizeInBytes <= maxDimBytes
          }
        }
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, _, _, hint) if hint == JoinHint.NONE =>
      val lSmall = isSmallDim(l)
      val rSmall = isSmallDim(r)
      if (!lSmall && !rSmall) j
      else j.copy(hint = JoinHint(
        leftHint = if (lSmall) Some(HintInfo(Some(BROADCAST))) else None,
        rightHint = if (rSmall) Some(HintInfo(Some(BROADCAST))) else None))
  }
}
