package graft.lake

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation, V1ScanWrapper}

/** Restores size-based broadcast planning for lake tables read through the
  * composed (tier-3) scan.
  *
  * The tier-3 read is a `V1Scan`; Spark's pushdown wraps it in
  * `V1ScanWrapper`, which implements only `Scan` — the wrapped scan's
  * `SupportsReportStatistics` becomes invisible and the relation plans with
  * `defaultSizeInBytes` (effectively infinite). Consequence: a 5-row lake
  * dimension table joined to a 100 TB fact would sort-merge both sides.
  * The native tiers don't have this problem (`MetadataFileIndex` reports
  * exact sizes), so this rule only matters for tables carrying inline rows
  * or unrewritten schema evolution.
  *
  * Pre-CBO rule: when a join side is (a projection/filter over) a lake
  * relation whose metadata footprint fits under
  * `spark.sql.autoBroadcastJoinThreshold`, attach the same BROADCAST hint
  * the size-based planner would have derived had the stats been visible.
  * Explicit user hints are never overridden, and the gate is the exact
  * byte threshold, so this cannot force a broadcast the size-based rule
  * wouldn't also pick.
  */
class LakeJoinHint(spark: SparkSession) extends Rule[LogicalPlan] {

  /** metadata size of the lake relation under projections/filters, if any */
  private def lakeSize(p: LogicalPlan): Option[Long] = p match {
    case r: DataSourceV2Relation => r.table match {
      case t: LakeTable => Some(t.estimatedSizeInBytes)
      case _ => None
    }
    case r: DataSourceV2ScanRelation => r.scan match {
      case w: V1ScanWrapper => w.v1Scan match {
        case ls: LakeScan => Some(ls.sizeHint)
        case _ => None
      }
      case ls: LakeScan => Some(ls.sizeHint)
      case _ => None
    }
    case Project(_, c) => lakeSize(c)
    case Filter(_, c) => lakeSize(c)
    case _ => None
  }

  // mirror JoinSelectionHelper.canBuildBroadcastLeft/Right: the preserved
  // side of an outer join can't be broadcast, a full outer join neither —
  // hinting those sides would only produce planner-warning noise
  private def canBuildLeft(jt: org.apache.spark.sql.catalyst.plans.JoinType): Boolean =
    jt match {
      case org.apache.spark.sql.catalyst.plans.Inner |
           org.apache.spark.sql.catalyst.plans.Cross |
           org.apache.spark.sql.catalyst.plans.RightOuter => true
      case _ => false
    }
  private def canBuildRight(jt: org.apache.spark.sql.catalyst.plans.JoinType): Boolean =
    jt match {
      case org.apache.spark.sql.catalyst.plans.Inner |
           org.apache.spark.sql.catalyst.plans.Cross |
           org.apache.spark.sql.catalyst.plans.LeftOuter |
           org.apache.spark.sql.catalyst.plans.LeftSemi |
           org.apache.spark.sql.catalyst.plans.LeftAnti => true
      case _: org.apache.spark.sql.catalyst.plans.ExistenceJoin => true
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    def small(p: LogicalPlan): Boolean = lakeSize(p).exists(_ <= threshold)
    plan.transform {
      case j @ Join(l, r, jt, _, hint) =>
        val lh = hint.leftHint.orElse(
          if (canBuildLeft(jt) && small(l)) Some(HintInfo(Some(BROADCAST))) else None)
        val rh = hint.rightHint.orElse(
          if (canBuildRight(jt) && small(r)) Some(HintInfo(Some(BROADCAST))) else None)
        if ((lh eq hint.leftHint) && (rh eq hint.rightHint)) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }
}
