package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec

/** Shared plan-walking for specs/probes: AQE hides the real operators
  * behind AdaptiveSparkPlanExec / QueryStageExec / ReusedExchangeExec
  * wrappers — walk through them so plan pins reach the executed nodes.
  */
object PlanWalk {
  def batchScans(p: SparkPlan): Seq[BatchScanExec] = p match {
    case a: AdaptiveSparkPlanExec => batchScans(a.executedPlan)
    case q: QueryStageExec        => batchScans(q.plan)
    case r: ReusedExchangeExec    => batchScans(r.child)
    case b: BatchScanExec         => Seq(b)
    case other                    => other.children.flatMap(batchScans)
  }
}
