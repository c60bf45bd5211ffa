package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2Relation, DataSourceV2ScanRelation}

/** Tenant isolation as a Catalyst rule — the reference enforces a
  * mandatory `tenant_id` predicate on every query by convention
  * (database/change_tracking.py:64-68, monitoring/dashboard.py:784-787;
  * SURVEY.md §1.3). Convention is exactly what breaks at scale, so here
  * the engine enforces it: when `spark.graft.tenant` is set on the
  * session, every scanned relation exposing a `tenant_id` column gets the
  * equality filter injected at the plan level. Combined with
  * tenant-partitioned storage that turns isolation into partition pruning
  * — the query can't even read other tenants' files.
  *
  * Two integration points:
  *  - `TenantIsolationExtensions` for
  *    `spark.sql.extensions=graft.plans.TenantIsolationExtensions`;
  *  - `spark.experimental.extraOptimizations ++= Seq(TenantIsolationRule(spark))`
  *    for an already-running session (what the tests use).
  */
case class TenantIsolationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import TenantIsolationRule._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val tenant = spark.conf.getOption(TenantConfKey)
    tenant match {
      case None | Some("") => plan
      case Some(t) =>
        def isolate(r: LogicalPlan): LogicalPlan = {
          r.setTagValue(Isolated, true)
          val attr = r.output.find(_.name == TenantCol).get
          // cast to the relation's own tenant type (partition-inferred
          // columns come back as int, data columns may be long/string)
          Filter(EqualTo(attr, Cast(Literal(t), attr.dataType)), r)
        }
        plan.transformUp {
          // DSv1 (parquet/csv/jdbc default path). Scan-schema narrowing
          // happens at physical planning, so output always carries the
          // full relation schema and late injection still prunes.
          // The tag survives fixpoint re-runs of the batch, so the filter
          // is injected once per relation.
          case r: LogicalRelation
              if r.getTagValue(Isolated).isEmpty &&
                r.output.exists(_.name == TenantCol) =>
            isolate(r)
          // DSv2 before V2ScanRelationPushDown (the injectOptimizerRule /
          // spark.sql.extensions path runs in the operator-optimization
          // batch, ahead of early scan push-down): full output, and the
          // injected predicate participates in v2 filter push-down and
          // partition pruning like any user filter.
          case r: DataSourceV2Relation
              if r.getTagValue(Isolated).isEmpty &&
                r.output.exists(_.name == TenantCol) =>
            isolate(r)
          // DSv2 after push-down (the experimental.extraOptimizations path
          // runs in the last optimizer batch): the Scan is already built.
          // If tenant_id survived column pruning, a residual filter above
          // the scan still isolates (no file pruning, but correct rows).
          // If pruning dropped it, isolation is impossible this late —
          // FAIL CLOSED rather than silently return cross-tenant rows,
          // the exact failure the rule exists to prevent.
          case r: DataSourceV2ScanRelation if r.getTagValue(Isolated).isEmpty =>
            if (r.output.exists(_.name == TenantCol)) isolate(r)
            else if (r.relation.output.exists(_.name == TenantCol))
              throw new IllegalStateException(
                s"tenant isolation: '$TenantCol' was pruned from a v2 scan of " +
                  s"${r.relation.table.name()} before the isolation rule ran; " +
                  "register the rule via spark.sql.extensions=" +
                  "graft.plans.TenantIsolationExtensions so it runs before " +
                  "scan push-down")
            else r
        }
    }
  }
}

object TenantIsolationRule {
  val TenantConfKey = "spark.graft.tenant"
  val TenantCol = "tenant_id"
  val Isolated: TreeNodeTag[Boolean] = TreeNodeTag[Boolean]("graft.tenantIsolated")
}

/** Session-extension registration (spark.sql.extensions). */
class TenantIsolationExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(session => TenantIsolationRule(session))
}
