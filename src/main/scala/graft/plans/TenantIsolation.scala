package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.{Cast, EqualTo, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.execution.datasources.LogicalRelation

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
        plan.transformUp {
          case r: LogicalRelation
              if r.getTagValue(Isolated).isEmpty &&
                r.output.exists(_.name == TenantCol) =>
            // tag survives fixpoint re-runs of this batch, so the filter
            // is injected once per relation
            r.setTagValue(Isolated, true)
            val attr = r.output.find(_.name == TenantCol).get
            // cast to the relation's own tenant type (partition-inferred
            // columns come back as int, data columns may be long/string)
            Filter(EqualTo(attr, Cast(Literal(t), attr.dataType)), r)
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
