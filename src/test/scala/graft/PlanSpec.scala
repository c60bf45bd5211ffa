package graft

import graft.SparkSpec

/** Physical-plan regression guards: the properties that keep these
  * queries scalable are asserted on the executed plan, so a refactor that
  * silently loses pushdown/broadcast/codegen fails here, not at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("watermark join: filters reach the parquet scan, join broadcasts") {
    val df = graft.sync.Reconcile.needsUpdate(spark, sf)
    df.collect() // finalize AQE — the static plan may still show SMJ
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(o_orderstatus,O)"),
      s"status filter must be pushed to the scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"snapshot join should broadcast at this scale:\n$plan")
  }

  test("dimension join broadcasts the supplier side") {
    val plan = planOf(graft.metrics.Dashboard.revenueBySupplier(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pricing summary runs inside whole-stage codegen with pruned columns") {
    val df = graft.metrics.Dashboard.pricingSummary(spark, sf)
    // collect() (not count(), which builds its own plan) so THIS dataframe's
    // AQE plan finalizes and codegen spans appear
    df.collect()
    val plan = planOf(df)
    // codegen stages render as "*(n) Op" in the executed-plan string
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    // column pruning: the scan must not read l_comment-style extra fields —
    // schema should only contain the five columns the query touches
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan must prune unused columns: $readSchema")
  }

  test("anti joins plan as broadcast/hash anti joins, not cartesian") {
    val plan = planOf(graft.sync.Reconcile.newCases(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("top-k limit plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf(graft.metrics.Dashboard.recentEvents(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
