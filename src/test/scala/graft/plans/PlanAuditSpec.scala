package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The plan linter flags the known scale-killers, exempts the engine's
  * sanctioned idioms, and passes every flagship query clean. */
class PlanAuditSpec extends SparkSpec {
  import spark.implicits._

  private lazy val base = (1L to 100L).map(i => (i, i % 7)).toDF("id", "k")

  test("global window is an error; partitioned window is clean") {
    val bad = base.withColumn("r",
      row_number().over(Window.orderBy(col("id"))))
    assert(PlanAudit.audit(bad).exists(f =>
      f.level == "error" && f.rule == "global-window"))
    val good = base.withColumn("r",
      row_number().over(Window.partitionBy(col("k")).orderBy(col("id"))))
    assert(!PlanAudit.audit(good).exists(_.rule == "global-window"))
    // partitionBy(constant) is the disguised global window — same flag
    val disguised = base.withColumn("r",
      row_number().over(Window.partitionBy(lit(0)).orderBy(col("id"))))
    assert(PlanAudit.audit(disguised).exists(f =>
      f.level == "error" && f.rule == "global-window"))
    intercept[IllegalArgumentException](PlanAudit.assertScaleSafe(bad))
    PlanAudit.assertScaleSafe(good)
  }

  test("unhinted cross join is an error; the broadcast scalar anchor is exempt") {
    val other = Seq((1L, "x")).toDF("id2", "label")
    assert(PlanAudit.audit(base.crossJoin(other)).exists(f =>
      f.level == "error" && f.rule == "cartesian-join"))
    assert(!PlanAudit.audit(base.crossJoin(broadcast(other)))
      .exists(_.rule == "cartesian-join"))
  }

  test("global sort without a limit warns; orderBy + limit is clean") {
    val sorted = base.orderBy(col("id").desc)
    assert(PlanAudit.audit(sorted).exists(f =>
      f.level == "warning" && f.rule == "global-sort-no-limit"))
    assert(PlanAudit.audit(sorted.limit(10))
      .forall(_.rule != "global-sort-no-limit"))
    // a projection between the limit and the sort keeps the protection
    assert(PlanAudit.audit(base.orderBy(col("id")).select(col("id") * 2).limit(5))
      .forall(_.rule != "global-sort-no-limit"))
    // warnings never trip the CI guard
    PlanAudit.assertScaleSafe(sorted)
  }

  test("flagship queries audit clean of scale-killers") {
    val flagships = Seq(
      graft.sync.Reconcile.categories(spark, sf),
      graft.metrics.Dashboard.qualityDeciles(spark, sf),
      graft.ml.TextOps.tokenDrift(spark, sf),
      graft.ml.Dedup.spanDedupStats(spark, sf),
      graft.operators.Temporal.purchaseAsofBrowseSalted(spark, sf),
      graft.operators.Temporal.userSessionsSalted(spark, sf))
    flagships.foreach(PlanAudit.assertScaleSafe)
    spark.catalog.clearCache()
  }
}
