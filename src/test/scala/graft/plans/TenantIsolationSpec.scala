package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The tenant-isolation rule injects the mandatory tenant predicate into
  * scans of tenant-carrying relations and composes with partition
  * pruning. */
class TenantIsolationSpec extends SparkSpec {

  private def withRule[A](body: => A): A = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ TenantIsolationRule(spark)
    try body
    finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_.isInstanceOf[TenantIsolationRule])
      spark.conf.unset(TenantIsolationRule.TenantConfKey)
    }
  }

  lazy val tenantTable: String = {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-tenants").toString + "/cases"
    (0L until 100L).map(i => (i % 4, i, i * 10))
      .toDF("tenant_id", "case_ref", "serialno")
      .write.partitionBy("tenant_id").parquet(out)
    out
  }

  test("rule filters every tenant-carrying scan when the conf is set") {
    withRule {
      spark.conf.set(TenantIsolationRule.TenantConfKey, "2")
      val df = spark.read.parquet(tenantTable)
      val got = df.select("tenant_id").distinct()
        .collect().map(_.getAs[Number]("tenant_id").longValue()).toSeq
      assert(got == Seq(2L))
      assert(df.count() == 25)
      // and the filter reaches the scan as a partition filter (pruning)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters") && plan.contains("tenant_id"),
        s"isolation should prune partitions:\n$plan")
    }
  }

  test("no conf -> no filtering; non-tenant tables untouched") {
    withRule {
      val all = spark.read.parquet(tenantTable).count()
      assert(all == 100)
      spark.conf.set(TenantIsolationRule.TenantConfKey, "1")
      // region has no tenant_id column -> rule must not touch it
      assert(graft.Tables.region(spark, sf).count() > 0)
    }
  }

  test("isolation composes with real queries over the relation") {
    withRule {
      spark.conf.set(TenantIsolationRule.TenantConfKey, "3")
      val agg = spark.read.parquet(tenantTable)
        .groupBy("tenant_id").agg(count(lit(1)).as("n"))
        .collect()
      assert(agg.length == 1)
      assert(agg.head.getAs[Long]("n") == 25)
    }
  }
}
