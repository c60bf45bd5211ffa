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

  test("v2 scan (post-pushdown path): residual filter still isolates") {
    withRule {
      spark.conf.set(TenantIsolationRule.TenantConfKey, "2")
      withConf("spark.sql.sources.useV1SourceList", "") {
        // the late extraOptimizations batch runs after V2ScanRelationPushDown,
        // so the scan is already built — the rule injects a residual Filter
        // above the BatchScan, which still restricts rows for any query
        // whose scan output kept tenant_id
        val df = spark.read.parquet(tenantTable)
        val got = df.select("tenant_id").distinct()
          .collect().map(_.getAs[Number]("tenant_id").longValue()).toSeq
        assert(got == Seq(2L))
        val agg = df.groupBy("tenant_id").agg(count(lit(1)).as("n")).collect()
        assert(agg.length == 1 && agg.head.getAs[Long]("n") == 25)
        assert(df.select("tenant_id").queryExecution.optimizedPlan.toString
          .contains("tenant_id"),
          "isolation filter must appear in the optimized v2 plan")
      }
    }
  }

  test("v2 scan with tenant_id pruned out: fails closed, never leaks") {
    withRule {
      spark.conf.set(TenantIsolationRule.TenantConfKey, "2")
      withConf("spark.sql.sources.useV1SourceList", "") {
        // the projection drops tenant_id, so by the time the late rule runs
        // column pruning has removed it from the scan — isolation must
        // refuse to run the query rather than silently return all tenants
        val e = intercept[Throwable] {
          spark.read.parquet(tenantTable).select("case_ref").collect()
        }
        def messages(t: Throwable): Seq[String] =
          Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
        assert(messages(e).exists(_.contains("tenant isolation")), s"got: $e")
      }
    }
  }

  // Holds SparkSpec.sessionLock for the entire default-session swap window:
  // concurrently-starting suites would otherwise getOrCreate THIS bare
  // session and fail on its missing static confs.
  test("v2 scan via session extensions: filter injected before pushdown prunes") {
    graft.SparkSpec.sessionLock.synchronized {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .withExtensions(new TenantIsolationExtensions()(_))
      .getOrCreate()
    try {
      s2.conf.set(TenantIsolationRule.TenantConfKey, "2")
      s2.conf.set("spark.sql.sources.useV1SourceList", "")
      val df = s2.read.parquet(tenantTable)
      assert(df.count() == 25)
      // injectOptimizerRule runs in the operator-optimization batch, ahead
      // of V2ScanRelationPushDown — the injected predicate must reach the
      // v2 scan as a partition filter (file-level pruning, not row filter)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("tenant_id"), s"plan must carry the predicate:\n$plan")
      // a projection that never references tenant_id is still isolated,
      // because injection happens before column pruning
      assert(df.select("case_ref").distinct().count() == 25)
    } finally {
      s2.conf.unset(TenantIsolationRule.TenantConfKey)
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
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
