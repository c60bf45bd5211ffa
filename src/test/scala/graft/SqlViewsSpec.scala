package graft

import org.apache.spark.sql.functions._

/** The SQL façade produces the same results (and the same plans) as the
  * DataFrame API. */
class SqlViewsSpec extends SparkSpec {

  test("spark.sql over the registered views matches the DataFrame forms") {
    SqlViews.register(spark, sf)

    // flagship: category counts via SQL == Reconcile.summary's counts
    val sqlCounts = spark.sql(
      "SELECT category, count(*) AS n FROM recon_categories GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfCounts = sync.Reconcile.summary(spark, sf)
      .select("category", "n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sqlCounts == dfCounts)

    // dashboard-style SQL over events == Dashboard.hourlyThroughput
    val sqlHours = spark.sql(
      """SELECT date_trunc('hour', ts) AS hour, user_id % 4 AS tenant_id,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin)
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2))).toSet
    val dfHours = metrics.Dashboard.hourlyThroughput(spark, sf)
      .collect().map(r => (r.get(0), r.getLong(1), r.getLong(2))).toSet
    assert(sqlHours == dfHours)
  }

  test("filters push through the views into the parquet scan") {
    SqlViews.register(spark, sf)
    val plan = spark.sql(
      "SELECT o_orderkey FROM orders WHERE o_orderkey = 42")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"expected pushed filter in:\n$plan")
  }
}
