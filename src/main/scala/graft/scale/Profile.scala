package graft.scale

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Round-18 profiling probe: split a registry query's bench time into
  * CONSTRUCTION (the registered fn — includes any driver-side iterative
  * loops and their jobs), PLANNING (analysis+optimization+physical
  * planning of the returned frame, from QueryPlanningTracker), and
  * EXECUTION (toRdd.count()). Guide §1 (measure first) / §7.3 (driver
  * planning time): the bench's timed region is construction + execution,
  * so a query can be "slow" in three distinct places that need three
  * different fixes. Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY,
  * SPARK_GRAFT_PASSES (default 2). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "graph_pagerank")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val passes = sys.env.getOrElse("SPARK_GRAFT_PASSES", "2").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config(Tables.NanosAsLongConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    for (name <- names; p <- 1 to passes) {
      val fn = graft.SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      val rdd = df.queryExecution.toRdd // forces analysis->physical planning
      val t2 = System.nanoTime()
      rdd.count()
      val t3 = System.nanoTime()
      val phases = df.queryExecution.tracker.phases
        .map { case (k, v) => s"$k=${(v.endTimeMs - v.startTimeMs)}ms" }
        .toSeq.sorted.mkString(" ")
      println(f"PROFILE $name pass$p construct=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
        f"total=${(t3 - t0) / 1e9}%.2f [$phases]")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
