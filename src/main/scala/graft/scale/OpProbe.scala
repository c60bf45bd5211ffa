package graft.scale

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import graft.Tables

/** Round-19 probe: per-OPERATOR SQLMetrics for one registry query — the
  * local stand-in for the Spark UI's SQL tab (disabled in the bench).
  * Executes the query once (toRdd.count, the bench's own action), then
  * walks the final adaptive plan (through query stages, reused
  * exchanges/subqueries, and InMemoryRelation cached plans) printing
  * every operator whose time-ish metrics exceed a threshold, so the
  * expensive operator is identifiable by name instead of by job id.
  * Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_ONLY, SPARK_GRAFT_CPUS. */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "graph_pagerank")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
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

    def walk(p: SparkPlan, depth: Int, seen: java.util.IdentityHashMap[SparkPlan, Boolean]): Unit = {
      if (seen.containsKey(p)) return
      seen.put(p, true)
      val ms = p.metrics.map { case (k, m) => (k, m.value) }
        .filter(_._2 > 0)
      val interesting = ms.filter { case (k, v) =>
        (k.contains("Time") || k.contains("duration") || k == "numOutputRows" ||
          k.contains("build") || k.contains("sort") || k.contains("agg") ||
          k.contains("collect")) && v > 0
      }
      val timeish = ms.filter { case (k, v) =>
        (k.toLowerCase.contains("time") || k.contains("duration")) && v > 50
      }
      if (timeish.nonEmpty || ms.getOrElse("numOutputRows", 0L) > 100000L) {
        val s = interesting.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(" ")
        println("  " * depth + f"${p.nodeName}%-40s $s")
      }
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1, seen)
        case q: QueryStageExec => walk(q.plan, depth + 1, seen)
        case im: InMemoryTableScanExec =>
          walk(im.relation.cachedPlan, depth + 1, seen)
        case _ => p.children.foreach(walk(_, depth + 1, seen))
      }
      p.subqueries.foreach(walk(_, depth + 1, seen))
    }

    for (name <- names) {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"QUERY $name exec=$dt%.2f")
      walk(df.queryExecution.executedPlan, 0,
        new java.util.IdentityHashMap[SparkPlan, Boolean]())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
