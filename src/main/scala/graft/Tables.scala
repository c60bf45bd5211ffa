package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the driver's synthetic star schema
  * (see /root/repo/TESTDATA.md). Every query receives the scale-factor
  * directory at call time, so readers stay pure functions of (spark, dir).
  *
  * Scale notes: at 100 TB these reads become partitioned scans; all
  * downstream operators filter/project before shuffling so Catalyst can
  * push predicates and prune columns into the scan.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS), which Spark's parquet reader
    * rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as long
    * (legacy conf) and rebuild a TIMESTAMP_NTZ column — the generator only
    * populates microsecond precision, so `div 1000` is lossless.
    *
    * The conf must be set AT SESSION BUILD (as SparkSpec/Bench/Verify do):
    * the parquet reader consults it both at schema inference and again at
    * physical planning, so a set-and-restore around the read would still
    * leak order dependence, and a reader that mutates session state flips
    * a global toggle for every neighboring query. A reader asserts instead
    * of mutating. */
  val NanosAsLongConf = "spark.sql.legacy.parquet.nanosAsLong"
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    require(spark.conf.get(NanosAsLongConf, "false") == "true",
      s"Tables.events needs $NanosAsLongConf=true set at session build " +
        "(events.parquet is TIMESTAMP(NANOS))")
    import org.apache.spark.sql.functions._
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
