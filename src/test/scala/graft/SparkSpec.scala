package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkSpec {
  /** Suites run in parallel threads inside one forked JVM, and
    * SparkSession.getOrCreate reads process-global default-session state.
    * Any test that swaps or clears the default session (e.g. the
    * session-extensions case) must hold this lock for the whole swap
    * window, and every builder call takes it too — otherwise a suite's
    * lazy session can land on the foreign, unconfigured session and fail
    * on missing static confs (a real race seen as 8 cross-suite
    * failures: TIMESTAMP_NTZ reads, plan-shape drift). */
  val sessionLock = new Object
}

/** Shared session base for all suites: one local session per suite class
  * (lazy), UTC, small shuffle fan-out. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.sessionLock.synchronized {
    SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS); Tables.events requires this at
      // session build instead of mutating session conf per read
      .config(Tables.NanosAsLongConf, "true")
      // bucketed-table tests need a warehouse outside the repo; static conf,
      // so it must be set by whichever suite creates the session first
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
  }

  /** Run `body` with a session conf temporarily overridden — suites share
    * one session, so leaking a conf breaks order-dependent tests. */
  def withConf[A](key: String, value: String)(body: => A): A = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Smoke-scale data (500 docs / 1.5k orders / 6k lineitems). */
  val sf: String = "/root/testdata/sf0.001"
}
