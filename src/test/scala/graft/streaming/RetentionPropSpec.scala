package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import IncrementalSync._

/** The streaming retention tracker must reproduce the batch A26
  * calendar-week cohort matrix exactly: crafted week-boundary cases
  * (a Sunday-23:59 / Monday-00:00 pair falls in DIFFERENT weeks) plus
  * random corpora under time-split shuffled micro-batches. Fixed
  * ScalaCheck seeds — no scalatest-plus bridge in the offline cache. */
class RetentionPropSpec extends SparkSpec {
  import spark.implicits._

  // base: 2023-11-13 00:00:00 UTC, a Monday midnight — day d hour h
  // lands on calendar day d exactly; events span ~5 weeks
  private val baseMs = 1699833600000L
  private def ts(day: Int, hour: Int): java.sql.Timestamp =
    new java.sql.Timestamp(baseMs + day * 86400000L + hour * 3600000L)

  /** Batch matrix keyed (cohort epoch-day, offset) -> n_users. */
  private def batchMatrix(events: Seq[(Long, java.sql.Timestamp)])
      : Map[(Long, Long), Long] =
    graft.metrics.Dashboard.retentionCohortsOf(
      events.toDF("user_id", "ts")).collect().map { r =>
      (java.time.LocalDate.parse(r.getAs[String]("cohort_week")).toEpochDay,
        r.getAs[Long]("week_offset")) -> r.getAs[Long]("n_users")
    }.toMap

  private def streamMatrix(batches: Seq[Seq[(Long, java.sql.Timestamp)]],
      name: String): Map[(Long, Long), Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[UserEvent]
    val q = retentionStream(input.toDS())
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Append).start()
    try {
      batches.foreach { b =>
        input.addData(b.map { case (u, t) => UserEvent(u, t) })
        q.processAllAvailable()
      }
      spark.table(name).as[RetentionTouch].collect()
        .groupBy(t => (t.cohort_day, t.week_offset))
        .map { case (k, v) => k -> v.length.toLong }
    } finally q.stop()
  }

  test("Monday truncation matches date_trunc at the week boundary, and " +
    "cross-batch touches dedup per (user, week)") {
    // u1: Sunday 23:00 then next-day Monday 01:00 — different cohort
    // weeks for u1 vs u2 who starts Monday; u1's Monday event is its
    // offset-1 touch. u3: three events in ONE week across batches —
    // exactly one touch emitted.
    val sunday = 6 // 2023-11-19 (Sunday); day 7 is the next Monday
    val monday = 7
    val b1 = Seq((1L, ts(sunday, 23)), (3L, ts(0, 1)), (3L, ts(1, 2)))
    val b2 = Seq((1L, ts(monday, 1)), (2L, ts(monday, 2)), (3L, ts(2, 3)))
    val got = streamMatrix(Seq(b1, b2), "ret_crafted")
    val want = batchMatrix(b1 ++ b2)
    assert(got == want, s"stream $got vs batch $want")
    // u1's two events straddle the Monday boundary: offsets 0 AND 1
    // exist for u1's cohort; u3's three same-week events collapse to 1
    assert(want.keys.count(_._2 == 1L) >= 1)
  }

  test("random corpora: streaming touch counts equal the batch cohort " +
    "matrix across time-split micro-batches") {
    for (seed <- Seq(7L, 1337L, 24601L)) {
      val g = for {
        u <- Gen.choose(1L, 25L)
        d <- Gen.choose(0, 34)
        h <- Gen.choose(0, 23)
      } yield (u, ts(d, h))
      val events = (0 until 250).flatMap(i =>
        g.apply(Gen.Parameters.default, Seed(seed + i)))
      val rnd = new scala.util.Random(seed)
      val batches = Seq(0 until 12, 12 until 24, 24 until 35).map { w =>
        rnd.shuffle(events.filter { case (_, t) =>
          w.contains(((t.getTime - baseMs) / 86400000L).toInt) })
      }
      val got = streamMatrix(batches, s"ret_prop_$seed")
      val want = batchMatrix(events)
      assert(got == want, s"seed $seed: stream $got vs batch $want")
    }
  }
}
