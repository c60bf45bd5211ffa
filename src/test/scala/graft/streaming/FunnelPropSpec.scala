package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import IncrementalSync._

/** Property check for the streaming funnel: on RANDOM event corpora the
  * cross-batch tracker must reproduce the batch A25 join-ladder's
  * step-reach counts exactly — crafted cases (IncrementalSyncSpec) pin
  * the edges, this pins the space between them. Fixed ScalaCheck seeds
  * (no scalatest-plus bridge in the offline cache); micro-batches are
  * split by event-time threshold, satisfying the documented in-order-
  * across-batches precondition, and shuffled within each batch. */
class FunnelPropSpec extends SparkSpec {
  import spark.implicits._

  private val steps = Seq("signup", "view", "click", "purchase")
  // decoys exercise the non-step filter; heavy type/time collision odds
  // (30 users x 40 secs x 6 types over ~300 events) force duplicate
  // events, same-ts ties and skipped-step arrivals
  private val types = steps ++ Seq("scroll", "hover")

  private def corpus(seed: Long): Seq[(Long, Int, String)] = {
    val g = for {
      u <- Gen.choose(1L, 30L)
      s <- Gen.choose(1, 40)
      t <- Gen.oneOf(types)
    } yield (u, s, t)
    (0 until 300).flatMap(i => g.apply(Gen.Parameters.default,
      Seed(seed + i)))
  }

  test("random corpora: streaming step-reach counts equal the batch " +
    "join-ladder across time-split micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    def ts(sec: Int): java.sql.Timestamp =
      new java.sql.Timestamp(1700000000000L + sec * 1000L)
    for (seed <- Seq(11L, 4177L, 90210L)) {
      val events = corpus(seed)
      val want = graft.metrics.Dashboard.funnelConversionOf(
        events.map { case (u, s, t) => (u, ts(s), t) }
          .toDF("user_id", "ts", "event_type"))
        .collect()
        .map(r => r.getAs[Int]("step") -> r.getAs[Long]("n_users")).toMap
      val input = MemoryStream[FunnelEvent]
      val q = funnelStream(input.toDS())
        .writeStream.format("memory").queryName(s"funnel_prop_$seed")
        .outputMode(OutputMode.Append).start()
      try {
        // three batches split at event-time thirds; shuffle within each
        val rnd = new scala.util.Random(seed)
        Seq(1 to 13, 14 to 26, 27 to 40).foreach { window =>
          val b = rnd.shuffle(events.filter(e => window.contains(e._2)))
          input.addData(b.map { case (u, s, t) => FunnelEvent(u, ts(s), t) })
          q.processAllAvailable()
        }
        val adv = spark.table(s"funnel_prop_$seed").as[FunnelAdvance]
          .collect()
        val got = (1 to steps.length).map(s =>
          s -> adv.count(_.step == s).toLong).toMap
        assert(got == want, s"seed $seed: stream $got vs batch $want")
        // structural invariant: per user, steps are a contiguous 1..m
        // prefix with strictly increasing times
        adv.groupBy(_.user_id).values.foreach { a =>
          val sorted = a.sortBy(_.step)
          assert(sorted.map(_.step).toSeq == (1 to a.length).toSeq)
          val times = sorted.map(_.ts.getTime)
          assert(times.zip(times.drop(1)).forall { case (x, y) => y > x })
        }
      } finally q.stop()
    }
  }
}
