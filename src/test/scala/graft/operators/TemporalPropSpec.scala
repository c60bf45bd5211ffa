package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** Property tests: the distributed as-of join and sessionization agree
  * with naive single-machine reference implementations on randomized
  * inputs (fixed ScalaCheck seeds — no scalatest-plus bridge in the
  * offline cache). */
class TemporalPropSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(911L + i)))

  /** (key, epochSecond, id) event rows over a deliberately tiny key/time
    * domain so ties and same-ts collisions actually occur. */
  private val rowGen: Gen[(Long, Long, Long)] = for {
    key <- Gen.choose(1L, 5L)
    sec <- Gen.choose(0L, 5000L)
  } yield (key, sec, 0L)

  private def mkRows(n: Int): Seq[(Long, Timestamp, Long)] =
    samples(rowGen, n).zipWithIndex.map { case ((k, s, _), i) =>
      (k, Timestamp.from(java.time.Instant.ofEpochSecond(s)), i.toLong)
    }

  test("as-of join matches the naive per-probe max-filter reference") {
    val probe = mkRows(120)
    val build = mkRows(150).map { case (k, ts, id) => (k, ts, id + 1000L) }
    val got = Temporal.asofJoinOf(
        probe.toDF("user_id", "ts", "event_id"),
        build.toDF("user_id", "ts", "event_id"),
        "user_id", "ts", "event_id")
      .collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong)).toMap
    // reference: greatest build (ts, id) with ts <= probe ts, same key
    val expected = probe.map { case (k, ts, id) =>
      val cand = build.filter(b => b._1 == k && !b._2.after(ts))
      id -> (if (cand.isEmpty) None
             else Some(cand.maxBy(b => (b._2.getTime, b._3))._3))
    }.toMap
    assert(got.size == probe.size)
    assert(got == expected)
  }

  test("segmented as-of equals the plain form for any bucket span") {
    val probe = mkRows(120).toDF("user_id", "ts", "event_id")
    val build = mkRows(150).map { case (k, ts, id) => (k, ts, id + 1000L) }
      .toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("event_id"),
        Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong),
        Option(r.getAs[Timestamp]("asof_ts")).map(_.getTime))).toSet
    val plain = canon(Temporal.asofJoinOf(probe, build, "user_id", "ts", "event_id"))
    // prime/odd spans shake boundary alignment; a span past the domain
    // degenerates to one bucket (must equal plain trivially)
    for (span <- Seq(601L, 733L, 1500L, 10000L)) {
      val seg = canon(Temporal.asofJoinSaltedOf(
        probe, build, "user_id", "ts", "event_id", bucketSpanSeconds = span))
      assert(seg == plain, s"segmented as-of diverged at span=$span")
    }
  }

  test("segmented sessionization equals the plain form, even with spans below the gap") {
    val gap = 600L
    val events = mkRows(200).toDF("user_id", "ts", "event_id")
    def canon(df: org.apache.spark.sql.DataFrame) = df.collect().map(r =>
      (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").getTime,
        r.getAs[Timestamp]("session_end").getTime, r.getAs[Long]("n_events"),
        r.getAs[Long]("duration_s"))).toSet
    val plain = canon(Temporal.sessionizeOf(events, gapSeconds = gap))
    // span < gap forces sessions to straddle MANY buckets — every
    // consecutive-bucket pair must stitch through the offset chain
    for (span <- Seq(300L, 601L, 977L, 10000L)) {
      val seg = canon(Temporal.sessionizeSaltedOf(
        events, gapSeconds = gap, bucketSpanSeconds = span))
      assert(seg == plain, s"segmented sessions diverged at span=$span")
    }
  }

  test("sessionization matches the naive gap-scan reference") {
    val gap = 600L
    val events = mkRows(200)
    val got = Temporal.sessionizeOf(
        events.toDF("user_id", "ts", "event_id"), gapSeconds = gap)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Timestamp]("session_start").getTime,
        r.getAs[Timestamp]("session_end").getTime, r.getAs[Long]("n_events")))
      .toSet
    // reference: per key, sort by (ts, id), split where gap exceeded
    val expected = events.groupBy(_._1).flatMap { case (k, rows) =>
      val sorted = rows.sortBy(r => (r._2.getTime, r._3))
      val sessions = sorted.foldLeft(List.empty[List[(Long, Timestamp, Long)]]) {
        case (acc, r) => acc match {
          case cur :: rest
            if (r._2.getTime - cur.head._2.getTime) / 1000 <= gap =>
              (r :: cur) :: rest   // cur.head is the session's LAST event
          case _ => List(r) :: acc
        }
      }
      sessions.map { s =>
        (k, s.last._2.getTime, s.head._2.getTime, s.length.toLong)
      }
    }.toSet
    assert(got == expected)
  }

  test("island coalescing matches a naive sequential sweep on random intervals") {
    val ivGen: Gen[(Long, Long, Long)] = for {
      key <- Gen.choose(1L, 4L)
      s <- Gen.choose(0L, 200L)
      len <- Gen.choose(0L, 15L)
    } yield (key, s, s + len)
    val rows = samples(ivGen, 300).distinct
    val got = Temporal.busyIslandsOf(rows.toDF("key", "s", "e"))
      .collect()
      .map(r => (r.getAs[Long]("key"), r.getAs[Long]("island_start"),
        r.getAs[Long]("island_end"), r.getAs[Long]("n_intervals")))
      .toSet
    // reference: per key, sweep sorted intervals, open a new island when
    // s exceeds the running max end seen so far
    val expected = rows.groupBy(_._1).flatMap { case (k, ivs) =>
      val sorted = ivs.map(iv => (iv._2, iv._3)).sorted
      val islands = scala.collection.mutable.ListBuffer
        .empty[(Long, Long, Long)] // (start, maxEnd, count)
      var cur: Option[(Long, Long, Long)] = None
      sorted.foreach { case (s, e) =>
        cur = cur match {
          case Some((st, en, n)) if s <= en => Some((st, math.max(en, e), n + 1))
          case Some(done) => islands += done; Some((s, e, 1L))
          case None => Some((s, e, 1L))
        }
      }
      cur.foreach(islands += _)
      islands.map { case (st, en, n) => (k, st, en, n) }
    }.toSet
    assert(got == expected)
  }

  test("banded skyline matches the naive dominance filter on random points") {
    val ptGen: Gen[(Double, Int)] = for {
      // price grid with fractional cents; sizes small so ties occur
      cents <- Gen.choose(0L, 4000L)
      size <- Gen.choose(1, 40)
    } yield (cents / 100.0, size)
    val pts = samples(ptGen, 400).zipWithIndex
      .map { case ((pr, sz), i) => (i.toLong, pr, sz) }
    val got = graft.metrics.Dashboard.paretoFrontierOf(
        pts.toDF("p_partkey", "p_retailprice", "p_size"))
      .collect().map(_.getAs[Long]("p_partkey")).toSet
    val expected = pts.filter { case (_, pr, sz) =>
      !pts.exists { case (_, bpr, bsz) =>
        bpr <= pr && bsz >= sz && (bpr < pr || bsz > sz)
      }
    }.map(_._1).toSet
    assert(got == expected && got.nonEmpty)
    spark.catalog.clearCache() // paretoFrontierOf persists its aggregate
  }
}
