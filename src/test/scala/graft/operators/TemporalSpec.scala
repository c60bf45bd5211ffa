package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Golden-case semantics for the temporal operators on crafted inputs,
  * plus shape checks on the real testdata. */
class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("as-of join picks the greatest build ts <= probe ts, per key") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L), // after b1, before b2
      (1L, ts("2024-01-01 12:00:00"), 101L), // equal to b2's ts -> b2 wins
      (2L, ts("2024-01-01 09:00:00"), 102L), // no build before it
      (3L, ts("2024-01-01 23:00:00"), 103L)  // key with no build rows at all
    ).toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),
      (1L, ts("2024-01-01 12:00:00"), 11L),
      (2L, ts("2024-01-01 09:30:00"), 12L)
    ).toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoinOf(probe, build, "user_id", "ts", "event_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong)).toMap
    assert(out(100L).contains(10L))
    assert(out(101L).contains(11L)) // same-ts build visible (<= semantics)
    assert(out(102L).isEmpty)       // build exists but only later
    assert(out(103L).isEmpty)       // key never seen on build side
    assert(out.size == 4)           // every probe row survives (left as-of)
  }

  test("segmented variants stitch sessions and as-of matches across bucket boundaries") {
    // a session straddling midnight (the daily-bucket boundary), a clean
    // later session, and an as-of probe whose only build lives in the
    // previous bucket — the carry/stitch paths, exercised explicitly
    val events = Seq(
      (1L, ts("2024-01-01 23:50:00"), 1L),
      (1L, ts("2024-01-01 23:55:00"), 2L),
      (1L, ts("2024-01-02 00:05:00"), 3L), // 10 min gap: same session
      (1L, ts("2024-01-02 00:10:00"), 4L),
      (1L, ts("2024-01-02 12:00:00"), 5L)  // new session
    ).toDF("user_id", "ts", "event_id")
    val plain = Temporal.sessionizeOf(events, gapSeconds = 1800L)
    val salted = Temporal.sessionizeSaltedOf(events,
      gapSeconds = 1800L, bucketSpanSeconds = 86400L)
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
    val spanning = salted.filter(col("n_events") === 4).collect()
    assert(spanning.length == 1, "the midnight-straddling session must merge")
    assert(spanning.head.getAs[Long]("duration_s") == 1200L)

    val probe = Seq((1L, ts("2024-01-02 00:30:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts("2024-01-01 22:00:00"), 10L),  // previous bucket: the match
      (1L, ts("2024-01-01 23:00:00"), 11L))  // previous bucket, later: wins
      .toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoinSaltedOf(probe, build,
      "user_id", "ts", "event_id", bucketSpanSeconds = 86400L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("asof_id") == 11L,
      "carry-in must surface the latest previous-bucket build")
  }

  test("tolerance as-of nulls out matches older than the window") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L),  // build 9:50 -> fresh (10 min)
      (2L, ts("2024-01-01 10:00:00"), 101L))  // build 8:00 -> stale
      .toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts("2024-01-01 09:50:00"), 10L),
      (2L, ts("2024-01-01 08:00:00"), 11L)
    ).toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoinWithinOf(probe, build,
        "user_id", "ts", "event_id", toleranceSeconds = 1800L)
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("asof_id")).map(_.toLong)).toMap
    assert(out(100L).contains(10L))
    assert(out(101L).isEmpty) // nearest candidate exists but is too old
  }

  test("as-of ties on build ts resolve to the max build id") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), 100L))
      .toDF("user_id", "ts", "event_id")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 10L),
      (1L, ts("2024-01-01 09:00:00"), 11L)
    ).toDF("user_id", "ts", "event_id")
    val out = Temporal.asofJoinOf(probe, build, "user_id", "ts", "event_id").collect()
    assert(out.head.getAs[Long]("asof_id") == 11L)
  }

  test("sessionization splits on gaps > threshold and aggregates per session") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 2L),  // same session (10 min gap)
      (1L, ts("2024-01-01 11:00:00"), 3L),  // 50 min gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 4L)   // separate user
    ).toDF("user_id", "ts", "event_id")
    val out = Temporal.sessionizeOf(events, gapSeconds = 1800L)
      .orderBy("user_id", "session_idx").collect()
    assert(out.length == 3)
    val first = out(0)
    assert(first.getAs[Long]("user_id") == 1L)
    assert(first.getAs[Long]("n_events") == 2L)
    assert(first.getAs[Long]("duration_s") == 600L)
    assert(out(1).getAs[Long]("n_events") == 1L)
    assert(out(2).getAs[Long]("user_id") == 2L)
  }

  test("sessionization: exact-threshold gap does NOT split") {
    val events = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:30:00"), 2L) // exactly 1800s -> same session
    ).toDF("user_id", "ts", "event_id")
    val out = Temporal.sessionizeOf(events, gapSeconds = 1800L).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_events") == 2L)
  }

  test("banded interval-overlap join is lossless vs the direct predicate join") {
    // crafted: band-interior overlaps, a cross-band-boundary overlap,
    // touching endpoints (inclusive), disjoint pairs, and a second key
    val iv = Seq(
      (1L, 10L, 20L), (1L, 15L, 40L), (1L, 40L, 45L), (1L, 100L, 110L),
      (1L, 29L, 31L), // straddles the 30-day band edge
      (2L, 10L, 20L), (2L, 200L, 210L))
      .toDF("key", "s", "e")
    val banded = Temporal.intervalOverlapOf(iv).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val a = iv.select(col("key"), col("s").as("a_s"), col("e").as("a_e"))
    val b = iv.select(col("key"), col("s").as("b_s"), col("e").as("b_e"))
    val direct = a.join(b, Seq("key"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        (col("a_s") < col("b_s") ||
          (col("a_s") === col("b_s") && col("a_e") < col("b_e"))))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(banded == direct)
    // the boundary-straddling interval's overlaps survived the banding
    assert(banded.contains((1L, 15L, 40L, 29L, 31L)))
    assert(banded.contains((1L, 29L, 31L, 40L, 45L)) == false) // disjoint
    // and the real-corpus query agrees with its own direct replay
    val real = Temporal.supplierShipmentOverlaps(spark, sf)
    assert(real.agg(sum(col("n_overlaps"))).collect().head.getLong(0) > 0)
  }

  test("price band join covers every part exactly once") {
    val n = graft.Tables.part(spark, sf).count()
    val banded = Temporal.priceBandStats(spark, sf)
    assert(banded.agg(sum("n_parts")).head.getLong(0) == n)
    assert(banded.count() <= 10)
  }

  test("running spend is monotone per customer and seq is dense") {
    val df = Temporal.customerRunningSpend(spark, sf)
      .filter(col("o_custkey") === 1L).orderBy("order_seq").collect()
    if (df.length > 1) {
      val spends = df.map(_.getAs[Double]("running_spend"))
      assert(spends.zip(spends.tail).forall { case (a, b) => b >= a })
      assert(df.map(_.getAs[Int]("order_seq")).toSeq == (1 to df.length))
      assert(df.head.getAs[java.lang.Long]("days_since_prev") == null)
    }
  }

  test("rollup emits leaf, status-subtotal, and grand-total levels that add up") {
    val out = Temporal.statusPriorityRollup(spark, sf).collect()
    val grand = out.filter(r => r.getAs[String]("status") == "ALL")
    assert(grand.length == 1)
    val leafN = out.filter(r => r.getAs[String]("status") != "ALL" &&
      r.getAs[String]("priority") != "ALL").map(_.getAs[Long]("n")).sum
    assert(grand.head.getAs[Long]("n") == leafN)
    val statusN = out.filter(r => r.getAs[String]("status") != "ALL" &&
      r.getAs[String]("priority") == "ALL").map(_.getAs[Long]("n")).sum
    assert(statusN == leafN)
  }

  test("funnel: strictly-increasing stage walk on crafted timelines") {
    val ev = Seq(
      // u1 completes the funnel in order
      (1L, ts("2024-01-01 10:00:00"), 1L, "view"),
      (1L, ts("2024-01-01 10:05:00"), 2L, "click"),
      (1L, ts("2024-01-01 10:10:00"), 3L, "purchase"),
      // u2: purchase BEFORE click -> reaches only stage 2
      (2L, ts("2024-01-01 09:00:00"), 4L, "view"),
      (2L, ts("2024-01-01 09:01:00"), 5L, "purchase"),
      (2L, ts("2024-01-01 09:02:00"), 6L, "click"),
      // u3: click at the SAME timestamp as view -> strict rule blocks it
      (3L, ts("2024-01-01 08:00:00"), 7L, "view"),
      (3L, ts("2024-01-01 08:00:00"), 8L, "click"),
      // u4: click with no view -> reaches nothing
      (4L, ts("2024-01-01 07:00:00"), 9L, "click"),
      // u5: view only, with noise types ignored
      (5L, ts("2024-01-01 06:00:00"), 10L, "view"),
      (5L, ts("2024-01-01 06:30:00"), 11L, "error")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.funnelOf(ev, Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[Int]("stage_idx") ->
        ((r.getAs[String]("stage"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_milli")))).toMap
    // stage 1: u1 u2 u3 u5; stage 2: u1 u2; stage 3: u1
    assert(out(1) == (("view", 4L, 1000L)))
    assert(out(2) == (("click", 2L, 500L)))
    assert(out(3) == (("purchase", 1L, 250L)))
    assert(out.size == 3)
  }

  test("cohort retention: day-offset matrix normalized by cohort size") {
    val ev = Seq(
      // cohort day 0: u1 active days 0,1,3; u2 active day 0 only
      (1L, ts("1970-01-01 08:00:00"), 1L, "view"),
      (1L, ts("1970-01-02 09:00:00"), 2L, "view"),
      (1L, ts("1970-01-04 10:00:00"), 3L, "click"),
      (2L, ts("1970-01-01 23:59:59"), 4L, "view"),
      // cohort day 2: u3 active days 2 and 3
      (3L, ts("1970-01-03 00:00:00"), 5L, "view"),
      (3L, ts("1970-01-04 12:00:00"), 6L, "view"),
      // two events same user same day collapse to one active day
      (2L, ts("1970-01-01 04:00:00"), 7L, "error")
    ).toDF("user_id", "ts", "event_id", "event_type")
    val out = Temporal.cohortRetentionOf(ev).collect()
      .map(r => (r.getAs[Long]("cohort_day"), r.getAs[Int]("day_offset")) ->
        ((r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_milli")))).toMap
    assert(out((0L, 0)) == ((2L, 2L, 1000L)))
    assert(out((0L, 1)) == ((1L, 2L, 500L)))
    assert(out((0L, 3)) == ((1L, 2L, 500L)))
    assert(out((2L, 0)) == ((1L, 1L, 1000L)))
    assert(out((2L, 1)) == ((1L, 1L, 1000L)))
    assert(out.size == 5)
  }

  test("SCD-2 history: versions tile each user's timeline, one open version") {
    val hist = Temporal.scd2History(spark, sf).collect()
      .groupBy(_.getAs[Long]("user_id"))
    assert(hist.nonEmpty)
    hist.foreach { case (uid, rows) =>
      // ts is TIMESTAMP_NTZ -> collects as java.time.LocalDateTime
      def t(r: org.apache.spark.sql.Row, c: String) =
        r.getAs[java.time.LocalDateTime](c)
      val vs = rows.sortBy(r => t(r, "valid_from"))(
        Ordering.fromLessThan(_ isBefore _))
      // exactly the last version is open (NULL valid_to, is_current)
      vs.dropRight(1).foreach { r =>
        assert(t(r, "valid_to") != null)
        assert(!r.getAs[Boolean]("is_current"))
      }
      assert(t(vs.last, "valid_to") == null)
      assert(vs.last.getAs[Boolean]("is_current"))
      // intervals tile: each version's valid_to == next version's valid_from
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(t(a, "valid_to") == t(b, "valid_from"), s"gap for user $uid")
          // consecutive versions must actually differ in type
          assert(a.getAs[String]("event_type") != b.getAs[String]("event_type"))
        case _ =>
      }
    }
  }

  test("EWMA daily agrees with a naive sequential fold") {
    val got = Temporal.ewmaDaily(spark, sf).collect()
      .groupBy(_.getAs[Long]("tenant_id"))
    assert(got.nonEmpty)
    got.foreach { case (_, rows) =>
      val byDay = rows.sortBy(_.getAs[java.sql.Timestamp]("day").getTime)
      var e = byDay.head.getAs[Long]("cents")
      assert(byDay.head.getAs[Long]("ewma") == e)
      byDay.tail.foreach { r =>
        e = (300L * r.getAs[Long]("cents") + 700L * e) / 1000L
        assert(r.getAs[Long]("ewma") == e)
      }
    }
  }

  test("island coalescing contract: duplicate intervals each count toward " +
    "n_intervals (callers dedup when identity is the value)") {
    val iv = Seq((1L, 0L, 5L), (1L, 0L, 5L), (1L, 3L, 8L), (1L, 20L, 21L))
      .toDF("key", "s", "e")
    val out = Temporal.busyIslandsOf(iv).collect()
      .sortBy(_.getAs[Long]("island_start"))
    assert(out.length == 2)
    assert(out.head.getAs[Long]("n_intervals") == 3L) // dup counted twice
    assert(out.head.getAs[Long]("island_start") == 0L &&
      out.head.getAs[Long]("island_end") == 8L)
    assert(out(1).getAs[Long]("n_intervals") == 1L)
  }

  test("dwell times: gap count equals events minus first-per-user, stats ordered") {
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    val rows = Temporal.dwellTimes(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
    rows.foreach { r =>
      assert(r.getAs[Double]("p50_s") <= r.getAs[Double]("p90_s"))
      assert(r.getAs[Long]("mean_milli_s") >= 0L)
    }
  }

  test("hourly anomalies: full-window rows only, flags mutually exclusive") {
    val hourly = Temporal.gapfillHourly(spark, sf)
    val tenants = hourly.select("tenant_id").distinct().count()
    val out = Temporal.hourlyAnomalies(spark, sf)
    // exactly the first 24 hours of each tenant's dense series are skipped
    assert(out.count() == hourly.count() - 24 * tenants)
    assert(out.filter(col("is_spike") && col("is_drop")).count() == 0)
    // flags recompute from the emitted columns
    val bad = out.filter(
      (col("is_spike") =!= (col("n") * 24 > col("prev_sum") * 2)) ||
        (col("is_drop") =!= (col("n") * 48 < col("prev_sum")))).count()
    assert(bad == 0)
  }

  test("channel attribution conserves purchase count and value") {
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
    val totalCents = purchases
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")))
      .head.getLong(0)
    val rows = Temporal.channelAttribution(spark, sf).collect()
    assert(rows.map(_.getAs[String]("channel")).toSet
      .subsetOf(Set("view", "click", "direct")))
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases.count())
    assert(rows.map(_.getAs[Long]("cents")).sum == totalCents)
  }

  test("time-decay attribution: hand-computed decay shares on crafted " +
    "timelines, and value conservation up to floor residue on real data") {
    val ev = Seq(
      // u1: purchase 10.00 with a 1-day-old click (decay 1000) and a
      // 12-day-old view (12 div 7 = 1 half-life -> 500); a 38-day-old
      // view falls outside the 30-day window entirely
      (1L, ts("2023-12-25 09:00:00"), 10L, "view", 0.0),
      (1L, ts("2024-01-20 09:00:00"), 11L, "view", 0.0),
      (1L, ts("2024-01-31 09:00:00"), 12L, "click", 0.0),
      (1L, ts("2024-02-01 10:00:00"), 100L, "purchase", 10.0),
      // u2: untouched purchase -> direct
      (2L, ts("2024-02-01 10:00:00"), 200L, "purchase", 5.0),
      // u3: only touch is AFTER the purchase -> direct
      (3L, ts("2024-02-01 10:00:00"), 300L, "purchase", 2.0),
      (3L, ts("2024-02-01 11:00:00"), 13L, "view", 0.0),
      // u4: same-timestamp view counts (t <= p), day age 0 -> full 1000
      (4L, ts("2024-02-01 12:00:00"), 14L, "view", 0.0),
      (4L, ts("2024-02-01 12:00:00"), 400L, "purchase", 1.0)
    ).toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Temporal.timeDecayAttributionOf(ev).collect()
      .map(r => r.getAs[String]("channel") ->
        ((r.getAs[Long]("n_touchpoints"), r.getAs[Long]("cents")))).toMap
    // u1 splits 1000 cents at weights 1000 (click) : 500 (view):
    // click 1000*1000 div 1500 = 666, view 333; u4's view takes all 100
    assert(got == Map(
      "click" -> ((1L, 666L)),
      "view" -> ((2L, 333L + 100L)),
      "direct" -> ((2L, 700L))), s"got $got")

    // real corpus: every purchase's floor-division shares sum to at most
    // its value, and the total shortfall is bounded by one milli-unit
    // per touchpoint (the ledger-residue property of the decay split)
    val rows = Temporal.timeDecayAttribution(spark, sf).collect()
    val totalCents = graft.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")))
      .head.getLong(0)
    val attributed = rows.map(_.getAs[Long]("cents")).sum
    val nTouch = rows.filter(_.getAs[String]("channel") != "direct")
      .map(_.getAs[Long]("n_touchpoints")).sum
    assert(attributed <= totalCents)
    assert(rows.map(_.getAs[String]("channel")).toSet
      .subsetOf(Set("view", "click", "direct")))
    // each touchpoint's floor loses < 1 of its exact share only when the
    // per-purchase residue is < n_touches; globally the gap is < Σtouches
    assert(totalCents - attributed <= nTouch,
      s"shortfall ${totalCents - attributed} exceeds touchpoint count $nTouch")
  }

  test("hourly autocorrelation: +1 on a repeated daily pattern, -1 on a " +
    "reversed one, moments exact") {
    def mk(rows: Seq[(String, Int)]) = rows.zipWithIndex.flatMap {
      case ((h, n), i) => (0 until n).map(j =>
        (1L, ts(h), i * 100L + j, "view", 0.0))
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    // day 0 hours 0,1,2 carry 1,2,3 events; day 1 repeats the pattern
    val repeat = mk(Seq(
      ("2024-01-01 00:10:00", 1), ("2024-01-01 01:10:00", 2),
      ("2024-01-01 02:10:00", 3),
      ("2024-01-02 00:10:00", 1), ("2024-01-02 01:10:00", 2),
      ("2024-01-02 02:10:00", 3)))
    val r1 = Temporal.hourlyAutocorrOf(repeat).head()
    assert(r1.getAs[Long]("n_pairs") == 3L)
    assert(r1.getAs[Long]("cov_num") == 6L)   // 3*14 - 6*6
    assert(r1.getAs[Long]("var_x") == 6L && r1.getAs[Long]("var_y") == 6L)
    assert(math.abs(r1.getAs[Double]("r") - 1.0) < 1e-12)
    // day 1 reverses the pattern -> perfect anti-correlation
    val reversed = mk(Seq(
      ("2024-01-01 00:10:00", 1), ("2024-01-01 01:10:00", 2),
      ("2024-01-01 02:10:00", 3),
      ("2024-01-02 00:10:00", 3), ("2024-01-02 01:10:00", 2),
      ("2024-01-02 02:10:00", 1)))
    val r2 = Temporal.hourlyAutocorrOf(reversed).head()
    assert(r2.getAs[Long]("cov_num") == -6L)
    assert(math.abs(r2.getAs[Double]("r") + 1.0) < 1e-12)
    // real corpus: |r| is a correlation
    val rr = Temporal.hourlyAutocorr(spark, sf).head().getAs[Double]("r")
    assert(rr >= -1.0000001 && rr <= 1.0000001)
  }

  test("CUSUM daily: step shift accumulates exactly, alarms only past " +
    "3x mean, and the real corpus replays the fold bit-for-bit") {
    // scala replica of the registered fold (positive longs: / == div)
    def replay(ns: Seq[Long]): Seq[(Long, Long, Long)] = {
      val mean = ns.sum * 1000 / ns.length
      val slack = mean / 4
      var sp = 0L; var sn = 0L
      ns.map { n =>
        sp = math.max(0L, sp + n * 1000 - mean - slack)
        sn = math.max(0L, sn - n * 1000 + mean - slack)
        (sp, sn, if (sp > mean * 3 || sn > mean * 3) 1L else 0L)
      }
    }
    def mk(uid: Long, counts: Seq[Int]) = counts.zipWithIndex.flatMap {
      case (c, d) => (0 until c).map(j =>
        (uid, ts(f"2024-01-${d + 1}%02d 05:00:00"),
          uid * 100000L + d * 1000L + j, "view", 0.0))
    }
    val df = (mk(0L, Seq(10, 10, 10, 10, 20, 20, 20, 20)) ++
        mk(1L, Seq(1, 1, 1, 1, 1, 1, 100, 100, 100, 100, 100, 100)))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val rows = Temporal.cusumDailyOf(df).collect()
    def series(t: Long) = rows.filter(_.getAs[Long]("tenant_id") == t)
      .sortBy(_.getAs[Any]("day").toString)
    // tenant 0: mean 15000, slack 3750 -> hand-computed ramps, no alarm
    val t0 = series(0L)
    assert(t0.map(_.getAs[Long]("s_pos_milli")).toSeq ==
      Seq(0L, 0, 0, 0, 1250, 2500, 3750, 5000))
    assert(t0.map(_.getAs[Long]("s_neg_milli")).toSeq ==
      Seq(1250L, 2500, 3750, 5000, 0, 0, 0, 0))
    assert(t0.forall(_.getAs[Long]("alarm") == 0L))
    // tenant 1: 1/day then 100/day -- BOTH regimes sit far from the
    // blended mean, so the low tail trips s_neg and the sustained high
    // regime trips s_pos by the end; the replica agrees exactly
    val t1 = series(1L)
    val exp1 = replay(t1.map(_.getAs[Long]("n")).toSeq)
    assert(t1.map(r => (r.getAs[Long]("s_pos_milli"),
      r.getAs[Long]("s_neg_milli"), r.getAs[Long]("alarm"))).toSeq == exp1)
    assert(t1.last.getAs[Long]("alarm") == 1L)
    assert(t1.map(_.getAs[Long]("alarm")).sum > 0)

    // real corpus: replay every tenant's fold from the emitted counts
    val real = Temporal.cusumDaily(spark, sf).collect()
    real.groupBy(_.getAs[Long]("tenant_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Any]("day").toString)
      val exp = replay(sorted.map(_.getAs[Long]("n")).toSeq)
      assert(sorted.map(r => (r.getAs[Long]("s_pos_milli"),
        r.getAs[Long]("s_neg_milli"), r.getAs[Long]("alarm"))).toSeq == exp)
    }
  }

  test("Holt linear trend: ramp series converges toward the true slope, " +
    "decreasing series goes negative, real corpus replays the fold") {
    // scala replica: Long / truncates toward zero, same as Spark div
    def replay(xs: Seq[Long]): Seq[(Long, Long)] = {
      var l = xs.head; var b = 0L
      (l, b) +: xs.tail.map { x =>
        val lNew = (300 * x + 700 * (l + b)) / 1000
        b = (200 * (lNew - l) + 800 * b) / 1000
        l = lNew
        (l, b)
      }
    }
    def mk(uid: Long, cents: Seq[Long]) = cents.zipWithIndex.map {
      case (c, d) => (uid, ts(f"2024-01-${d + 1}%02d 05:00:00"),
        uid * 1000L + d, "view", c.toDouble / 100.0)
    }
    // tenant 0: +1000 cents/day ramp; tenant 1: -500 cents/day decline
    val ramp = (1 to 12).map(i => 10000L + 1000L * i)
    val fall = (1 to 12).map(i => 20000L - 500L * i)
    val df = (mk(0L, ramp) ++ mk(1L, fall))
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val rows = Temporal.holtDailyOf(df).collect()
    def series(t: Long) = rows.filter(_.getAs[Long]("tenant_id") == t)
      .sortBy(_.getAs[Any]("day").toString)
    val t0 = series(0L)
    assert(t0.map(r => (r.getAs[Long]("level"), r.getAs[Long]("trend")))
      .toSeq == replay(ramp))
    // trend locks onto the ramp: positive and growing toward 1000/day
    assert(t0.last.getAs[Long]("trend") > 400L)
    assert(t0.last.getAs[Long]("forecast_next") ==
      t0.last.getAs[Long]("level") + t0.last.getAs[Long]("trend"))
    val t1 = series(1L)
    assert(t1.map(r => (r.getAs[Long]("level"), r.getAs[Long]("trend")))
      .toSeq == replay(fall))
    assert(t1.last.getAs[Long]("trend") < 0L) // negative-trend arm exercised

    // real corpus: replay every tenant from the emitted cents
    val real = Temporal.holtDaily(spark, sf).collect()
    real.groupBy(_.getAs[Long]("tenant_id")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Any]("day").toString)
      val exp = replay(sorted.map(_.getAs[Long]("cents")).toSeq)
      assert(sorted.map(r => (r.getAs[Long]("level"),
        r.getAs[Long]("trend"))).toSeq == exp)
    }
  }

  test("busy islands tile each supplier's intervals: disjoint, ordered, complete") {
    val day = datediff(col("l_shipdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val nIv = graft.Tables.lineitem(spark, sf)
      .select(col("l_suppkey"), day.as("s"),
        (day + lit(3L) + (col("l_quantity").cast("long") % 14L)).as("e"))
      .distinct().count()
    val islands = Temporal.supplierBusyIslands(spark, sf)
    // complete: every distinct interval lands in exactly one island
    assert(islands.agg(sum("n_intervals")).head.getLong(0) == nIv)
    // islands are internally consistent and strictly separated in order
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("suppkey").orderBy("island")
    val bad = islands
      .withColumn("prev_end", lag(col("island_end"), 1).over(w))
      .filter(col("island_start") > col("island_end") ||
        (col("prev_end").isNotNull && col("island_start") <= col("prev_end")))
      .count()
    assert(bad == 0L)
  }

  test("event transitions: per-from rows sum to a proper distribution") {
    val m = Temporal.eventTransitions(spark, sf)
    // every user with k events contributes k-1 transitions
    val ev = graft.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(m.agg(sum("n")).head.getLong(0) == expected)
    // integer per-mille: each from-row <= 1000, each from-group sums into
    // (1000 - |group|, 1000] (floor division loses < 1 per row)
    val grp = m.groupBy("from_type")
      .agg(sum("p_mille").as("pm"), count(lit(1)).as("k"))
      .filter(col("pm") > 1000 || col("pm") <= lit(1000) - col("k"))
    assert(grp.count() == 0L)
  }
}
