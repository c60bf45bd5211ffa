package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expr.Exprs

/** Temporal / ordered-relational operators Spark has no single built-in
  * for — as-of join, range(band) join, sessionization, running windows,
  * rollup — each composed from core operators so Catalyst keeps full
  * visibility (SURVEY.md §2.3 notes the reference itself needs none of
  * these; they extend the engine per the north-star scale mandate).
  *
  * Scale notes are per-operator; the common theme is "one shuffle on the
  * natural key, no driver-side state".
  */
object Temporal {

  /** epoch microseconds of a TIMESTAMP_NTZ column (session TZ is pinned
    * UTC, so the NTZ->LTZ cast is the identity). Integer microseconds
    * make gap/as-of comparisons exact — no float seconds. */
  private def epochUs(ts: Column): Column = unix_micros(ts.cast("timestamp"))

  // -------------------------------------------------------------------
  // As-of join
  // -------------------------------------------------------------------

  /** As-of join via the sorted-union trick: tag build rows 0 / probe rows
    * 1, sort within each key by (ts, tag, id), and carry the last
    * non-null build id forward — every probe row then holds the build row
    * with the greatest ts <= its own (same-ts builds win, matching `<=`;
    * ties on ts resolve to the max build id).
    *
    * This is ONE shuffle on the join key — the same cost as an equi join
    * — versus a naive theta-join's quadratic blowup. At 100 TB both
    * inputs arrive bucketed by key and the window sort is per-bucket.
    *
    * Library surface: probe/build need (key, ts, id); the output is the
    * probe's (key, id, ts) plus asof_id/asof_ts — payload columns from
    * either side are recovered by an equi join on the id (cheap; the id
    * is unique), which keeps the window state to three columns. */
  /** Shared probe/build tagging — the as-of tie-break contract (build
    * rows sort before probes at equal ts; build_id/ts carried for the
    * last-non-null window) lives HERE once, so the plain and segmented
    * forms cannot silently fork semantics. */
  private def asofTagged(probe: DataFrame, build: DataFrame,
                         key: String, ts: String, id: String)
  : (DataFrame, DataFrame) = {
    val tsType = probe.schema(ts).dataType
    (probe.select(
      col(key), col(ts), col(id), lit(1).as("is_probe"),
      lit(null).cast("long").as("build_id"), lit(null).cast(tsType).as("build_ts")),
      build.select(
        col(key), col(ts), col(id), lit(0).as("is_probe"),
        col(id).as("build_id"), col(ts).as("build_ts")))
  }

  def asofJoinOf(probe: DataFrame, build: DataFrame,
                 key: String, ts: String, id: String): DataFrame = {
    val (probeTagged, buildTagged) = asofTagged(probe, build, key, ts, id)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts).asc, col("is_probe").asc, col(id).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    probeTagged.unionByName(buildTagged)
      .withColumn("asof_id", last(col("build_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("build_ts"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
      .select(col(key), col(id), col(ts), col("asof_id"), col("asof_ts"))
  }

  /** Registered form: each purchase event matched to the same user's most
    * recent view/click at-or-before it (the trades/quotes as-of shape). */
  def purchaseAsofBrowse(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    asofJoinOf(
      probe = e.filter(col("event_type") === "purchase"),
      build = e.filter(col("event_type").isin("view", "click")),
      key = "user_id", ts = "ts", id = "event_id")
  }

  /** Skew-proofed as-of join — identical semantics to [[asofJoinOf]], but
    * the per-key window is SEGMENTED into fixed time buckets (a segmented
    * prefix scan, the window analog of [[graft.scale.Scale.saltedCounts]]'s
    * two-phase aggregation): the shuffle key is (key, bucket), so one hot
    * key at 100 TB spreads over its timeline's buckets instead of landing
    * on a single reducer task.
    *
    * Two phases. Phase 1 runs the sorted-union carry-forward WITHIN each
    * (key, bucket) partition. Phase 2 computes the carry-in across bucket
    * boundaries on a bucket-level summary (one row per (key, bucket), the
    * per-bucket max (ts, id) build): the latest preceding non-empty
    * bucket's max is exactly the as-of match for probes that saw no build
    * in their own bucket — builds in earlier buckets always have earlier
    * timestamps, so no tie-break subtlety crosses a boundary. The summary
    * window is per-key but over ~#buckets rows, not events — trivially
    * small at any scale. */
  def asofJoinSaltedOf(probe: DataFrame, build: DataFrame,
                       key: String, ts: String, id: String,
                       bucketSpanSeconds: Long): DataFrame = {
    val spanUs = bucketSpanSeconds * 1000000L
    def bktOf(c: Column): Column =
      ((epochUs(c) - pmod(epochUs(c), lit(spanUs))) / lit(spanUs)).cast("long")
    val (probeTagged, buildTagged) = asofTagged(probe, build, key, ts, id)
    val unioned = probeTagged.unionByName(buildTagged)
      .withColumn("bkt", bktOf(col(ts)))
    val w = Window.partitionBy(col(key), col("bkt"))
      .orderBy(col(ts).asc, col("is_probe").asc, col(id).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = unioned
      .withColumn("asof_id", last(col("build_id"), ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(col("build_ts"), ignoreNulls = true).over(w))
      .filter(col("is_probe") === 1)
    // bucket-level carry: per-bucket max build, then the latest preceding
    // non-empty bucket's max via a summary window (struct ordering gives
    // the (ts, id) max — same tie rule as the in-bucket `last`)
    val bmax = buildTagged.withColumn("bkt", bktOf(col(ts)))
      .groupBy(col(key), col("bkt"))
      .agg(max(struct(col(ts), col(id))).as("m"))
    val cw = Window.partitionBy(col(key)).orderBy(col("bkt").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = unioned.select(col(key), col("bkt")).distinct()
      .join(bmax, Seq(key, "bkt"), "left_outer")
      .withColumn("c", last(col("m"), ignoreNulls = true).over(cw))
      .select(col(key), col("bkt"),
        col(s"c.$id").as("carry_id"), col(s"c.$ts").as("carry_ts"))
    within.join(carry, Seq(key, "bkt"), "left_outer")
      .select(col(key), col(id), col(ts),
        coalesce(col("asof_id"), col("carry_id")).as("asof_id"),
        coalesce(col("asof_ts"), col("carry_ts")).as("asof_ts"))
  }

  /** Registered form: [[purchaseAsofBrowse]] through the segmented plan
    * (daily buckets) — same oracle, different (skew-proof) shuffle. */
  def purchaseAsofBrowseSalted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    asofJoinSaltedOf(
      probe = e.filter(col("event_type") === "purchase"),
      build = e.filter(col("event_type").isin("view", "click")),
      key = "user_id", ts = "ts", id = "event_id",
      bucketSpanSeconds = 86400L)
  }

  /** Tolerance-bounded as-of: like [[asofJoinOf]] but a match older than
    * `toleranceSeconds` is nulled out (the "quote must be fresh" form —
    * the nearest candidate is the only possible match, so a post-filter
    * on its age is exact). Same one-shuffle plan. */
  def asofJoinWithinOf(probe: DataFrame, build: DataFrame,
                       key: String, ts: String, id: String,
                       toleranceSeconds: Long): DataFrame = {
    val fresh = epochUs(col(ts)) - epochUs(col("asof_ts")) <=
      toleranceSeconds * 1000000L
    asofJoinOf(probe, build, key, ts, id)
      .select(col(key), col(id), col(ts),
        when(fresh, col("asof_id")).as("asof_id"),
        when(fresh, col("asof_ts")).as("asof_ts"))
  }

  /** Tolerance-bounded form of the SEGMENTED as-of: the freshness
    * post-filter is plan-agnostic (the nearest candidate is the only
    * possible match either way), so it composes over the skew-proof
    * variant unchanged. */
  def asofJoinWithinSaltedOf(probe: DataFrame, build: DataFrame,
                             key: String, ts: String, id: String,
                             toleranceSeconds: Long,
                             bucketSpanSeconds: Long): DataFrame = {
    val fresh = epochUs(col(ts)) - epochUs(col("asof_ts")) <=
      toleranceSeconds * 1000000L
    asofJoinSaltedOf(probe, build, key, ts, id, bucketSpanSeconds)
      .select(col(key), col(id), col(ts),
        when(fresh, col("asof_id")).as("asof_id"),
        when(fresh, col("asof_ts")).as("asof_ts"))
  }

  /** Registered form: [[purchaseAsofFresh]] through the segmented plan. */
  def purchaseAsofFreshSalted(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    asofJoinWithinSaltedOf(
      probe = e.filter(col("event_type") === "purchase"),
      build = e.filter(col("event_type").isin("view", "click")),
      key = "user_id", ts = "ts", id = "event_id",
      toleranceSeconds = 1800L, bucketSpanSeconds = 86400L)
  }

  /** Registered form: purchases only count a browse within 30 minutes. */
  def purchaseAsofFresh(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    asofJoinWithinOf(
      probe = e.filter(col("event_type") === "purchase"),
      build = e.filter(col("event_type").isin("view", "click")),
      key = "user_id", ts = "ts", id = "event_id",
      toleranceSeconds = 1800L)
  }

  // -------------------------------------------------------------------
  // Range (band) join
  // -------------------------------------------------------------------

  /** Price bands [900+10*b, 900+10*(b+1)) over part.p_retailprice. */
  private val bandEdges: Seq[(Int, Double, Double)] =
    (0 until 10).map(b => (b, 900.0 + 10 * b, 910.0 + 10 * b))

  /** Range join against a broadcast band table: fact rows land in the
    * band whose [lo, hi) interval contains them. The dimension side is
    * bounded and broadcast, so the fact table never shuffles for the
    * join itself — only for the per-band aggregate. At 100 TB with a big
    * interval table you'd bucket both sides on a quantized interval key
    * first (turning it into an equi join + residual predicate). */
  def priceBandStats(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    val bands = bandEdges.toDF("band_id", "lo", "hi")
    Tables.part(spark, dir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band_id", "lo", "hi")
      .agg(count(lit(1)).as("n_parts"),
        Exprs.moneyAvg(col("p_retailprice")).as("avg_price"))
  }

  // -------------------------------------------------------------------
  // Interval-overlap join (banded)
  // -------------------------------------------------------------------

  /** 30-day band width for [[intervalOverlapOf]]. Intervals here span at
    * most 17 days, so each explodes into ≤ 2 bands. */
  val OverlapBandDays = 30L

  /** Pairs of same-key intervals that overlap in time — the temporal
    * complement of the as-of join (t1: nearest point; t14: shared span).
    *
    * Overlap is not an equi predicate, so the naive plan is a per-key
    * cartesian. Banding restores the equi shape: each interval explodes
    * into the `OverlapBandDays`-day buckets it covers, the pair search
    * becomes an equi-join on (key, band) + the exact overlap residual
    * `a.s <= b.e && b.s <= a.e`, and a distinct collapses pairs that
    * meet in several bands. Band width trades row duplication against
    * per-band block volume — the same knob as the ER blocker's prefix
    * length; the per-key grouping bounds block size on top.
    *
    * Input `iv`: (key, s, e) integer-day intervals, pre-deduplicated
    * (the pair identity is the interval VALUE pair, ordered (s, e)
    * lexicographically a < b, so self-pairs and double counting are
    * excluded). Output: one row per overlapping pair. */
  def intervalOverlapOf(iv: DataFrame): DataFrame = {
    val banded = iv.select(col("key"), col("s"), col("e"),
      explode(sequence(expr(s"s div $OverlapBandDays"),
        expr(s"e div $OverlapBandDays"))).as("band"))
    val a = banded.select(col("key"), col("band"),
      col("s").as("a_s"), col("e").as("a_e"))
    val b = banded.select(col("key"), col("band"),
      col("s").as("b_s"), col("e").as("b_e"))
    a.join(b, Seq("key", "band"))
      .filter(col("a_s") <= col("b_e") && col("b_s") <= col("a_e") &&
        (col("a_s") < col("b_s") ||
          (col("a_s") === col("b_s") && col("a_e") < col("b_e"))))
      .select("key", "a_s", "a_e", "b_s", "b_e")
      .distinct()
  }

  /** T14 — supplier shipment-window concurrency: each distinct lineitem
    * shipment opens a handling window [ship_day, ship_day + 3 + qty%14]
    * (integer epoch days — engine-portable date arithmetic); the count
    * of overlapping same-supplier window pairs measures how much of the
    * supplier's book is in flight simultaneously. */
  def supplierShipmentOverlaps(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("l_shipdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val iv = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("key"), day.as("s"),
        (day + lit(3L) + (col("l_quantity").cast("long") % 14L)).as("e"))
      .distinct()
    intervalOverlapOf(iv)
      .groupBy(col("key").as("suppkey"))
      .agg(count(lit(1)).as("n_overlaps"))
      .select("suppkey", "n_overlaps")
  }

  /** T18 — dwell-time distribution: the gap (seconds) between each
    * event and the user's previous event, summarized per event type —
    * exact count, mean (integer milli), and interpolated median/p90
    * over integer seconds (the a17/o8 percentile convention, so both
    * engines agree bit-for-bit). The engagement-latency view behind
    * session-gap tuning: t3's 30-minute threshold is a parameter; this
    * is the distribution that justifies it. One lag window on the
    * user's timeline, one bounded aggregate per type. */
  def dwellTimes(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .filter(col("prev_ts").isNotNull)
      .select(col("event_type"),
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")))
          .as("gap_s"))
    gaps.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        expr("sum(gap_s) * 1000 div count(1)").as("mean_milli_s"),
        percentile(col("gap_s"), lit(0.5)).as("p50_s"),
        percentile(col("gap_s"), lit(0.9)).as("p90_s"))
  }

  /** A24 — hourly anomaly screen over the gap-filled per-tenant series
    * (composes t10): each hour compares against the sum of its trailing
    * 24 FULL hours — gap-filling first is what makes a 24-ROW frame
    * mean 24 HOURS, and what lets a silent hour (n = 0 after an outage)
    * register as a drop at all. Flags in exact integer cross-products
    * (spike: n > 2× trailing mean; drop: n < half): the monitoring
    * operator behind the reference dashboard's stall detection
    * (monitoring/dashboard.py's stalled-job queries), made windowed.
    * One extra bounded window over the already-shuffled hourly frame. */
  def hourlyAnomalies(spark: SparkSession, dir: String): DataFrame = {
    val hourly = gapfillHourly(spark, dir)
    val w = Window.partitionBy(col("tenant_id")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    hourly
      .withColumn("prev_sum", sum(col("n")).over(w))
      .withColumn("prev_cnt", count(col("n")).over(w))
      .filter(col("prev_cnt") === 24)
      .select(col("tenant_id"), col("hour"), col("n"), col("prev_sum"),
        (col("n") * 24 > col("prev_sum") * 2).as("is_spike"),
        (col("n") * 48 < col("prev_sum")).as("is_drop"))
  }

  /** T17 — last-touch channel attribution: every purchase's value is
    * credited to the channel (event type) of the as-of preceding browse
    * event; purchases with no preceding browse are 'direct'. The
    * composed form of the as-of join — the marketing/causal question
    * the reference's timeline retriever answers per case
    * (smart_field_retriever.py's latest-event-before lookups), asked of
    * the whole corpus and rolled up.
    *
    * Plan: the as-of join is t1's union-window pass (one shuffle on
    * user_id); the channel lookup joins back on the attributed event id
    * (hash join on a unique key); values sum in exact integer cents.
    * The rollup output is |channels|+1 rows regardless of scale. */
  def channelAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val asof = purchaseAsofBrowse(spark, dir)
    val purchaseValue = ev.select(col("event_id"),
      expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
    val channel = ev.select(col("event_id").as("asof_id"),
      col("event_type").as("ch"))
    asof.join(purchaseValue, "event_id")
      .join(channel, Seq("asof_id"), "left")
      .groupBy(coalesce(col("ch"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("cents")).as("cents"))
  }

  /** T20 — time-decay multi-touch attribution, completing the
    * attribution family: where t17 hands each purchase wholly to its
    * LAST touch, this splits the purchase value across EVERY view/click
    * in the trailing 30 days, weighted by recency — the multi-touch
    * model marketing analytics actually reports next to last-touch.
    *
    * Decay is the exact-integer stepwise form: weight halves per full
    * 7 days of age, `decay_milli = 1000 div 2^(days div 7)` (1000, 500,
    * 250, 125, 62 — the exponent is bounded by the 30-day window), and
    * each purchase's cents split as `cents · w_i div Σw` — floor
    * division on non-negative operands, so every share replays
    * bit-for-bit in the oracle (rounding residue stays with the house,
    * the standard ledger convention). Purchases with no touch in the
    * window fall to 'direct', exactly as t17's coalesce does.
    *
    * Scale shape: one equi-join of purchases against touches on
    * user_id with the 30-day band predicate — per-user pair volume is
    * bounded by (touches × purchases) inside a 30-day window, the same
    * bounded-band argument as t14; a pathological single user would get
    * the t1b/t3b salted-segment treatment. The per-purchase normalizer
    * is a window keyed by purchase event_id (state bounded by one
    * purchase's touches), then one grouped sum per channel. */
  def timeDecayAttribution(spark: SparkSession, dir: String): DataFrame =
    timeDecayAttributionOf(Tables.events(spark, dir))

  /** Library form over any (user_id, ts, event_id, event_type, value)
    * event frame. */
  def timeDecayAttributionOf(ev: DataFrame): DataFrame = {
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("ts").as("t_ts"),
        col("event_type").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id"),
        expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("cents"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter(col("t_ts") <= col("p_ts") &&
        col("t_ts") > col("p_ts") - expr("INTERVAL 30 DAYS"))
      .withColumn("days",
        datediff(col("p_ts").cast("date"), col("t_ts").cast("date")))
      .withColumn("decay_milli",
        expr("1000 div shiftleft(1, CAST(days div 7 AS INT))").cast("long"))
    val w = Window.partitionBy(col("event_id"))
    val attributed = pairs
      .withColumn("total_decay", sum(col("decay_milli")).over(w))
      .select(col("channel"),
        expr("cents * decay_milli div total_decay").as("attr_cents"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_touchpoints"),
        sum(col("attr_cents")).as("cents"))
    val direct = purchases
      .join(pairs.select("event_id").distinct(), Seq("event_id"), "left_anti")
      .agg(count(lit(1)).as("n_touchpoints"), sum(col("cents")).as("cents"))
      .select(lit("direct").as("channel"), col("n_touchpoints"), col("cents"))
      .filter(col("n_touchpoints") > 0)
    attributed.unionByName(direct)
  }

  /** T21 — seasonality detection: Pearson autocorrelation of the hourly
    * event-count series at a one-day lag. The number that says whether
    * the traffic has a daily rhythm (r → 1), is patternless (r → 0), or
    * anti-cycles — the check a capacity planner or anomaly-threshold
    * owner (a24's trailing windows assume daily seasonality) runs
    * BEFORE trusting a daily model. Hours with no events pair only
    * where both lagged hours exist (inner join on the hour grid).
    *
    * Exactness: the moment sums and the three Pearson building blocks
    * (n·Σxy − ΣxΣy and the two variance terms) are exact longs; `r` is
    * the single double, computed from exact operands in the same
    * expression order in both engines (the embedding-cosine idiom).
    *
    * Scale shape: one map-side-combined grouped count onto the bounded
    * hour grid, one co-partitioned self-join shifted by the lag, one
    * scalar aggregate — series length is time-bounded, independent of
    * corpus size. */
  def hourlyAutocorrOf(ev: DataFrame, lag: Int = 24): DataFrame = {
    val hours = ev
      .select(expr(
        "unix_micros(CAST(ts AS TIMESTAMP)) div 3600000000").as("h"))
      .groupBy("h").agg(count(lit(1)).as("n"))
    val a = hours.select(col("h"), col("n").as("x"))
    val b = hours.select((col("h") - lag).as("h"), col("n").as("y"))
    a.join(b, "h")
      .agg(count(lit(1)).as("n_pairs"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(expr("x * y")).as("sxy"),
        sum(expr("x * x")).as("sxx"), sum(expr("y * y")).as("syy"))
      .select(lit(lag.toLong).as("lag_hours"), col("n_pairs"),
        expr("n_pairs * sxy - sx * sy").as("cov_num"),
        expr("n_pairs * sxx - sx * sx").as("var_x"),
        expr("n_pairs * syy - sy * sy").as("var_y"))
      .withColumn("r", expr("CAST(cov_num AS DOUBLE) / " +
        "(sqrt(CAST(var_x AS DOUBLE)) * sqrt(CAST(var_y AS DOUBLE)))"))
  }

  def hourlyAutocorr(spark: SparkSession, dir: String): DataFrame =
    hourlyAutocorrOf(Tables.events(spark, dir))

  /** T22 — CUSUM changepoint detection on each tenant's daily event
    * counts: the classic two-sided tabular CUSUM. Against the tenant's
    * own long-run mean μ (milli), with slack k = μ/4, accumulate
    * S⁺ₜ = max(0, S⁺ₜ₋₁ + xₜ − μ − k) and S⁻ₜ = max(0, S⁻ₜ₋₁ − xₜ + μ − k);
    * a day alarms when either side exceeds h = 3μ. Where a24's trailing
    * windows flag single-hour SPIKES, CUSUM accumulates small SUSTAINED
    * level shifts (a feed silently halving, a tenant ramping) long
    * before any one day looks anomalous — the standard drift alarm on
    * an ingest dashboard.
    *
    * Exactness: counts and μ are exact longs (one floor division on
    * non-negative operands); the fold is pure long arithmetic, replayed
    * by a recursive CTE in the oracle (the t12 EWMA idiom).
    *
    * Scale shape: one map-side-combined (tenant, day) count, one
    * broadcast join of the bounded per-tenant means, then the sorted
    * per-tenant fold over a TIME-BOUNDED series (days, not rows) — the
    * series length is independent of corpus size, and tenants
    * parallelize. */
  def cusumDailyOf(ev: DataFrame): DataFrame = {
    val daily = ev.groupBy((col("user_id") % 4).as("tenant_id"),
        date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("tenant_id")
      .agg(expr("sum(n) * 1000 div count(1)").as("mean_milli"))
    val packed = daily.join(broadcast(stats), "tenant_id")
      .groupBy("tenant_id", "mean_milli")
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("xs"))
    packed
      .select(col("tenant_id"), col("mean_milli"), explode(expr(
        """aggregate(xs,
          |  CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, n: BIGINT,
          |                               s_pos: BIGINT, s_neg: BIGINT>>),
          |  (acc, x) -> array_append(acc, struct(x.day AS day, x.n AS n,
          |    greatest(0L,
          |      (CASE WHEN size(acc) = 0 THEN 0L
          |            ELSE element_at(acc, -1).s_pos END)
          |      + x.n * 1000 - mean_milli - mean_milli div 4) AS s_pos,
          |    greatest(0L,
          |      (CASE WHEN size(acc) = 0 THEN 0L
          |            ELSE element_at(acc, -1).s_neg END)
          |      - x.n * 1000 + mean_milli - mean_milli div 4) AS s_neg)))"""
          .stripMargin)).as("y"))
      .select(col("tenant_id"), col("y.day").as("day"), col("y.n").as("n"),
        col("y.s_pos").as("s_pos_milli"), col("y.s_neg").as("s_neg_milli"),
        expr("CAST(y.s_pos > mean_milli * 3 OR y.s_neg > mean_milli * 3" +
          " AS BIGINT)").as("alarm"))
  }

  def cusumDaily(spark: SparkSession, dir: String): DataFrame =
    cusumDailyOf(Tables.events(spark, dir))

  /** T23 — Holt's LINEAR-TREND smoothing of each tenant's daily spend
    * (α=0.3 level, β=0.2 trend, both in milli): where t12's EWMA tracks
    * a level only (and lags every ramp), Holt carries an explicit trend
    * term, so the one-step forecast `level + trend` stays on a steadily
    * growing or shrinking series — the capacity-planning forecast next
    * to the EWMA dashboard line.
    *
    * Exactness: the recurrences are integer, with the truncating
    * division both engines share (Spark `div` and DuckDB `//` both
    * round toward zero, including on the negative trend operands —
    * verified, not assumed). l₁ = x₁, b₁ = 0; the new level expression
    * is repeated inside the trend update because a fold struct cannot
    * reference its sibling field.
    *
    * Scale shape: identical to t12 — a bounded per-tenant sorted fold
    * over a TIME-bounded daily series. */
  def holtDailyOf(ev: DataFrame): DataFrame = {
    val daily = ev
      .groupBy((col("user_id") % 4).as("tenant_id"),
        date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        * 100).cast("long").as("cents"))
    val packed = daily.groupBy("tenant_id")
      .agg(array_sort(collect_list(struct(col("day"), col("cents")))).as("xs"))
    val lNew = "(300 * x.cents + 700 * (element_at(acc, -1).l" +
      " + element_at(acc, -1).b)) div 1000"
    packed
      .select(col("tenant_id"), explode(expr(
        s"""aggregate(xs,
          |  CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, cents: BIGINT,
          |                               l: BIGINT, b: BIGINT>>),
          |  (acc, x) -> array_append(acc, struct(x.day AS day,
          |    x.cents AS cents,
          |    CASE WHEN size(acc) = 0 THEN x.cents
          |         ELSE $lNew END AS l,
          |    CASE WHEN size(acc) = 0 THEN 0L
          |         ELSE (200 * (($lNew) - element_at(acc, -1).l)
          |               + 800 * element_at(acc, -1).b) div 1000
          |    END AS b)))""".stripMargin)).as("y"))
      .select(col("tenant_id"), col("y.day").as("day"),
        col("y.cents").as("cents"), col("y.l").as("level"),
        col("y.b").as("trend"),
        (col("y.l") + col("y.b")).as("forecast_next"))
  }

  def holtDaily(spark: SparkSession, dir: String): DataFrame =
    holtDailyOf(Tables.events(spark, dir))

  /** T15 — interval coalescing (gaps-and-islands): merge each supplier's
    * overlapping/touching shipment windows (the same [s, e] intervals as
    * t14) into maximal busy islands. The dual of t14's pair count: t14
    * measures HOW MUCH overlap, t15 reduces the book to its disjoint
    * span cover — the canonical warehouse question "when was this
    * supplier continuously busy, and how many shipments piled into each
    * stretch".
    *
    * Plan: one shuffle on the interval key, then two windows over the
    * per-key sorted intervals — (1) an island-open flag where the
    * interval's start clears the running max end of all earlier
    * intervals, (2) a running sum of flags numbering the islands —
    * followed by one map-side-combined groupBy. Per-key row counts are
    * bounded (a supplier's shipment count), so window state never
    * exceeds one key's intervals; no global sort, no cross product —
    * this is the shape that holds at 100 TB where t14's pair join is
    * quadratic in the worst island. */
  def supplierBusyIslands(spark: SparkSession, dir: String): DataFrame = {
    val day = datediff(col("l_shipdate").cast("date"),
      lit("1970-01-01").cast("date")).cast("long")
    val iv = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("key"), day.as("s"),
        (day + lit(3L) + (col("l_quantity").cast("long") % 14L)).as("e"))
      .distinct()
    busyIslandsOf(iv).withColumnRenamed("key", "suppkey")
  }

  /** DataFrame form of t15: coalesce (key, s, e) integer intervals into
    * maximal islands (touching endpoints merge — the interval model is
    * closed). Input must be pre-deduplicated if duplicate intervals
    * should count once. */
  def busyIslandsOf(iv: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("key")).orderBy(col("s"), col("e"))
    val prevMaxE = max(col("e"))
      .over(ord.rowsBetween(Window.unboundedPreceding, -1))
    iv.withColumn("opens",
        when(prevMaxE.isNull || col("s") > prevMaxE, 1L).otherwise(0L))
      .withColumn("island", sum(col("opens")).over(ord))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("island_start"), max(col("e")).as("island_end"),
        count(lit(1)).as("n_intervals"))
  }

  /** T16 — first-order transition mining over each user's event
    * sequence: the Markov matrix (from_type, to_type, n, p_mille) of
    * consecutive event-type pairs, ordered by (ts, event_id) within
    * user. The sequence-analytics primitive behind funnel discovery and
    * next-action models, and the reference's status-progression question
    * (proclaim/status_detector.py's ordered status history) asked of the
    * whole corpus at once.
    *
    * Plan: one window (lead) partitioned by the high-cardinality
    * user_id, then a groupBy over the tiny (type x type) domain with
    * map-side combine; the per-mille normalization is a window over the
    * aggregated matrix only (|types|^2 rows), never over the events.
    * Integer fixed-point throughout so the oracle replays exactly. */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    val m = pairs.groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    m.withColumn("p_mille",
      expr("n * 1000 div sum(n) OVER (PARTITION BY from_type)"))
  }

  // -------------------------------------------------------------------
  // Sessionization
  // -------------------------------------------------------------------

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapSeconds`. lag -> flag -> running sum
    * (the session index) -> per-session aggregate; one shuffle on
    * user_id, all window work per-key. This is the batch twin of
    * streaming session windows (Structured Streaming's
    * session_window() / flatMapGroupsWithState path). */
  def sessionizeOf(events: DataFrame, gapSeconds: Long): DataFrame = {
    val order = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val flagged = events
      .select(col("user_id"), col("ts"), col("event_id"), epochUs(col("ts")).as("us"))
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapSeconds * 1000000L, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("is_new")).over(order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy("user_id", "session_idx")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000L).cast("long").as("duration_s"))
  }

  def userSessions(spark: SparkSession, dir: String): DataFrame =
    sessionizeOf(Tables.events(spark, dir), gapSeconds = 1800L)

  /** Skew-proofed sessionization — identical semantics to [[sessionizeOf]]
    * via the same segmentation as [[asofJoinSaltedOf]]: sessionize WITHIN
    * (key, bucket) partitions, then stitch sessions across bucket
    * boundaries on the bucket summary. A boundary session merges when the
    * gap from the previous non-empty bucket's last event to this bucket's
    * first is within the threshold; each bucket then contributes
    * (n_sessions − merged) new session starts, and a prefix sum over the
    * summary renumbers globally: global = offset − merged + within_idx.
    * The final per-session aggregate groups by (key, global), which
    * merges the spanning sessions' halves exactly. Events shuffle on
    * (key, bucket) — never on the bare hot key. */
  def sessionizeSaltedOf(events: DataFrame, gapSeconds: Long,
                         bucketSpanSeconds: Long): DataFrame = {
    val gapUs = gapSeconds * 1000000L
    val spanUs = bucketSpanSeconds * 1000000L
    val us = epochUs(col("ts"))
    val base = events.select(
      col("user_id"), col("ts"), col("event_id"), us.as("us"),
      ((us - pmod(us, lit(spanUs))) / lit(spanUs)).cast("long").as("bkt"))
    val order = Window.partitionBy(col("user_id"), col("bkt"))
      .orderBy(col("ts").asc, col("event_id").asc)
    // The flagged frame feeds BOTH the bucket summary and the final join;
    // Spark recomputes the window subtree for each consumer. Measured at
    // bench scale a persist() buys nothing (the window is not the cost),
    // and at 100 TB caching a corpus-sized intermediate is a memory
    // liability while the recompute is two pushed, column-pruned scans —
    // so the plan deliberately recomputes.
    val flagged = base
      .withColumn("prev_us", lag(col("us"), 1).over(order))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          col("us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("s_within", sum(col("is_new")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sw = Window.partitionBy(col("user_id")).orderBy(col("bkt").asc)
    val offsets = flagged
      .groupBy(col("user_id"), col("bkt"))
      .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"),
        max(col("s_within")).as("n_sessions"))
      .withColumn("prev_last_us", lag(col("last_us"), 1).over(sw))
      .withColumn("merged",
        when(col("prev_last_us").isNotNull &&
          col("first_us") - col("prev_last_us") <= gapUs, 1L).otherwise(0L))
      .withColumn("offset", coalesce(
        sum(col("n_sessions") - col("merged"))
          .over(sw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("bkt"), col("merged"), col("offset"))
    flagged.join(offsets, Seq("user_id", "bkt"))
      .withColumn("session_idx", col("offset") - col("merged") + col("s_within"))
      .groupBy("user_id", "session_idx")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        ((max(col("us")) - min(col("us"))) / 1000000L).cast("long").as("duration_s"))
  }

  /** Registered form: [[userSessions]] through the segmented plan. */
  def userSessionsSalted(spark: SparkSession, dir: String): DataFrame =
    sessionizeSaltedOf(Tables.events(spark, dir),
      gapSeconds = 1800L, bucketSpanSeconds = 86400L)

  // -------------------------------------------------------------------
  // Running totals / lead-lag frames
  // -------------------------------------------------------------------

  /** Per-customer order timeline: running spend (decimal-exact cumulative
    * sum), previous/next order dates, days since previous. Covers
    * rowsBetween frames + lag/lead, which the reference never uses but
    * any dashboard successor would (SURVEY.md §2.5 "absent" list). */
  def customerRunningSpend(spark: SparkSession, dir: String): DataFrame = {
    val order = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val running = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(18,2)")).over(running)
          .cast("double"))
      .withColumn("order_seq", row_number().over(order))
      .withColumn("prev_date", lag(col("o_orderdate"), 1).over(order))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(order))
      .withColumn("days_since_prev",
        datediff(col("o_orderdate"), col("prev_date")).cast("long"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "order_seq",
        "running_spend", "prev_date", "next_date", "days_since_prev")
  }

  // -------------------------------------------------------------------
  // Funnel
  // -------------------------------------------------------------------

  /** Ordered conversion funnel over the event stream: a user reaches
    * stage i when the stages' event types occur at STRICTLY increasing
    * timestamps in order (a same-microsecond next-stage event does not
    * count — the rule needs no tie-break and is engine-portable).
    * Output is one row per stage with the user count and milli
    * conversion rate vs stage 1.
    *
    * Scale shape: filter to funnel event types at the scan, ONE shuffle
    * grouping by user (per-user partitions bounded by per-user funnel
    * activity, as in [[sessionizeOf]]), then the stage walk is a narrow
    * per-row array fold: sort the user's events once and fold a
    * (stage, stage_ts) accumulator over them — the earliest qualifying
    * event advances the stage exactly like the min-chain definition,
    * whatever the scan order of ties. The final stage histogram is a
    * handful of rows. No window anywhere; a `lag`-window formulation
    * would re-sort per user AND pay the window machinery for a single
    * linear scan. */
  def funnelOf(events: DataFrame, stages: Seq[String]): DataFrame = {
    val n = stages.size
    val stageArr = array(stages.map(lit): _*)
    val perUser = events
      .filter(col("event_type").isin(stages: _*))
      .select(col("user_id"),
        struct(epochUs(col("ts")).as("t"), col("event_id").as("eid"),
          col("event_type").as("et")).as("e"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(col("e"))).as("evs"))
      .select(col("user_id"),
        aggregate(col("evs"),
          struct(lit(0).as("s"), lit(Long.MinValue).as("st")),
          (acc, e) => when(
            acc.getField("s") < n &&
              e.getField("et") ===
                element_at(stageArr, acc.getField("s") + 1) &&
              e.getField("t") > acc.getField("st"),
            struct((acc.getField("s") + 1).as("s"),
              e.getField("t").as("st"))).otherwise(acc),
          acc => acc.getField("s")).as("stage_reached"))
    val hist = perUser.filter(col("stage_reached") >= 1)
      .select(explode(sequence(lit(1), col("stage_reached"))).as("stage_idx"))
      .groupBy("stage_idx").agg(count(lit(1)).as("n_users"))
    val first = hist.filter(col("stage_idx") === 1)
      .select(col("n_users").as("n_first"))
    hist.crossJoin(broadcast(first))
      .select(col("stage_idx"),
        element_at(stageArr, col("stage_idx")).as("stage"),
        col("n_users"),
        expr("n_users * 1000 div n_first").as("conv_milli"))
  }

  def purchaseFunnel(spark: SparkSession, dir: String): DataFrame =
    funnelOf(Tables.events(spark, dir), Seq("view", "click", "purchase"))

  /** Cohort retention matrix: users grouped by first-active day (epoch
    * day index — integer throughout, so every cell replays exactly in
    * any engine), each later active day counted at its day offset, and
    * the cell normalized by cohort size in milli. The
    * engagement-analysis twin of the funnel: same event stream, same
    * one-shuffle discipline.
    *
    * Scale shape: ONE shuffle of (user, day) pairs builds both the
    * cohort assignment and the active-day set per user
    * (`collect_set(day)` — per-user state bounded by distinct active
    * days, the same bound sessionization carries); offsets explode
    * narrowly from that array, and the matrix/cohort-size aggregates
    * are bounded by days × offsets, broadcast-joined at the end. The
    * alternative (distinct + self-join on user) pays three exchanges of
    * the event-day stream; this pays one. */
  def cohortRetentionOf(events: DataFrame): DataFrame = {
    val perUser = events
      .select(col("user_id"),
        expr(s"${unixMicrosSql("ts")} div 86400000000").as("day"))
      .groupBy("user_id")
      .agg(min(col("day")).as("cohort_day"), collect_set(col("day")).as("ds"))
    val offsets = perUser
      .select(col("cohort_day"), explode(col("ds")).as("day"))
      .select(col("cohort_day"),
        (col("day") - col("cohort_day")).cast("int").as("day_offset"))
    val sizes = perUser.groupBy("cohort_day")
      .agg(count(lit(1)).as("cohort_size"))
    offsets.groupBy("cohort_day", "day_offset")
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_day")
      .select(col("cohort_day"), col("day_offset"), col("n_active"),
        col("cohort_size"),
        expr("n_active * 1000 div cohort_size").as("retention_milli"))
  }

  private def unixMicrosSql(tsCol: String): String =
    s"unix_micros(CAST($tsCol AS TIMESTAMP))"

  def cohortRetention(spark: SparkSession, dir: String): DataFrame =
    cohortRetentionOf(Tables.events(spark, dir))

  // -------------------------------------------------------------------
  // Rollup
  // -------------------------------------------------------------------

  /** Status x priority rollup: subtotals at (status, priority), (status),
    * and grand-total levels in one pass (partial aggregation handles the
    * level expansion map-side). Subtotal cells are labeled 'ALL' via
    * grouping() — not coalesce — so a genuine NULL grouping value (legal
    * if the data contract ever allows it) stays distinguishable from a
    * rollup subtotal row. */
  def statusPriorityRollup(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .rollup("o_orderstatus", "o_orderpriority")
      // grouping() only resolves inside the Aggregate itself, so the flags
      // are computed here and consumed (then dropped) one select later.
      .agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_priority"),
        count(lit(1)).as("n"),
        Exprs.moneySum(col("o_totalprice")).as("total_spend"))
      .select(
        when(col("g_status") === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("g_priority") === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total_spend"))

  /** T5b — the CUBE twin of [[statusPriorityRollup]]: all four grouping
    * levels in one pass, adding the (priority-only) subtotals ROLLUP's
    * hierarchy omits. Same single-aggregate plan; the level expansion is
    * map-side like the rollup's. */
  def statusPriorityCube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(
        grouping(col("o_orderstatus")).as("g_status"),
        grouping(col("o_orderpriority")).as("g_priority"),
        count(lit(1)).as("n"),
        Exprs.moneySum(col("o_totalprice")).as("total_spend"))
      .select(
        when(col("g_status") === 1, lit("ALL"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("g_priority") === 1, lit("ALL"))
          .otherwise(col("o_orderpriority")).as("priority"),
        col("n"), col("total_spend"))

  // -------------------------------------------------------------------
  // Gap filling / resampling
  // -------------------------------------------------------------------

  /** T10 — time-series gap fill: per-tenant hourly event counts with an
    * EXPLICIT zero row for every empty hour between the corpus's first
    * and last hour — the resample step every charting layer and
    * forecasting model needs (sparse group-by output hides gaps; models
    * read "missing" as "no data", not "zero").
    *
    * Scale design: the dense grid is tenants × hours — hours are bounded
    * by calendar time (a constant per deployment), so the explode is
    * linear in tenant count, never in events. Global [min, max] is one
    * scan-and-reduce broadcast as a 1-row anchor (same pattern as the
    * dashboard's max_ts); the fill join is one hash shuffle on
    * (tenant, hour) against the already-aggregated (small) counts. */
  def gapfillHourly(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
      .select((col("user_id") % 4).as("tenant_id"),
        date_trunc("hour", col("ts")).as("hour"))
    val counts = e.groupBy("tenant_id", "hour").agg(count(lit(1)).as("n"))
    val bounds = e.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
    val grid = e.select("tenant_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("tenant_id"),
        explode(sequence(col("h0"), col("h1"),
          expr("INTERVAL 1 HOUR"))).as("hour"))
    grid.join(counts, Seq("tenant_id", "hour"), "left")
      .select(col("tenant_id"), col("hour"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** T13 — trailing-30-day spend per customer: a RANGE frame (value-based
    * bounds over integer epoch days), the complement of T4's ROWS frame —
    * RANGE windows include ALL rows whose key falls in the interval, so
    * same-day orders aggregate together and sparse histories weight by
    * calendar distance, not row position. Exact decimal cents keep the
    * frame sums engine-portable. One shuffle on the customer key. */
  def trailing30dSpend(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("day"))
      .rangeBetween(-29, Window.currentRow)
    Tables.orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        expr(s"${unixMicrosSql("o_orderdate")} div 86400000000").as("day"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(12, 2))
          * 100).cast("long").as("cents"))
      .withColumn("trailing_30d_cents", sum(col("cents")).over(w))
      .select("o_custkey", "o_orderkey", "o_orderdate", "cents",
        "trailing_30d_cents")
  }

  // -------------------------------------------------------------------
  // Dimension versioning (SCD type 2)
  // -------------------------------------------------------------------

  /** T11 — SCD-2 history build: collapse each user's event stream into
    * versioned rows with [valid_from, valid_to) intervals — a new version
    * opens whenever event_type changes; the open version has NULL
    * valid_to and is_current = true. The standard slowly-changing-
    * dimension shape every warehouse mirror keeps (the reference keeps
    * only latest state + high watermark; this is the full history twin).
    *
    * Scale design: two windows, both partitioned by the high-cardinality
    * user_id — the change-flag pass sorts each user's events once, the
    * interval pass runs over the (much smaller) version rows only.
    * (ts, event_id) makes the order total, so versions are deterministic
    * under ties. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val versions = Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
    val wv = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    versions
      .withColumn("valid_to", lead(col("ts"), 1).over(wv))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
  }

  /** T12 — EWMA smoothing of the per-tenant daily value series in exact
    * integer arithmetic: e_1 = x_1; e_t = (300·x_t + 700·e_{t-1}) div
    * 1000 over cents (α = 0.3). The recursion is inherently sequential
    * along each series, so it runs as ONE ordered aggregate() fold over
    * the tenant's collected daily array — no self-join chain, no
    * per-step shuffle — and series length is calendar-bounded, so the
    * collected array is a constant per tenant regardless of corpus size.
    * The DuckDB oracle replays the recursion as a RECURSIVE CTE over the
    * day index; both sides are pure integers, so the hash matches. */
  def ewmaDaily(spark: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(spark, dir)
      .groupBy((col("user_id") % 4).as("tenant_id"),
        date_trunc("day", col("ts")).as("day"))
      .agg((sum(col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
        * 100).cast("long").as("cents"))
    val packed = daily.groupBy("tenant_id")
      .agg(array_sort(collect_list(struct(col("day"), col("cents")))).as("xs"))
    packed
      .select(col("tenant_id"), explode(expr(
        """aggregate(xs,
          |  CAST(array() AS ARRAY<STRUCT<day: TIMESTAMP, cents: BIGINT, ewma: BIGINT>>),
          |  (acc, x) -> array_append(acc, struct(x.day AS day, x.cents AS cents,
          |    CASE WHEN size(acc) = 0 THEN x.cents
          |         ELSE (300 * x.cents + 700 * element_at(acc, -1).ewma) div 1000
          |    END AS ewma)))""".stripMargin)).as("y"))
      .select(col("tenant_id"), col("y.day").as("day"),
        col("y.cents").as("cents"), col("y.ewma").as("ewma"))
  }

  /** T19 — session-TTL audit (core/session_manager.py:22 — sessions
    * expire after 6 hours of inactivity): each user's last-activity age
    * relative to the corpus watermark, bucketed by whole hours, with
    * the expired verdict per bucket. The age distribution + live/expired
    * split is the session-store health view the reference's manager
    * consults before reusing a cached session.
    *
    * Arithmetic is whole microseconds (unix_micros under the mandated
    * UTC session; DuckDB's epoch_us is the same integer), so the hour
    * floor replays exactly. One map-side-combined groupBy(user) + a
    * broadcast scalar watermark anchor + a bounded groupBy(bucket) —
    * nothing here outgrows a 100 TB events table. */
  def sessionTtlBuckets(spark: SparkSession, dir: String,
      ttlHours: Int = 6): DataFrame = {
    val e = Tables.events(spark, dir)
    val last = e.groupBy("user_id").agg(max(col("ts")).as("last_ts"))
    val wm = e.agg(max(col("ts")).as("wm"))
    last.crossJoin(broadcast(wm))
      .select(col("user_id"),
        // unix_micros takes TIMESTAMP only; under the mandated UTC session
        // the NTZ->LTZ cast is wall-clock-preserving, so the integer equals
        // DuckDB's naive epoch_us
        expr("(unix_micros(CAST(wm AS TIMESTAMP)) - " +
          "unix_micros(CAST(last_ts AS TIMESTAMP))) div 3600000000")
          .as("age_hours"))
      .groupBy("age_hours")
      .agg(count(lit(1)).as("n_sessions"))
      .select(col("age_hours"), col("n_sessions"),
        (col("age_hours") >= ttlHours).as("expired"))
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "t1_asof_purchase_browse" -> ((s, d) => purchaseAsofBrowse(s, d)),
    "t1b_asof_salted" -> ((s, d) => purchaseAsofBrowseSalted(s, d)),
    "t6_asof_within_30m" -> ((s, d) => purchaseAsofFresh(s, d)),
    "t6b_asof_within_salted" -> ((s, d) => purchaseAsofFreshSalted(s, d)),
    "t2_price_band_join" -> ((s, d) => priceBandStats(s, d)),
    "t3_user_sessions" -> ((s, d) => userSessions(s, d)),
    "t3b_sessions_salted" -> ((s, d) => userSessionsSalted(s, d)),
    "t4_running_spend" -> ((s, d) => customerRunningSpend(s, d)),
    "t5_status_rollup" -> ((s, d) => statusPriorityRollup(s, d)),
    "t5b_status_cube" -> ((s, d) => statusPriorityCube(s, d)),
    "t7_purchase_funnel" -> ((s, d) => purchaseFunnel(s, d)),
    "t8_cohort_retention" -> ((s, d) => cohortRetention(s, d)),
    "t10_gapfill_hourly" -> ((s, d) => gapfillHourly(s, d)),
    "t11_scd2_history" -> ((s, d) => scd2History(s, d)),
    "t12_ewma_daily" -> ((s, d) => ewmaDaily(s, d)),
    "t13_trailing_30d_spend" -> ((s, d) => trailing30dSpend(s, d)),
    "t14_shipment_overlaps" -> ((s, d) => supplierShipmentOverlaps(s, d)),
    "t15_busy_islands" -> ((s, d) => supplierBusyIslands(s, d)),
    "t16_event_transitions" -> ((s, d) => eventTransitions(s, d)),
    "t17_channel_attribution" -> ((s, d) => channelAttribution(s, d)),
    "t20_time_decay_attribution" -> ((s, d) => timeDecayAttribution(s, d)),
    "t21_hourly_autocorr" -> ((s, d) => hourlyAutocorr(s, d)),
    "t22_cusum_daily" -> ((s, d) => cusumDaily(s, d)),
    "t23_holt_daily" -> ((s, d) => holtDaily(s, d)),
    "a24_hourly_anomaly" -> ((s, d) => hourlyAnomalies(s, d)),
    "t18_dwell_times" -> ((s, d) => dwellTimes(s, d)),
    "t19_session_ttl" -> ((s, d) => sessionTtlBuckets(s, d)))

  private val baseOracles: Map[String, String] = Map(
    // the oracle states the SEMANTICS (direct overlap-predicate join);
    // the Spark plan's banding is lossless, so results coincide
    "t14_shipment_overlaps" ->
      """WITH iv AS (
        |  SELECT DISTINCT l_suppkey AS suppkey,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |           + 3 + CAST(l_quantity AS BIGINT) % 14 AS e
        |  FROM lineitem)
        |SELECT a.suppkey, count(*) AS n_overlaps
        |FROM iv a JOIN iv b ON a.suppkey = b.suppkey
        |  AND a.s <= b.e AND b.s <= a.e
        |  AND (a.s < b.s OR (a.s = b.s AND a.e < b.e))
        |GROUP BY 1""".stripMargin,
    "t1_asof_purchase_browse" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS is_probe,
        |         event_id AS build_id, ts AS build_ts
        |  FROM events WHERE event_type IN ('view', 'click')
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1, NULL, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, ts, event_id, is_probe,
        |         last_value(build_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id,
        |         last_value(build_ts IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
        |  FROM u)
        |SELECT user_id, event_id, ts, asof_id, asof_ts
        |FROM w WHERE is_probe = 1""".stripMargin,
    "t6_asof_within_30m" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS is_probe,
        |         event_id AS build_id, ts AS build_ts
        |  FROM events WHERE event_type IN ('view', 'click')
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1, NULL, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, ts, event_id, is_probe,
        |         last_value(build_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id,
        |         last_value(build_ts IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_ts
        |  FROM u)
        |SELECT user_id, event_id, ts,
        |       CASE WHEN epoch_us(ts) - epoch_us(asof_ts) <= 1800 * 1000000
        |            THEN asof_id END AS asof_id,
        |       CASE WHEN epoch_us(ts) - epoch_us(asof_ts) <= 1800 * 1000000
        |            THEN asof_ts END AS asof_ts
        |FROM w WHERE is_probe = 1""".stripMargin,
    "t2_price_band_join" ->
      """WITH bands AS (
        |  SELECT b AS band_id, 900.0::DOUBLE + 10 * b AS lo,
        |         910.0::DOUBLE + 10 * b AS hi
        |  FROM range(10) t(b))
        |SELECT CAST(band_id AS INT) AS band_id, lo, hi, count(*) AS n_parts,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE)
        |         / count(*) AS avg_price
        |FROM part JOIN bands
        |  ON p_retailprice >= lo AND p_retailprice < hi
        |GROUP BY band_id, lo, hi""".stripMargin,
    "t3_user_sessions" ->
      """WITH f AS (
        |  SELECT user_id, ts, event_id, epoch_us(ts) AS us,
        |         lag(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN prev_us IS NULL
        |                   OR us - prev_us > 1800 * 1000000 THEN 1 ELSE 0
        |            END AS is_new
        |  FROM f),
        |s AS (
        |  SELECT *, sum(is_new) OVER (
        |    PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
        |  FROM g)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |       min(ts) AS session_start,
        |       max(ts) AS session_end, count(*) AS n_events,
        |       (max(us) - min(us)) // 1000000 AS duration_s
        |FROM s GROUP BY user_id, session_idx""".stripMargin,
    "t4_running_spend" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |       CAST(row_number() OVER w AS INT) AS order_seq,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
        |         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |         AS running_spend,
        |       lag(o_orderdate) OVER w AS prev_date,
        |       lead(o_orderdate) OVER w AS next_date,
        |       date_diff('day', lag(o_orderdate) OVER w, o_orderdate)
        |         AS days_since_prev
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "t5_status_rollup" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |            ELSE o_orderstatus END AS status,
        |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |            ELSE o_orderpriority END AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_spend
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "t5b_status_cube" ->
      """SELECT CASE WHEN GROUPING(o_orderstatus) = 1 THEN 'ALL'
        |            ELSE o_orderstatus END AS status,
        |       CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL'
        |            ELSE o_orderpriority END AS priority,
        |       count(*) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |         AS total_spend
        |FROM orders
        |GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin)

  /** The salted twins must produce bit-identical results to their plain
    * forms, so they share the oracle — the correctness gate then proves
    * the segmented plans equivalent against an independent engine. */
  val oracles: Map[String, String] = baseOracles ++ Map(
    "t1b_asof_salted" -> baseOracles("t1_asof_purchase_browse"),
    "t6b_asof_within_salted" -> baseOracles("t6_asof_within_30m"),
    "t3b_sessions_salted" -> baseOracles("t3_user_sessions"),
    // min-chain formulation of the strictly-increasing stage rule — the
    // Spark side's sorted fold picks the same earliest qualifying event
    "t7_purchase_funnel" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS t, event_type AS et
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |s1 AS (SELECT user_id, min(t) AS t1 FROM e WHERE et = 'view' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(t) AS t2 FROM e JOIN s1 USING (user_id)
        |  WHERE et = 'click' AND t > t1 GROUP BY e.user_id),
        |s3 AS (
        |  SELECT e.user_id, min(t) AS t3 FROM e JOIN s2 USING (user_id)
        |  WHERE et = 'purchase' AND t > t2 GROUP BY e.user_id),
        |n AS (
        |  SELECT (SELECT count(*) FROM s1) AS n1,
        |         (SELECT count(*) FROM s2) AS n2,
        |         (SELECT count(*) FROM s3) AS n3)
        |SELECT stage_idx, stage, n_users, n_users * 1000 // n1 AS conv_milli
        |FROM (
        |  SELECT 1 AS stage_idx, 'view' AS stage, CAST(n1 AS BIGINT) AS n_users, n1 FROM n
        |  UNION ALL SELECT 2, 'click', CAST(n2 AS BIGINT), n1 FROM n
        |  UNION ALL SELECT 3, 'purchase', CAST(n3 AS BIGINT), n1 FROM n)
        |WHERE n_users >= 1""".stripMargin,
    "t8_cohort_retention" ->
      """WITH d AS (
        |  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
        |  FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY 1),
        |o AS (
        |  SELECT c.cohort_day, CAST(d.day - c.cohort_day AS INT) AS day_offset
        |  FROM d JOIN c USING (user_id)),
        |s AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_size
        |      FROM c GROUP BY 1),
        |m AS (SELECT cohort_day, day_offset, CAST(count(*) AS BIGINT) AS n_active
        |      FROM o GROUP BY 1, 2)
        |SELECT m.cohort_day, m.day_offset, m.n_active, s.cohort_size,
        |       m.n_active * 1000 // s.cohort_size AS retention_milli
        |FROM m JOIN s USING (cohort_day)""".stripMargin,
    "t18_dwell_times" ->
      """WITH g AS (
        |  SELECT event_type,
        |         epoch_us(ts) // 1000000
        |           - epoch_us(lag(ts) OVER (PARTITION BY user_id
        |                                    ORDER BY ts, event_id)) // 1000000
        |           AS gap_s
        |  FROM events),
        |f AS (SELECT event_type, CAST(gap_s AS BIGINT) AS gap_s
        |      FROM g WHERE gap_s IS NOT NULL)
        |SELECT event_type, count(*) AS n,
        |       CAST(sum(gap_s) * 1000 // count(*) AS BIGINT) AS mean_milli_s,
        |       quantile_cont(gap_s, 0.5) AS p50_s,
        |       quantile_cont(gap_s, 0.9) AS p90_s
        |FROM f GROUP BY 1""".stripMargin,
    "t19_session_ttl" ->
      """WITH last AS (
        |  SELECT user_id, max(ts) AS last_ts FROM events GROUP BY 1),
        |wm AS (SELECT max(ts) AS wm FROM events),
        |ages AS (
        |  SELECT CAST((epoch_us(wm) - epoch_us(last_ts)) // 3600000000
        |           AS BIGINT) AS age_hours
        |  FROM last CROSS JOIN wm)
        |SELECT age_hours, CAST(count(*) AS BIGINT) AS n_sessions,
        |       age_hours >= 6 AS expired
        |FROM ages GROUP BY 1""".stripMargin,
    "a24_hourly_anomaly" ->
      """WITH e AS (
        |  SELECT user_id % 4 AS tenant_id, date_trunc('hour', ts) AS hour
        |  FROM events),
        |c AS (SELECT tenant_id, hour, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        |t AS (SELECT DISTINCT tenant_id FROM e),
        |g AS (
        |  SELECT tenant_id,
        |         unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
        |  FROM t CROSS JOIN b),
        |h AS (
        |  SELECT g.tenant_id, g.hour, coalesce(c.n, 0) AS n
        |  FROM g LEFT JOIN c ON c.tenant_id = g.tenant_id AND c.hour = g.hour),
        |w AS (
        |  SELECT tenant_id, hour, n,
        |         CAST(sum(n) OVER (PARTITION BY tenant_id ORDER BY hour
        |           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS BIGINT)
        |           AS prev_sum,
        |         count(n) OVER (PARTITION BY tenant_id ORDER BY hour
        |           ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING) AS prev_cnt
        |  FROM h)
        |SELECT tenant_id, hour, n, prev_sum,
        |       n * 24 > prev_sum * 2 AS is_spike,
        |       n * 48 < prev_sum AS is_drop
        |FROM w WHERE prev_cnt = 24""".stripMargin,
    "t10_gapfill_hourly" ->
      """WITH e AS (
        |  SELECT user_id % 4 AS tenant_id, date_trunc('hour', ts) AS hour
        |  FROM events),
        |c AS (SELECT tenant_id, hour, count(*) AS n FROM e GROUP BY 1, 2),
        |b AS (SELECT min(hour) AS h0, max(hour) AS h1 FROM e),
        |t AS (SELECT DISTINCT tenant_id FROM e),
        |g AS (
        |  SELECT tenant_id,
        |         unnest(generate_series(h0, h1, INTERVAL '1 hour')) AS hour
        |  FROM t CROSS JOIN b)
        |SELECT g.tenant_id, g.hour, coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c ON c.tenant_id = g.tenant_id AND c.hour = g.hour""".stripMargin,
    "t11_scd2_history" ->
      """WITH m AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |v AS (
        |  SELECT user_id, ts, event_id, event_type FROM m
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) AS valid_to,
        |       lead(ts) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) IS NULL AS is_current
        |FROM v""".stripMargin,
    // per-tenant mean and the two-sided fold replayed exactly; alarm
    // threshold 3*mean compared on exact longs in both engines
    "t22_cusum_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id % 4 AS tenant_id,
        |         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT tenant_id,
        |         CAST(sum(n) * 1000 // count(*) AS BIGINT) AS mean_milli
        |  FROM daily GROUP BY 1),
        |d AS (
        |  SELECT daily.tenant_id, daily.day, daily.n, st.mean_milli,
        |         row_number() OVER (PARTITION BY daily.tenant_id
        |                            ORDER BY daily.day) AS i
        |  FROM daily JOIN st USING (tenant_id)),
        |r AS (
        |  SELECT tenant_id, day, n, mean_milli, i,
        |         greatest(0, n * 1000 - mean_milli - mean_milli // 4)
        |           AS s_pos,
        |         greatest(0, -(n * 1000) + mean_milli - mean_milli // 4)
        |           AS s_neg
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.tenant_id, d.day, d.n, d.mean_milli, d.i,
        |         greatest(0, r.s_pos + d.n * 1000 - d.mean_milli
        |                     - d.mean_milli // 4),
        |         greatest(0, r.s_neg - d.n * 1000 + d.mean_milli
        |                     - d.mean_milli // 4)
        |  FROM d JOIN r ON d.tenant_id = r.tenant_id AND d.i = r.i + 1)
        |SELECT tenant_id, day, n,
        |       CAST(s_pos AS BIGINT) AS s_pos_milli,
        |       CAST(s_neg AS BIGINT) AS s_neg_milli,
        |       CAST(s_pos > mean_milli * 3 OR s_neg > mean_milli * 3
        |         AS BIGINT) AS alarm
        |FROM r""".stripMargin,
    // level and trend recurrences replayed exactly: DuckDB // and Spark
    // div both truncate toward zero, including the negative trend terms
    "t23_holt_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id % 4 AS tenant_id,
        |         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT tenant_id, day, cents,
        |         row_number() OVER (PARTITION BY tenant_id ORDER BY day) AS i
        |  FROM daily),
        |r AS (
        |  SELECT tenant_id, day, cents, i, cents AS l, CAST(0 AS BIGINT) AS b
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.tenant_id, d.day, d.cents, d.i,
        |         CAST((300 * d.cents + 700 * (r.l + r.b)) // 1000 AS BIGINT),
        |         CAST((200 * ((300 * d.cents + 700 * (r.l + r.b)) // 1000
        |                      - r.l)
        |               + 800 * r.b) // 1000 AS BIGINT)
        |  FROM d JOIN r ON d.tenant_id = r.tenant_id AND d.i = r.i + 1)
        |SELECT tenant_id, day, cents, l AS level, b AS trend,
        |       CAST(l + b AS BIGINT) AS forecast_next
        |FROM r""".stripMargin,
    "t12_ewma_daily" ->
      """WITH RECURSIVE daily AS (
        |  SELECT user_id % 4 AS tenant_id,
        |         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
        |         CAST(sum(CAST(value AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
        |  FROM events GROUP BY 1, 2),
        |d AS (
        |  SELECT tenant_id, day, cents,
        |         row_number() OVER (PARTITION BY tenant_id ORDER BY day) AS i
        |  FROM daily),
        |r AS (
        |  SELECT tenant_id, day, cents, i, cents AS ewma
        |  FROM d WHERE i = 1
        |  UNION ALL
        |  SELECT d.tenant_id, d.day, d.cents, d.i,
        |         (300 * d.cents + 700 * r.ewma) // 1000 AS ewma
        |  FROM d JOIN r ON d.tenant_id = r.tenant_id AND d.i = r.i + 1)
        |SELECT tenant_id, day, cents, ewma FROM r""".stripMargin,
    "t17_channel_attribution" ->
      """WITH u AS (
        |  SELECT user_id, ts, event_id, 0 AS is_probe,
        |         event_id AS build_id
        |  FROM events WHERE event_type IN ('view', 'click')
        |  UNION ALL
        |  SELECT user_id, ts, event_id, 1, NULL
        |  FROM events WHERE event_type = 'purchase'),
        |w AS (
        |  SELECT user_id, ts, event_id, is_probe,
        |         last_value(build_id IGNORE NULLS) OVER (
        |           PARTITION BY user_id ORDER BY ts, is_probe, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_id
        |  FROM u),
        |p AS (SELECT event_id, asof_id FROM w WHERE is_probe = 1),
        |v AS (
        |  SELECT event_id,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events),
        |c AS (SELECT event_id AS asof_id, event_type AS ch FROM events)
        |SELECT coalesce(c.ch, 'direct') AS channel,
        |       count(*) AS n_purchases,
        |       CAST(sum(v.cents) AS BIGINT) AS cents
        |FROM p
        |JOIN v USING (event_id)
        |LEFT JOIN c USING (asof_id)
        |GROUP BY 1""".stripMargin,
    // moment sums exact; r is the single double, built from the same
    // exact operands in the same order (the embedding-cosine idiom)
    "t21_hourly_autocorr" ->
      """WITH hc AS (
        |  SELECT epoch_us(ts) // 3600000000 AS h,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |p AS (
        |  SELECT a.n AS x, b.n AS y FROM hc a JOIN hc b ON b.h = a.h + 24),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         CAST(sum(x * y) AS BIGINT) AS sxy,
        |         CAST(sum(x * x) AS BIGINT) AS sxx,
        |         CAST(sum(y * y) AS BIGINT) AS syy
        |  FROM p)
        |SELECT CAST(24 AS BIGINT) AS lag_hours, n_pairs,
        |       CAST(n_pairs * sxy - sx * sy AS BIGINT) AS cov_num,
        |       CAST(n_pairs * sxx - sx * sx AS BIGINT) AS var_x,
        |       CAST(n_pairs * syy - sy * sy AS BIGINT) AS var_y,
        |       CAST(CAST(n_pairs * sxy - sx * sy AS BIGINT) AS DOUBLE) /
        |         (sqrt(CAST(CAST(n_pairs * sxx - sx * sx AS BIGINT) AS DOUBLE)) *
        |          sqrt(CAST(CAST(n_pairs * syy - sy * sy AS BIGINT) AS DOUBLE)))
        |         AS r
        |FROM s""".stripMargin,
    // decay ladder and per-purchase floor-division shares replayed
    // exactly; 'direct' rides in as the untouched-purchase UNION arm
    "t20_time_decay_attribution" ->
      """WITH tch AS (
        |  SELECT user_id, ts AS t_ts, event_type AS channel
        |  FROM events WHERE event_type IN ('view', 'click')),
        |p AS (
        |  SELECT user_id, ts AS p_ts, event_id,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM events WHERE event_type = 'purchase'),
        |pr AS (
        |  SELECT p.event_id, p.cents, tch.channel,
        |         CAST(1000 // (1 << CAST(date_diff('day', CAST(t_ts AS DATE),
        |             CAST(p_ts AS DATE)) // 7 AS INT)) AS BIGINT) AS decay_milli
        |  FROM p JOIN tch ON p.user_id = tch.user_id
        |   AND t_ts <= p_ts AND t_ts > p_ts - INTERVAL 30 DAY),
        |tot AS (
        |  SELECT event_id, CAST(sum(decay_milli) AS BIGINT) AS total_decay
        |  FROM pr GROUP BY 1),
        |att AS (
        |  SELECT channel,
        |         CAST(cents * decay_milli // total_decay AS BIGINT) AS attr_cents
        |  FROM pr JOIN tot USING (event_id))
        |SELECT channel, count(*) AS n_touchpoints,
        |       CAST(sum(attr_cents) AS BIGINT) AS cents
        |FROM att GROUP BY 1
        |UNION ALL
        |SELECT 'direct', count(*), CAST(sum(cents) AS BIGINT)
        |FROM p WHERE event_id NOT IN (SELECT event_id FROM pr)
        |HAVING count(*) > 0""".stripMargin,
    "t15_busy_islands" ->
      """WITH iv AS (
        |  SELECT DISTINCT l_suppkey AS suppkey,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS s,
        |         date_diff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
        |           + 3 + CAST(l_quantity AS BIGINT) % 14 AS e
        |  FROM lineitem),
        |f AS (
        |  SELECT suppkey, s, e,
        |         CASE WHEN max(e) OVER (
        |                PARTITION BY suppkey ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              IS NULL
        |           OR s > max(e) OVER (
        |                PARTITION BY suppkey ORDER BY s, e
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |         THEN 1 ELSE 0 END AS opens
        |  FROM iv),
        |g AS (
        |  SELECT suppkey, s, e,
        |         CAST(sum(opens) OVER (
        |           PARTITION BY suppkey ORDER BY s, e
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS island
        |  FROM f)
        |SELECT suppkey, island, min(s) AS island_start, max(e) AS island_end,
        |       count(*) AS n_intervals
        |FROM g GROUP BY 1, 2""".stripMargin,
    "t16_event_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS to_type
        |  FROM events),
        |m AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       CAST(n * 1000 // sum(n) OVER (PARTITION BY from_type)
        |         AS BIGINT) AS p_mille
        |FROM m""".stripMargin,
    "t13_trailing_30d_spend" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, o_orderdate, cents,
        |       CAST(sum(cents) OVER (
        |         PARTITION BY o_custkey ORDER BY day
        |         RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS BIGINT)
        |         AS trailing_30d_cents
        |FROM o""".stripMargin)
}
