package graft.sync

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Exprs

/** Snapshot reconciliation — the reference's flagship computation.
  *
  * The reference diffs a CRM snapshot against a DB mirror with three Python
  * set operations plus a per-key serial-number watermark check
  * (etl/flows/sync_daily.py:147-223, etl/reconciliation.py:68-141,
  * database/change_tracking.py:126-246). Here the whole decomposition is ONE
  * full-outer join with a CASE label — Catalyst turns it into a single
  * shuffle on (tenant_id, case_ref), and at 100 TB both snapshots would be
  * written bucketed/partitioned by the same key so the join is co-located.
  *
  * The driver's testdata has no case tables, so snapshots are synthesized
  * deterministically from `orders` (SURVEY.md §7): the CRM side drops keys
  * ≡ 0 (mod 7) and bumps some serials; the DB side drops keys ≡ 3 (mod 10)
  * and zeroes some watermarks. All derivations are pure integer arithmetic
  * so the DuckDB oracle computes bit-identical values.
  */
object Reconcile {

  /** 'O' -> active, 'F' -> complete, else processing (status vocabulary of
    * proclaim/status_detector.py:99-124 mapped onto o_orderstatus). */
  def statusOf(os: Column): Column =
    when(os === "O", lit("active"))
      .when(os === "F", lit("complete"))
      .otherwise(lit("processing"))

  /** CRM-visible snapshot (reference scan S1: crm/discovery.py:193-232). */
  def crmSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 7 =!= 0)
      .select(
        col("o_orderkey").as("case_ref"),
        (col("o_custkey") % 4).as("tenant_id"),
        statusOf(col("o_orderstatus")).as("status"),
        (col("o_orderstatus") === "O").as("is_active"),
        (Exprs.serialOf(col("o_orderkey")) +
          when(col("o_orderkey") % 5 === 1, lit(7L)).otherwise(lit(0L)))
          .as("serialno"))

  /** DB-mirror snapshot with high-watermark column (reference scan S8:
    * etl/flows/sync_daily_enhanced.py:156-197; watermark semantics
    * database/change_tracking.py:51-124 — 0 means never processed). */
  def dbSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .filter(col("o_orderkey") % 10 =!= 3)
      .select(
        col("o_orderkey").as("case_ref"),
        (col("o_custkey") % 4).as("tenant_id"),
        statusOf(col("o_orderstatus")).as("status"),
        (col("o_orderstatus") === "O").as("is_active"),
        when(col("o_orderkey") % 11 === 0, lit(0L))
          .otherwise(Exprs.serialOf(col("o_orderkey"))).as("last_serialno"))

  private def activeOnly(df: DataFrame): DataFrame =
    df.filter(Exprs.activeCase(col("is_active"), col("status")))

  // -------------------------------------------------------------------
  // DataFrame-level API — the library surface. Inputs: a CRM snapshot
  // with (tenant_id, case_ref, serialno) and a DB mirror with
  // (tenant_id, case_ref, last_serialno); any extra columns pass through
  // the caller's projections. The dir-level builders below bind these to
  // the driver's synthesized testdata.
  // -------------------------------------------------------------------

  /** Per-case change categories: new / deactivated / needs_update /
    * unchanged. One full-outer join replaces the reference's J1/J2/J3 set
    * ops + J4 watermark check (etl/reconciliation.py:94-141). */
  def categoriesOf(crm: DataFrame, db: DataFrame): DataFrame =
    crm.select("tenant_id", "case_ref", "serialno")
      .join(db.select("tenant_id", "case_ref", "last_serialno"),
        Seq("tenant_id", "case_ref"), "full_outer")
      .select(
        col("tenant_id"), col("case_ref"),
        when(col("last_serialno").isNull && col("serialno").isNotNull, lit("new"))
          .when(col("serialno").isNull, lit("deactivated"))
          .when(col("serialno") > col("last_serialno"), lit("needs_update"))
          .otherwise(lit("unchanged")).as("category"),
        col("serialno"), col("last_serialno"))

  /** J4 — cases whose CRM serial moved past the stored watermark. */
  def needsUpdateOf(crm: DataFrame, db: DataFrame): DataFrame =
    crm.select("tenant_id", "case_ref", "serialno")
      .join(db.select("tenant_id", "case_ref", "last_serialno"),
        Seq("tenant_id", "case_ref"), "inner")
      .filter(col("serialno") > coalesce(col("last_serialno"), lit(0L)))

  /** S9 — MERGE-style watermark advance: processed serials win. */
  def advanceOf(db: DataFrame, processed: DataFrame): DataFrame =
    db.select("tenant_id", "case_ref", "last_serialno")
      .join(processed.select(col("tenant_id"), col("case_ref"),
        col("serialno").as("new_serialno")),
        Seq("tenant_id", "case_ref"), "left_outer")
      .select(
        col("tenant_id"), col("case_ref"),
        coalesce(col("new_serialno"), col("last_serialno")).as("last_serialno"))

  def categories(spark: SparkSession, dir: String): DataFrame =
    categoriesOf(
      activeOnly(crmSnapshot(spark, dir)),
      activeOnly(dbSnapshot(spark, dir)))

  /** Reconciliation summary (A9): per-category counts + change_rate +
    * processing_reduction — etl/reconciliation.py:297-300. */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    val cat = categories(spark, dir)
      .groupBy("category").agg(count(lit(1)).as("n"))
    val tot = cat.agg(
      sum("n").as("total"),
      sum(when(col("category") === "unchanged", col("n")).otherwise(lit(0L))).as("n_unchanged"))
    // scalar anchor: hint it so the plan is a deterministic broadcast
    // nested-loop, not whatever AQE happens to pick at runtime
    cat.crossJoin(broadcast(tot))
      .select(
        col("category"), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        (col("n_unchanged").cast("double") / col("total")).as("processing_reduction"))
  }

  /** ST5 — the sync dry run (the reference runs one before every
    * scheduled sync, configs/tenants/fdm_solicitors.json:90-97): the full
    * reconciliation plan executed against a counting sink instead of the
    * queue — per category, how many cases WOULD be touched and how many
    * batch-of-`batchSize` enqueues that means (sync_daily_enhanced.py:
    * 275-407 enqueues new/needs_update in batches of 100). Pure query,
    * zero side effects — which is the whole point of a dry run. */
  def dryRunPlan(spark: SparkSession, dir: String,
                 batchSize: Int = 100): DataFrame =
    categories(spark, dir)
      .groupBy("category").agg(count(lit(1)).as("n"))
      .select(
        col("category"), col("n"),
        // ceil(n/batchSize) in exact arithmetic: (n + b - 1) / b floored
        when(col("category").isin("new", "needs_update"),
          ((col("n") + (batchSize - 1)) / batchSize).cast("long"))
          .otherwise(lit(0L)).as("n_batches"),
        col("category").isin("new", "needs_update").as("would_enqueue"))

  /** A11 — CSV load statistics: after every S1 load the reference reports
    * total/active/complete counts (crm/discovery.py:227-228 — "complete"
    * there is literally NOT is_active). One aggregate over the unfiltered
    * snapshot scan; at 100 TB this is a metadata-cheap count with full
    * map-side partial aggregation. */
  def loadStats(spark: SparkSession, dir: String): DataFrame =
    crmSnapshot(spark, dir).agg(
      count(lit(1)).as("n_loaded"),
      sum(when(col("is_active"), 1L).otherwise(0L)).as("n_active"),
      sum(when(!col("is_active"), 1L).otherwise(0L)).as("n_complete"))

  /** J1 — new cases via left-anti join (sync_daily.py:171-175). */
  def newCases(spark: SparkSession, dir: String): DataFrame =
    activeOnly(crmSnapshot(spark, dir)).select("tenant_id", "case_ref", "serialno")
      .join(activeOnly(dbSnapshot(spark, dir)).select("tenant_id", "case_ref"),
        Seq("tenant_id", "case_ref"), "left_anti")

  /** J2 — deactivated cases via left-anti the other way
    * (sync_daily.py:176). */
  def deactivated(spark: SparkSession, dir: String): DataFrame =
    activeOnly(dbSnapshot(spark, dir)).select("tenant_id", "case_ref", "last_serialno")
      .join(activeOnly(crmSnapshot(spark, dir)).select("tenant_id", "case_ref"),
        Seq("tenant_id", "case_ref"), "left_anti")

  /** J3 — intersection via left-semi join (sync_daily.py:177). */
  def potentialUpdates(spark: SparkSession, dir: String): DataFrame =
    activeOnly(crmSnapshot(spark, dir)).select("tenant_id", "case_ref", "serialno")
      .join(activeOnly(dbSnapshot(spark, dir)).select("tenant_id", "case_ref"),
        Seq("tenant_id", "case_ref"), "left_semi")

  /** J4 — watermark theta-join: intersecting cases whose CRM serial moved
    * past the stored watermark (change_tracking.py:195-246). Inner equi-join
    * with a residual non-equi predicate; the smaller (filtered) side is
    * broadcast-eligible and AQE will pick that up at runtime. */
  def needsUpdate(spark: SparkSession, dir: String): DataFrame =
    needsUpdateOf(
      activeOnly(crmSnapshot(spark, dir)),
      activeOnly(dbSnapshot(spark, dir)))

  /** S9 — MERGE-style watermark advance as a join rewrite (no Delta in this
    * environment): the watermark table is rewritten with processed serials
    * taking precedence (database/change_tracking.py:369-434). At 100 TB this
    * becomes a partition-overwrite of only the touched tenant partitions.
    * Output: the post-merge watermark table. */
  def advanceWatermarks(spark: SparkSession, dir: String): DataFrame =
    advanceOf(dbSnapshot(spark, dir), needsUpdate(spark, dir))

  /** Q1 step 2 — the onboarding accessibility gate
    * (etl/flows/onboard_tenant.py:73-151, proceed/abort decision at
    * :379-383): before backfilling a tenant, sample `sampleN` of its
    * case refs, probe each for accessibility, and proceed only if the
    * accessible rate clears `thresholdPct`. The reference samples
    * randomly; here the draw is the portable arithmetic-hash rank
    * (smallest serialOf, case_ref tie-break) so any engine — and the
    * oracle — replays the exact same sample. Accessibility is modeled
    * as "the live system can serve the ref": presence in the
    * `accessible` ref set (the DB mirror in the registered binding —
    * the same stands-in-for-the-fetch convention as the snapshot
    * synthesis itself).
    *
    * Scale shape: the per-tenant top-`sampleN` uses the two-phase
    * segmented window ([[graft.metrics.Dashboard.stratifiedSample]]'s
    * argument — phase 1 pre-prunes per (tenant, input partition), so no
    * tenant ever funnels through one reducer), and the tiny sample is
    * BROADCAST against the accessible set, which is therefore scanned
    * once and never shuffled. */
  def accessibilityGateOf(crm: DataFrame, accessible: DataFrame,
      sampleN: Int = 10, thresholdPct: Int = 80): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = crm.select(col("tenant_id"), col("case_ref"),
      Exprs.serialOf(col("case_ref")).as("hkey"))
    val pre = Window.partitionBy(col("tenant_id"), spark_partition_id())
      .orderBy(col("hkey"), col("case_ref"))
    val cands = keyed.withColumn("prerank", row_number().over(pre))
      .filter(col("prerank") <= sampleN).drop("prerank")
    val w = Window.partitionBy(col("tenant_id"))
      .orderBy(col("hkey"), col("case_ref"))
    val samp = cands.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= sampleN)
      .select("tenant_id", "case_ref")
    val hits = accessible.select(col("case_ref"))
      .join(broadcast(samp), "case_ref")
      .groupBy("tenant_id").agg(count(lit(1)).as("n_accessible"))
    val totals = samp.groupBy("tenant_id").agg(count(lit(1)).as("n_sampled"))
    totals.join(hits, Seq("tenant_id"), "left_outer")
      .select(col("tenant_id"), col("n_sampled"),
        coalesce(col("n_accessible"), lit(0L)).as("n_accessible"))
      .select(col("tenant_id"), col("n_sampled"), col("n_accessible"),
        expr("n_accessible * 100 div n_sampled").as("accessibility_pct"),
        (col("n_accessible") * 100 >= lit(thresholdPct.toLong) * col("n_sampled"))
          .as("proceed"))
  }

  /** Registered binding: sample the full CRM caseload per tenant, probe
    * the DB mirror for accessibility. */
  def accessibilityGate(spark: SparkSession, dir: String): DataFrame =
    accessibilityGateOf(crmSnapshot(spark, dir), dbSnapshot(spark, dir))

  /** U8 — reconciliation quality gates: change_rate < 20%, snapshot count
    * mismatch < 10% (etl/reconciliation.py:324-405). Emits one row of gate
    * metrics + a 0-1 quality score. */
  def qualityValidation(spark: SparkSession, dir: String): DataFrame = {
    val crmN = activeOnly(crmSnapshot(spark, dir)).agg(count(lit(1)).as("crm_count"))
    val dbN = activeOnly(dbSnapshot(spark, dir)).agg(count(lit(1)).as("db_count"))
    val cat = categories(spark, dir).agg(
      count(lit(1)).as("total"),
      sum(when(col("category").isin("new", "deactivated", "needs_update"), 1L)
        .otherwise(0L)).as("changed"))
    cat.crossJoin(broadcast(crmN)).crossJoin(broadcast(dbN))
      .select(
        col("total"), col("changed"), col("crm_count"), col("db_count"),
        (col("changed").cast("double") / greatest(col("total"), lit(1L))).as("change_rate"),
        (abs(col("crm_count") - col("db_count")).cast("double") /
          greatest(col("crm_count"), lit(1L))).as("count_mismatch_rate"))
      .select(
        col("*"),
        (col("change_rate") > 0.2).as("change_rate_breach"),
        (col("count_mismatch_rate") > 0.1).as("count_mismatch_breach"),
        Exprs.clamp01(lit(1.0)
          - when(col("change_rate") > 0.2, col("change_rate") - 0.2).otherwise(lit(0.0)) * 2.0
          - when(col("count_mismatch_rate") > 0.1, col("count_mismatch_rate") - 0.1).otherwise(lit(0.0)) * 2.0)
          .as("quality_score"))
  }
}
