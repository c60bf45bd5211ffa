package graft.sync

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing registration of the reconciliation module: query name ->
  * DataFrame builder, plus the DuckDB-equivalent ANSI SQL oracle. The
  * snapshot synthesis is pure integer arithmetic so both engines compute
  * identical values (see Reconcile's scaladoc).
  */
object ReconcileQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Shared snapshot CTEs: must mirror Reconcile.crmSnapshot/dbSnapshot
    * + the active-case filter (status 'O' <=> active). Visible package-wide
    * so the flagship lineage oracle (pipeline.Lineage) composes them. */
  private[graft] val ctes: String =
    """WITH crm AS (
      |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id,
      |         (o_orderkey * 48271) % 100000
      |           + CASE WHEN o_orderkey % 5 = 1 THEN 7 ELSE 0 END AS serialno
      |  FROM orders WHERE o_orderkey % 7 <> 0 AND o_orderstatus = 'O'
      |), db AS (
      |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id,
      |         CASE WHEN o_orderkey % 11 = 0 THEN 0
      |              ELSE (o_orderkey * 48271) % 100000 END AS last_serialno
      |  FROM orders WHERE o_orderkey % 10 <> 3 AND o_orderstatus = 'O'
      |), cat AS (
      |  SELECT tenant_id, case_ref,
      |         CASE WHEN last_serialno IS NULL AND serialno IS NOT NULL THEN 'new'
      |              WHEN serialno IS NULL THEN 'deactivated'
      |              WHEN serialno > last_serialno THEN 'needs_update'
      |              ELSE 'unchanged' END AS category,
      |         serialno, last_serialno
      |  FROM crm FULL OUTER JOIN db USING (tenant_id, case_ref)
      |)""".stripMargin

  val queries: Map[String, Q] = Map(
    "recon_categories" -> ((s, d) => Reconcile.categories(s, d)),
    "recon_summary" -> ((s, d) => Reconcile.summary(s, d)),
    "recon_new_cases" -> ((s, d) => Reconcile.newCases(s, d)),
    "recon_deactivated" -> ((s, d) => Reconcile.deactivated(s, d)),
    "recon_potential_updates" -> ((s, d) => Reconcile.potentialUpdates(s, d)),
    "recon_needs_update" -> ((s, d) => Reconcile.needsUpdate(s, d)),
    "recon_advance_watermarks" -> ((s, d) => Reconcile.advanceWatermarks(s, d)),
    "recon_quality" -> ((s, d) => Reconcile.qualityValidation(s, d)),
    "recon_dry_run" -> ((s, d) => Reconcile.dryRunPlan(s, d)),
    "recon_accessibility_gate" -> ((s, d) => Reconcile.accessibilityGate(s, d)),
    "a11_load_stats" -> ((s, d) => Reconcile.loadStats(s, d)))

  val oracles: Map[String, String] = Map(
    "recon_categories" ->
      s"$ctes SELECT tenant_id, case_ref, category, serialno, last_serialno FROM cat",
    "recon_summary" ->
      s"""$ctes, agg AS (SELECT category, count(*) AS n FROM cat GROUP BY category),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
         |               CAST(sum(CASE WHEN category = 'unchanged' THEN n ELSE 0 END) AS BIGINT) AS n_unchanged
         |        FROM agg)
         |SELECT category, n, CAST(n AS DOUBLE) / CAST(total AS DOUBLE) AS share,
         |       CAST(n_unchanged AS DOUBLE) / CAST(total AS DOUBLE) AS processing_reduction
         |FROM agg, tot""".stripMargin,
    "recon_new_cases" ->
      s"""$ctes SELECT tenant_id, case_ref, serialno FROM crm c
         |WHERE NOT EXISTS (SELECT 1 FROM db d
         |                  WHERE d.tenant_id = c.tenant_id AND d.case_ref = c.case_ref)""".stripMargin,
    "recon_deactivated" ->
      s"""$ctes SELECT tenant_id, case_ref, last_serialno FROM db d
         |WHERE NOT EXISTS (SELECT 1 FROM crm c
         |                  WHERE c.tenant_id = d.tenant_id AND c.case_ref = d.case_ref)""".stripMargin,
    "recon_potential_updates" ->
      s"""$ctes SELECT tenant_id, case_ref, serialno FROM crm c
         |WHERE EXISTS (SELECT 1 FROM db d
         |              WHERE d.tenant_id = c.tenant_id AND d.case_ref = c.case_ref)""".stripMargin,
    "recon_needs_update" ->
      s"""$ctes SELECT c.tenant_id, c.case_ref, c.serialno, d.last_serialno
         |FROM crm c JOIN db d ON c.tenant_id = d.tenant_id AND c.case_ref = d.case_ref
         |WHERE c.serialno > coalesce(d.last_serialno, 0)""".stripMargin,
    "recon_advance_watermarks" ->
      s"""$ctes, db_all AS (
         |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id,
         |         CASE WHEN o_orderkey % 11 = 0 THEN 0
         |              ELSE (o_orderkey * 48271) % 100000 END AS last_serialno
         |  FROM orders WHERE o_orderkey % 10 <> 3
         |), processed AS (
         |  SELECT c.tenant_id, c.case_ref, c.serialno AS new_serialno
         |  FROM crm c JOIN db d ON c.tenant_id = d.tenant_id AND c.case_ref = d.case_ref
         |  WHERE c.serialno > coalesce(d.last_serialno, 0))
         |SELECT db_all.tenant_id, db_all.case_ref,
         |       coalesce(p.new_serialno, db_all.last_serialno) AS last_serialno
         |FROM db_all LEFT JOIN processed p
         |  ON db_all.tenant_id = p.tenant_id AND db_all.case_ref = p.case_ref""".stripMargin,
    "recon_dry_run" ->
      s"""$ctes, agg AS (SELECT category, count(*) AS n FROM cat GROUP BY 1)
         |SELECT category, n,
         |       CASE WHEN category IN ('new', 'needs_update')
         |            THEN CAST((n + 99) // 100 AS BIGINT) ELSE 0 END AS n_batches,
         |       category IN ('new', 'needs_update') AS would_enqueue
         |FROM agg""".stripMargin,
    "recon_quality" ->
      s"""$ctes, crmn AS (SELECT count(*) AS crm_count FROM crm),
         |dbn AS (SELECT count(*) AS db_count FROM db),
         |c0 AS (SELECT count(*) AS total,
         |              CAST(sum(CASE WHEN category IN ('new','deactivated','needs_update')
         |                            THEN 1 ELSE 0 END) AS BIGINT) AS changed
         |       FROM cat)
         |SELECT total, changed, crm_count, db_count,
         |       CAST(changed AS DOUBLE) / CAST(greatest(total, 1) AS DOUBLE) AS change_rate,
         |       CAST(abs(crm_count - db_count) AS DOUBLE) / CAST(greatest(crm_count, 1) AS DOUBLE) AS count_mismatch_rate,
         |       (CAST(changed AS DOUBLE) / CAST(greatest(total, 1) AS DOUBLE)) > 0.2 AS change_rate_breach,
         |       (CAST(abs(crm_count - db_count) AS DOUBLE) / CAST(greatest(crm_count, 1) AS DOUBLE)) > 0.1 AS count_mismatch_breach,
         |       least(greatest(1.0
         |         - CASE WHEN (CAST(changed AS DOUBLE) / CAST(greatest(total, 1) AS DOUBLE)) > 0.2
         |                THEN (CAST(changed AS DOUBLE) / CAST(greatest(total, 1) AS DOUBLE)) - 0.2 ELSE 0.0 END * 2.0
         |         - CASE WHEN (CAST(abs(crm_count - db_count) AS DOUBLE) / CAST(greatest(crm_count, 1) AS DOUBLE)) > 0.1
         |                THEN (CAST(abs(crm_count - db_count) AS DOUBLE) / CAST(greatest(crm_count, 1) AS DOUBLE)) - 0.1 ELSE 0.0 END * 2.0,
         |         0.0), 1.0) AS quality_score
         |FROM c0, crmn, dbn""".stripMargin,
    // the crm CTE above filters to active cases; A11 counts the UNFILTERED
    // load (active vs complete), so it states the S1 scan inline
    "a11_load_stats" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_loaded,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |       CAST(sum(CASE WHEN o_orderstatus <> 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_complete
        |FROM orders WHERE o_orderkey % 7 <> 0""".stripMargin,
    // the onboarding gate samples the UNFILTERED caseload (pre-backfill,
    // before any active/complete split matters), so it states its own
    // snapshot CTEs like a11
    "recon_accessibility_gate" ->
      """WITH crm AS (
        |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id
        |  FROM orders WHERE o_orderkey % 7 <> 0),
        |db AS (
        |  SELECT o_orderkey AS case_ref
        |  FROM orders WHERE o_orderkey % 10 <> 3),
        |ranked AS (
        |  SELECT tenant_id, case_ref,
        |         row_number() OVER (PARTITION BY tenant_id
        |           ORDER BY (case_ref * 48271) % 100000, case_ref) AS rn
        |  FROM crm),
        |samp AS (SELECT tenant_id, case_ref FROM ranked WHERE rn <= 10),
        |a AS (
        |  SELECT samp.tenant_id,
        |         CAST(count(*) AS BIGINT) AS n_sampled,
        |         CAST(sum(CASE WHEN db.case_ref IS NOT NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_accessible
        |  FROM samp LEFT JOIN db ON samp.case_ref = db.case_ref
        |  GROUP BY 1)
        |SELECT tenant_id, n_sampled, n_accessible,
        |       CAST(n_accessible * 100 // n_sampled AS BIGINT)
        |         AS accessibility_pct,
        |       n_accessible * 100 >= 80 * n_sampled AS proceed
        |FROM a""".stripMargin)
}
