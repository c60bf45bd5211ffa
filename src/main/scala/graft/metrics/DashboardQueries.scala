package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver-facing registration of the metrics module (names -> builders +
  * DuckDB oracles). See Dashboard's scaladoc for determinism rules.
  */
object DashboardQueries {
  type Q = (SparkSession, String) => DataFrame

  private val snapCtes: String =
    """WITH crm AS (
      |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |), db AS (
      |  SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id
      |  FROM orders WHERE o_orderkey % 10 <> 3
      |)""".stripMargin

  val queries: Map[String, Q] = Map(
    "a1_job_stats" -> ((s, d) => Dashboard.jobStats(s, d)),
    "a1b_performance_summary" -> ((s, d) => Dashboard.performanceSummary(s, d)),
    "a2_hourly_throughput" -> ((s, d) => Dashboard.hourlyThroughput(s, d)),
    "a3_top_errors" -> ((s, d) => Dashboard.topErrors(s, d)),
    "a4_status_summary" -> ((s, d) => Dashboard.statusSummary(s, d)),
    "a5_tenant_stats" -> ((s, d) => Dashboard.tenantStats(s, d)),
    "a6_activity_levels" -> ((s, d) => Dashboard.activityLevels(s, d)),
    "a7_portfolio" -> ((s, d) => Dashboard.portfolio(s, d)),
    "a8_freshness" -> ((s, d) => Dashboard.freshness(s, d)),
    "w1_latest_per_customer" -> ((s, d) => Dashboard.latestPerCustomer(s, d)),
    "w2_recent_per_tenant" -> ((s, d) => Dashboard.recentPerTenant(s, d)),
    "w3_first5_per_order" -> ((s, d) => Dashboard.first5PerOrder(s, d)),
    "o2_recent_events" -> ((s, d) => Dashboard.recentEvents(s, d)),
    "o5_priority_batches" -> ((s, d) => Dashboard.priorityBatches(s, d)),
    "o5b_processing_recommendations" ->
      ((s, d) => Dashboard.processingRecommendations(s, d)),
    "inc_rollup_merge" -> ((s, d) => Dashboard.incrementalRollup(s, d)),
    "q1_pricing_summary" -> ((s, d) => Dashboard.pricingSummary(s, d)),
    "j5_revenue_by_supplier" -> ((s, d) => Dashboard.revenueBySupplier(s, d)),
    "j9_shipping_priority" -> ((s, d) => Dashboard.shippingPriority(s, d)),
    "w8_percent_rank" -> ((s, d) => Dashboard.tenantValueDistribution(s, d)),
    "o12_pareto_front" -> ((s, d) => Dashboard.paretoParts(s, d)),
    "p8_meaningful_docs" -> ((s, d) => Dashboard.meaningfulDocs(s, d)),
    "w4_tumbling_hourly" -> ((s, d) => Dashboard.tumblingHourly(s, d)),
    "a10_embedding_stats" -> ((s, d) => Dashboard.embeddingStats(s, d)),
    "f21_document_mimes" -> ((s, d) => Dashboard.documentMimes(s, d)),
    "a15_distinct_users" -> ((s, d) => Dashboard.distinctUsers(s, d)),
    "set_only_in_crm" -> ((s, d) => Dashboard.keysOnlyInCrm(s, d)),
    "set_in_both" -> ((s, d) => Dashboard.keysInBoth(s, d)),
    "set_tagged_union" -> ((s, d) => Dashboard.taggedUnion(s, d)),
    "set_except_all_surplus" -> ((s, d) => Dashboard.tenantSlotsOnlyInDb(s, d)),
    "a13_error_stats" -> ((s, d) => Dashboard.errorStats(s, d)),
    "a14_queue_depths" -> ((s, d) => Dashboard.queueDepths(s, d)),
    "a16_event_type_pivot" -> ((s, d) => Dashboard.eventTypePivot(s, d)),
    "a17_value_percentiles" -> ((s, d) => Dashboard.valuePercentiles(s, d)),
    "a17b_hist_quantiles" -> ((s, d) => Dashboard.histQuantiles(s, d)),
    "a23_mad_outliers" -> ((s, d) => Dashboard.madOutliers(s, d)),
    "o6_hash_sample" -> ((s, d) => Dashboard.hashSample(s, d)),
    "o7_dataset_split" -> ((s, d) => Dashboard.datasetSplit(s, d)),
    "a18_profile_orders" -> ((s, d) => Dashboard.profileOrders(s, d)),
    "u9_impute_median" -> ((s, d) => Dashboard.imputeMedian(s, d)),
    "o8_quality_deciles" -> ((s, d) => Dashboard.qualityDeciles(s, d)),
    "o9_balanced_sample" -> ((s, d) => Dashboard.balancedSample(s, d)),
    "o10_stratified_sample" -> ((s, d) => Dashboard.stratifiedSample(s, d)),
    "w5_sliding_quarter_hourly" -> ((s, d) => Dashboard.slidingQuarterHourly(s, d)),
    "a19_tenant_unpivot" -> ((s, d) => Dashboard.tenantMetricsUnpivot(s, d)),
    "a21_value_hour_corr" -> ((s, d) => Dashboard.valueHourCorrelation(s, d)),
    "u10_winsorize" -> ((s, d) => Dashboard.winsorize(s, d)),
    "w6_tenant_value_ranks" -> ((s, d) => Dashboard.tenantValueRanks(s, d)),
    "w7_top_orders_heap" -> ((s, d) => Dashboard.topOrdersHeap(s, d)),
    "a22_status_priority_listagg" -> ((s, d) => Dashboard.statusPriorityListagg(s, d)),
    // HLL-sketch distinct (the 100 TB path for a15): approximate, so
    // rows-only checked; the 5% error bound vs exact is spec-pinned.
    "a15b_approx_distinct_users" -> ((s, d) => Dashboard.approxDistinctUsers(s, d)),
    // the bound itself, oracle-visible: exact count + integer verdict
    // that the HLL estimate sits within 5% — a drifting sketch now
    // hash-mismatches instead of hiding behind the rows-only check
    "a15b_hll_error_bound" -> ((s, d) => Dashboard.hllErrorBound(s, d)),
    "a25_funnel_conversion" -> ((s, d) => Dashboard.funnelConversion(s, d)),
    "a26_retention_cohorts" -> ((s, d) => Dashboard.retentionCohorts(s, d)),
    "a15c_kmv_distinct_users" -> ((s, d) => Dashboard.kmvDistinctUsers(s, d)),
    "a15d_cms_user_counts" -> ((s, d) => Dashboard.cmsUserCounts(s, d)),
    "a15e_kmv_overlap" -> ((s, d) => Dashboard.kmvUserOverlap(s, d)),
    "o13_purged_time_split" -> ((s, d) => Dashboard.purgedTimeSplit(s, d)),
    "o15_epoch_order" -> ((s, d) => Dashboard.epochOrder(s, d)),
    "o16_weighted_sample" -> ((s, d) => Dashboard.weightedSample(s, d)))

  val oracles: Map[String, String] = Map(
    "a1_job_stats" ->
      """SELECT event_type, user_id % 4 AS tenant_id, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value,
        |       max(value) AS max_value
        |FROM events
        |WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
        |GROUP BY event_type, user_id % 4""".stripMargin,
    "a1b_performance_summary" ->
      """WITH g AS (
        |  SELECT event_type, user_id % 4 AS tenant_id,
        |         CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(value AS DECIMAL(12,2))) * 1000000 AS BIGINT)
        |           // count(*) AS avg_micro
        |  FROM events
        |  WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
        |  GROUP BY 1, 2),
        |s AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS total_jobs,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN n ELSE 0 END)
        |           AS BIGINT) AS n_success,
        |         CAST(sum(avg_micro) AS BIGINT) AS sum_avg_micro,
        |         CAST(count(*) AS BIGINT) AS n_groups
        |  FROM g)
        |SELECT total_jobs, n_success,
        |       CAST(n_success AS DOUBLE) * 100.0 / CAST(total_jobs AS DOUBLE)
        |         AS success_rate,
        |       sum_avg_micro // n_groups AS avg_of_avgs_micro
        |FROM s""".stripMargin,
    // the oracle is the DIRECT full-corpus rollup: hash equality with the
    // Spark side's merge-of-partials PROVES incremental maintenance
    "inc_rollup_merge" ->
      """SELECT user_id % 4 AS tenant_id, event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a2_hourly_throughput" ->
      """SELECT date_trunc('hour', ts) AS hour, user_id % 4 AS tenant_id,
        |       count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a3_top_errors" ->
      """SELECT json_extract_string(props, '$.k') AS error_code, count(*) AS n
        |FROM events WHERE event_type = 'error'
        |GROUP BY 1 ORDER BY n DESC, error_code ASC LIMIT 10""".stripMargin,
    "a4_status_summary" ->
      "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus",
    "a5_tenant_stats" ->
      """SELECT user_id % 4 AS tenant_id, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value,
        |       max(value) AS max_value,
        |       CAST(sum(CASE WHEN ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_recent
        |FROM events GROUP BY 1""".stripMargin,
    "a6_activity_levels" ->
      """WITH labeled AS (
        |  SELECT CASE WHEN o_orderkey % 11 = 0 THEN 'never_processed'
        |              WHEN o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 180 DAYS THEN 'high_activity'
        |              WHEN o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 360 DAYS THEN 'moderate_activity'
        |              ELSE 'low_activity' END AS activity_level
        |  FROM orders
        |), counts AS (SELECT activity_level, count(*) AS n FROM labeled GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS total,
        |               CAST(sum(CASE WHEN activity_level = 'high_activity' THEN n ELSE 0 END) AS BIGINT) AS recent
        |        FROM counts)
        |SELECT activity_level, n,
        |       CAST(recent AS DOUBLE) / CAST(total AS DOUBLE) AS update_rate
        |FROM counts, tot""".stripMargin,
    "a7_portfolio" ->
      """WITH scored AS (
        |  SELECT o_custkey % 4 AS tenant_id, o_orderstatus, o_totalprice,
        |         least(greatest(
        |           0.5
        |           + CASE WHEN o_orderstatus = 'F' THEN 0.3
        |                  WHEN o_orderstatus = 'P' THEN 0.1 ELSE 0.0 END
        |           + CASE WHEN o_orderpriority LIKE '1%' THEN 0.1
        |                  WHEN o_orderpriority LIKE '2%' THEN 0.05 ELSE 0.0 END
        |           - CASE WHEN o_totalprice > 250000.0 THEN 0.25 ELSE 0.0 END,
        |           0.0), 1.0) AS settlement
        |  FROM orders)
        |SELECT tenant_id,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_value,
        |       CAST(sum(CAST(settlement AS DECIMAL(6,3))) AS DOUBLE) / count(*) AS avg_settlement
        |FROM scored GROUP BY tenant_id""".stripMargin,
    "a8_freshness" ->
      """WITH anchored AS (
        |  SELECT o_orderkey,
        |         CAST(epoch((SELECT max(o_orderdate) FROM orders)) - epoch(o_orderdate) AS DOUBLE) / 3600.0 AS hours_since
        |  FROM orders)
        |SELECT CASE WHEN o_orderkey % 11 = 0 THEN 'never_processed'
        |            WHEN hours_since <= 24 THEN 'recent'
        |            WHEN hours_since <= 168 THEN 'moderate'
        |            ELSE 'stale' END AS freshness_status,
        |       count(*) AS n
        |FROM anchored GROUP BY 1""".stripMargin,
    "w1_latest_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin,
    "w2_recent_per_tenant" ->
      """SELECT tenant_id, event_id, ts, rn FROM (
        |  SELECT user_id % 4 AS tenant_id, event_id, ts,
        |         row_number() OVER (PARTITION BY user_id % 4
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) WHERE rn <= 10""".stripMargin,
    "w3_first5_per_order" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_linenumber ASC, l_partkey ASC,
        |                                     l_suppkey ASC, l_quantity ASC,
        |                                     l_extendedprice ASC) AS rn
        |  FROM lineitem) WHERE rn <= 5""".stripMargin,
    "o2_recent_events" ->
      """SELECT event_id, ts, event_type, value FROM events
        |ORDER BY ts DESC, event_id DESC LIMIT 10""".stripMargin,
    "o5_priority_batches" ->
      """WITH p AS (
        |  SELECT event_id, ts,
        |         CASE WHEN event_type = 'error' THEN 1
        |              WHEN event_type = 'purchase' THEN 2
        |              WHEN event_type = 'signup' THEN 3
        |              ELSE 4 END AS priority
        |  FROM events),
        |r AS (SELECT event_id, priority,
        |             row_number() OVER (PARTITION BY priority
        |                                ORDER BY ts ASC, event_id ASC) AS rn
        |      FROM p)
        |SELECT event_id, priority, CAST((rn - 1) // 25 AS BIGINT) AS batch_id
        |FROM r""".stripMargin,
    "o5b_processing_recommendations" ->
      """WITH p AS (
        |  SELECT CASE WHEN event_type = 'error' THEN 1
        |              WHEN event_type = 'purchase' THEN 2
        |              WHEN event_type = 'signup' THEN 3
        |              ELSE 4 END AS priority
        |  FROM events),
        |c AS (SELECT priority, CAST(count(*) AS BIGINT) AS n_cases
        |      FROM p GROUP BY 1)
        |SELECT priority, n_cases,
        |       CAST((n_cases + 24) // 25 AS BIGINT) AS n_batches,
        |       CAST(n_cases * CASE WHEN priority <= 2 THEN 30
        |                           WHEN priority = 3 THEN 15
        |                           ELSE 6 END AS BIGINT) AS est_minutes
        |FROM c""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS avg_price,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "j5_revenue_by_supplier" ->
      """SELECT s_name,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY s_name""".stripMargin,
    "w8_percent_rank" ->
      """WITH o AS (
        |  SELECT o_orderkey, o_custkey % 4 AS tenant_id,
        |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders)
        |SELECT o_orderkey, tenant_id, cents,
        |       percent_rank() OVER (PARTITION BY tenant_id ORDER BY cents)
        |         AS pct_rank,
        |       cume_dist() OVER (PARTITION BY tenant_id ORDER BY cents)
        |         AS cume
        |FROM o""".stripMargin,
    "j9_shipping_priority" ->
      """SELECT o_orderkey, o_orderdate, o_orderpriority,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |                (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))))
        |         AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2, 3
        |ORDER BY sum(CAST(l_extendedprice AS DECIMAL(12,2)) *
        |             (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))) DESC,
        |         o_orderkey ASC
        |LIMIT 10""".stripMargin,
    "o12_pareto_front" ->
      """SELECT a.p_partkey, a.p_retailprice, a.p_size
        |FROM part a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice OR b.p_size > a.p_size))""".stripMargin,
    "p8_meaningful_docs" ->
      """SELECT lang, doc_id, n_chars, rn FROM (
        |  SELECT lang, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY n_chars DESC, doc_id ASC) AS rn
        |  FROM documents WHERE n_chars > 300)
        |WHERE rn <= 10""".stripMargin,
    "w4_tumbling_hourly" ->
      """SELECT date_trunc('hour', ts) AS hour_start, event_type, count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a10_embedding_stats" ->
      """SELECT label, count(*) AS n,
        |       CAST(min(len(embedding)) AS INT) AS dim,
        |       max(vec_id) AS max_vec_id
        |FROM embeddings GROUP BY label""".stripMargin,
    "f21_document_mimes" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 4 = 0 THEN 'PDF'
        |            WHEN doc_id % 4 = 1 THEN 'docx'
        |            WHEN doc_id % 4 = 2 THEN 'xyz'
        |            ELSE 'JPG' END AS format,
        |       CASE lower(CASE WHEN doc_id % 4 = 0 THEN 'PDF'
        |                       WHEN doc_id % 4 = 1 THEN 'docx'
        |                       WHEN doc_id % 4 = 2 THEN 'xyz'
        |                       ELSE 'JPG' END)
        |            WHEN 'pdf' THEN 'application/pdf'
        |            WHEN 'doc' THEN 'application/msword'
        |            WHEN 'docx' THEN 'application/vnd.openxmlformats-officedocument.wordprocessingml.document'
        |            WHEN 'txt' THEN 'text/plain'
        |            WHEN 'rtf' THEN 'application/rtf'
        |            WHEN 'jpg' THEN 'image/jpeg'
        |            WHEN 'png' THEN 'image/png'
        |            WHEN 'tif' THEN 'image/tiff'
        |            WHEN 'msg' THEN 'application/vnd.ms-outlook'
        |            WHEN 'html' THEN 'text/html'
        |            ELSE 'application/octet-stream' END AS mime
        |FROM documents""".stripMargin,
    "a15_distinct_users" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,
    // the exact count is portable; the within-bound verdict is the
    // oracle's ASSERTION (true per group) — Spark's HLL estimate must
    // land inside 5% of exact or the hash check fails
    "a15b_hll_error_bound" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_users,
        |       true AS within_bound
        |FROM events GROUP BY event_type""".stripMargin,
    // strict-order funnel: each step's earliest time is re-anchored at
    // the user's previous-step time; counts combine in one scalar row
    "a25_funnel_conversion" ->
      """WITH s1 AS (
        |  SELECT user_id, min(ts) AS t FROM events
        |  WHERE event_type = 'signup' GROUP BY 1),
        |s2 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
        |s3 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
        |s4 AS (
        |  SELECT e.user_id, min(e.ts) AS t FROM events e
        |  JOIN s3 ON e.user_id = s3.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
        |n AS (
        |  SELECT (SELECT count(*) FROM s1) AS n1,
        |         (SELECT count(*) FROM s2) AS n2,
        |         (SELECT count(*) FROM s3) AS n3,
        |         (SELECT count(*) FROM s4) AS n4)
        |SELECT 1 AS step, 'signup' AS event_type, CAST(n1 AS BIGINT) AS n_users,
        |       CAST(1000 AS BIGINT) AS conv_milli FROM n
        |UNION ALL SELECT 2, 'view', CAST(n2 AS BIGINT),
        |       CAST(n2 * 1000 // nullif(n1, 0) AS BIGINT) FROM n
        |UNION ALL SELECT 3, 'click', CAST(n3 AS BIGINT),
        |       CAST(n3 * 1000 // nullif(n2, 0) AS BIGINT) FROM n
        |UNION ALL SELECT 4, 'purchase', CAST(n4 AS BIGINT),
        |       CAST(n4 * 1000 // nullif(n3, 0) AS BIGINT) FROM n""".stripMargin,
    // Monday-truncated weeks in both engines; offset = integer day
    // division by 7 so partial weeks can never straddle a bucket
    "a26_retention_cohorts" ->
      """WITH f AS (
        |  SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cw
        |  FROM events GROUP BY 1),
        |a AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS w
        |  FROM events)
        |SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
        |       CAST(date_diff('day', cw, w) // 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_users
        |FROM a JOIN f ON a.user_id = f.user_id
        |GROUP BY 1, 2""".stripMargin,
    // the KMV sketch replayed exactly: same quadratic congruential hash,
    // same k smallest distinct values, same integer-division estimator
    "a15e_kmv_overlap" ->
      """WITH g AS (
        |  SELECT DISTINCT event_type,
        |         ((user_id % 1000000007) + 1000000007) % 1000000007 AS gv
        |  FROM events),
        |h AS (
        |  SELECT DISTINCT event_type,
        |         ((gv * gv % 1000000007) * 1315423911 % 1000000007
        |          + gv * 2654435761 % 1000000007 + 97) % 1000000007 AS hv
        |  FROM g),
        |r AS (
        |  SELECT event_type, hv,
        |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |sk AS (SELECT event_type, hv FROM r WHERE rn <= 64),
        |t AS (SELECT DISTINCT event_type FROM sk),
        |p AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb
        |  FROM t a JOIN t b ON a.event_type < b.event_type),
        |u AS (
        |  SELECT p.ta, p.tb, sk.hv,
        |         max(CASE WHEN sk.event_type = p.ta THEN 1 ELSE 0 END) AS in_a,
        |         max(CASE WHEN sk.event_type = p.tb THEN 1 ELSE 0 END) AS in_b
        |  FROM p JOIN sk ON sk.event_type IN (p.ta, p.tb)
        |  GROUP BY 1, 2, 3),
        |rr AS (
        |  SELECT ta, tb, hv, in_a, in_b,
        |         row_number() OVER (PARTITION BY ta, tb ORDER BY hv) AS rn
        |  FROM u),
        |s AS (
        |  SELECT ta, tb, count(*) AS ku,
        |         max(CASE WHEN rn = 64 THEN hv END) AS tau,
        |         CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS kint
        |  FROM rr WHERE rn <= 64 GROUP BY 1, 2)
        |SELECT ta, tb,
        |       CASE WHEN ku < 64 THEN kint
        |            ELSE CAST(kint * (63::BIGINT * 1000000007 // tau) // 64
        |                   AS BIGINT) END AS est_overlap
        |FROM s""".stripMargin,
    "o16_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
        |         (doc_id * 48271) % 100000 AS h
        |  FROM documents WHERE n_chars > 0),
        |c AS (
        |  SELECT doc_id, w,
        |         CAST(sum(w) OVER (ORDER BY h, doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS cum_hi
        |  FROM k),
        |t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM k),
        |s AS (
        |  SELECT doc_id, w, cum_hi, cum_hi - w AS cum_lo, total,
        |         LEAST(100, total) AS g
        |  FROM c CROSS JOIN t)
        |SELECT doc_id, w,
        |       CAST(CASE WHEN cum_lo = 0
        |                 THEN (cum_hi - 1) * g // NULLIF(total, 0) + 1
        |                 ELSE (cum_hi - 1) * g // NULLIF(total, 0)
        |                      - (cum_lo - 1) * g // NULLIF(total, 0) END
        |         AS BIGINT) AS n_copies
        |FROM s
        |WHERE (CASE WHEN cum_lo = 0
        |            THEN (cum_hi - 1) * g // NULLIF(total, 0) + 1
        |            ELSE (cum_hi - 1) * g // NULLIF(total, 0)
        |                 - (cum_lo - 1) * g // NULLIF(total, 0) END) >= 1""".stripMargin,
    "o15_epoch_order" ->
      """WITH x AS (
        |  SELECT doc_id, e AS epoch,
        |         (doc_id * 48271 + e * 9973) % 100000 AS h
        |  FROM documents
        |  CROSS JOIN (SELECT unnest(range(0, 2)) AS e))
        |SELECT CAST(epoch AS INT) AS epoch, doc_id,
        |       CAST(row_number() OVER (PARTITION BY epoch
        |                               ORDER BY h, doc_id) AS BIGINT)
        |         AS position
        |FROM x""".stripMargin,
    "o13_purged_time_split" ->
      """WITH m AS (SELECT max(ts) AS max_ts FROM events)
        |SELECT event_id,
        |       CASE WHEN ts <= max_ts - INTERVAL 14 DAY THEN 'train'
        |            WHEN ts > max_ts - INTERVAL 7 DAY THEN 'test' END AS split
        |FROM events CROSS JOIN m
        |WHERE ts <= max_ts - INTERVAL 14 DAY
        |   OR ts > max_ts - INTERVAL 7 DAY""".stripMargin,
    "a15c_kmv_distinct_users" ->
      """WITH g AS (
        |  SELECT DISTINCT event_type,
        |         ((user_id % 1000000007) + 1000000007) % 1000000007 AS gv
        |  FROM events),
        |h AS (
        |  SELECT DISTINCT event_type,
        |         ((gv * gv % 1000000007) * 1315423911 % 1000000007
        |          + gv * 2654435761 % 1000000007 + 97) % 1000000007 AS hv
        |  FROM g),
        |r AS (
        |  SELECT event_type, hv,
        |         row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rn
        |  FROM h),
        |top AS (
        |  SELECT event_type,
        |         max(CASE WHEN rn = 64 THEN hv END) AS hk,
        |         count(*) AS nmin
        |  FROM r WHERE rn <= 64 GROUP BY event_type)
        |SELECT event_type,
        |       CASE WHEN nmin < 64 THEN nmin
        |            ELSE 63::BIGINT * 1000000007 // hk END AS n_users_kmv
        |FROM top""".stripMargin,
    // the Count-Min grid replayed exactly: same affine hashes mod 1e9+7
    // folded to width 64, same min-over-depths estimator
    "a15d_cms_user_counts" ->
      """WITH g AS (
        |  SELECT user_id,
        |         ((user_id % 1000000007) + 1000000007) % 1000000007 AS gv
        |  FROM events),
        |b AS (
        |  SELECT user_id, d.d AS depth,
        |         CASE d.d
        |           WHEN 0 THEN (gv * 1315423911 % 1000000007 + 31)
        |                       % 1000000007 % 64
        |           WHEN 1 THEN (gv * 2654435761 % 1000000007 + 151)
        |                       % 1000000007 % 64
        |           ELSE (gv * 97787 % 1000000007 + 997) % 1000000007 % 64
        |         END AS bucket
        |  FROM g CROSS JOIN (VALUES (0), (1), (2)) d(d)),
        |cells AS (SELECT depth, bucket, count(*) AS cnt FROM b GROUP BY 1, 2),
        |probes AS (SELECT DISTINCT user_id, depth, bucket FROM b)
        |SELECT p.user_id, CAST(min(c.cnt) AS BIGINT) AS est_events
        |FROM probes p JOIN cells c USING (depth, bucket)
        |GROUP BY 1""".stripMargin,
    "set_only_in_crm" ->
      s"""$snapCtes SELECT tenant_id, case_ref FROM crm
         |EXCEPT SELECT tenant_id, case_ref FROM db""".stripMargin,
    "set_in_both" ->
      s"""$snapCtes SELECT tenant_id, case_ref FROM crm
         |INTERSECT SELECT tenant_id, case_ref FROM db""".stripMargin,
    "set_tagged_union" ->
      s"""$snapCtes SELECT tenant_id, case_ref, 'crm' AS source FROM crm
         |UNION ALL SELECT tenant_id, case_ref, 'db' AS source FROM db""".stripMargin,
    "set_except_all_surplus" ->
      s"""$snapCtes, surplus AS (
         |  SELECT tenant_id FROM db
         |  EXCEPT ALL
         |  SELECT tenant_id FROM crm)
         |SELECT tenant_id, count(*) AS surplus FROM surplus GROUP BY 1""".stripMargin,
    "a13_error_stats" ->
      """WITH e AS (
        |  SELECT CASE WHEN value > 400.0::DOUBLE THEN 'critical'
        |              WHEN value > 200.0::DOUBLE THEN 'error'
        |              ELSE 'warning' END AS severity,
        |         event_id % 3 <> 0 AS resolved
        |  FROM events WHERE event_type = 'error')
        |SELECT severity, count(*) AS n,
        |       CAST(sum(CASE WHEN resolved THEN 1 ELSE 0 END) AS BIGINT) AS n_resolved,
        |       CAST(sum(CASE WHEN resolved THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(greatest(count(*), 1) AS DOUBLE) AS resolution_rate
        |FROM e GROUP BY severity""".stripMargin,
    "a14_queue_depths" ->
      """WITH q AS (
        |  SELECT CASE WHEN event_type = 'error' THEN 1
        |              WHEN event_type = 'purchase' THEN 2
        |              WHEN event_type = 'signup' THEN 3
        |              ELSE 4 END AS priority,
        |         event_id % 4 = 0 AS pending
        |  FROM events)
        |SELECT CAST(priority AS INT) AS priority, count(*) AS expected,
        |       CAST(sum(CASE WHEN pending THEN 1 ELSE 0 END) AS BIGINT) AS remaining,
        |       CAST(count(*) - sum(CASE WHEN pending THEN 1 ELSE 0 END) AS DOUBLE)
        |         * 100.0::DOUBLE / CAST(greatest(count(*), 1) AS DOUBLE)
        |         AS completion_pct
        |FROM q GROUP BY priority""".stripMargin,
    "a16_event_type_pivot" ->
      """SELECT user_id % 4 AS tenant_id,
        |       count(*) FILTER (WHERE event_type = 'click') AS n_click,
        |       count(*) FILTER (WHERE event_type = 'error') AS n_error,
        |       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
        |       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
        |       count(*) FILTER (WHERE event_type = 'view') AS n_view
        |FROM events GROUP BY 1""".stripMargin,
    "a17_value_percentiles" ->
      """SELECT event_type, count(*) AS n,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) AS p25,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) AS p50,
        |       quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) AS p75
        |FROM events GROUP BY event_type""".stripMargin,
    "a17b_hist_quantiles" ->
      s"""WITH hist AS (
        |  SELECT event_type,
        |         CAST(round(value * 100) AS BIGINT) // ${Dashboard.HistBinCents}
        |           AS bin, count(*) AS c
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type, bin, c,
        |         CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |         CAST(sum(c) OVER (PARTITION BY event_type ORDER BY bin
        |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM hist)
        |SELECT event_type, max(n) AS n, count(*) AS n_bins,
        |  min(CASE WHEN cum >= (n * 500 + 999) // 1000
        |    THEN bin * ${Dashboard.HistBinCents} END) AS p50_est,
        |  min(CASE WHEN cum >= (n * 900 + 999) // 1000
        |    THEN bin * ${Dashboard.HistBinCents} END) AS p90_est,
        |  min(CASE WHEN cum >= (n * 990 + 999) // 1000
        |    THEN bin * ${Dashboard.HistBinCents} END) AS p99_est
        |FROM x GROUP BY event_type""".stripMargin,
    "a23_mad_outliers" ->
      """WITH base AS (
        |  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c
        |  FROM events),
        |med AS (
        |  SELECT event_type,
        |         CAST(2 * quantile_cont(c, 0.5) AS BIGINT) AS m2
        |  FROM base GROUP BY 1),
        |dev AS (
        |  SELECT base.event_type, m2, abs(c * 2 - m2) AS dev2
        |  FROM base JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type,
        |         CAST(2 * quantile_cont(dev2, 0.5) AS BIGINT) AS mad4
        |  FROM dev GROUP BY 1)
        |SELECT dev.event_type, count(*) AS n,
        |       max(m2) AS med_half_cents,
        |       max(mad4) AS mad_quarter_cents,
        |       CAST(sum(CASE WHEN dev2 * 10000 > mad4 * 22239
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad USING (event_type)
        |GROUP BY 1""".stripMargin,
    "o6_hash_sample" ->
      """SELECT o_custkey % 4 AS tenant_id, o_orderkey, o_orderstatus
        |FROM orders WHERE (o_orderkey * 48271) % 100000 < 10000""".stripMargin,
    "o9_balanced_sample" ->
      """WITH c AS (SELECT lang, count(*) AS n_lang
        |           FROM documents GROUP BY lang)
        |SELECT d.doc_id, d.lang, c.n_lang
        |FROM documents d JOIN c ON d.lang = c.lang
        |WHERE (((d.doc_id * 48271) % 100000) % 1000) * c.n_lang < 75000""".stripMargin,
    "o10_stratified_sample" ->
      """WITH r AS (
        |  SELECT lang, doc_id, (doc_id * 48271) % 100000 AS hkey,
        |         row_number() OVER (PARTITION BY lang
        |           ORDER BY (doc_id * 48271) % 100000, doc_id) AS sample_rank
        |  FROM documents)
        |SELECT lang, CAST(sample_rank AS INT) AS sample_rank, doc_id, hkey
        |FROM r WHERE sample_rank <= 40""".stripMargin,
    "a18_profile_orders" ->
      """SELECT count(*) AS n_rows,
        |       CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT) AS null_keys,
        |       CAST(count(*) FILTER (WHERE o_orderstatus IS NULL) AS BIGINT) AS null_status,
        |       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |       min(o_orderdate) AS min_date, max(o_orderdate) AS max_date,
        |       count(DISTINCT o_orderstatus) AS n_statuses,
        |       count(DISTINCT o_custkey) AS n_customers
        |FROM orders""".stripMargin,
    "u9_impute_median" ->
      """WITH b AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 13 = 0 THEN NULL
        |              ELSE o_totalprice END AS v
        |  FROM orders),
        |m AS (
        |  SELECT o_orderstatus,
        |         quantile_cont(CAST(round(v * 100) AS BIGINT), 0.5) AS med_cents
        |  FROM b WHERE v IS NOT NULL GROUP BY 1)
        |SELECT o_orderkey, b.o_orderstatus,
        |       coalesce(v, med_cents / 100.0::DOUBLE) AS value_imputed,
        |       v IS NULL AS was_imputed
        |FROM b JOIN m ON b.o_orderstatus = m.o_orderstatus""".stripMargin,
    "o7_dataset_split" ->
      """SELECT doc_id, lang,
        |       CASE WHEN (doc_id * 48271) % 100000 % 100 < 80 THEN 'train'
        |            WHEN (doc_id * 48271) % 100000 % 100 < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents""".stripMargin,
    "w5_sliding_quarter_hourly" ->
      """WITH k AS (SELECT unnest(generate_series(0, 3)) AS k),
        |member AS (
        |  SELECT time_bucket(INTERVAL '15 minutes', ts)
        |           - k.k * INTERVAL '15 minutes' AS win_start,
        |         value
        |  FROM events CROSS JOIN k)
        |SELECT win_start, win_start + INTERVAL '1 hour' AS win_end,
        |       count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |FROM member GROUP BY win_start""".stripMargin,
    "a19_tenant_unpivot" ->
      """WITH w AS (
        |  SELECT user_id % 4 AS tenant_id,
        |         CAST(count(*) AS DOUBLE) AS n_events,
        |         CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users,
        |         CAST(sum(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
        |  FROM events GROUP BY 1)
        |SELECT tenant_id, 'n_events' AS metric, n_events AS value FROM w
        |UNION ALL
        |SELECT tenant_id, 'n_users' AS metric, n_users AS value FROM w
        |UNION ALL
        |SELECT tenant_id, 'total_value' AS metric, total_value AS value FROM w""".stripMargin,
    "a21_value_hour_corr" ->
      """WITH xy AS (
        |  SELECT CAST(value AS DECIMAL(12,2)) AS x,
        |         CAST(hour(ts) AS DECIMAL(12,2)) AS y
        |  FROM events),
        |sums AS (
        |  SELECT count(*) AS n,
        |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x * y) AS DOUBLE) AS sxy,
        |         CAST(sum(x * x) AS DOUBLE) AS sxx,
        |         CAST(sum(y * y) AS DOUBLE) AS syy
        |  FROM xy)
        |SELECT n,
        |       (sxy * n - sx * sy)
        |         / (sqrt(sxx * n - sx * sx) * sqrt(syy * n - sy * sy)) AS pearson_r
        |FROM sums""".stripMargin,
    "a22_status_priority_listagg" ->
      """SELECT o_orderstatus,
        |       string_agg(DISTINCT o_orderpriority, ','
        |                  ORDER BY o_orderpriority) AS priorities,
        |       CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "w6_tenant_value_ranks" ->
      """SELECT tenant_id, o_orderkey, o_totalprice, rnk, drnk, prank, cdist
        |FROM (
        |  SELECT o_custkey % 4 AS tenant_id, o_orderkey, o_totalprice,
        |         rank() OVER w AS rnk,
        |         dense_rank() OVER w AS drnk,
        |         percent_rank() OVER w AS prank,
        |         cume_dist() OVER w AS cdist,
        |         row_number() OVER w AS rn
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey % 4
        |               ORDER BY o_totalprice DESC, o_orderkey ASC))
        |WHERE rn <= 50""".stripMargin,
    // the heap aggregate's ranking contract stated declaratively: the
    // window form it replaces
    "w7_top_orders_heap" ->
      """SELECT o_custkey, CAST(rn AS INT) AS rank, o_orderkey, o_totalprice
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3""".stripMargin,
    "u10_winsorize" ->
      """WITH e AS (
        |  SELECT event_id, value,
        |         CAST(floor(value * 100.0::DOUBLE) AS BIGINT) AS cents
        |  FROM events),
        |p AS (SELECT quantile_cont(cents, [0.05, 0.95]) AS pp FROM e)
        |SELECT event_id, value,
        |       least(greatest(CAST(cents AS DOUBLE), pp[1]), pp[2])
        |         / 100.0::DOUBLE AS value_winsorized
        |FROM e CROSS JOIN p""".stripMargin,
    "o8_quality_deciles" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_distinct(toks)) AS INT) AS n_uniq
        |  FROM t),
        |q AS (
        |  SELECT doc_id,
        |         least(greatest(
        |           least(CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
        |           + (CAST(n_uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 0.5::DOUBLE,
        |           0.0::DOUBLE), 1.0::DOUBLE) AS quality_score
        |  FROM s),
        |qb AS (
        |  SELECT doc_id, quality_score,
        |         CAST(floor(quality_score * 10000.0::DOUBLE) AS BIGINT) AS qbin
        |  FROM q),
        |e AS (
        |  SELECT quantile_cont(qbin,
        |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS edges
        |  FROM qb)
        |SELECT doc_id, quality_score,
        |       CAST(10 - len(list_filter(e.edges,
        |         x -> CAST(qb.qbin AS DOUBLE) > x)) AS INT) AS decile
        |FROM qb CROSS JOIN e""".stripMargin)
}
