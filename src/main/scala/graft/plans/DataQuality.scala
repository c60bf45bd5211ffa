package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Column-level data-quality constraints (Deequ-style), the validation
  * layer the reference runs informally (pydantic models at ingest,
  * database/models.py:25-146; reconciliation gates at sync time,
  * etl/reconciliation.py:324-405) made a first-class, declarative
  * suite: each constraint is one aggregate expression over the frame,
  * so an entire suite is ONE map-side-combined pass per table — at
  * 100 TB you pay a single scan per table for any number of
  * constraints, never a scan per check.
  *
  * Violation COUNTS (not booleans) are the output: they grade severity,
  * diff across runs, and stay exact integers for the oracle.
  */
object DataQuality {

  /** One constraint: a name and a violation-counting aggregate. */
  final case class Check(name: String, violations: Column)

  /** Count of rows where `pred` holds (the violation predicate). */
  def countWhere(pred: Column): Column =
    sum(when(pred, 1L).otherwise(0L))

  /** Run a suite over one frame in a single aggregation pass; emits one
    * row per check: (constraint, n_violations, n_checked, pass). */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    val aggs = count(lit(1)).as("n_checked") +:
      checks.map(c => coalesce(c.violations, lit(0L)).as(c.name))
    val one = df.agg(aggs.head, aggs.tail: _*)
    val pairs = checks.flatMap(c => Seq(lit(c.name), col(c.name)))
    one.select(col("n_checked"), map(pairs: _*).as("m"))
      .select(explode(col("m")).as(Seq("constraint", "n_violations")),
        col("n_checked"))
      .select(col("constraint"), col("n_violations"), col("n_checked"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** The registered suite over the driver's star schema: primary-key
    * uniqueness, domain/range rules, null rules, and cross-table
    * referential integrity — one pass over orders, one anti-join for
    * the foreign key. */
  def constraintReport(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(spark, dir)
    val ordersChecks = validate(o, Seq(
      Check("orders_no_null_key",
        countWhere(col("o_orderkey").isNull || col("o_custkey").isNull)),
      Check("orders_price_nonneg", countWhere(col("o_totalprice") < 0)),
      Check("orders_status_vocab",
        countWhere(!col("o_orderstatus").isin("O", "F", "P"))),
      Check("orders_priority_nonempty",
        countWhere(col("o_orderpriority").isNull ||
          col("o_orderpriority") === ""))))
    // uniqueness needs a distinct, not just an aggregate — count vs
    // count(distinct) in the same single pass
    val pk = o.agg(count(lit(1)).as("n_checked"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("n_violations"))
      .select(lit("orders_pk_unique").as("constraint"), col("n_violations"),
        col("n_checked"), (col("n_violations") === 0L).as("pass"))
    // referential integrity: lineitem rows whose order does not exist
    val l = graft.Tables.lineitem(spark, dir)
    val orphans = l.select(col("l_orderkey"))
      .join(o.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("n_violations"))
      .crossJoin(broadcast(l.agg(count(lit(1)).as("n_checked"))))
      .select(lit("lineitem_fk_orders").as("constraint"), col("n_violations"),
        col("n_checked"), (col("n_violations") === 0L).as("pass"))
    ordersChecks.unionByName(pk).unionByName(orphans)
  }

  /** Column profiling (ANALYZE-style statistics) over the orders table:
    * per column, the row/null/distinct counts, lexicographic min/max and
    * total rendered length — the stats layer an optimizer or a data
    * catalog keeps, and the first thing a pipeline owner asks of a new
    * 100 TB drop ("how null, how skewed, how wide").
    *
    * ONE aggregation pass: all columns' statistics are aggregate
    * expressions in a single agg (the multi-count-distinct runs via
    * Catalyst's expand — k distinct columns cost a k-way row expansion
    * in the map stage, still one shuffle, no per-column scans), then the
    * 1-row result unpivots driver-free via stack(). Values are rendered
    * to strings so the output schema is uniform; min/max on the string
    * rendering is deliberate (portable across engines, and the profile
    * is diagnostic, not arithmetic). */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val o = graft.Tables.orders(spark, dir)
    val cols = Seq("o_orderstatus", "o_orderpriority", "o_custkey")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      val s = col(c).cast("string")
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls"),
        countDistinct(col(c)).as(s"${c}_ndv"),
        min(s).as(s"${c}_min"), max(s).as(s"${c}_max"),
        sum(length(s)).as(s"${c}_len"))
    }
    val one = o.agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.map(c =>
      s"'$c', ${c}_nulls, ${c}_ndv, ${c}_min, ${c}_max, ${c}_len").mkString(", ")
    one.select(col("n_rows"), expr(
        s"stack(${cols.size}, $stackArgs) AS " +
          "(col_name, n_nulls, n_distinct, min_val, max_val, sum_len)"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"), col("min_val"), col("max_val"), col("sum_len"))
  }

  /** Benford first-digit audit over order totals: the distribution of
    * the leading digit of o_totalprice (in exact cents) against
    * Benford's law — the classic large-corpus anomaly screen for
    * fabricated or truncated numeric feeds. Digits are extracted from
    * the decimal rendering of an exact integer, counts normalize in
    * integer per-mille against a broadcast scalar total, and the
    * expected distribution is a shared literal table — every value
    * replays bit-for-bit in the oracle. */
  def benfordDigits(spark: SparkSession, dir: String): DataFrame = {
    val benford = array(Seq(301, 176, 124, 96, 79, 66, 57, 51, 45).map(lit): _*)
    val d = graft.Tables.orders(spark, dir)
      .select(expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
        .as("cents"))
      .select(substring(col("cents").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    d.crossJoin(broadcast(d.agg(sum(col("n")).as("total"))))
      .select(col("digit"), col("n"),
        expr("n * 1000 div total").as("p_mille"),
        element_at(benford, col("digit")).as("expected_mille"))
  }

  /** Join-key skew diagnostics: the one-row profile a planner needs
    * before shuffling 100 TB on a key — row/key counts, the hottest
    * key's share, and the collision probability (the chance two random
    * rows share a key, sum n_i(n_i-1)/N(N-1) — the quantity that
    * predicts reducer blow-up under a hash shuffle). Exact integers:
    * share in per-mille, collision in per-million. One groupBy plus one
    * scalar aggregate; at extreme corpus sizes the products upgrade to
    * DECIMAL(38,0) — the shape is unchanged. */
  def keySkew(spark: SparkSession, dir: String): DataFrame = {
    val perKey = graft.Tables.orders(spark, dir)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    perKey.agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_keys"),
        max(col("n")).as("max_key_rows"),
        sum(col("n") * (col("n") - 1)).as("coll_num"))
      // NULLIF: a 0/1-row table must yield NULL ratios in both engines,
      // not a DuckDB division error
      .select(lit("o_custkey").as("key_col"), col("n_rows"), col("n_keys"),
        col("max_key_rows"),
        expr("max_key_rows * 1000 div nullif(n_rows, 0)")
          .as("top_share_mille"),
        expr("coll_num * 1000000 div nullif(n_rows * (n_rows - 1), 0)")
          .as("collision_micro"))
  }

  /** Column-entropy profile: Shannon entropy of each profiled column's
    * value distribution in exact milli-bits (the interpolated integer
    * milli-log2 chain shared with BM25/PSI), plus the entropy normalized
    * by log2(ndv) in milli — the information-density read a catalog
    * keeps next to [[columnProfile]]'s counts: near-zero entropy means a
    * constant-in-disguise (drop it from features), near-1000 normalized
    * means uniform (a good partition/shuffle key), and entropy DRIFT
    * between ingests is a schema-less anomaly alarm.
    *
    * Identity used: `H = L(N) − (Σ nᵢ·L(nᵢ)) div N` with L the
    * milli-log2 — one floor division at the end, so the value replays
    * bit-for-bit. Plan: the columns melt into (col, value) rows in ONE
    * pass over the (pruned) scan, then one grouped count and one
    * bounded per-column roll-up — at 100 TB this is a single shuffle
    * keyed (col, value), the same cost as profiling one column. */
  def columnEntropy(spark: SparkSession, dir: String): DataFrame =
    columnEntropyOf(graft.Tables.orders(spark, dir),
      Seq("o_orderstatus", "o_orderpriority", "o_custkey"))

  /** Library form: entropy profile of the named columns of any frame. */
  def columnEntropyOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val melted = df.select(explode(map(cols.flatMap(c =>
      Seq(lit(c), col(c).cast("string"))): _*)).as(Seq("col_name", "v")))
    val log2m = graft.ml.TextOps.log2mExpr _
    melted.groupBy("col_name", "v").agg(count(lit(1)).as("n"))
      .groupBy("col_name").agg(
        sum(col("n")).as("n_rows"),
        count(lit(1)).as("n_distinct"),
        sum(expr(s"n * (${log2m("n")})")).as("s_nl"))
      .selectExpr("col_name", "n_rows", "n_distinct",
        s"(${log2m("n_rows")}) - s_nl div n_rows AS entropy_milli_bits",
        s"((${log2m("n_rows")}) - s_nl div n_rows) * 1000" +
          s" div nullif(${log2m("n_distinct")}, 0) AS norm_entropy_milli")
  }

  /** Functional-dependency audit — schema-discovery DQ: for each
    * candidate FD `det → dep`, how many determinant values map to MORE
    * than one dependent value (and how badly). `n_violating_det = 0`
    * certifies the dependency (safe to normalize out / trust as a
    * lookup); a large `max_dep_per_det` on a supposed FD is an
    * upstream-join fan-out alarm. The registered suite mixes FDs that
    * HOLD on the corpus with ones that must fail, so both verdicts are
    * exercised.
    *
    * Plan: each FD is one grouped exact `count(distinct dep)` keyed by
    * determinant value — shuffle on (fd, det value), map-side partial
    * counts, then a bounded per-FD roll-up. No FD ever funnels through
    * a single reducer. */
  def fdAudit(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val o = Tables.orders(spark, dir)
    val l = Tables.lineitem(spark, dir)
    val c = Tables.customer(spark, dir)
    val cases = Seq(
      ("orders: o_orderkey -> o_custkey",
        o.select(col("o_orderkey").cast("string").as("dv"),
          col("o_custkey").cast("string").as("pv"))),
      ("orders: o_custkey -> o_orderpriority",
        o.select(col("o_custkey").cast("string").as("dv"),
          col("o_orderpriority").as("pv"))),
      ("lineitem: l_orderkey -> l_suppkey",
        l.select(col("l_orderkey").cast("string").as("dv"),
          col("l_suppkey").cast("string").as("pv"))),
      ("customer: c_custkey -> c_nationkey",
        c.select(col("c_custkey").cast("string").as("dv"),
          col("c_nationkey").cast("string").as("pv"))))
    cases.map { case (name, df) =>
      fdAuditOf(df.withColumn("fd", lit(name)))
    }.reduce(_.unionByName(_))
  }

  /** Library form: one audit row per distinct `fd` of a (fd, dv, pv)
    * frame — determinant-value counts, violating determinants, the
    * worst fan-out, and rows living under violating determinants. */
  def fdAuditOf(df: DataFrame): DataFrame =
    df.groupBy("fd", "dv")
      .agg(countDistinct(col("pv")).as("ndp"), count(lit(1)).as("nrows"))
      .groupBy("fd").agg(
        count(lit(1)).as("n_det_values"),
        sum(when(col("ndp") > 1, 1L).otherwise(0L)).as("n_violating_det"),
        max(col("ndp")).as("max_dep_per_det"),
        sum(when(col("ndp") > 1, col("nrows")).otherwise(0L))
          .as("n_rows_in_violation"))
      .withColumn("holds",
        expr("CAST(n_violating_det = 0 AS BIGINT)"))

  /** Referential-integrity audit — the orphan-key scan a warehouse
    * runs before trusting its star schema's joins: for every declared
    * FK edge, the child row count, the orphan rows (child keys with no
    * parent), and the distinct orphan key count. All-zero orphans is
    * the healthy reading; any non-zero is broken lineage that would
    * silently DROP rows from every inner join downstream.
    *
    * Plan: each edge is one anti join keyed on the FK (broadcast when
    * the parent key set is small, shuffle otherwise — Spark's planner
    * picks per edge) collapsed map-side into one row. */
  def refIntegrity(spark: SparkSession, dir: String): DataFrame = {
    import graft.Tables
    val edges = Seq(
      ("lineitem.l_orderkey -> orders.o_orderkey",
        Tables.lineitem(spark, dir).select(col("l_orderkey").as("fk")),
        Tables.orders(spark, dir).select(col("o_orderkey").as("pk"))),
      ("lineitem.l_partkey -> part.p_partkey",
        Tables.lineitem(spark, dir).select(col("l_partkey").as("fk")),
        Tables.part(spark, dir).select(col("p_partkey").as("pk"))),
      ("lineitem.l_suppkey -> supplier.s_suppkey",
        Tables.lineitem(spark, dir).select(col("l_suppkey").as("fk")),
        Tables.supplier(spark, dir).select(col("s_suppkey").as("pk"))),
      ("orders.o_custkey -> customer.c_custkey",
        Tables.orders(spark, dir).select(col("o_custkey").as("fk")),
        Tables.customer(spark, dir).select(col("c_custkey").as("pk"))),
      ("customer.c_nationkey -> nation.n_nationkey",
        Tables.customer(spark, dir).select(col("c_nationkey").as("fk")),
        Tables.nation(spark, dir).select(col("n_nationkey").as("pk"))))
    edges.map { case (name, child, parent) =>
      refIntegrityOf(name, child, parent)
    }.reduce(_.unionByName(_))
  }

  /** Library form: the single-edge audit row. */
  def refIntegrityOf(fkName: String, child: DataFrame,
      parent: DataFrame): DataFrame = {
    val orphans = child.join(parent,
      child("fk") === parent("pk"), "left_anti")
    child.agg(count(lit(1)).as("n_child_rows"))
      .crossJoin(broadcast(orphans.agg(
        count(lit(1)).as("n_orphan_rows"),
        countDistinct(col("fk")).as("n_orphan_keys"))))
      .select(lit(fkName).as("fk_edge"), col("n_child_rows"),
        col("n_orphan_rows"), col("n_orphan_keys"))
  }

  /** K-anonymity audit — the re-identification governance check a
    * training-data release runs before shipping: group the table by its
    * quasi-identifier tuple (tenant, status, time bucket), report the
    * minimum group size (the table's k-anonymity level), how many
    * groups fall below the k threshold, and how many rows those
    * at-risk groups expose. Two generalization levels (month, then
    * quarter) in one result, showing the standard remedy — coarsen the
    * quasi-identifier until k clears the bar.
    *
    * Scale: each level is one grouped count (map-side combined) plus a
    * scalar roll-up — bounded output at any table size. */
  def kAnonymity(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val base = graft.Tables.orders(spark, dir)
      .select((col("o_custkey") % 4).as("tenant_id"),
        col("o_orderstatus").as("status"), col("o_orderdate"))
    def level(name: String, bucket: Column): DataFrame =
      base.select(col("tenant_id"), col("status"), bucket.as("bucket"))
        .groupBy("tenant_id", "status", "bucket")
        .agg(count(lit(1)).as("n"))
        .agg(sum(col("n")).as("n_rows"),
          count(lit(1)).as("n_groups"),
          min(col("n")).as("k_anonymity"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("groups_below_k"),
          sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_at_risk"))
        .select(lit(name).as("level"), col("n_rows"), col("n_groups"),
          col("k_anonymity"), col("groups_below_k"), col("rows_at_risk"))
    level("month", date_format(col("o_orderdate"), "yyyy-MM"))
      .unionByName(level("quarter",
        concat(year(col("o_orderdate")), lit("-Q"),
          quarter(col("o_orderdate")))))
  }

  /** Distribution-drift monitor (PSI — population stability index, the
    * standard train/serve drift alarm): the reference snapshot (even
    * doc ids — the deterministic stand-in for "last ingest", same
    * convention as the contamination split) vs the current one (odd
    * ids), compared on the document-length distribution over a bounded
    * 16-bucket grid. Per bucket: counts, milli shares, and the PSI
    * contribution `(p − q) · log(p/q)` in exact integers — shares in
    * milli, the log via the established interpolated milli-log2
    * ([[graft.ml.TextOps.log2mExpr]], +1 Laplace smoothing so empty
    * buckets stay finite), so the whole report replays bit-for-bit.
    * Σ contrib_micro is the corpus PSI in micro-log2 units — the
    * number an ingest gate alerts on (>0.2·ln2 scaled ≈ major shift).
    *
    * Scale: two bounded grouped counts + a bounded full-outer join —
    * nothing grows with the corpus. */
  def driftPsi(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"),
        least(expr("n_chars div 200"), lit(15L)).as("bucket"))
    driftPsiOf(docs.filter(col("doc_id") % 2 === 0).select("bucket"),
      docs.filter(col("doc_id") % 2 === 1).select("bucket"))
  }

  /** Library form over two (bucket) observation frames. */
  def driftPsiOf(refBuckets: DataFrame, curBuckets: DataFrame): DataFrame = {
    val ref = refBuckets.groupBy("bucket").agg(count(lit(1)).as("n_ref"))
    val cur = curBuckets.groupBy("bucket").agg(count(lit(1)).as("n_cur"))
    val tr = ref.agg(sum(col("n_ref")).as("t_ref"))
    val tc = cur.agg(sum(col("n_cur")).as("t_cur"))
    val log2m = graft.ml.TextOps.log2mExpr _
    ref.join(cur, Seq("bucket"), "full_outer")
      .select(col("bucket"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
      .crossJoin(broadcast(tr)).crossJoin(broadcast(tc))
      .selectExpr("bucket", "n_ref", "n_cur",
        "n_ref * 1000 div t_ref AS p_milli",
        "n_cur * 1000 div t_cur AS q_milli")
      .selectExpr("bucket", "n_ref", "n_cur", "p_milli", "q_milli",
        s"(p_milli - q_milli) * (${log2m("p_milli + 1")}" +
          s" - (${log2m("q_milli + 1")})) AS contrib_micro")
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "dq_constraints" -> ((s, d) => constraintReport(s, d)),
    "dq_column_profile" -> ((s, d) => columnProfile(s, d)),
    "dq_benford" -> ((s, d) => benfordDigits(s, d)),
    "dq_k_anonymity" -> ((s, d) => kAnonymity(s, d)),
    "dq_column_entropy" -> ((s, d) => columnEntropy(s, d)),
    "dq_fd_audit" -> ((s, d) => fdAudit(s, d)),
    "dq_ref_integrity" -> ((s, d) => refIntegrity(s, d)),
    "dq_drift_psi" -> ((s, d) => driftPsi(s, d)),
    "dq_key_skew" -> ((s, d) => keySkew(s, d)))

  /** The interpolated milli-log2 in DuckDB form (same chain as the PSI
    * oracle) over a positive integral SQL expression. */
  private def duckLog2m(x: String): String =
    s"((length(bin($x)) - 1) * 1000 + ($x) * 1000" +
      s" // CAST(pow(2, length(bin($x)) - 1) AS BIGINT) - 1000)"

  private def columnEntropyOracle: String = {
    val ent = s"${duckLog2m("n_rows")} - s_nl // n_rows"
    s"""WITH m AS (
      |  SELECT u.k AS col_name, u.v FROM (
      |    SELECT unnest([
      |      {'k': 'o_orderstatus', 'v': CAST(o_orderstatus AS VARCHAR)},
      |      {'k': 'o_orderpriority', 'v': CAST(o_orderpriority AS VARCHAR)},
      |      {'k': 'o_custkey', 'v': CAST(o_custkey AS VARCHAR)}]) AS u
      |    FROM orders)),
      |c AS (SELECT col_name, v, CAST(count(*) AS BIGINT) AS n
      |      FROM m GROUP BY 1, 2),
      |a AS (
      |  SELECT col_name, CAST(sum(n) AS BIGINT) AS n_rows,
      |         count(*) AS n_distinct,
      |         CAST(sum(n * ${duckLog2m("n")}) AS BIGINT) AS s_nl
      |  FROM c GROUP BY 1)
      |SELECT col_name, n_rows, n_distinct,
      |       CAST($ent AS BIGINT) AS entropy_milli_bits,
      |       CAST(($ent) * 1000 // NULLIF(${duckLog2m("n_distinct")}, 0)
      |         AS BIGINT) AS norm_entropy_milli
      |FROM a""".stripMargin
  }

  private def fdAuditOracle: String =
    """WITH u AS (
      |  SELECT 'orders: o_orderkey -> o_custkey' AS fd,
      |         CAST(o_orderkey AS VARCHAR) AS dv,
      |         CAST(o_custkey AS VARCHAR) AS pv FROM orders
      |  UNION ALL
      |  SELECT 'orders: o_custkey -> o_orderpriority',
      |         CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
      |  UNION ALL
      |  SELECT 'lineitem: l_orderkey -> l_suppkey',
      |         CAST(l_orderkey AS VARCHAR),
      |         CAST(l_suppkey AS VARCHAR) FROM lineitem
      |  UNION ALL
      |  SELECT 'customer: c_custkey -> c_nationkey',
      |         CAST(c_custkey AS VARCHAR),
      |         CAST(c_nationkey AS VARCHAR) FROM customer),
      |g AS (
      |  SELECT fd, dv, CAST(count(DISTINCT pv) AS BIGINT) AS ndp,
      |         CAST(count(*) AS BIGINT) AS nrows
      |  FROM u GROUP BY 1, 2)
      |SELECT fd, CAST(count(*) AS BIGINT) AS n_det_values,
      |       CAST(sum(CASE WHEN ndp > 1 THEN 1 ELSE 0 END) AS BIGINT)
      |         AS n_violating_det,
      |       CAST(max(ndp) AS BIGINT) AS max_dep_per_det,
      |       CAST(sum(CASE WHEN ndp > 1 THEN nrows ELSE 0 END) AS BIGINT)
      |         AS n_rows_in_violation,
      |       CAST(sum(CASE WHEN ndp > 1 THEN 1 ELSE 0 END) = 0 AS BIGINT)
      |         AS holds
      |FROM g GROUP BY 1""".stripMargin

  private def refIntegrityOracle: String = {
    def arm(name: String, child: String, fk: String, parent: String,
        pk: String): String =
      s"""SELECT '$name' AS fk_edge,
        |  CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_child_rows,
        |  CAST((SELECT count(*) FROM $child
        |        WHERE $fk NOT IN (SELECT $pk FROM $parent)) AS BIGINT)
        |    AS n_orphan_rows,
        |  CAST((SELECT count(DISTINCT $fk) FROM $child
        |        WHERE $fk NOT IN (SELECT $pk FROM $parent)) AS BIGINT)
        |    AS n_orphan_keys""".stripMargin
    Seq(
      arm("lineitem.l_orderkey -> orders.o_orderkey",
        "lineitem", "l_orderkey", "orders", "o_orderkey"),
      arm("lineitem.l_partkey -> part.p_partkey",
        "lineitem", "l_partkey", "part", "p_partkey"),
      arm("lineitem.l_suppkey -> supplier.s_suppkey",
        "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      arm("orders.o_custkey -> customer.c_custkey",
        "orders", "o_custkey", "customer", "c_custkey"),
      arm("customer.c_nationkey -> nation.n_nationkey",
        "customer", "c_nationkey", "nation", "n_nationkey"))
      .mkString("\nUNION ALL\n")
  }

  val oracles: Map[String, String] = Map(
    "dq_column_entropy" -> columnEntropyOracle,
    "dq_fd_audit" -> fdAuditOracle,
    "dq_ref_integrity" -> refIntegrityOracle,
    "dq_drift_psi" ->
      """WITH d AS (
        |  SELECT doc_id, least(n_chars // 200, 15) AS bucket FROM documents),
        |r AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_ref
        |      FROM d WHERE doc_id % 2 = 0 GROUP BY 1),
        |c AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_cur
        |      FROM d WHERE doc_id % 2 = 1 GROUP BY 1),
        |tr AS (SELECT CAST(sum(n_ref) AS BIGINT) AS t_ref FROM r),
        |tc AS (SELECT CAST(sum(n_cur) AS BIGINT) AS t_cur FROM c),
        |j AS (
        |  SELECT COALESCE(r.bucket, c.bucket) AS bucket,
        |         COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
        |  FROM r FULL OUTER JOIN c ON r.bucket = c.bucket),
        |m AS (
        |  SELECT bucket, n_ref, n_cur,
        |         CAST(n_ref * 1000 // t_ref AS BIGINT) AS p_milli,
        |         CAST(n_cur * 1000 // t_cur AS BIGINT) AS q_milli
        |  FROM j CROSS JOIN tr CROSS JOIN tc)
        |SELECT bucket, n_ref, n_cur, p_milli, q_milli,
        |       CAST((p_milli - q_milli) *
        |         (((length(bin(p_milli + 1)) - 1) * 1000
        |            + (p_milli + 1) * 1000
        |              // CAST(pow(2, length(bin(p_milli + 1)) - 1) AS BIGINT) - 1000)
        |          - ((length(bin(q_milli + 1)) - 1) * 1000
        |            + (q_milli + 1) * 1000
        |              // CAST(pow(2, length(bin(q_milli + 1)) - 1) AS BIGINT) - 1000))
        |         AS BIGINT) AS contrib_micro
        |FROM m""".stripMargin,
    "dq_k_anonymity" ->
      """WITH base AS (
        |  SELECT o_custkey % 4 AS tenant_id, o_orderstatus AS status,
        |         o_orderdate
        |  FROM orders),
        |gm AS (
        |  SELECT count(*) AS n FROM base
        |  GROUP BY tenant_id, status, strftime(o_orderdate, '%Y-%m')),
        |gq AS (
        |  SELECT count(*) AS n FROM base
        |  GROUP BY tenant_id, status,
        |           year(o_orderdate)::VARCHAR || '-Q' ||
        |           quarter(o_orderdate)::VARCHAR)
        |SELECT 'month' AS level, CAST(sum(n) AS BIGINT) AS n_rows,
        |       count(*) AS n_groups, CAST(min(n) AS BIGINT) AS k_anonymity,
        |       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS groups_below_k,
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |         AS rows_at_risk
        |FROM gm
        |UNION ALL
        |SELECT 'quarter', CAST(sum(n) AS BIGINT), count(*),
        |       CAST(min(n) AS BIGINT),
        |       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
        |       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |FROM gq""".stripMargin,
    "dq_key_skew" ->
      """WITH k AS (
        |  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1),
        |s AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS n_rows,
        |         count(*) AS n_keys,
        |         CAST(max(n) AS BIGINT) AS max_key_rows,
        |         CAST(sum(n * (n - 1)) AS BIGINT) AS coll_num
        |  FROM k)
        |SELECT 'o_custkey' AS key_col, n_rows, n_keys, max_key_rows,
        |       CAST(max_key_rows * 1000 // NULLIF(n_rows, 0) AS BIGINT)
        |         AS top_share_mille,
        |       CAST(coll_num * 1000000 // NULLIF(n_rows * (n_rows - 1), 0)
        |         AS BIGINT) AS collision_micro
        |FROM s""".stripMargin,
    "dq_column_profile" ->
      """SELECT 'o_orderstatus' AS col_name, count(*) AS n_rows,
        |       CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        |       count(DISTINCT o_orderstatus) AS n_distinct,
        |       min(CAST(o_orderstatus AS VARCHAR)) AS min_val,
        |       max(CAST(o_orderstatus AS VARCHAR)) AS max_val,
        |       CAST(sum(length(CAST(o_orderstatus AS VARCHAR))) AS BIGINT) AS sum_len
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', count(*),
        |       CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       count(DISTINCT o_orderpriority),
        |       min(CAST(o_orderpriority AS VARCHAR)),
        |       max(CAST(o_orderpriority AS VARCHAR)),
        |       CAST(sum(length(CAST(o_orderpriority AS VARCHAR))) AS BIGINT)
        |FROM orders
        |UNION ALL
        |SELECT 'o_custkey', count(*),
        |       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |       count(DISTINCT o_custkey),
        |       min(CAST(o_custkey AS VARCHAR)),
        |       max(CAST(o_custkey AS VARCHAR)),
        |       CAST(sum(length(CAST(o_custkey AS VARCHAR))) AS BIGINT)
        |FROM orders""".stripMargin,
    "dq_benford" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
        |  FROM orders),
        |d AS (
        |  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
        |         count(*) AS n
        |  FROM c GROUP BY 1),
        |t AS (SELECT sum(n) AS total FROM d)
        |SELECT digit, n, CAST(n * 1000 // total AS BIGINT) AS p_mille,
        |       [301,176,124,96,79,66,57,51,45][digit] AS expected_mille
        |FROM d CROSS JOIN t""".stripMargin,
    "dq_constraints" ->
      """WITH o AS (SELECT * FROM orders),
        |base AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
        |         CAST(sum(CASE WHEN o_orderkey IS NULL OR o_custkey IS NULL
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_nullkey,
        |         CAST(sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_price,
        |         CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_status,
        |         CAST(sum(CASE WHEN o_orderpriority IS NULL
        |                         OR o_orderpriority = ''
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS v_prio,
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS v_pk
        |  FROM o),
        |fk AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_checked,
        |         CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
        |           AS BIGINT) AS v_fk
        |  FROM lineitem l LEFT JOIN o ON l.l_orderkey = o.o_orderkey)
        |SELECT * FROM (
        |  SELECT 'orders_no_null_key' AS constraint, v_nullkey AS n_violations,
        |         n_checked, v_nullkey = 0 AS pass FROM base
        |  UNION ALL
        |  SELECT 'orders_price_nonneg', v_price, n_checked, v_price = 0 FROM base
        |  UNION ALL
        |  SELECT 'orders_status_vocab', v_status, n_checked, v_status = 0 FROM base
        |  UNION ALL
        |  SELECT 'orders_priority_nonempty', v_prio, n_checked, v_prio = 0 FROM base
        |  UNION ALL
        |  SELECT 'orders_pk_unique', v_pk, n_checked, v_pk = 0 FROM base
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', v_fk, n_checked, v_fk = 0 FROM fk)""".stripMargin)
}
