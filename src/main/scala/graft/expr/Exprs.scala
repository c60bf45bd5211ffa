package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Pure-Column expression library — the row-level transformation surface of
  * the reference pipeline, re-expressed as codegen-friendly Catalyst
  * expressions (never UDFs). Each function cites the reference behavior it
  * reproduces (paths relative to /root/reference).
  *
  * Determinism contract: nothing here reads wall-clock or RNG state; every
  * function is a pure function of its input columns, so results are stable
  * across runs and across engines (required by the DuckDB oracle gate).
  */
object Exprs {

  // ---------------------------------------------------------------------
  // Date / time
  // ---------------------------------------------------------------------

  /** Strip English ordinal suffixes from day numbers: "4th October" ->
    * "4 October". Mirrors technical-details.md:934-935. */
  def stripOrdinals(c: Column): Column =
    regexp_replace(c, "(\\d+)(st|nd|rd|th)", "$1")

  /** Multi-format UK-ish date parse: try d/M/yyyy, then ISO, then
    * "4 October 2024" (after ordinal strip); null when nothing matches.
    * Mirrors technical-details.md:920-943 and
    * caseguard/hdr_timeline/smart_field_retriever.py:346-351.
    * The coalesce(try_to_date...) chain keeps the whole thing inside
    * whole-stage codegen — no UDF. */
  def multiFormatDate(c: Column): Column = {
    val cleaned = stripOrdinals(c)
    coalesce(
      try_to_timestamp(cleaned, lit("d/M/yyyy")).cast("date"),
      try_to_timestamp(cleaned, lit("yyyy-MM-dd")).cast("date"),
      try_to_timestamp(cleaned, lit("d MMMM yyyy")).cast("date"))
  }

  /** Age in hours relative to a fixed reference instant (the reference uses
    * NOW() — etl/flows/sync_daily_enhanced.py:167 — but wall-clock breaks
    * reproducibility, so the engine takes the "now" as data). */
  def ageHours(ts: Column, asOf: Column): Column =
    (unix_timestamp(asOf) - unix_timestamp(ts)).cast("double") / lit(3600.0)

  // ---------------------------------------------------------------------
  // Strings / currency
  // ---------------------------------------------------------------------

  /** Currency parse: "[Empty]" -> null, strip "£" and thousands commas,
    * cast to decimal(18,2). Mirrors technical-details.md:903-918. */
  def parseCurrency(c: Column): Column =
    when(c === lit("[Empty]") || c.isNull, lit(null).cast(DecimalType(18, 2)))
      .otherwise(regexp_replace(c, "[£,]", "").cast(DecimalType(18, 2)))

  /** Extract a money amount embedded in free text:
    * £?([0-9][0-9,]*\.[0-9]{2}) — smart_field_retriever.py:378-384. */
  def extractMoney(c: Column): Column =
    parseCurrency(nullif(regexp_extract(c, "([0-9][0-9,]*\\.[0-9]{2})", 1), lit("")))

  /** Extract the first d/m/y-looking date from free text —
    * smart_field_retriever.py:385-391. */
  def extractDateToken(c: Column): Column =
    nullif(regexp_extract(c, "(\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4})", 1), lit(""))

  /** Keyword containment over lowercase text: true if any term occurs.
    * Mirrors the timeline keyword search smart_field_retriever.py:232-252. */
  def containsAny(c: Column, terms: Seq[String]): Column =
    terms.map(t => lower(c).contains(lit(t))).reduce(_ || _)

  // ---------------------------------------------------------------------
  // Status / scoring
  // ---------------------------------------------------------------------

  /** Active-case predicate: is_active AND status not closed/complete —
    * etl/reconciliation.py:143-167. */
  def activeCase(isActive: Column, status: Column): Column =
    isActive && !lower(status).isin("closed", "complete")

  /** Status-keyword liveness: substring containment on the lowered status,
    * falling back to "no closed date" — proclaim/status_detector.py:99-124. */
  def statusIsLive(status: Column, dateClosed: Column): Column =
    when(lower(status).contains("complete") || lower(status).contains("closed") ||
         lower(status).contains("settled"), lit(false))
      .when(dateClosed.isNotNull, lit(false))
      .otherwise(lit(true))

  /** clamp(x, 0, 1) — ai/enricher.py:203-207. */
  def clamp01(c: Column): Column = least(greatest(c, lit(0.0)), lit(1.0))

  /** Weighted priority score — ai/enricher.py:264-274:
    * 0.3*settlement + 0.2*risk/10 + 0.2*complexity/10 + 0.3*urgency. */
  def priorityScore(settlement: Column, risk: Column, complexity: Column,
                    urgency: Column): Column =
    clamp01(settlement * lit(0.3) + (risk / lit(10.0)) * lit(0.2) +
      (complexity / lit(10.0)) * lit(0.2) + urgency * lit(0.3))

  /** 4-way priority bucket from a 0-1 score — status_detector.py:283-309. */
  def priorityLevel(score: Column): Column =
    when(score >= 0.8, "critical")
      .when(score >= 0.6, "high")
      .when(score >= 0.3, "medium")
      .otherwise("low")

  /** Freshness label from hours-since-update —
    * sync_daily_enhanced.py:168-173. */
  def freshnessStatus(hoursSince: Column, neverProcessed: Column): Column =
    when(neverProcessed, "never_processed")
      .when(hoursSince <= 24, "recent")
      .when(hoursSince <= 24 * 7, "moderate")
      .otherwise("stale")

  /** Activity label from watermark + recency — change_tracking.py:286-298. */
  def activityLevel(lastSerialno: Column, updatedRecently: Column,
                    updatedModerately: Column): Column =
    when(lastSerialno === 0, "never_processed")
      .when(updatedRecently, "high_activity")
      .when(updatedModerately, "moderate_activity")
      .otherwise("low_activity")

  // ---------------------------------------------------------------------
  // Hashing / ids
  // ---------------------------------------------------------------------

  /** Deterministic arithmetic serial-number derivation. The reference fakes
    * serial numbers as hash(case_ref) % 100000 (crm/discovery.py:221); we
    * use a multiplicative congruential form on the numeric key so the same
    * value is computable in any ANSI SQL engine (the DuckDB oracle cannot
    * reproduce Spark's murmur hash). Inputs must be non-negative. */
  def serialOf(key: Column): Column = (key * lit(48271L)) % lit(100000L)

  /** Content hash for dedup — sha256 hex, portable across engines.
    * Mirrors database/models.py:81 (content_hash). */
  def contentHash(c: Column): Column = sha2(c, 256)

  // ---------------------------------------------------------------------
  // JSON / maps
  // ---------------------------------------------------------------------

  /** Dot-path JSON field access (job payloads / props) —
    * smart_field_retriever.py:311-330 navigates dict paths; Spark has this
    * natively. */
  def jsonField(c: Column, path: String): Column =
    get_json_object(c, s"$$.$path")

  // ---------------------------------------------------------------------
  // Exact-arithmetic aggregation helpers (oracle parity)
  // ---------------------------------------------------------------------
  // Double sums are order-dependent; Spark's parallel partial aggregation
  // and DuckDB's sequential scan would drift in the low bits. Summing in
  // decimal is exact (associative), and one final cast to double lands on
  // the identical IEEE value in both engines.

  /** Exact sum of a money-ish double column, returned as double. */
  /** F23 — credential/config variable interpolation
    * (core/tenant_manager.py:428-456): a value that IS a `${VAR}`
    * reference (full-string match, nothing else counts) resolves
    * through the supplied variable map; an unresolvable reference keeps
    * the ORIGINAL `${VAR}` string — the reference's warn-and-keep
    * behavior. The map is a config-layer literal folded into the
    * expression (broadcast by construction, codegen'd `element_at` —
    * never a join, never an executor env read: executors must not need
    * driver-only secrets in their environment). */
  def interpolate(value: Column, vars: Map[String, String]): Column = {
    val name = regexp_extract(value, "^\\$\\{([A-Za-z0-9_]+)\\}$", 1)
    if (vars.isEmpty) value
    else {
      val m = map(vars.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
      when(name =!= "", coalesce(element_at(m, name), value)).otherwise(value)
    }
  }

  def moneySum(c: Column): Column =
    sum(c.cast(DecimalType(12, 2))).cast("double")

  /** Exact average (decimal sum / count), returned as double. */
  def moneyAvg(c: Column): Column =
    sum(c.cast(DecimalType(12, 2))).cast("double") / count(lit(1))

  /** Revenue term: extendedprice * (1 - discount), exact in decimal. */
  def revenueTerm(price: Column, discount: Column): Column =
    price.cast(DecimalType(12, 2)) * (lit(1).cast(DecimalType(12, 2)) - discount.cast(DecimalType(12, 2)))
}
