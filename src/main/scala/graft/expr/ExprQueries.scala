package graft.expr

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Declared queries exercising the expression library (SURVEY.md §2.8).
  * The testdata has no string-typed date/currency columns, so each query
  * synthesizes the reference's input shapes deterministically from
  * `orders`/`documents` with arithmetic both engines compute identically,
  * then applies the Exprs function under test. Everything stays inside
  * whole-stage codegen — no UDFs anywhere.
  */
object ExprQueries {
  type Q = (SparkSession, String) => DataFrame


  /** English ordinal suffix for a day-of-month (1st/2nd/3rd/4th...). */
  private def ordinalSuffix(day: Column): Column =
    when(day.isin(11, 12, 13), "th")
      .when(day % 10 === 1, "st")
      .when(day % 10 === 2, "nd")
      .when(day % 10 === 3, "rd")
      .otherwise("th")

  // -------------------------------------------------------------------
  // Builders
  // -------------------------------------------------------------------

  /** F7 — multi-format date parse round-trip: render o_orderdate in one of
    * three reference formats (UK slash, ISO, "4th October 2024"), parse it
    * back with the coalesce(try_to_timestamp...) chain. */
  def multiformatDates(spark: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate")
    val day = dayofmonth(d)
    val dateStr = when(col("o_orderkey") % 3 === 0, date_format(d, "d/M/yyyy"))
      .when(col("o_orderkey") % 3 === 1, date_format(d, "yyyy-MM-dd"))
      .otherwise(concat(day.cast("string"), ordinalSuffix(day), lit(" "),
        date_format(d, "MMMM yyyy")))
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), dateStr.as("date_str"))
      // render back to ISO text: DATE-typed outputs normalize differently
      // across engines (date vs midnight timestamp) in the compare layer
      .withColumn("parsed",
        date_format(Exprs.multiFormatDate(col("date_str")), "yyyy-MM-dd"))
  }

  /** F8 — currency parse: "£499,978.59" / "[Empty]" -> decimal -> double. */
  def currencyParse(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        when(col("o_orderkey") % 100 === 0, lit("[Empty]"))
          .otherwise(Synth.moneyStr(col("o_totalprice"))).as("money_str"))
      .withColumn("parsed_value",
        Exprs.parseCurrency(col("money_str")).cast("double"))

  /** F5 — regex money extraction from free text. */
  def extractMoney(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        concat(lit("Settlement agreed "), Synth.moneyStr(col("o_totalprice")), lit(" on file")).as("note"))
      .withColumn("amount", Exprs.extractMoney(col("note")).cast("double"))

  /** F6 — regex date-token extraction + parse from free text. */
  def extractDates(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        concat(lit("hearing on "), date_format(col("o_orderdate"), "d/M/yyyy"),
          lit(" confirmed")).as("note"))
      .withColumn("date_token", Exprs.extractDateToken(col("note")))
      .withColumn("parsed",
        date_format(Exprs.multiFormatDate(col("date_token")), "yyyy-MM-dd"))

  /** F9 — age in hours vs the newest order (reference uses NOW()). */
  def ageHours(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.crossJoin(broadcast(o.agg(max(col("o_orderdate")).as("max_d"))))
      .select(col("o_orderkey"),
        Exprs.ageHours(col("o_orderdate").cast("timestamp"),
          col("max_d").cast("timestamp")).as("age_hours"))
  }

  /** F12/F13/F14/U4/U5 — the full scoring pipeline: settlement heuristic,
    * urgency heuristic, weighted priority score, 4-way priority level. */
  def priorityScores(spark: SparkSession, dir: String): DataFrame = {
    val settlement = graft.metrics.Dashboard.settlementLikelihood(
      col("o_orderstatus"), col("o_orderpriority"), col("o_totalprice"))
    val risk = (col("o_orderkey") % 10).cast("double")
    val complexity = col("o_totalprice") / 100000.0
    val urgency = Exprs.clamp01(lit(0.1) + (col("o_orderkey") % 7).cast("double") / 10.0)
    Tables.orders(spark, dir)
      .select(col("o_orderkey"),
        settlement.as("settlement"),
        urgency.as("urgency"),
        Exprs.priorityScore(settlement, risk, complexity, urgency).as("priority_score"))
      .withColumn("priority_level", Exprs.priorityLevel(col("priority_score")))
  }

  /** F16 — portable serial-number hash. */
  def hashSerial(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), Exprs.serialOf(col("o_orderkey")).as("serialno"))

  /** F18 — JSON payload field extraction (queue job payloads). */
  def jsonPayload(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .select(col("event_id"),
        Exprs.jsonField(col("props"), "k").cast("long").as("k"))

  /** F24 — keyword containment over document text (timeline search). */
  def keywordSearch(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        Exprs.containsAny(col("text"), Seq("join", "filter", "window")).as("has_kw"))

  /** P3/F21/F22 — document-format filter: parse extension, apply
    * skip/allow/size gates, assign a priority bucket
    * (docproc/format_config.py:86-145). */
  def docFormatFilter(spark: SparkSession, dir: String): DataFrame = {
    val fname = concat(lit("doc_"), col("doc_id").cast("string"),
      when(col("doc_id") % 5 === 0, ".pdf")
        .when(col("doc_id") % 5 === 1, ".docx")
        .when(col("doc_id") % 5 === 2, ".txt")
        .when(col("doc_id") % 5 === 3, ".exe")
        .otherwise(".msg"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), fname.as("filename"),
        (col("n_chars").cast("double") / 1000.0).as("size_mb"))
      .withColumn("ext", lower(regexp_extract(col("filename"), "(\\.[^.]+)$", 1)))
      .filter(!col("ext").isin(".msg") && col("ext").isin(".pdf", ".docx", ".txt")
        && col("size_mb") <= 0.5)
      .withColumn("priority",
        when(col("ext") === ".pdf" && col("size_mb") <= 0.2, "high")
          .when(col("size_mb") <= 0.35, "medium")
          .otherwise("low"))
  }

  /** F23 query form: a synthetic credential column over the document
    * corpus — every third row a resolvable `${SOURCE_BUCKET}` reference,
    * every third an unresolvable `${MISSING_SECRET}` (kept verbatim, the
    * reference's warn-and-keep), the rest plain values passed through. */
  def envInterpolation(spark: SparkSession, dir: String): DataFrame = {
    val raw = when(col("doc_id") % 3 === 0, lit("${SOURCE_BUCKET}"))
      .when(col("doc_id") % 3 === 1, lit("${MISSING_SECRET}"))
      .otherwise(concat(lit("plain-"), col("source")))
    Tables.documents(spark, dir)
      .select(col("doc_id"), raw.as("raw_value"))
      .withColumn("resolved", Exprs.interpolate(col("raw_value"),
        Map("SOURCE_BUCKET" -> "s3://tenant-artifacts",
          "OTHER_VAR" -> "unused")))
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  val queries: Map[String, Q] = Map(
    "f23_env_interpolation" -> ((s, d) => envInterpolation(s, d)),
    "f7_multiformat_dates" -> ((s, d) => multiformatDates(s, d)),
    "f8_currency_parse" -> ((s, d) => currencyParse(s, d)),
    "f5_extract_money" -> ((s, d) => extractMoney(s, d)),
    "f6_extract_dates" -> ((s, d) => extractDates(s, d)),
    "f9_age_hours" -> ((s, d) => ageHours(s, d)),
    "f12_priority_scores" -> ((s, d) => priorityScores(s, d)),
    "f16_hash_serial" -> ((s, d) => hashSerial(s, d)),
    "f18_json_payload" -> ((s, d) => jsonPayload(s, d)),
    "f24_keyword_search" -> ((s, d) => keywordSearch(s, d)),
    "p3_doc_format_filter" -> ((s, d) => docFormatFilter(s, d)))

  private val suffixSql =
    """CASE WHEN day(o_orderdate) IN (11,12,13) THEN 'th'
      |     WHEN day(o_orderdate) % 10 = 1 THEN 'st'
      |     WHEN day(o_orderdate) % 10 = 2 THEN 'nd'
      |     WHEN day(o_orderdate) % 10 = 3 THEN 'rd'
      |     ELSE 'th' END""".stripMargin

  val oracles: Map[String, String] = Map(
    "f23_env_interpolation" ->
      """WITH r AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN '${SOURCE_BUCKET}'
        |              WHEN doc_id % 3 = 1 THEN '${MISSING_SECRET}'
        |              ELSE 'plain-' || source END AS raw_value
        |  FROM documents)
        |SELECT doc_id, raw_value,
        |       CASE WHEN raw_value = '${SOURCE_BUCKET}'
        |              THEN 's3://tenant-artifacts'
        |            ELSE raw_value END AS resolved
        |FROM r""".stripMargin,
    "f7_multiformat_dates" ->
      s"""WITH s AS (
         |  SELECT o_orderkey,
         |         CASE WHEN o_orderkey % 3 = 0 THEN strftime(o_orderdate, '%-d/%-m/%Y')
         |              WHEN o_orderkey % 3 = 1 THEN strftime(o_orderdate, '%Y-%m-%d')
         |              ELSE day(o_orderdate)::VARCHAR || $suffixSql || ' ' || strftime(o_orderdate, '%B %Y')
         |         END AS date_str
         |  FROM orders),
         |c AS (SELECT o_orderkey, date_str,
         |             regexp_replace(date_str, '(\\d+)(st|nd|rd|th)', '\\1') AS cleaned
         |      FROM s)
         |SELECT o_orderkey, date_str,
         |       strftime(coalesce(try_strptime(cleaned, '%d/%m/%Y'),
         |                         try_strptime(cleaned, '%Y-%m-%d'),
         |                         try_strptime(cleaned, '%d %B %Y')), '%Y-%m-%d') AS parsed
         |FROM c""".stripMargin,
    "f8_currency_parse" ->
      s"""${Synth.moneyCte}
         |SELECT o_orderkey,
         |       CASE WHEN o_orderkey % 100 = 0 THEN '[Empty]'
         |            ELSE ${Synth.moneyStrSql} END AS money_str,
         |       CASE WHEN o_orderkey % 100 = 0 THEN NULL
         |            ELSE CAST(CAST(replace(replace(${Synth.moneyStrSql}, '£', ''), ',', '') AS DECIMAL(18,2)) AS DOUBLE)
         |       END AS parsed_value
         |FROM b""".stripMargin,
    "f5_extract_money" ->
      s"""${Synth.moneyCte}
         |SELECT o_orderkey,
         |       'Settlement agreed ' || ${Synth.moneyStrSql} || ' on file' AS note,
         |       CAST(CAST(replace(regexp_extract('Settlement agreed ' || ${Synth.moneyStrSql} || ' on file',
         |                 '([0-9][0-9,]*\\.[0-9][0-9])', 1), ',', '') AS DECIMAL(18,2)) AS DOUBLE) AS amount
         |FROM b""".stripMargin,
    "f6_extract_dates" ->
      """WITH s AS (
        |  SELECT o_orderkey,
        |         'hearing on ' || strftime(o_orderdate, '%-d/%-m/%Y') || ' confirmed' AS note
        |  FROM orders),
        |t AS (SELECT o_orderkey, note,
        |             nullif(regexp_extract(note, '(\d{1,2}[/-]\d{1,2}[/-]\d{2,4})', 1), '') AS date_token
        |      FROM s)
        |SELECT o_orderkey, note, date_token,
        |       strftime(coalesce(try_strptime(date_token, '%d/%m/%Y'),
        |                         try_strptime(date_token, '%Y-%m-%d'),
        |                         try_strptime(date_token, '%d %B %Y')), '%Y-%m-%d') AS parsed
        |FROM t""".stripMargin,
    "f9_age_hours" ->
      """SELECT o_orderkey,
        |       CAST(epoch((SELECT max(o_orderdate) FROM orders)) - epoch(o_orderdate) AS DOUBLE) / 3600.0 AS age_hours
        |FROM orders""".stripMargin,
    "f12_priority_scores" ->
      """WITH s AS (
        |  SELECT o_orderkey,
        |         least(greatest(
        |           0.5::DOUBLE
        |           + CASE WHEN o_orderstatus = 'F' THEN 0.3::DOUBLE
        |                  WHEN o_orderstatus = 'P' THEN 0.1::DOUBLE ELSE 0.0::DOUBLE END
        |           + CASE WHEN o_orderpriority LIKE '1%' THEN 0.1::DOUBLE
        |                  WHEN o_orderpriority LIKE '2%' THEN 0.05::DOUBLE ELSE 0.0::DOUBLE END
        |           - CASE WHEN o_totalprice > 250000.0::DOUBLE THEN 0.25::DOUBLE ELSE 0.0::DOUBLE END,
        |           0.0::DOUBLE), 1.0::DOUBLE) AS settlement,
        |         CAST(o_orderkey % 10 AS DOUBLE) AS risk,
        |         o_totalprice / 100000.0::DOUBLE AS complexity,
        |         least(greatest(0.1::DOUBLE + CAST(o_orderkey % 7 AS DOUBLE) / 10.0::DOUBLE, 0.0::DOUBLE), 1.0::DOUBLE) AS urgency
        |  FROM orders),
        |p AS (SELECT o_orderkey, settlement, urgency,
        |             least(greatest(
        |               settlement * 0.3::DOUBLE + (risk / 10.0::DOUBLE) * 0.2::DOUBLE
        |               + (complexity / 10.0::DOUBLE) * 0.2::DOUBLE + urgency * 0.3::DOUBLE,
        |               0.0::DOUBLE), 1.0::DOUBLE) AS priority_score
        |      FROM s)
        |SELECT o_orderkey, settlement, urgency, priority_score,
        |       CASE WHEN priority_score >= 0.8 THEN 'critical'
        |            WHEN priority_score >= 0.6 THEN 'high'
        |            WHEN priority_score >= 0.3 THEN 'medium'
        |            ELSE 'low' END AS priority_level
        |FROM p""".stripMargin,
    "f16_hash_serial" ->
      "SELECT o_orderkey, (o_orderkey * 48271) % 100000 AS serialno FROM orders",
    "f18_json_payload" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events""".stripMargin,
    "f24_keyword_search" ->
      """SELECT doc_id,
        |       (contains(lower(text), 'join') OR contains(lower(text), 'filter')
        |        OR contains(lower(text), 'window')) AS has_kw
        |FROM documents""".stripMargin,
    "p3_doc_format_filter" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         'doc_' || doc_id::VARCHAR ||
        |         CASE WHEN doc_id % 5 = 0 THEN '.pdf'
        |              WHEN doc_id % 5 = 1 THEN '.docx'
        |              WHEN doc_id % 5 = 2 THEN '.txt'
        |              WHEN doc_id % 5 = 3 THEN '.exe'
        |              ELSE '.msg' END AS filename,
        |         CAST(n_chars AS DOUBLE) / 1000.0 AS size_mb
        |  FROM documents),
        |e AS (SELECT doc_id, filename, size_mb,
        |             lower(regexp_extract(filename, '(\.[^.]+)$', 1)) AS ext
        |      FROM f)
        |SELECT doc_id, filename, size_mb, ext,
        |       CASE WHEN ext = '.pdf' AND size_mb <= 0.2 THEN 'high'
        |            WHEN size_mb <= 0.35 THEN 'medium'
        |            ELSE 'low' END AS priority
        |FROM e
        |WHERE ext NOT IN ('.msg') AND ext IN ('.pdf', '.docx', '.txt')
        |  AND size_mb <= 0.5""".stripMargin)
}
