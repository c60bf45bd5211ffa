package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.{Exprs, Synth}

/** Nested case-document pipeline — the per-case processing shape of the
  * reference (caseguard/proclaim/client.py:180-221 assembles case + history
  * + parties + document manifest into one nested record; the flows in
  * etl/flows/process_case.py then project/slice/enrich it).
  *
  * The testdata is flat, so the nested documents are built with
  * collect_list over deterministic-sorted structs (SURVEY.md §7 risk #2):
  * orders play cases, lineitems play history events, customer attributes
  * play parties. At 100 TB the groupBy that assembles a case shuffles on
  * case_ref once, and every downstream per-case operator (slice, explode,
  * party lookup, canonical extraction) is narrow — no further shuffles.
  */
object CaseDocs {

  /** One nested row per case: history array (sorted), parties array,
    * synthesized free-text note (for the extraction operators). */
  def caseDocuments(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    // struct field order = sort order; full field set makes it total
    // ((l_orderkey, l_linenumber) alone is NOT unique in this data)
    val history = li
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(struct(
        col("l_linenumber"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity"), col("l_extendedprice"), col("l_shipdate")))).as("history"))
    // typed empty array for history-less cases, derived from the aggregated
    // schema (hardcoding the struct type would break if the parquet reader
    // infers NTZ vs LTZ timestamps differently)
    val emptyHistory = array().cast(history.schema("history").dataType)
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    Tables.orders(spark, dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"), "left_outer")
      .join(history, col("o_orderkey") === col("l_orderkey"), "left_outer")
      .select(
        col("o_orderkey").as("case_ref"),
        (col("o_custkey") % 4).as("tenant_id"),
        graft.sync.Reconcile.statusOf(col("o_orderstatus")).as("status"),
        col("o_totalprice").as("total_value"),
        col("o_orderdate").as("opened"),
        concat(lit("Settlement agreed "), Synth.moneyStr(col("o_totalprice")),
          lit(" on "), date_format(col("o_orderdate"), "d/M/yyyy")).as("note"),
        coalesce(col("history"), emptyHistory).as("history"),
        array(
          struct(lit("client").as("ptype"), col("c_name").as("name")),
          struct(lit("segment").as("ptype"), col("c_mktsegment").as("name")))
          .as("parties"))
  }

  /** P4 — embedding-input summary text: case id + status + first-5 history
    * lines concatenated (caseguard/vectorization/embedder.py:76-136). */
  def summaryText(spark: SparkSession, dir: String): DataFrame =
    caseDocuments(spark, dir).select(
      col("case_ref"),
      concat(
        lit("case "), col("case_ref").cast("string"),
        lit(" | "), col("status"),
        // empty history -> no trailing separator (concat_ws would keep one)
        when(size(col("history")) > 0,
          concat(lit(" | "), array_join(
            transform(slice(col("history"), 1, 5), h =>
              concat(lit("line"), h.getField("l_linenumber").cast("string"),
                lit(":q"), h.getField("l_quantity").cast("long").cast("string"))),
            "; ")))
          .otherwise(lit(""))).as("summary_text"))

  /** P5 — metadata flattening: nested case -> scalar metadata columns
    * (embedder.py:165-240). */
  def metadata(spark: SparkSession, dir: String): DataFrame =
    caseDocuments(spark, dir).select(
      col("case_ref"), col("tenant_id"), col("status"),
      size(col("history")).as("n_history"),
      (size(col("history")) > 0).as("has_history"),
      element_at(filter(col("parties"), p => p.getField("ptype") === "client"), 1)
        .getField("name").as("client_name"),
      col("total_value"))

  /** J7 — party-type lookup inside one case's parties array — an array
    * filter + first, no explode/shuffle (smart_field_retriever.py:159-192). */
  def partyLookup(spark: SparkSession, dir: String): DataFrame =
    caseDocuments(spark, dir).select(
      col("case_ref"),
      element_at(filter(col("parties"),
        p => lower(p.getField("ptype")) === "client"), 1)
        .getField("name").as("client_name"),
      element_at(filter(col("parties"),
        p => lower(p.getField("ptype")) === "segment"), 1)
        .getField("name").as("segment"))

  /** P7/W3 — first-5 positional slice of the nested history, exploded back
    * to rows (process_case.py:187 caps documents at 5/case). */
  def first5Exploded(spark: SparkSession, dir: String): DataFrame =
    caseDocuments(spark, dir)
      .select(col("case_ref"),
        explode(slice(col("history"), 1, 5)).as("h"))
      .select(col("case_ref"),
        col("h.l_linenumber").as("l_linenumber"),
        col("h.l_quantity").as("l_quantity"))

  /** U6 — canonical-field extraction compiler: a declarative field config
    * compiled to Column expressions (the reference's dispatcher at
    * smart_field_retriever.py:78-157 routes each configured field through
    * direct / party_extraction / costs_extraction / timeline_search with a
    * typed conversion; here each method becomes a Column builder). */
  def canonicalFields(spark: SparkSession, dir: String): DataFrame = {
    val extracted = CanonicalConfig.default.map(f =>
      CanonicalConfig.compile(f).as(f.name))
    caseDocuments(spark, dir).select(col("case_ref") +: extracted: _*)
  }

  /** U6 over LIVE dossiers — the reference's actual per-case ingest
    * (process_case.py: fetched dossier -> canonical fields): adapt a
    * parsed dossier frame ([[graft.sources.Adapters.dossierSchema]], the
    * exact shape [[graft.sources.LiveFetch.parseDossiers]] emits) to the
    * canonical-extraction input and run the same compiled config. Pure
    * projection on top of the fetch stage — the whole fetch -> parse ->
    * extract path is one narrow Catalyst plan per partition. */
  def canonicalFieldsFromDossiers(dossiers: DataFrame): DataFrame = {
    val shaped = dossiers.select(
      col("case_ref"),
      transform(col("parties"), p => struct(
        p.getField("type").as("ptype"),
        p.getField("name").as("name"))).as("parties"),
      col("core_details.case_status").as("status"),
      col("core_details.date_opened").as("opened"),
      array_join(transform(col("history"),
        h => coalesce(h.getField("notes"), lit(""))), " ").as("note"))
    val extracted = CanonicalConfig.default.map(f =>
      CanonicalConfig.compile(f).as(f.name))
    shaped.select(col("case_ref") +: extracted: _*)
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "p4_summary_text" -> ((s, d) => summaryText(s, d)),
    "p5_metadata" -> ((s, d) => metadata(s, d)),
    "j7_party_lookup" -> ((s, d) => partyLookup(s, d)),
    "p7_first5_exploded" -> ((s, d) => first5Exploded(s, d)),
    "u6_canonical_fields" -> ((s, d) => canonicalFields(s, d)))

  /** first-5 history rows in the same total order as the nested sort. */
  private val first5Cte: String =
    """WITH h AS (
      |  SELECT l_orderkey, l_linenumber, l_quantity,
      |         row_number() OVER (PARTITION BY l_orderkey
      |                            ORDER BY l_linenumber, l_partkey, l_suppkey,
      |                                     l_quantity, l_extendedprice) AS rn
      |  FROM lineitem)""".stripMargin

  val oracles: Map[String, String] = Map(
    "p4_summary_text" ->
      s"""$first5Cte, agg AS (
         |  SELECT l_orderkey,
         |         string_agg('line' || l_linenumber::VARCHAR || ':q' ||
         |                    CAST(l_quantity AS BIGINT)::VARCHAR, '; ' ORDER BY rn) AS hist
         |  FROM h WHERE rn <= 5 GROUP BY l_orderkey)
         |SELECT o_orderkey AS case_ref,
         |       'case ' || o_orderkey::VARCHAR || ' | ' ||
         |       CASE WHEN o_orderstatus = 'O' THEN 'active'
         |            WHEN o_orderstatus = 'F' THEN 'complete'
         |            ELSE 'processing' END ||
         |       CASE WHEN agg.hist IS NULL THEN '' ELSE ' | ' || agg.hist END AS summary_text
         |FROM orders LEFT JOIN agg ON o_orderkey = agg.l_orderkey""".stripMargin,
    "p5_metadata" ->
      """WITH n AS (SELECT l_orderkey, count(*) AS n_history FROM lineitem GROUP BY 1)
        |SELECT o_orderkey AS case_ref, o_custkey % 4 AS tenant_id,
        |       CASE WHEN o_orderstatus = 'O' THEN 'active'
        |            WHEN o_orderstatus = 'F' THEN 'complete'
        |            ELSE 'processing' END AS status,
        |       CAST(coalesce(n.n_history, 0) AS INT) AS n_history,
        |       coalesce(n.n_history, 0) > 0 AS has_history,
        |       c_name AS client_name,
        |       o_totalprice AS total_value
        |FROM orders
        |LEFT JOIN customer ON o_custkey = c_custkey
        |LEFT JOIN n ON o_orderkey = n.l_orderkey""".stripMargin,
    "j7_party_lookup" ->
      """SELECT o_orderkey AS case_ref, c_name AS client_name,
        |       c_mktsegment AS segment
        |FROM orders LEFT JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "p7_first5_exploded" ->
      s"""$first5Cte
         |SELECT l_orderkey AS case_ref, l_linenumber, l_quantity
         |FROM h WHERE rn <= 5""".stripMargin,
    "u6_canonical_fields" ->
      s"""${Synth.moneyCte.replace("WITH b", "WITH m")}
         |SELECT orders.o_orderkey AS case_ref,
         |       c_name AS client_name,
         |       c_mktsegment AS handler,
         |       CASE WHEN o_orderstatus = 'O' THEN 'active'
         |            WHEN o_orderstatus = 'F' THEN 'complete'
         |            ELSE 'processing' END AS status,
         |       strftime(o_orderdate, '%Y-%m-%d') AS opened_date,
         |       CAST(CAST(replace(regexp_extract(
         |            'Settlement agreed ' || ${Synth.moneyStrSql} || ' on ' || strftime(o_orderdate, '%-d/%-m/%Y'),
         |            '([0-9][0-9,]*\\.[0-9][0-9])', 1), ',', '') AS DECIMAL(18,2)) AS DOUBLE) AS total_paid,
         |       contains(lower('Settlement agreed ' || ${Synth.moneyStrSql} || ' on ' || strftime(o_orderdate, '%-d/%-m/%Y')), 'settlement') AS settlement_mentioned
         |FROM orders
         |LEFT JOIN customer ON o_custkey = c_custkey
         |JOIN m ON m.o_orderkey = orders.o_orderkey""".stripMargin)
}

/** Declarative canonical-field config + compiler (U6). Mirrors the shape of
  * config/canonical_fields_corrected.json: each field names an extraction
  * method and a typed conversion; `compile` turns a spec into a Column over
  * the nested case document. */
object CanonicalConfig {
  final case class FieldSpec(
      name: String, method: String, param: String, dataType: String)

  val default: Seq[FieldSpec] = Seq(
    FieldSpec("client_name", "party_extraction", "client", "string"),
    FieldSpec("handler", "party_extraction", "segment", "string"),
    FieldSpec("status", "direct", "status", "string"),
    FieldSpec("opened_date", "direct", "opened", "date"),
    FieldSpec("total_paid", "costs_extraction", "note", "currency"),
    FieldSpec("settlement_mentioned", "timeline_search", "settlement", "bool"))

  /** method -> HOW the raw value is located; dataType -> the typed
    * conversion applied to it (the two axes the reference's config
    * declares independently, canonical_fields_corrected.json:7-9). */
  def compile(f: FieldSpec): Column = convert(extract(f), f.dataType)

  private def extract(f: FieldSpec): Column = f.method match {
    case "party_extraction" =>
      element_at(filter(col("parties"),
        p => lower(p.getField("ptype")) === f.param), 1).getField("name")
    case "direct" => col(f.param)
    case "costs_extraction" => Exprs.extractMoney(col(f.param))
    case "timeline_search" => Exprs.containsAny(col("note"), Seq(f.param))
    case other => throw new IllegalArgumentException(s"unknown method: $other")
  }

  private def convert(c: Column, dataType: String): Column = dataType match {
    case "string" => c.cast("string")
    case "date" => date_format(c, "yyyy-MM-dd")
    case "currency" => c.cast("double")
    case "bool" => c.cast("boolean")
    case other => throw new IllegalArgumentException(s"unknown dataType: $other")
  }
}
