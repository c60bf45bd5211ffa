package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** U1/U2 — the external-service stages (LLM enrichment, embedding
  * generation) as deterministic, seedable column pipelines. The reference
  * calls gpt-4o-mini / text-embedding-3-large (ai/enricher.py:47-246,
  * caseguard/vectorization/embedder.py:138-163); the engine keeps the
  * same output contracts — validated/clamped insight fields, [:10] caps,
  * fixed-dim vectors, input truncation — behind pure expressions, so the
  * pipeline is testable end-to-end and an API-backed implementation can
  * swap in per stage without touching the plan shape.
  */
object Enricher {

  /** U1 — AI-insight stage over nested case documents: summary text,
    * key-issue extraction (capped at 10 — enricher.py:225-229),
    * settlement likelihood (U4 heuristic), confidence (clamped —
    * enricher.py:203-207). Emitted flat for oracle comparability. */
  def enrich(spark: SparkSession, dir: String): DataFrame = {
    val issueWords = Seq("settlement", "hearing", "agreed")
    val issues = filter(
      array(issueWords.map(w =>
        when(lower(col("note")).contains(w), w).otherwise(null)): _*),
      x => x.isNotNull)
    CaseDocs.caseDocuments(spark, dir).select(
      col("case_ref"),
      concat(lit("Case "), col("case_ref").cast("string"), lit(" ("), col("status"),
        lit("): "), size(col("history")).cast("string"),
        lit(" events on file")).as("case_summary"),
      slice(issues, 1, 10).as("key_issues"),
      Exprs.clamp01(lit(0.3)
        + least(size(col("history")).cast("double") / 20.0, lit(0.4))
        + when(col("status") === "complete", 0.2).otherwise(0.0))
        .as("confidence_score"))
      .select(col("case_ref"), col("case_summary"),
        size(col("key_issues")).as("n_key_issues"),
        array_join(col("key_issues"), ",").as("key_issues_csv"),
        col("confidence_score"))
  }

  /** U2 — deterministic embedding stub: input truncated (the reference
    * truncates to ~8k tokens / 32k chars, embedder.py:148-151), then a
    * fixed-dim pseudo-random vector seeded by a per-dimension hash of the
    * text. Swap this expression for a model-backed stage in production —
    * the dim/type/truncation contract is what the rest of the pipeline
    * (similarity, dedup) consumes. */
  def embedText(text: Column, dim: Int = 64): Column =
    transform(sequence(lit(0), lit(dim - 1)), j =>
      ((xxhash64(substring(text, 1, 32000), j) % 1000L).cast("double") / 1000.0)
        .cast("float"))

  def embedDocuments(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), embedText(col("text")).as("embedding"))

  /** Registered form of the embed stage: the vector projected to scalar
    * descriptors (dim, L1 mass, first/last components). The driver's
    * rows-only check loads result parquet into pandas and sorts every
    * column — array columns are unhashable there, so the registered
    * output must be scalar; `embedDocuments` keeps the vector form for
    * downstream consumers (similarity, dedup). */
  def embedStats(spark: SparkSession, dir: String): DataFrame =
    embedDocuments(spark, dir).select(
      col("doc_id"),
      size(col("embedding")).as("dim"),
      round(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + abs(x)), 6).as("l1_mass"),
      round(element_at(col("embedding"), 1).cast("double"), 6).as("c_first"),
      round(element_at(col("embedding"), -1).cast("double"), 6).as("c_last"))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "u1_enrichment" -> ((s, d) => enrich(s, d)),
    "u2_embed_stub" -> ((s, d) => embedStats(s, d)))

  val oracles: Map[String, String] = Map(
    "u1_enrichment" ->
      s"""${graft.expr.Synth.moneyCte.replace("WITH b", "WITH m")},
         |n AS (SELECT l_orderkey, count(*) AS n_history FROM lineitem GROUP BY 1),
         |base AS (
         |  SELECT orders.o_orderkey AS case_ref,
         |         CASE WHEN o_orderstatus = 'O' THEN 'active'
         |              WHEN o_orderstatus = 'F' THEN 'complete'
         |              ELSE 'processing' END AS status,
         |         coalesce(n.n_history, 0) AS nh,
         |         lower('Settlement agreed ' || ${graft.expr.Synth.moneyStrSql} ||
         |               ' on ' || strftime(o_orderdate, '%-d/%-m/%Y')) AS lnote
         |  FROM orders
         |  LEFT JOIN n ON orders.o_orderkey = n.l_orderkey
         |  JOIN m ON m.o_orderkey = orders.o_orderkey),
         |iss AS (
         |  SELECT base.*,
         |         list_filter(['settlement', 'hearing', 'agreed'],
         |                     w -> contains(lnote, w)) AS key_issues
         |  FROM base)
         |SELECT case_ref,
         |       'Case ' || case_ref::VARCHAR || ' (' || status || '): ' ||
         |         nh::VARCHAR || ' events on file' AS case_summary,
         |       CAST(len(key_issues) AS INT) AS n_key_issues,
         |       list_aggregate(key_issues, 'string_agg', ',') AS key_issues_csv,
         |       least(greatest(0.3::DOUBLE
         |         + least(CAST(nh AS DOUBLE) / 20.0::DOUBLE, 0.4::DOUBLE)
         |         + CASE WHEN status = 'complete' THEN 0.2::DOUBLE ELSE 0.0::DOUBLE END,
         |         0.0::DOUBLE), 1.0::DOUBLE) AS confidence_score
         |FROM iss""".stripMargin)
  // u2 has no oracle: the stub hash (xxhash64 with per-dim seeds) is not
  // reproducible in DuckDB; determinism/shape is pinned by MlSpec.
}
