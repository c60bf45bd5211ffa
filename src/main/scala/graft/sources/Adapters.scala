package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.expr.Exprs

/** Source/sink adapters (SURVEY.md §2.1): the reference's ingestion edges
  * re-expressed as Spark readers/writers. These take paths (not testdata
  * dirs) — the specs exercise them against temp files shaped like the
  * reference's real inputs.
  */
object Adapters {

  /** S1 — CRM CSV snapshot scan with the reference's column mapping
    * (crm/discovery.py:193-232): rename `Solicitor Reference`->case_ref,
    * `Status`->status etc., derive is_active, parse multi-format dates,
    * synthesize a serial number from the ref. */
  def csvSnapshot(spark: SparkSession, path: String, tenantId: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "PERMISSIVE")
      .csv(path)
      .select(
        trim(col("Solicitor Reference")).as("case_ref"),
        lit(tenantId).as("tenant_id"),
        trim(col("Status")).as("status"),
        col("Category").as("case_type"),
        col("Client").as("client_name"),
        col("Handler").as("handler"),
        Exprs.multiFormatDate(col("Opened")).as("opened_date"))
      .withColumn("is_active", lower(col("status")) === "active")
      // hash(ref) % 100000 in the reference (discovery.py:221); here the
      // portable arithmetic form over a stable string hash
      .withColumn("serialno",
        pmod(abs(xxhash64(col("case_ref"))), lit(100000L)))

  /** S2 — YAML case-number list scan (crm/discovery.py:347-372): the
    * reference reads `case_numbers: [- REF, ...]` and fabricates active
    * rows. Read wholetext (one row per file — config files are tiny,
    * and per-LINE scanning can't tell which block a list item belongs
    * to, so a `---` document separator or an unrelated list like
    * `tags:` would fabricate cases), extract the case_numbers block,
    * then explode its items. Still distributed per file. */
  def yamlCaseList(spark: SparkSession, path: String, tenantId: String): DataFrame =
    spark.read.option("wholetext", "true").text(path)
      .select(regexp_extract(col("value"),
        "(?m)^case_numbers:\\s*\\n((?:[ \\t]+-[^\\n]*\\n?)*)", 1).as("block"))
      .select(explode(split(col("block"), "\n")).as("line"))
      .select(regexp_extract(col("line"),
        "^\\s*-\\s*['\"]?([^'\"#\\-][^'\"#]*?)['\"]?\\s*(?:#.*)?$", 1)
        .as("case_ref"))
      .filter(col("case_ref") =!= "")
      .select(
        trim(col("case_ref")).as("case_ref"),
        lit(tenantId).as("tenant_id"),
        lit("active").as("status"),
        lit(true).as("is_active"),
        lit("yaml").as("source"))

  /** S13 — metrics/report export: single-file JSON artifact of a report
    * query (monitoring/dashboard.py:311-382). coalesce(1) is deliberate —
    * reports are small aggregates; never use it on data-scale outputs. */
  def exportReportJson(df: DataFrame, outPath: String): Unit =
    df.coalesce(1).write.mode("overwrite").json(outPath)

  /** S3 — nested case-dossier ingestion: JSON documents with history[]
    * and parties[] arrays (the shape client.py:180-221 assembles). Schema
    * is declared, not inferred — required at 100 TB (schema inference
    * reads the data twice) and for stable types at the ingest boundary. */
  val dossierSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(
      """case_ref STRING, tenant_id STRING, status STRING,
        |core_details STRUCT<case_status: STRING, handler_name: STRING,
        |                    client_name: STRING, date_opened: STRING>,
        |history ARRAY<STRUCT<description: STRING, notes: STRING, date: STRING>>,
        |parties ARRAY<STRUCT<type: STRING, name: STRING>>,
        |document_manifest ARRAY<STRUCT<code: STRING, format: STRING, filename: STRING>>
        |""".stripMargin.replace("\n", " "))

  def jsonDossiers(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(dossierSchema).json(path)

  /** S5/S7 — stored-document scan: binary payloads + file metadata,
    * listing ordered by modification time ascending (the reference's
    * list_objects ordering, technical-details.md:428-430). */
  def binaryDocuments(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("modificationTime"), col("length"), col("content"))
      .orderBy(asc_nulls_last("modificationTime"), asc("path"))

  /** S6 — object-store sink: tenant-prefixed partitioned parquet
    * ({tenant_id}/... key hierarchy, technical-details.md:475-486).
    * Partitioning by tenant is the scale mechanism for isolation +
    * pruning (SURVEY.md §1.3). */
  def writePartitioned(df: DataFrame, outPath: String): Unit =
    df.write
      .partitionBy("tenant_id")
      .mode("overwrite")
      .parquet(outPath)

  /** S10 — queue sink payloads: job rows serialized to the JSON shape the
    * worker consumes (sync_daily.py:265-275), priority-partitioned. */
  def jobPayloads(df: DataFrame): DataFrame =
    df.select(
      col("priority"),
      to_json(struct(
        col("tenant_id"), col("case_ref"), col("serialno"),
        col("priority"), col("job_type"))).as("payload"))

  /** S8 live form — partitioned JDBC snapshot scan, the production
    * counterpart of the parquet-snapshot model used throughout (every
    * consumer reads through the identical (case_ref, tenant_id, status,
    * is_active, serialno/last_serialno) schema either way). EXECUTED
    * against a real database in JdbcSpec: embedded Derby proves the
    * range-split parallel read, the WHERE pushdown, and the S9 MERGE
    * write-back end to end.
    *
    * Scale shape (reference etl/flows/sync_daily_enhanced.py:156-197):
    *  - `partitionColumn/lowerBound/upperBound/numPartitions` split the
    *    table into range-parallel reads — one connection per partition,
    *    no single-reader bottleneck at 10^8-row mirrors;
    *  - `pushDownPredicate` (default true) ships tenant/status filters
    *    into the database as WHERE clauses rather than scanning;
    *  - `fetchsize` bounds per-round-trip rows (the JDBC cursor knob).
    */
  def jdbcSnapshot(spark: SparkSession, url: String, table: String,
                   partitionColumn: String, lowerBound: Long, upperBound: Long,
                   numPartitions: Int, fetchSize: Int = 10000): DataFrame =
    spark.read
      .option("fetchsize", fetchSize)
      .jdbc(url, table,
        columnName = partitionColumn,
        lowerBound = lowerBound, upperBound = upperBound,
        numPartitions = numPartitions,
        connectionProperties = new java.util.Properties())

  /** S11-ish — payload parse-back (worker.py:124). */
  def parsePayloads(payloads: DataFrame): DataFrame =
    payloads.select(
      from_json(col("payload"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "tenant_id BIGINT, case_ref BIGINT, serialno BIGINT, " +
            "priority INT, job_type STRING")).as("job"))
      .select("job.*")
}
