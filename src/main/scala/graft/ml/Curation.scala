package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-composition curation: per-source document caps and the
  * cross-source duplication matrix — the two reports a data-mixing pass
  * reads before deciding how much of each source to keep (web pipelines
  * cap pathological domains and deduplicate across crawls/sources before
  * weighting; cf. C4 / Gopher / RefinedWeb corpus construction).
  */
object Curation {

  /** Default per-source document cap. */
  val CapPerSource = 15

  /** Salt fan-out for the two-phase per-source top-N. */
  val CapSalts = 8

  /** Deterministic pick order: the portable multiplicative hash used by
    * the dataset-split family (o7), tie-broken by doc_id. */
  private def pickHash: Column = (col("doc_id") * 48271) % 100000

  /** Keep at most `cap` documents per source, chosen by hash order — the
    * per-domain cap every web pipeline applies so one pathological domain
    * cannot dominate the corpus. Hash order (not "first N") makes the
    * kept subset a uniform sample of the source and stable under corpus
    * re-partitioning.
    *
    * Scale shape: a source is a LOW-cardinality key (20 sources here; a
    * few thousand domains dominate a crawl), so a single window
    * partitioned by source puts a whole source on one reducer — the hot
    * partition at 100 TB. Two-phase instead: phase 1 ranks within
    * (source, doc_id mod salts) and keeps `cap` per salt — each salt's
    * local top-`cap` is a superset of what the global top-`cap` needs
    * from it, so correctness is exact, and the per-reducer row bound
    * drops by the salt fan-out; phase 2 re-ranks the ≤ salts·cap
    * survivors per source. CurationSpec proves bit-equality with the
    * plain one-window form, which is also the oracle. */
  def sourceCapOf(docs: DataFrame, cap: Int = CapPerSource,
                  salts: Int = CapSalts): DataFrame = {
    val base = docs.select(col("doc_id"), col("source"), pickHash.as("pick"))
    val w1 = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(salts)))
      .orderBy(col("pick").asc, col("doc_id").asc)
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("pick").asc, col("doc_id").asc)
    base.withColumn("r1", row_number().over(w1)).filter(col("r1") <= cap)
      .withColumn("pick_rank", row_number().over(w2))
      .filter(col("pick_rank") <= cap)
      .select(col("doc_id"), col("source"), col("pick_rank"))
  }

  def sourceCap(spark: SparkSession, dir: String): DataFrame =
    sourceCapOf(Tables.documents(spark, dir))

  /** Cross-source exact-duplication matrix: for every (source_a <=
    * source_b) pair, how many identical-content document pairs straddle
    * them (diagonal = within-source duplication). This is the report
    * that tells a mixing pass "crawl B is 40% a re-crawl of A — dedup
    * before weighting, or A's content is double-counted".
    *
    * Scale shape: one hash aggregation to (content_hash, source, count)
    * — the content string collapses to its sha256 map-side — then a
    * self-equi-join ON content_hash whose per-key fan-out is the number
    * of DISTINCT SOURCES sharing a hash (bounded by the source count,
    * not by group size: a hash duplicated a million times in two sources
    * is still one row per side), and pair counts are products of the
    * pre-aggregated counts. Never materializes doc-level pairs. */
  def sourceOverlapOf(docs: DataFrame): DataFrame = {
    val perHashSource = docs
      .select(sha2(col("text"), 256).as("content_hash"), col("source"))
      .groupBy("content_hash", "source").agg(count(lit(1)).as("c"))
    val a = perHashSource.select(col("content_hash"),
      col("source").as("source_a"), col("c").as("ca"))
    val b = perHashSource.select(col("content_hash"),
      col("source").as("source_b"), col("c").as("cb"))
    a.join(b, Seq("content_hash"))
      .filter(col("source_a") <= col("source_b"))
      .selectExpr("source_a", "source_b",
        "CASE WHEN source_a = source_b THEN ca * (ca - 1) div 2" +
          " ELSE ca * cb END AS n_pairs")
      .filter(col("n_pairs") > 0)
      .groupBy("source_a", "source_b")
      .agg(sum(col("n_pairs")).as("n_pairs"), count(lit(1)).as("n_groups"))
  }

  def sourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlapOf(Tables.documents(spark, dir))

  /** Near-duplicate cross-source matrix: the same report over the n-gram
    * Jaccard near-dup pair set ([[Dedup.ngramJaccardPairsOf]], threshold
    * 0.7) instead of exact content equality — re-crawls rarely reproduce
    * a page byte-for-byte, so this is the arm that actually fires.
    *
    * Scale shape: the pair set is near-dup-sized (corpus-fraction, not
    * corpus-squared — the inverted index and df-cap bound it upstream);
    * the two doc_id→source lookups project the corpus to two columns
    * before their equi-joins, and the final matrix aggregation is at
    * source-pair cardinality. */
  def nearOverlapOf(docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    Dedup.ngramJaccardPairsOf(docs)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .select(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_pairs"))
  }

  def nearOverlap(spark: SparkSession, dir: String): DataFrame =
    nearOverlapOf(Tables.documents(spark, dir))

  /** DATASET CARD — the one-row release summary a training-data drop
    * ships with (datasheets-for-datasets practice): corpus size, source
    * and language breadth, token mass, exact-duplicate mass, and the
    * short-document fraction. Everything is a single map-side-combined
    * pass over the documents scan (the three distincts share one
    * Expand), so the card costs one scan at any corpus size. */
  def datasetCardOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"), col("n_chars"),
        size(filter(split(col("text"), " "), x => x =!= ""))
          .cast("long").as("n_tokens"),
        sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        countDistinct(col("lang")).as("n_langs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("n_tokens")).as("total_tokens"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dup_docs"),
        sum(when(col("n_tokens") < 50, 1L).otherwise(0L)).as("n_short_docs"))
      .select(col("*"),
        // nullif: an EMPTY corpus yields the zero-row card with NULL
        // means instead of an ANSI division-by-zero error
        expr("total_tokens * 1000 div nullif(n_docs, 0)")
          .as("mean_tokens_milli"),
        expr("n_short_docs * 1000 div nullif(n_docs, 0)")
          .as("short_docs_milli"))

  def datasetCard(spark: SparkSession, dir: String): DataFrame =
    datasetCardOf(Tables.documents(spark, dir))

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "curation_source_cap" -> ((s, d) => sourceCap(s, d)),
    "curation_source_overlap" -> ((s, d) => sourceOverlap(s, d)),
    "curation_dataset_card" -> ((s, d) => datasetCard(s, d)),
    "curation_source_overlap_near" -> ((s, d) => nearOverlap(s, d)))

  val oracles: Map[String, String] = Map(
    "curation_dataset_card" ->
      """WITH t AS (
        |  SELECT source, lang, n_chars,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |           AS BIGINT) AS n_tokens,
        |         sha256(text) AS h
        |  FROM documents),
        |a AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
        |         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
        |         CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
        |         CAST(count(*) - count(DISTINCT h) AS BIGINT)
        |           AS n_exact_dup_docs,
        |         CAST(sum(CASE WHEN n_tokens < 50 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_short_docs
        |  FROM t)
        |SELECT *, CAST(total_tokens * 1000 // n_docs AS BIGINT)
        |            AS mean_tokens_milli,
        |          CAST(n_short_docs * 1000 // n_docs AS BIGINT)
        |            AS short_docs_milli
        |FROM a""".stripMargin,
    // the plain one-window form the two-phase plan must equal
    "curation_source_cap" ->
      s"""SELECT doc_id, source, CAST(r AS INT) AS pick_rank FROM (
         |  SELECT doc_id, source,
         |         row_number() OVER (PARTITION BY source
         |           ORDER BY (doc_id * 48271) % 100000 ASC, doc_id ASC) AS r
         |  FROM documents)
         |WHERE r <= $CapPerSource""".stripMargin,
    "curation_source_overlap" ->
      """WITH h AS (
        |  SELECT sha256(text) AS content_hash, source,
        |         CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |p AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         CASE WHEN a.source = b.source THEN a.c * (a.c - 1) // 2
        |              ELSE a.c * b.c END AS n_pairs
        |  FROM h a JOIN h b ON a.content_hash = b.content_hash
        |    AND a.source <= b.source)
        |SELECT source_a, source_b, CAST(sum(n_pairs) AS BIGINT) AS n_pairs,
        |       CAST(count(*) AS BIGINT) AS n_groups
        |FROM p WHERE n_pairs > 0 GROUP BY 1, 2""".stripMargin,
    // the dedup_ngram_pairs oracle's pair set, mapped to source pairs
    "curation_source_overlap_near" ->
      s"""${Dedup.shingleCte},
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |j AS (
         |  SELECT doc_a, doc_b FROM pairs
         |  JOIN sz sa ON sa.doc_id = doc_a
         |  JOIN sz sb ON sb.doc_id = doc_b
         |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE)
         |    >= 0.7::DOUBLE),
         |src AS (SELECT doc_id, source FROM documents),
         |m AS (
         |  SELECT least(pa.source, pb.source) AS source_a,
         |         greatest(pa.source, pb.source) AS source_b
         |  FROM j JOIN src pa ON pa.doc_id = doc_a
         |         JOIN src pb ON pb.doc_id = doc_b)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM m GROUP BY 1, 2""".stripMargin)
}
