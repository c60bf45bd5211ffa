package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ml.Similarity
import graft.sync.{Reconcile, ReconcileQueries}

/** The flagship end-to-end lineage: SURVEY §3's Q2 + Q3 composition as ONE
  * Catalyst plan. The reference runs these as separate orchestrated stages
  * (sync_daily.py:324-436 finds changed cases, then process_case.py:325-450
  * enriches each and populates the vector index via a Redis hop per stage);
  * here the whole chain — reconcile → select changed → enrich → dedup to
  * content survivors → build the LSH index — is a single declarative plan
  * with no action, persist, or collect between stages, so Catalyst
  * optimizes across stage boundaries (the recon filter reaches the orders
  * scan; the enrich join keys the same scan) and the driver never holds
  * intermediate state. PLANS.md captures the physical plan as proof of
  * the no-barrier claim.
  *
  * Stages:
  *  1. RECONCILE (Q2): full-outer snapshot diff → category per case.
  *  2. SELECT: the actionable subset (new + needs_update) — the cases the
  *     reference would enqueue for processing.
  *  3. ENRICH (Q3/U1): deterministic case summary per changed case.
  *  4. DEDUP SURVIVORS: identical summary content collapses to one
  *     survivor (min case_ref), keeping group size and per-category mix —
  *     the exact-dedup stage a training-corpus build runs before indexing.
  *  5. INDEX BUILD (S12): embed each survivor's content with the portable
  *     stub (U2), take integer milli-components, and assign the 4-table
  *     sign-LSH bucket ids — the vector-index insert key material.
  *
  * Everything is integer-or-deterministic arithmetic, so the whole
  * five-stage pipeline carries a full DuckDB oracle.
  */
object Lineage {

  def flagship(spark: SparkSession, dir: String): DataFrame = {
    // 1-2: reconcile and keep the actionable categories
    val changed = Reconcile.categories(spark, dir)
      .filter(col("category").isin("new", "needs_update"))
      .select("case_ref", "category")
    // 3: enrich (U1) — join keyed on the case, summary built per case
    val cases = changed.join(Enricher.enrich(spark, dir), "case_ref")
    // 4: dedup to content survivors — the case_ref prefix is stripped so
    // identical (status, event-count) content actually collapses
    val survivors = cases
      .select(col("case_ref"), col("category"),
        regexp_replace(col("case_summary"), "^Case [0-9]+ ", "").as("content"))
      .groupBy("content")
      .agg(min(col("case_ref")).as("survivor_ref"),
        count(lit(1)).as("n_dupes"),
        sum(when(col("category") === "new", 1L).otherwise(0L)).as("n_new"))
    // 5: index build — portable embed, exact integer milli-components
    // (round(float*1000) recovers the underlying integer, see
    // Enricher.embedStats), then the 4-table sign-LSH bucket ids. Sign
    // planes are scale-invariant, so bucketing the milli vector directly
    // needs no normalization pass — the index key is pure long arithmetic.
    val milli = transform(Enricher.embedText(col("content")),
      x => round(x.cast("double") * 1000).cast("long"))
    val buckets = (0 until Similarity.LshTables).map(t =>
      Similarity.lshBucket(col("_mv"), t).as(s"bucket_$t"))
    survivors.withColumn("_mv", milli)
      .select(Seq(col("content"), col("survivor_ref"), col("n_dupes"),
        col("n_new")) ++ buckets: _*)
  }

  /** The SECOND flagship: the training-corpus build end to end as ONE
    * declarative plan — the ML-family twin of [[flagship]]'s case
    * pipeline. Tokenize → quality-gate (Gopher-style length and
    * mean-token-length rules in pure integers) → exact-dedup to
    * content survivors (md5 group, min-id winner) → hash-split
    * assignment → per-(source, split) corpus manifest. Real corpus
    * builds run these as separate orchestrated jobs with materialized
    * intermediates; composed declaratively, Catalyst pipelines the
    * gate into the scan, the dedup window and the rollup share one
    * shuffle each, and the output is the bounded manifest
    * (|sources|·|splits| rows) a sampler consumes.
    *
    * The token projection is declared once; Catalyst's CollapseProject
    * then inlines it into the gate predicate rather than materializing
    * it — recompute traded for zero barriers, the right call here
    * because per-row token work is linear and a persist barrier would
    * cache the full corpus. (Contrast sim_hybrid_rrf, where the shared
    * tokenization feeds THREE downstream aggregates and the barrier
    * pays for itself.) The dedup rank-1 compiles to WindowGroupLimit
    * (partial + final), so each group ships one row, not its members —
    * see PLANS.md. */
  def trainingCorpus(spark: SparkSession, dir: String): DataFrame = {
    val stats = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"),
        graft.ml.TextOps.tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("source"), col("text"),
        size(col("toks")).cast("long").as("n_toks"),
        expr("aggregate(toks, 0L, (a, x) -> a + length(x))").as("sum_len"))
    val gated = stats.filter(col("n_toks") >= 10 &&
      col("sum_len") >= col("n_toks") * 3 &&
      col("sum_len") <= col("n_toks") * 10)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    val survivors = gated
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val bucket = graft.expr.Exprs.serialOf(col("doc_id")) % 100
    survivors
      .select(col("source"), col("n_toks"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
      .groupBy("source", "split")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("n_tokens"))
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "e2e_flagship_lineage" -> ((s, d) => flagship(s, d)),
    "e2e_training_corpus" -> ((s, d) => trainingCorpus(s, d)))

  /** The five stages replayed in SQL: recon CTEs (shared with the recon_*
    * oracles), the U1 summary arithmetic, a GROUP BY dedup, the portable
    * token-fold embed (shared with the u2 oracle), and the inlined LSH
    * planes (shared with the sim_topk_ann oracle). */
  private def flagshipOracle: String = {
    val bucketCols = (0 until Similarity.LshTables).map { t =>
      val b = (0 until Similarity.LshPlanes).map { k =>
        val planeLit = Similarity.plane(t, k, Similarity.LshPlanes)
          .mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(kv, $planeLit) >= 0 THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ")
      s"CAST($b AS BIGINT) AS bucket_$t"
    }.mkString(",\n       ")
    s"""${ReconcileQueries.ctes},
       |changed AS (
       |  SELECT case_ref, category FROM cat
       |  WHERE category IN ('new', 'needs_update')),
       |n AS (SELECT l_orderkey, count(*) AS n_history FROM lineitem GROUP BY 1),
       |base AS (
       |  SELECT o_orderkey AS case_ref,
       |         CASE WHEN o_orderstatus = 'O' THEN 'active'
       |              WHEN o_orderstatus = 'F' THEN 'complete'
       |              ELSE 'processing' END AS status,
       |         coalesce(n.n_history, 0) AS nh
       |  FROM orders LEFT JOIN n ON orders.o_orderkey = n.l_orderkey),
       |joined AS (
       |  SELECT c.case_ref, c.category,
       |         '(' || b.status || '): ' || b.nh::VARCHAR || ' events on file'
       |           AS content
       |  FROM changed c JOIN base b ON c.case_ref = b.case_ref),
       |surv AS (
       |  SELECT content, min(case_ref) AS survivor_ref, count(*) AS n_dupes,
       |         CAST(sum(CASE WHEN category = 'new' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_new
       |  FROM joined GROUP BY content),
       |emb AS (
       |  SELECT content, survivor_ref, n_dupes, n_new,
       |         list_transform(range(0, 64), j ->
       |           (h * (2 * j + 1) + (j + 1) * 40503) % 1000 - 500) AS kv
       |  FROM (SELECT surv.*,
       |          list_reduce(list_prepend(0::BIGINT, list_transform(
       |            list_filter(string_split(substring(content, 1, 32000), ' '),
       |                        x -> x <> ''),
       |            x -> len(x)::BIGINT * 256 + ascii(x)::BIGINT)),
       |            (a, b) -> (a * 31 + b) % 1000000007) AS h
       |        FROM surv))
       |SELECT content, survivor_ref, n_dupes, n_new,
       |       $bucketCols
       |FROM emb""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "e2e_flagship_lineage" -> flagshipOracle,
    "e2e_training_corpus" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, text,
        |         CAST(len(toks) AS BIGINT) AS n_toks,
        |         CAST(coalesce(list_aggregate(
        |           list_transform(toks, x -> len(x)), 'sum'), 0)
        |           AS BIGINT) AS sum_len
        |  FROM t),
        |q AS (
        |  SELECT * FROM s
        |  WHERE n_toks >= 10 AND sum_len >= 3 * n_toks
        |    AND sum_len <= 10 * n_toks),
        |d AS (
        |  SELECT doc_id, source, n_toks,
        |         row_number() OVER (PARTITION BY md5(text)
        |                            ORDER BY doc_id) AS rn
        |  FROM q),
        |sv AS (
        |  SELECT source, n_toks,
        |         CASE WHEN (doc_id * 48271) % 100000 % 100 < 80 THEN 'train'
        |              WHEN (doc_id * 48271) % 100000 % 100 < 90 THEN 'val'
        |              ELSE 'test' END AS split
        |  FROM d WHERE rn = 1)
        |SELECT source, split, count(*) AS n_docs,
        |       CAST(sum(n_toks) AS BIGINT) AS n_tokens
        |FROM sv GROUP BY 1, 2""".stripMargin)
}
