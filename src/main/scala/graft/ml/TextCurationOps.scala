package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Exprs

/** Corpus-curation operators of [[TextOps]]: per-source quality pruning,
  * anneal/mixture scheduling, epoch planning, boilerplate statistics
  * (round-11 split; registration stays on the object).
  */
private[graft] trait TextCurationOps extends TextQualityOps {
  // -------------------------------------------------------------------
  // Per-source quality pruning + mixture weighting (corpus curation)
  // -------------------------------------------------------------------

  /** Drop each source's worst quality quantile — per-domain pruning, the
    * curation step after scoring (every web corpus prunes per-source, not
    * globally, so a clean source doesn't crowd out a noisy one entirely).
    *
    * Scale shape: the score is quantized to the bounded 1e4 grid and the
    * per-source cut points come from ONE grouped `percentile` aggregate
    * (bounded value→count maps per group, map-side partials); the edges
    * table has one row per source → broadcast back, and the keep test is
    * a per-row comparison. No window, no global sort — the same plan as
    * the decile binner, grouped. Spark's exact `percentile` interpolation
    * matches DuckDB `quantile_cont`, so the cut replays bit-for-bit. */
  def qualityPruneOf(docs: DataFrame, dropQuantile: Double = 0.3): DataFrame = {
    val t = tokens(col("text"))
    val stats = docs
      .select(col("doc_id"), col("source"), t.as("toks"))
      .select(col("doc_id"), col("source"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"))
      .select(col("doc_id"), col("source"),
        qualityScore(col("n_tokens"), col("n_uniq")).as("quality_score"))
      .withColumn("qbin", floor(col("quality_score") * 10000).cast("long"))
    val edges = stats.groupBy("source")
      .agg(percentile(col("qbin"), lit(dropQuantile)).as("edge"))
    stats.join(broadcast(edges), "source")
      .filter(col("qbin").cast("double") >= col("edge"))
      .select(col("doc_id"), col("source"), col("quality_score"))
  }

  def qualityPrune(spark: SparkSession, dir: String): DataFrame =
    qualityPruneOf(Tables.documents(spark, dir))

  /** Two-phase annealed mixture schedule (the midtraining-anneal
    * practice: bulk-train on a temperature-flattened mix, then finish
    * on a quality-upweighted one): phase 'bulk' carries the
    * sqrt-temperature weights of [[mixtureWeightsOf]] verbatim; phase
    * 'anneal' reweights each source by its MEAN quality bin (the exact
    * integer qbin of the corpus quality score), normalized per-mille.
    * Pure composition — one extra aggregate over the quality bins and a
    * broadcast scalar; output is 2·|sources| rows. */
  def annealScheduleOf(docs: DataFrame): DataFrame = {
    val bulk = mixtureWeightsOf(docs)
      .select(col("source"), lit("bulk").as("phase"), col("weight_milli"))
    val t = tokens(col("text"))
    val meanQ = docs
      .select(col("source"), t.as("toks"))
      .select(col("source"), size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"))
      .select(col("source"),
        floor(qualityScore(col("n_tokens"), col("n_uniq")) * 10000)
          .cast("long").as("qbin"))
      .groupBy("source")
      .agg(expr("sum(qbin) div count(1)").as("mean_qbin"))
    val anneal = meanQ
      .crossJoin(broadcast(meanQ.agg(sum(col("mean_qbin")).as("tq"))))
      // NULLIF: an all-zero-quality corpus must yield NULL weights in
      // BOTH engines, not a DuckDB division error (the er_match_quality
      // precedent)
      .select(col("source"), lit("anneal").as("phase"),
        expr("mean_qbin * 1000 div nullif(tq, 0)").as("weight_milli"))
    bulk.unionByName(anneal)
  }

  def annealSchedule(spark: SparkSession, dir: String): DataFrame =
    annealScheduleOf(Tables.documents(spark, dir))

  /** Sampling weights per source for training-mixture construction —
    * w_s ∝ sqrt(token count), the standard temperature-scaled reweighting
    * (α = 1/2: multilingual/multi-domain training upsamples small
    * domains relative to proportional sampling). The square root is the
    * INTEGER isqrt (floor of the true root, computed as a float seed
    * plus a two-step exact correction), so milli-weights replay exactly
    * in any engine regardless of libm rounding.
    *
    * Scale shape: one map-side-combined sum per source (sources are
    * few), then driver-free normalization through a 1-row broadcast
    * total — the document table is scanned once, projected to two
    * columns. */
  def mixtureWeightsOf(docs: DataFrame): DataFrame = {
    val bySource = docs
      .select(col("source"), size(tokens(col("text"))).cast("long").as("n"))
      .groupBy("source").agg(sum(col("n")).as("n_tokens"))
      // float sqrt seeds the integer root; the two corrections repair any
      // libm off-by-one so the result is exactly floor(sqrt(n))
      .withColumn("s0", floor(sqrt(col("n_tokens").cast("double"))).cast("long"))
      .withColumn("s1",
        col("s0") - when(col("s0") * col("s0") > col("n_tokens"), 1L).otherwise(0L))
      .withColumn("sqrt_tokens",
        col("s1") + when((col("s1") + 1) * (col("s1") + 1) <= col("n_tokens"), 1L)
          .otherwise(0L))
    val total = bySource.agg(sum(col("sqrt_tokens")).as("total_sqrt"))
    bySource.crossJoin(broadcast(total))
      .select(col("source"), col("n_tokens"), col("sqrt_tokens"),
        expr("sqrt_tokens * 1000 div total_sqrt").as("weight_milli"))
  }

  def mixtureWeights(spark: SparkSession, dir: String): DataFrame =
    mixtureWeightsOf(Tables.documents(spark, dir))

  /** Tokens drawn per source per epoch in the registered plan. */
  val EpochTokenBudget = 100000L

  /** Epoch sampling plan: turn the temperature-scaled mixture weights
    * into per-source token draws for a fixed epoch budget — the planning
    * step between "weights computed" and "sampler runs" in a training
    * pipeline. planned = budget·weight (integer milli), capped by what
    * the source actually holds; epochs_until_exhausted = how many epochs
    * the source survives before repeating data (the Muennighoff et al.
    * 2023 repetition question, asked per source). Pure projection over
    * [[mixtureWeightsOf]] — no additional scan or shuffle. */
  def epochPlanOf(docs: DataFrame, budget: Long = EpochTokenBudget): DataFrame =
    mixtureWeightsOf(docs)
      .withColumn("planned_tokens",
        least(expr(s"$budget * weight_milli div 1000"), col("n_tokens")))
      .withColumn("epochs_until_exhausted",
        expr("n_tokens div greatest(planned_tokens, 1)"))
      .select("source", "n_tokens", "weight_milli", "planned_tokens",
        "epochs_until_exhausted")

  def epochPlan(spark: SparkSession, dir: String): DataFrame =
    epochPlanOf(Tables.documents(spark, dir))

  /** Segment document frequency >= this ⇒ boilerplate. */
  val BoilerplateDf = 3L

  /** Token width of a boilerplate segment (the "line" proxy for an
    * unpunctuated corpus). */
  val BoilerplateSegTokens = 6

  /** C4-style boilerplate screen (Raffel et al. 2020, §2.2's line-level
    * filters): a SEGMENT — a non-overlapping 6-token window, the line
    * grain of an unpunctuated corpus — appearing in ≥ [[BoilerplateDf]]
    * distinct documents is boilerplate (nav chrome, license footers,
    * templates); per document, how many segments it holds, how many are
    * boilerplate, and the character mass that survives removal. The
    * cross-document twin of curation_span_dedup: span dedup kills
    * repeated SUBSTRINGS pairwise, this kills corpus-frequent whole
    * segments by one inverted-index pass — distinct (doc, segment)
    * explode, segment-df aggregate, one join back, one per-doc rollup.
    * The df aggregate map-side combines; hot segments are exactly the
    * high-df ones, bounded by the document count. */
  def boilerplateStatsOf(docs: DataFrame,
                         dfCap: Long = BoilerplateDf): DataFrame = {
    val w = BoilerplateSegTokens
    val sent = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, CAST(size(toks) div $w AS INT) - 1),
           |  i -> array_join(slice(toks, i * $w + 1, $w), ' '))""".stripMargin))
        .as("s"))
      .distinct()
    val dfs = sent.groupBy("s").agg(count(lit(1)).as("df"))
    sent.join(dfs, "s")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(when(col("df") >= dfCap, 1L).otherwise(0L)).as("n_boilerplate"),
        coalesce(sum(when(col("df") < dfCap, length(col("s")).cast("long"))),
          lit(0L)).as("kept_chars"))
  }

  def boilerplateStats(spark: SparkSession, dir: String): DataFrame =
    boilerplateStatsOf(Tables.documents(spark, dir))
}
