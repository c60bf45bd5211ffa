package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Exprs

/** Corpus-quality signals of [[TextOps]]: CCNet-style document rarity,
  * Gopher rule filters, DSIR importance weights, bigram-LM cross-entropy,
  * and markup text extraction (round-11 split; registration stays on the
  * object).
  */
private[graft] trait TextQualityOps extends TextTokenOps {
  // -------------------------------------------------------------------
  // Corpus-DF document rarity score (CCNet-style quality signal)
  // -------------------------------------------------------------------

  /** Tokens whose DF join goes through the broadcast hot arm. */
  val HotVocab = 64

  /** Skew-split fact-to-vocab join on `keyCols`: join `facts` (many rows
    * per key, Zipf-skewed — natural-language tokens and n-grams) against
    * one-row-per-key `vocab`, with the `hotK` highest-`byCol` vocab rows
    * (a TakeOrdered — tiny) going broadcast and their fact rows carved
    * out of the shuffled cold arm by a broadcast anti-join BEFORE it
    * shuffles — without the carve-out the cold join would still drag
    * every stopword row through its exchange and re-concentrate the
    * exact skew the split exists to break (caught by ScaleSpec's
    * task-metric test). Post-split no hot-key row enters any exchange,
    * and the cold arm's per-key multiplicity is bounded by the
    * (hotK+1)-th `byCol`. The effect of a salted join, with zero
    * replication of the fact side.
    *
    * `joinType` applies to the cold arm; `"left"` yields exact
    * left-join semantics overall because hot keys always match (hot is
    * a subset of vocab). Shared by [[docRarityOf]],
    * [[importanceWeightsOf]] and [[lmCrossEntropyOf]]. */
  private def skewSplitJoin(facts: DataFrame, vocab: DataFrame,
                            keyCols: Seq[String], byCol: String, hotK: Int,
                            joinType: String = "inner"): DataFrame = {
    val hot = vocab
      .orderBy((col(byCol).desc +: keyCols.map(col(_).asc)): _*).limit(hotK)
    val coldFacts = facts
      .join(broadcast(hot.select(keyCols.map(col): _*)), keyCols, "left_anti")
    facts.join(broadcast(hot), keyCols)
      .unionByName(coldFacts.join(vocab, keyCols, joinType))
  }

  /** Per-document rarity statistics against the corpus-wide token
    * document-frequency (DF) table — the deterministic analog of CCNet's
    * LM-perplexity quality signal (Wenzek et al. 2020): a document whose
    * distinct tokens are mostly hapaxes (DF=1) is likely OCR noise or
    * encoding garbage; one made only of ubiquitous tokens is likely
    * template boilerplate. Output per doc: distinct-token count, hapax
    * count, DF sum, and integral milli-ratios (a·1000 div b — exact long
    * division, no floating point, so the oracle replays bit-for-bit).
    *
    * Scale design: unlike [[textStatsOf]]'s row-local signals, this one
    * needs a corpus-global statistic joined back per document. The DF
    * table is vocab-sized — NOT broadcastable at web scale — so the join
    * back to (doc, token) pairs shuffles on token, and natural-language
    * tokens are the canonical skewed key (every doc contains "the"; its
    * reducer would receive ~|corpus| rows). The join goes through
    * [[skewSplitJoin]]'s hot/cold split; TextOpsSpec proves the split
    * equals the naive single-join form. */
  def docRarityOf(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
      .persist() // read by the DF aggregate and both join arms
    val dfTab = pairs.groupBy("tok").agg(count(lit(1)).as("df"))
    val joined = skewSplitJoin(pairs, dfTab, Seq("tok"), "df", HotVocab)
    joined.groupBy("doc_id")
      .agg(count(lit(1)).as("n_uniq"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("df")).as("df_sum"))
      .select(col("doc_id"), col("n_uniq"), col("n_hapax"), col("df_sum"),
        expr("n_hapax * 1000 div n_uniq").as("hapax_milli"),
        expr("df_sum * 1000 div n_uniq").as("mean_df_milli"))
  }

  /** Naive single-join form — spec-only equality yardstick for the
    * hot/cold split (skew-prone: one reducer per stopword). */
  def docRarityNaiveOf(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"),
        explode(array_distinct(tokens(col("text")))).as("tok"))
    val dfTab = pairs.groupBy("tok").agg(count(lit(1)).as("df"))
    pairs.join(dfTab, Seq("tok"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_uniq"),
        sum(when(col("df") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(col("df")).as("df_sum"))
      .select(col("doc_id"), col("n_uniq"), col("n_hapax"), col("df_sum"),
        expr("n_hapax * 1000 div n_uniq").as("hapax_milli"),
        expr("df_sum * 1000 div n_uniq").as("mean_df_milli"))
  }

  def docRarity(spark: SparkSession, dir: String): DataFrame =
    docRarityOf(Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // Gopher-style repetition/quality filters (Rae et al. 2021, table A1)
  // -------------------------------------------------------------------

  /** Per-document Gopher rule values — the repetition + shape heuristics
    * every large-scale pretraining pipeline applies before training
    * (Rae et al. 2021 appendix A1.1; also C4/MassiveText): word count,
    * mean word length, alphabetic-word fraction, the token share of the
    * single most repeated bigram, and the repeated-5-gram fraction. All
    * ratios are integral milli-units (`a·1000 div b`), so the oracle
    * replays them exactly. `gopher_pass` combines the thresholds —
    * consumers filter on it or re-cut from the raw rule values.
    *
    * Scale shape: everything except the top-bigram mode is a row-local
    * array expression (narrow, codegen'd). The within-doc bigram mode is
    * explode → (doc, gram) count → per-doc max — two map-side-combined
    * aggregates keyed by doc, no corpus-global state at all, so the
    * operator is embarrassingly parallel at any corpus size. The
    * repeated-5-gram fraction deliberately stays row-local
    * (size − size(array_distinct)) rather than exploding 5× the corpus. */
  def gopherQualityOf(docs: DataFrame): DataFrame = {
    val base = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        size(col("toks")).cast("long").as("n_words"),
        isum(transform(col("toks"), w => length(w).cast("long"))).as("sum_len"),
        size(filter(col("toks"), w => w.rlike("[A-Za-z]")))
          .cast("long").as("n_alpha"),
        when(size(col("toks")) >= 5,
          transform(sequence(lit(1), size(col("toks")) - 4),
            i => concat_ws(" ", slice(col("toks"), i, lit(5)))))
          .otherwise(array().cast("array<string>")).as("g5"))
      .select(col("doc_id"), col("toks"), col("n_words"), col("sum_len"),
        col("n_alpha"),
        size(col("g5")).cast("long").as("n5"),
        size(array_distinct(col("g5"))).cast("long").as("n5d"))
      .persist() // re-read by the bigram explode and the final join
    val topBigram = base
      .filter(col("n_words") >= 2)
      .select(col("doc_id"), explode(
        transform(sequence(lit(1), size(col("toks")) - 1),
          i => concat_ws(" ", slice(col("toks"), i, lit(2))))).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).as("top_bigram_n"))
    base.join(topBigram, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_words"), col("sum_len"), col("n_alpha"),
        col("n5"), col("n5d"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"))
      .select(col("doc_id"), col("n_words"),
        expr("sum_len * 1000 div greatest(n_words, 1)").as("mean_word_len_milli"),
        expr("n_alpha * 1000 div greatest(n_words, 1)").as("alpha_word_milli"),
        expr("top_bigram_n * 2000 div greatest(n_words, 1)").as("top_bigram_milli"),
        expr("CASE WHEN n5 > 0 THEN (n5 - n5d) * 1000 div n5 ELSE 0 END")
          .as("rep5_milli"))
      .withColumn("gopher_pass",
        col("n_words") >= 10 &&
          col("mean_word_len_milli").between(1000, 10000) &&
          col("alpha_word_milli") >= 500 &&
          col("top_bigram_milli") <= 200 &&
          col("rep5_milli") <= 150)
  }

  def gopherQuality(spark: SparkSession, dir: String): DataFrame =
    gopherQualityOf(Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // DSIR-shaped importance weights (Xie et al. 2023, in linear space)
  // -------------------------------------------------------------------

  /** Importance weight of each document against a target slice — the
    * data-selection stage that upsamples raw documents resembling a
    * trusted corpus (DSIR, Xie et al. 2023; CCNet's LM filter is the
    * same idea with a trained LM). The real method scores log-likelihood
    * ratios of hashed n-gram LMs; logs are not engine-portable (libm low
    * bits differ), so this computes the per-token likelihood ratio
    * c_target/c_raw, normalized by corpus totals, in FIXED integral
    * milli-arithmetic — the identical `div` chain replays in any SQL
    * engine, and the ORDERING of documents (what selection actually
    * consumes) is preserved. A doc of target-typical tokens scores near
    * its slice's base rate; one of never-in-target tokens scores 0.
    *
    * Scale shape: one token-count shuffle produces BOTH corpora's counts
    * (c_raw, c_target) in a single aggregate; totals ride the 1-row
    * broadcast scalar-anchor; the ratio table joins back through the
    * [[skewSplitJoin]] hot/cold split, then one per-doc aggregate.
    * The target slice must be non-empty (n_t appears as a divisor). */
  def importanceWeightsOf(docs: DataFrame, isTarget: Column): DataFrame = {
    val toks = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(tokens(col("text"))).as("tok"))
      .persist() // read by the count aggregate and both join arms
    val counts = toks.groupBy("tok").agg(
      count(lit(1)).as("c_r"),
      sum(when(col("is_t"), 1L).otherwise(0L)).as("c_t"))
    val totals = counts.agg(sum(col("c_r")).as("n_r"), sum(col("c_t")).as("n_t"))
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("tok"), col("c_r"),
        expr("(c_t * 1000 div c_r) * (n_r * 1000 div n_t) div 1000")
          .as("lr_milli"))
    skewSplitJoin(toks.select(col("doc_id"), col("tok")), lr,
        Seq("tok"), "c_r", HotVocab)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("lr_milli")).as("lr_sum"))
      .select(col("doc_id"), col("n_tokens"),
        expr("lr_sum div n_tokens").as("importance_milli"))
  }

  /** Registered form: English documents as the target slice. */
  def importanceWeights(spark: SparkSession, dir: String): DataFrame =
    importanceWeightsOf(Tables.documents(spark, dir), col("lang") === "en")

  // -------------------------------------------------------------------
  // CCNet-shaped bigram-LM cross-entropy (Wenzek et al. 2020)
  // -------------------------------------------------------------------

  /** Per-document bigram-LM cross-entropy against a target slice — the
    * model-based quality filter of CCNet-style pipelines: train a
    * language model on trusted text, keep raw documents whose
    * cross-entropy under it is low. The real pipelines score a 5-gram
    * KenLM; the binary log is the only non-portable piece (libm low bits
    * differ across engines), so this uses an integral fixed-point log2:
    * floor(log2 x) from the length of the binary string (`bin` — unpadded
    * in both Spark and DuckDB) plus a linear milli-interpolation between
    * powers of two,
    * {{{ log2m(x) = (bl-1)*1000 + x*1000 div 2^(bl-1) - 1000,  bl = len(bin(x)) }}}
    * making the whole chain exact integer arithmetic that replays
    * bit-for-bit in any SQL engine.
    *
    * LM: add-one-smoothed bigrams over the target slice,
    * `p(w2|w1) = (c(w1,w2)+1) / (c(w1,·)+V)` with V the target's distinct
    * successor vocabulary; per-doc score is the mean `-log2 p` over its
    * bigrams in milli-bits (`xent_milli` — the log2 of perplexity).
    * `log2m` is monotone, and `den >= num` always (c_ctx >= c_bg, V >= 1),
    * so scores are non-negative. Docs with fewer than 2 tokens have no
    * bigram and are dropped.
    *
    * Scale shape: bigrams generate narrowly from each row's token array
    * (sequence+transform+explode — no shuffle); the LM table is one
    * count shuffle and the context table a re-aggregation of it; V rides
    * the 1-row broadcast scalar anchor; both score joins go through
    * [[skewSplitJoin]]'s hot/cold split on the Zipf-skewed bigram and
    * context keys, with LEFT semantics so never-in-target n-grams fall
    * through to the smoothing floor. */
  def lmCrossEntropyOf(docs: DataFrame, isTarget: Column): DataFrame = {
    val bg = docs
      .select(col("doc_id"), isTarget.as("is_t"), tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= 2)
      .select(col("doc_id"), col("is_t"),
        explode(expr("transform(sequence(1, size(toks) - 1), " +
          "i -> named_struct('w1', toks[i-1], 'w2', toks[i]))")).as("p"))
      .select(col("doc_id"), col("is_t"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
      .persist() // read by the LM aggregate, V, and the score join
    val lm = bg.where(col("is_t")).groupBy("w1", "w2")
      .agg(count(lit(1)).as("c_bg"))
    val ctx = lm.groupBy("w1").agg(sum(col("c_bg")).as("c_ctx"))
    val v = bg.where(col("is_t")).agg(countDistinct(col("w2")).as("v"))
    val scored = skewSplitJoin(
      skewSplitJoin(bg.select("doc_id", "w1", "w2"), lm,
        Seq("w1", "w2"), "c_bg", HotVocab, "left"),
      ctx, Seq("w1"), "c_ctx", HotVocab, "left")
    scored.crossJoin(broadcast(v))
      .selectExpr("doc_id",
        "coalesce(c_bg, 0L) + 1L AS num", "coalesce(c_ctx, 0L) + v AS den")
      .selectExpr("doc_id",
        s"${log2mExpr("den")} - (${log2mExpr("num")}) AS bits_milli")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("bits_milli")).as("bits_sum"))
      .selectExpr("doc_id", "n_bigrams", "bits_sum div n_bigrams AS xent_milli")
  }

  /** Registered form: English documents as the trusted LM slice. */
  def lmCrossEntropy(spark: SparkSession, dir: String): DataFrame =
    lmCrossEntropyOf(Tables.documents(spark, dir), col("lang") === "en")

  // -------------------------------------------------------------------
  // U3 — markup/control-char text extraction
  // -------------------------------------------------------------------

  /** U3: extract clean text from tagged markup — strip elements, decode
    * the basic HTML entities (&amp; last, so &amp;lt; survives single
    * decoding), erase control characters, collapse whitespace. The
    * column-expression stand-in for the reference's external document
    * parser (docproc/format_config.py:147-230): where that service
    * consumes PDFs, this consumes the markup-shaped text that survives
    * in a crawl/export corpus. Pure codegen'd regex projection — narrow,
    * no UDF. */
  def extractText(markup: Column): Column = {
    val noTags = regexp_replace(markup, "<[^>]*>", " ")
    val ent = regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(noTags, "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&nbsp;", " "),
      "&amp;", "&")
    val noCtl = regexp_replace(ent, "[\\x00-\\x1F\\x7F]", " ")
    trim(regexp_replace(noCtl, " +", " "))
  }

  /** Registered U3 form over a markup column synthesized from documents
    * (tags + entities + control bytes wrapped around the real text, so
    * the oracle can rebuild the identical input). */
  def extractTextQuery(spark: SparkSession, dir: String): DataFrame = {
    val marked = Tables.documents(spark, dir).select(
      col("doc_id"),
      concat(
        lit("<html>\n<body>\t<h1>Doc "), col("doc_id").cast("string"),
        lit("</h1>\u0001<p>"), col("text"),
        lit(" &amp; tail&nbsp;&lt;EOF&gt;</p>\u0007</body></html>")).as("markup"))
    marked.select(
      col("doc_id"),
      extractText(col("markup")).as("text_clean"))
      .withColumn("n_chars_clean", length(col("text_clean")).cast("long"))
  }
}
