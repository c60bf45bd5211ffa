package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.expr.Exprs

/** Text-analysis operators for a training-data pipeline over the
  * `documents` table: tokenization/quality stats, n-gram language ID,
  * document fingerprinting. These extend the reference surface per the
  * north-star mandate (SURVEY.md §7 phase 6); the reference's own text
  * handling tops out at keyword search + truncation
  * (caseguard/vectorization/embedder.py:148-151).
  *
  * Everything is array-expression based (codegen'd, no UDFs, no shuffle
  * until an aggregate) — at 100 TB these are embarrassingly parallel
  * per-document map stages.
  */
object TextOps {

  /** whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is")

  /** integer sum over an int array (explicit left fold — portable). */
  private def isum(arr: Column): Column =
    aggregate(arr, lit(0L), (a, b) => a + b)

  /** Fixed-point milli-log2 as a selectExpr fragment over a positive
    * integral expression `x`: `(bitlen-1)*1000 + x*1000 div 2^(bitlen-1)
    * - 1000` — the linear-interpolated log2 used by the BM25 idf and the
    * bigram-LM cross-entropy chains. Integral `div` throughout, so the
    * same chain (with `//`) replays bit-for-bit in DuckDB oracles. */
  private[graft] def log2mExpr(x: String): String =
    s"(length(bin($x)) - 1) * 1000" +
      s" + ($x) * 1000 div CAST(power(2, length(bin($x)) - 1) AS BIGINT) - 1000"

  /** Token/quality statistics per document: counts, average token length,
    * stopword ratio, and a 0-1 quality score (length + lexical density).
    * Library surface: any DataFrame with (doc_id, text). */
  /** The shared 0-1 quality score: length saturation (100 tokens → 1.0)
    * blended 50/50 with lexical density. One formula, used by the stats
    * projection here and the per-source prune ([[qualityPruneOf]]). */
  def qualityScore(nTokens: Column, nUniq: Column): Column =
    Exprs.clamp01(
      least(nTokens.cast("double") / lit(100.0), lit(1.0)) * lit(0.5)
        + nUniq.cast("double") / greatest(nTokens, lit(1)).cast("double")
          * lit(0.5))

  def textStatsOf(docs: DataFrame): DataFrame = {
    val t = tokens(col("text"))
    docs
      .select(col("doc_id"), length(col("text")).as("n_chars"), t.as("toks"))
      .select(
        col("doc_id"), col("n_chars"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_uniq"),
        isum(transform(col("toks"), x => length(x).cast("long"))).as("sum_len"),
        size(filter(col("toks"), x =>
          x.isin(stopwords.map(s => lit(s)): _*))).as("n_stop"))
      .select(
        col("doc_id"), col("n_chars"), col("n_tokens"), col("n_uniq"),
        (col("sum_len").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double")).as("avg_token_len"),
        (col("n_stop").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double")).as("stopword_ratio"),
        (col("n_uniq").cast("double") /
          greatest(col("n_tokens"), lit(1)).cast("double")).as("lexical_density"))
      .withColumn("quality_score",
        qualityScore(col("n_tokens"), col("n_uniq")))
  }

  def textStats(spark: SparkSession, dir: String): DataFrame =
    textStatsOf(Tables.documents(spark, dir))

  /** Token-count estimators: whitespace words, BPE-ish subword pieces
    * (letter runs / digit runs / single punctuation — the standard cheap
    * proxy for model-tokenizer counts), and the chars/4 rule of thumb. */
  def tokenCountsOf(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens(col("text"))).as("n_words"),
      size(regexp_extract_all(col("text"),
        lit("\\p{L}+|\\d+|[^\\p{L}\\d\\s]"), lit(0))).as("n_bpe_pieces"),
      ceil(length(col("text")).cast("double") / 4.0).cast("long").as("n_chars_div4"))

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    tokenCountsOf(Tables.documents(spark, dir))

  /** Tokenizer fertility + lexical diversity per language — the
    * cost-model metrics a multilingual corpus is profiled by before
    * mixing: fertility (subword pieces per whitespace word; high-
    * fertility languages cost more tokens per word) and type-token
    * ratio (corpus-level lexical diversity). Two map-side-combined
    * aggregates, one language-keyed join — the type count explodes
    * doc-DISTINCT tokens only, so the shuffle is vocabulary-bounded per
    * doc, never corpus-bounded (the queryKeywordsOf df shape). Integer
    * milli-units throughout. */
  def fertilityByLangOf(docs: DataFrame): DataFrame = {
    val perLang = docs.select(col("lang"),
      size(tokens(col("text"))).cast("long").as("w"),
      size(regexp_extract_all(col("text"),
        lit("\\p{L}+|\\d+|[^\\p{L}\\d\\s]"), lit(0))).cast("long").as("p"),
      length(col("text")).cast("long").as("c"))
      .groupBy("lang").agg(
        count(lit(1)).as("n_docs"), sum(col("w")).as("n_words"),
        sum(col("p")).as("n_pieces"), sum(col("c")).as("n_chars"))
    val types = docs
      .select(col("lang"), explode(array_distinct(tokens(col("text")))).as("tok"))
      .groupBy("lang").agg(countDistinct(col("tok")).as("n_types"))
    perLang.join(types, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"), col("n_words"), col("n_pieces"),
        col("n_chars"), coalesce(col("n_types"), lit(0L)).as("n_types"),
        expr("1000 * n_pieces div greatest(n_words, 1)").as("fertility_milli"),
        expr("1000 * n_types div greatest(n_words, 1)").as("ttr_milli"))
  }

  def fertilityByLang(spark: SparkSession, dir: String): DataFrame =
    fertilityByLangOf(Tables.documents(spark, dir))

  /** Language-ID by stopword-set scoring with a CJK-codepoint fast path —
    * the classic n-gram/wordlist heuristic. Tie-breaks follow a fixed
    * precedence (en > de > fr > es) so the argmax is total. */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val t = tokens(lower(col("text")))
    def hits(words: Seq[String]): Column =
      size(filter(t, x => x.isin(words.map(lit): _*)))
    val en = hits(Seq("the", "a", "of", "and", "is"))
    val de = hits(Seq("der", "die", "das", "und", "ist"))
    val fr = hits(Seq("le", "la", "et", "est", "les"))
    val es = hits(Seq("el", "los", "y", "es", "las"))
    val hasCjk = col("text").rlike("[\\u4e00-\\u9fff]")
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        en.as("s_en"), de.as("s_de"), fr.as("s_fr"), es.as("s_es"),
        hasCjk.as("has_cjk"))
      .withColumn("lang_pred",
        when(col("has_cjk"), "zh")
          .when(col("s_en") >= greatest(col("s_de"), col("s_fr"), col("s_es")), "en")
          .when(col("s_de") >= greatest(col("s_fr"), col("s_es")), "de")
          .when(col("s_fr") >= col("s_es"), "fr")
          .otherwise("es"))
      .withColumn("is_correct", col("lang_pred") === col("lang"))
  }

  /** Rolling polynomial fingerprint over token codes (mod 1e9+7): a
    * portable stand-in for a content-defined document signature. Token
    * code = 256*len + first-codepoint, folded left as acc*31 + code.
    * Library surface: any DataFrame with (doc_id, text). */
  def fingerprintsOf(docs: DataFrame): DataFrame = {
    val codes = transform(tokens(col("text")),
      t => (length(t).cast("long") * 256 + ascii(t).cast("long")))
    docs
      .select(col("doc_id"),
        aggregate(codes, lit(0L),
          (a, b) => (a * 31 + b) % 1000000007L).as("fingerprint"))
  }

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    fingerprintsOf(Tables.documents(spark, dir))

  /** Normalization pass for training corpora: strip punctuation to
    * spaces, collapse whitespace runs, trim, lowercase — the standard
    * pre-tokenization cleanup. Pure regex projection (codegen'd, no
    * shuffle); emitted with before/after char counts. */
  def normalizeOf(docs: DataFrame): DataFrame = {
    val cleaned = lower(trim(regexp_replace(
      regexp_replace(col("text"), "[^\\p{L}\\d\\s]", " "), "\\s+", " ")))
    // n_chars derived, not required: the *Of library surface contract is
    // (doc_id, text) like the sibling functions
    docs.select(
      col("doc_id"), length(col("text")).as("n_chars"),
      cleaned.as("norm_text"),
      length(cleaned).as("n_chars_norm"))
  }

  def normalize(spark: SparkSession, dir: String): DataFrame =
    normalizeOf(Tables.documents(spark, dir))

  // Anchored, unambiguous PII shapes — fixed-length phone and a standard
  // email pattern keep Java-regex (backtracking, leftmost-greedy) and
  // RE2 (leftmost-longest) in exact agreement for the oracle.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "07\\d{3} \\d{6}" // UK mobile: 07700 900123

  /** PII scrub for training corpora: mask emails and phone numbers and
    * count what was masked (the audit trail a compliance pipeline
    * needs). Pure regex projection — narrow, codegen'd.
    * Library surface: any DataFrame with (doc_id, text-like column). */
  def piiMaskOf(docs: DataFrame, textCol: Column): DataFrame =
    docs.select(
      col("doc_id"),
      regexp_replace(regexp_replace(textCol, EmailRe, "<EMAIL>"),
        PhoneRe, "<PHONE>").as("masked_text"),
      size(regexp_extract_all(textCol, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(textCol, lit(PhoneRe), lit(0))).as("n_phones"))

  /** The testdata corpus carries no digits at all, so the registered
    * query masks a deterministic PII-bearing note synthesized from
    * doc_id + a text prefix (the Synth pattern of the expr module) —
    * exercising the masking for real instead of vacuously. */
  def piiNote(docs: DataFrame): Column =
    concat(
      lit("Contact agent"), col("doc_id").cast("string"),
      lit("@firm.co.uk or 07"),
      lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"), lit(" "),
      lpad((col("doc_id") * 48271 % 1000000).cast("string"), 6, "0"),
      lit(" re: "), substring(col("text"), 1, 40))

  def piiMask(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    piiMaskOf(docs, piiNote(docs))
  }

  /** (doc_id, token, tf) term frequencies — explode once, shared by the
    * vocabulary and keyword queries. */
  private def termFreqs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens(col("text"))).as("token"))
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))

  /** Corpus vocabulary top-k: global term frequency + document
    * frequency, deterministic tie-break on the token. The
    * vocabulary-building pass of a tokenizer-training pipeline; two
    * map-side-combined aggregates, top-k via TakeOrdered. */
  def vocabTopKOf(docs: DataFrame, k: Int = 100): DataFrame =
    termFreqs(docs)
      .groupBy("token")
      .agg(sum(col("tf")).as("freq"), count(lit(1)).as("df"))
      .orderBy(col("freq").desc, col("token").asc)
      .limit(k)

  def vocabTopK(spark: SparkSession, dir: String): DataFrame =
    vocabTopKOf(Tables.documents(spark, dir))

  /** EXACT heavy hitters — every token with freq·k > N — at bounded
    * memory. [[vocabTopKOf]] shuffles the whole distinct vocabulary to
    * rank it; at a 100 TB corpus the vocabulary itself (URLs, hashes,
    * typos) is shuffle-hostile. This is the classic two-phase fix:
    *
    * Phase 1 runs Misra–Gries with k counters INSIDE each input
    * partition (`mapPartitions` — genuinely imperative per-partition
    * state, the documented last-resort case). Each task emits at most k
    * candidate tokens, so the only vocabulary-shaped state anywhere is k
    * strings per task and the candidate shuffle is ≤ k·partitions rows.
    *
    * Phase 2 recounts ONLY the candidates exactly: the exploded token
    * stream is pruned by a BROADCAST join with the tiny candidate set
    * before the one counting shuffle, and the exact threshold
    * freq·k > N filters the recount.
    *
    * Soundness (why the output is exact, not approximate): Misra–Gries
    * with k counters retires k+1 token instances per decrement, so at
    * most n_p/(k+1) decrements happen in a partition of n_p tokens and
    * any token with local freq_p > n_p/(k+1) still holds a counter at
    * the end. If freq(t)·k > N globally then some partition has
    * freq_p(t)·k > n_p (else summing the per-partition negations
    * contradicts the premise), and freq_p > n_p/k > n_p/(k+1) — so
    * every true heavy hitter is a candidate in at least one partition.
    * The candidate pass over-collects; the exact recount + threshold
    * discards the excess. Result: exact answer, memory bounded by k
    * regardless of vocabulary size. (Reference computes token frequency
    * tables driver-side; see SURVEY §2.6 text-analysis family.) */
  /** Per-partition Misra–Gries summaries over a token stream: each task
    * runs MG with k counters and emits its surviving (token, est) pairs
    * — at most k rows per task, the bounded-memory frequency sketch the
    * heavy-hitter operators build on. Estimates are one-sided:
    * c_p(t) − n_p/(k+1) ≤ est ≤ c_p(t) within the task's slice. */
  def mgSummaryOf(toks: DataFrame, k: Int): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    toks.as[String].mapPartitions { it =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1L
          case None if counters.size < k => counters(t) = 1L
          case None =>
            val keys = counters.keys.toArray
            var i = 0
            while (i < keys.length) {
              val c = counters(keys(i)) - 1L
              if (c == 0L) counters.remove(keys(i)) else counters(keys(i)) = c
              i += 1
            }
        }
      }
      counters.iterator
    }.toDF("token", "est")
  }

  /** Merge a union of Misra–Gries summaries back to ≤ k counters — the
    * mergeability rule of Agarwal et al. 2012 (Mergeable Summaries):
    * sum estimates per token, then subtract the (k+1)-th largest merged
    * value from every counter and drop the non-positive ones. At most k
    * counters survive (only those strictly above the threshold), and
    * the one-sided error bounds add across the merged inputs — so
    * batch-wise merging over an unbounded stream keeps the global
    * guarantee at constant state. Input is summary-sized (≤ k rows per
    * contributing task), so every step here is tiny by construction:
    * one small aggregate, a k+1-row TakeOrdered, a broadcast anchor. */
  def mgMergeOf(summaries: DataFrame, k: Int): DataFrame = {
    val merged = summaries.groupBy("token").agg(sum(col("est")).as("est"))
    val sub = merged.orderBy(col("est").desc).limit(k + 1)
      .agg(when(count(lit(1)) > k, min(col("est")))
        .otherwise(lit(0L)).as("sub"))
    merged.crossJoin(broadcast(sub))
      .select(col("token"), (col("est") - col("sub")).as("est"))
      .filter(col("est") > 0)
  }

  def heavyHittersOf(docs: DataFrame, k: Int = 200): DataFrame = {
    val toks = docs.select(explode(tokens(col("text"))).as("token"))
    val candidates = mgSummaryOf(toks, k).select("token").distinct()
    // N without a second explode: token count == size of the token array
    val total = docs.agg(
      sum(size(tokens(col("text"))).cast("long")).as("n_total"))
    toks.join(broadcast(candidates), "token")
      .groupBy("token").agg(count(lit(1)).as("freq"))
      .crossJoin(broadcast(total))
      .filter(col("freq") * k > col("n_total"))
      .orderBy(col("freq").desc, col("token").asc)
      .select("token", "freq", "n_total")
  }

  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHittersOf(Tables.documents(spark, dir))

  /** BM25 keyword retrieval over the corpus — the ranking stage of a
    * quality-classifier / eval-set curation loop ("find the documents
    * most about X"). Okapi BM25 with Lucene's non-negative idf
    * `log((N+1)/(df+0.5))` (never negative, so no clamp discontinuity
    * when a term's df crosses N/2), k1 = 1.2, b = 0.75 — computed
    * entirely in the module's fixed-point milli-arithmetic: the idf log
    * is the same `log2m` chain as [[lmCrossEntropyOf]] over the integer
    * forms 2N+2 and 2df+1, and the tf normalization is one integral
    * `div` chain, so scores replay bit-for-bit in any SQL engine
    * (ranking only needs monotonicity; bit-equality is what makes the
    * oracle exact).
    *
    * Scale shape: the query terms are LITERALS, so the `isin` prune
    * lands right after the explode and only matching (doc, term) rows —
    * |q| per doc at most — ever reach a shuffle; tf is one small
    * aggregate, df a re-aggregation of it, corpus stats ride the 1-row
    * broadcast scalar anchor, and top-k is TakeOrdered with a doc_id
    * tie-break. No inverted index needed: at any corpus size the
    * post-prune volume is bounded by matches, not vocabulary. */
  def bm25Of(docs: DataFrame, queryTerms: Seq[String], topK: Int = 20): DataFrame = {
    val terms = queryTerms.distinct
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(size(tokens(col("text"))).cast("long")).as("n_toks"))
      .select(col("n_docs"), expr("n_toks * 1000 div n_docs").as("avgdl_milli"))
    val tf = docs
      .select(col("doc_id"), size(tokens(col("text"))).cast("long").as("dl"),
        explode(tokens(col("text"))).as("token"))
      .filter(col("token").isin(terms: _*))
      .groupBy("doc_id", "dl", "token")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("token").agg(count(lit(1)).cast("long").as("df"))
    tf.join(broadcast(df), "token")
      .crossJoin(broadcast(stats))
      .selectExpr("doc_id", "tf",
        s"${log2mExpr("2 * n_docs + 2")} - (${log2mExpr("2 * df + 1")}) AS idf_milli",
        "tf * 1000 + 1200 * (250 + 750 * (dl * 1000000 div avgdl_milli) div 1000)" +
          " div 1000 AS den_milli")
      .selectExpr("doc_id",
        "idf_milli * (tf * 2200 * 1000 div den_milli) div 1000 AS contrib_milli")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("contrib_milli")).as("bm25_milli"))
      .orderBy(col("bm25_milli").desc, col("doc_id").asc)
      .limit(topK)
  }

  /** Registered form: one rare term ("dup", df ≈ 5% of docs) and two
    * common ones — exercises both ends of the idf range. */
  def bm25(spark: SparkSession, dir: String): DataFrame =
    bm25Of(Tables.documents(spark, dir), Seq("dup", "vector", "window"))

  /** Per-document distinctive keywords: rank terms by (tf desc, df asc,
    * token asc) — the TF-IDF ordering done entirely in integers (df
    * replaces the idf log monotonically), so the ranking is exact in any
    * engine. Stopwords excluded; top 3 per document. */
  def keywordsOf(docs: DataFrame, k: Int = 3): DataFrame = {
    val tf = termFreqs(docs).filter(!col("token").isin(stopwords.map(lit): _*))
    val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("token").asc)
    tf.join(df, "token")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "rank", "token", "tf", "df")
  }

  def keywords(spark: SparkSession, dir: String): DataFrame =
    keywordsOf(Tables.documents(spark, dir))

  /** Power-of-two document-length histogram (the standard corpus
    * profiling view). The bucket is the integer log2 of n_chars computed
    * from the BINARY-STRING length — float log2 is a trap at exact
    * powers (libm rounding can land just below the integer and floor to
    * the wrong bucket, differently per engine); string length is exact
    * everywhere. */
  def lengthHistogramOf(docs: DataFrame): DataFrame =
    docs
      // empty docs get their own bucket (-1, lo 0): log2 is undefined at
      // 0 and folding them into the length-1 bucket would mislabel it
      .select(when(length(col("text")) === 0, lit(-1))
        .otherwise((length(conv(length(col("text")).cast("string"), 10, 2)) - 1)
          .cast("int")).as("log2_bucket"))
      .groupBy("log2_bucket")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("bucket_lo",
        when(col("log2_bucket") === -1, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), log2_bucket)")))

  def lengthHistogram(spark: SparkSession, dir: String): DataFrame =
    lengthHistogramOf(Tables.documents(spark, dir))

  /** Token-distribution drift between two corpus slices, as
    * total-variation distance: TV = ½ Σ_t |p_a(t) − p_b(t)|. KL/JS need
    * logs (libm low bits differ across engines); TV over counts is
    * Σ|c_a·N_b − c_b·N_a| / (2·N_a·N_b) — an INTEGER numerator, one
    * exact division at the end, bit-identical anywhere. The per-token
    * contributions also rank the most-drifted tokens — the monitoring
    * view a training-data pipeline alerts on.
    *
    * Cache contract: the joined count table is persist()ed and referenced
    * by the returned lazy plan — callers in a long-lived session release
    * it after their final action (clearCache, as Bench/Verify do). */
  def tokenDriftOf(a: DataFrame, b: DataFrame, topK: Int = 10): DataFrame = {
    def counts(df: DataFrame, side: String): DataFrame =
      df.select(explode(tokens(col("text"))).as("token"))
        .groupBy("token").agg(count(lit(1)).as(s"c_$side"))
    val ca = counts(a, "a")
    val cb = counts(b, "b")
    val joined = ca.join(cb, Seq("token"), "full_outer")
      .select(col("token"),
        coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .persist()
    val tot = joined.agg(
      sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"))
    // the cross products go through decimal(38): long c*N wraps silently
    // past 2^63 (trillion-token corpora), decimal stays exact
    val scored = joined.crossJoin(broadcast(tot))
      .select(col("token"), col("c_a"), col("c_b"),
        abs(col("c_a").cast("decimal(38,0)") * col("n_b")
          - col("c_b").cast("decimal(38,0)") * col("n_a")).as("num"),
        col("n_a"), col("n_b"))
    // top-K via orderBy+limit -> TakeOrderedAndProject (per-partition heap
    // then a K-row merge), never a global-sort window over the vocabulary;
    // rank is then a broadcast theta-join over the K survivors only —
    // windowless end to end (tokens are unique, so ahead-count+1 is exactly
    // row_number over (num DESC, token ASC))
    val top = scored.orderBy(col("num").desc, col("token").asc).limit(topK)
    top.join(
        broadcast(top.select(col("num").as("num2"), col("token").as("token2"))),
        col("num2") > col("num") ||
          (col("num2") === col("num") && col("token2") < col("token")),
        "left")
      .groupBy("token", "c_a", "c_b", "num", "n_a", "n_b")
      .agg((count(col("token2")) + 1).cast("int").as("rank"))
      .select(col("rank"), col("token"), col("c_a"), col("c_b"),
        (col("num").cast("double") / (lit(2.0) * col("n_a") * col("n_b")))
          .as("tv_contrib"))
  }

  /** Registered form: even vs odd doc_ids as the two slices. */
  def tokenDrift(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    tokenDriftOf(docs.filter(col("doc_id") % 2 === 0),
      docs.filter(col("doc_id") % 2 === 1))
  }

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

  type Q = (SparkSession, String) => DataFrame

  // -------------------------------------------------------------------
  // Tokenizer merge training (word-level BPE)
  // -------------------------------------------------------------------

  /** Merge rounds learned by [[bpeMergesOf]] / replayed by its oracle. */
  val BpeRounds = 3

  /** Apply ONE merge rule greedily left-to-right. Restricted to p1 != p2
    * (enforced at rule selection), merge sites cannot be adjacent — a
    * site at i and i+1 would need toks(i+1) = p2 = p1 — so the greedy
    * walk decomposes into independent per-position flags and the merge
    * is a closed-form projection (no sequential fold, which also keeps
    * it replayable in SQL engines whose list_reduce cannot carry a
    * struct accumulator). */
  private def mergeOnce(toks: Column, p1: Column, p2: Column): Column = {
    val n = size(toks)
    flatten(transform(sequence(lit(1), n), i =>
      when(i < n && element_at(toks, i) === p1 && element_at(toks, i + 1) === p2,
        array(concat_ws("_", p1, p2)))
        .when(i > 1 && element_at(toks, i - 1) === p1 && element_at(toks, i) === p2,
          array().cast("array<string>"))
        .otherwise(array(element_at(toks, i)))))
  }

  /** Tokenizer merge training — byte-pair encoding's training loop at
    * word granularity (phrase mining): each round counts adjacent token
    * pairs across the corpus, adopts the most frequent non-self pair
    * (ties: lexicographic, so the rule table is deterministic in any
    * engine), rewrites the corpus with the merge, and repeats. Output is
    * the learned rule table (round, p1, p2, n) — what a tokenizer ships.
    *
    * Scale shape per round: one narrow pass explodes adjacent pairs, ONE
    * count shuffle (map-side partials), the argmax is orderBy+limit 1
    * (TakeOrderedAndProject — never a global window), and the 1-row rule
    * broadcasts back into a narrow rewrite. Self-pairs (p1 == p2) are
    * excluded at selection so the greedy rewrite stays closed-form (see
    * [[mergeOnce]]) — at word granularity they are degenerate phrases
    * anyway. Rounds are a driver loop over persisted generations, like
    * the IVF trainer; callers release the cache after their action.
    *
    * Cite: the reference has no tokenizer, but its embedder chunks text
    * for the vector path (caseguard/vectorization/embedder.py) — this is
    * the north-star training-data extension of that stage. */
  def bpeMergesOf(docs: DataFrame, rounds: Int = BpeRounds): DataFrame = {
    var toks = docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .persist()
    val bests = (1 to rounds).map { r =>
      val pairs = toks
        .filter(size(col("toks")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("toks")) - 1),
          i => struct(element_at(col("toks"), i).as("p1"),
            element_at(col("toks"), i + 1).as("p2")))).as("pr"))
        .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
        .filter(col("p1") =!= col("p2"))
        .groupBy("p1", "p2").agg(count(lit(1)).as("n"))
      val best = pairs.orderBy(col("n").desc, col("p1").asc, col("p2").asc)
        .limit(1)
        .select(lit(r).cast("int").as("round"), col("p1"), col("p2"), col("n"))
        .persist()
      val next = toks.crossJoin(broadcast(best.select("p1", "p2")))
        .select(col("doc_id"),
          mergeOnce(col("toks"), col("p1"), col("p2")).as("toks"))
        .persist()
      // materialize generation r, then FREE generation r-1 — otherwise
      // rounds x corpus-sized cache entries pile up until the caller's
      // clearCache (the 1-row best tables stay cached for the output)
      next.count()
      toks.unpersist()
      toks = next
      best
    }
    toks.unpersist() // the final generation feeds nothing downstream
    bests.reduce(_ unionByName _)
  }

  def bpeMerges(spark: SparkSession, dir: String): DataFrame =
    bpeMergesOf(Tables.documents(spark, dir))

  /** Tokenizer APPLICATION — encode a corpus with an already-trained
    * merge table ([[bpeMergesOf]]'s output): apply each round's rule in
    * training order via the same closed-form rewrite, and report
    * whitespace vs encoded token counts per document (the sizing pass a
    * packing/budgeting stage runs with a shipped tokenizer).
    *
    * Unlike training, application needs NO per-round counting: the
    * whole encode is ONE lazy Catalyst plan — `rounds` broadcast joins
    * of 1-row rule tables into `rounds` chained narrow array rewrites,
    * zero corpus shuffles, zero driver materialization. Train on the
    * trusted slice, encode anything — the table transfers. */
  def bpeEncodeOf(docs: DataFrame, merges: DataFrame,
                  rounds: Int = BpeRounds): DataFrame = {
    var cur = docs.select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .withColumn("n_tokens_ws", size(col("toks")).cast("long"))
    (1 to rounds).foreach { r =>
      cur = cur.crossJoin(broadcast(
          merges.filter(col("round") === r).select("p1", "p2")))
        .select(col("doc_id"), col("n_tokens_ws"),
          mergeOnce(col("toks"), col("p1"), col("p2")).as("toks"))
    }
    cur.select(col("doc_id"), col("n_tokens_ws"),
      size(col("toks")).cast("long").as("n_tokens_bpe"),
      (col("n_tokens_ws") - size(col("toks"))).as("n_merged"))
  }

  /** Registered form: rules trained on the even-id slice, applied to
    * the odd-id slice — the train/apply split the decontamination
    * family already uses, proving the table transfers to unseen text. */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    bpeEncodeOf(docs.filter(col("doc_id") % 2 =!= 0),
      bpeMergesOf(docs.filter(col("doc_id") % 2 === 0)))
  }

  /** Oracle for [[bpeMergesOf]], one CTE block per round generated from
    * the same [[BpeRounds]] constant the trainer runs — identical count,
    * tie-break, and closed-form rewrite semantics. */
  private def bpeOracle: String = {
    def round(r: Int): String = {
      val prev = s"t${r - 1}"
      s"""pc_$r AS (
         |  SELECT u.p1 AS p1, u.p2 AS p2, count(*) AS n FROM (
         |    SELECT unnest([{'p1': toks[i], 'p2': toks[i+1]}
         |                   for i in range(1, len(toks))]) AS u
         |    FROM $prev WHERE len(toks) >= 2) s
         |  WHERE p1 <> p2 GROUP BY 1, 2),
         |b_$r AS (SELECT p1, p2, n FROM pc_$r
         |         ORDER BY n DESC, p1 ASC, p2 ASC LIMIT 1),
         |t$r AS (
         |  SELECT doc_id, flatten([CASE
         |      WHEN i < len(toks) AND toks[i] = b.p1 AND toks[i+1] = b.p2
         |        THEN [b.p1 || '_' || b.p2]
         |      WHEN i > 1 AND toks[i-1] = b.p1 AND toks[i] = b.p2
         |        THEN CAST([] AS VARCHAR[])
         |      ELSE [toks[i]] END for i in range(1, len(toks) + 1)]) AS toks
         |  FROM $prev, b_$r b)""".stripMargin
    }
    s"""WITH t0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents WHERE len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
       |${(1 to BpeRounds).map(round).mkString(",\n")}
       |SELECT * FROM (${(1 to BpeRounds).map(r =>
            s"SELECT CAST($r AS INT) AS round, p1, p2, n FROM b_$r")
          .mkString(" UNION ALL ")})""".stripMargin
  }

  /** Oracle for [[bpeEncode]]: the training CTE chain restricted to
    * even doc_ids (same per-round count/tie-break/rewrite as
    * [[bpeOracle]]), plus an apply chain `a_r` rewriting the odd slice
    * with each round's learned rule. */
  private def bpeEncodeOracle: String = {
    def trainRound(r: Int): String = {
      val prev = s"t${r - 1}"
      s"""pc_$r AS (
         |  SELECT u.p1 AS p1, u.p2 AS p2, count(*) AS n FROM (
         |    SELECT unnest([{'p1': toks[i], 'p2': toks[i+1]}
         |                   for i in range(1, len(toks))]) AS u
         |    FROM $prev WHERE len(toks) >= 2) s
         |  WHERE p1 <> p2 GROUP BY 1, 2),
         |b_$r AS (SELECT p1, p2 FROM pc_$r
         |         ORDER BY n DESC, p1 ASC, p2 ASC LIMIT 1),
         |t$r AS (
         |  SELECT doc_id, flatten([CASE
         |      WHEN i < len(toks) AND toks[i] = b.p1 AND toks[i+1] = b.p2
         |        THEN [b.p1 || '_' || b.p2]
         |      WHEN i > 1 AND toks[i-1] = b.p1 AND toks[i] = b.p2
         |        THEN CAST([] AS VARCHAR[])
         |      ELSE [toks[i]] END for i in range(1, len(toks) + 1)]) AS toks
         |  FROM $prev, b_$r b),
         |a_$r AS (
         |  SELECT doc_id, n_tokens_ws, flatten([CASE
         |      WHEN i < len(toks) AND toks[i] = b.p1 AND toks[i+1] = b.p2
         |        THEN [b.p1 || '_' || b.p2]
         |      WHEN i > 1 AND toks[i-1] = b.p1 AND toks[i] = b.p2
         |        THEN CAST([] AS VARCHAR[])
         |      ELSE [toks[i]] END for i in range(1, len(toks) + 1)]) AS toks
         |  FROM a_${r - 1}, b_$r b)""".stripMargin
    }
    s"""WITH t0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents
       |  WHERE doc_id % 2 = 0
       |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
       |a_0 AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks,
       |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
       |           AS n_tokens_ws
       |  FROM documents
       |  WHERE doc_id % 2 = 1
       |    AND len(list_filter(string_split(text, ' '), x -> x <> '')) >= 1),
       |${(1 to BpeRounds).map(trainRound).mkString(",\n")}
       |SELECT doc_id, n_tokens_ws, CAST(len(toks) AS BIGINT) AS n_tokens_bpe,
       |       n_tokens_ws - CAST(len(toks) AS BIGINT) AS n_merged
       |FROM a_$BpeRounds""".stripMargin
  }

  // -------------------------------------------------------------------
  // Model-shaped quality classifier (hashing trick, fastText-style)
  // -------------------------------------------------------------------

  /** Feature-hash buckets for the linear scorer. Small on purpose: the
    * weight table must be a literal the optimizer constant-folds into
    * the per-row expression — the 100 TB plan is a pure map stage. */
  val ClassifierBuckets = 64

  /** Per-document linear quality classifier over hashed token features —
    * the fastText-supervised shape every production corpus filter uses
    * (a trained model's weights would be broadcast the same way; here
    * the weights are a deterministic function of the bucket id so the
    * oracle can replay them). Token → bucket via the portable
    * (len*256 + ascii) code and the multiplicative hash; bucket → a
    * milli-weight in [0, 2000]; document score = mean token weight,
    * keep = score above the 1000-milli midline.
    *
    * Scale shape: zero shuffle — tokenize, hash, and fold entirely
    * inside one codegen'd projection; collisions are the hashing
    * trick's accepted trade, not a bug. Integer-only arithmetic
    * (`div` on non-negative longs) replays exactly in any engine. */
  def qualityClassifierOf(docs: DataFrame): DataFrame = {
    val w = (tok: Column) => {
      val code = length(tok).cast("long") * 256 + ascii(tok).cast("long")
      (code * lit(48271L) % lit(ClassifierBuckets.toLong)) *
        lit(2654435761L) % lit(2001L)
    }
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        isum(transform(col("toks"), w)).as("w_sum"))
      .select(col("doc_id"), col("n_tokens"), col("w_sum"),
        expr("w_sum div greatest(n_tokens, 1)").as("mean_w_milli"),
        (col("w_sum") > col("n_tokens").cast("long") * 1000L).as("keep"))
  }

  def qualityClassifier(spark: SparkSession, dir: String): DataFrame =
    qualityClassifierOf(Tables.documents(spark, dir))

  /** Classifier evaluation — exact ROC-AUC + confusion matrix of the
    * fastText-shaped classifier's score ([[qualityClassifierOf]],
    * `mean_w_milli`) against the Gopher rule verdict
    * ([[gopherQualityOf]], `gopher_pass`) as ground truth: the
    * "does the cheap learned filter reproduce the expensive rule set"
    * check every curation pipeline runs before swapping one in for the
    * other (the fastText-vs-rules calibration step).
    *
    * AUC is the Mann–Whitney U statistic computed EXACTLY from the
    * bounded score histogram (scores are integer milli, ≤ 2001 distinct
    * values): per ascending score s,
    * `U2 += n_pos(s) · (2·cum_neg_below(s) + n_neg(s))` — ties get the
    * standard half credit, everything in integers; the single division
    * to [0,1] is the only double, computed from exact operands in the
    * same expression order in both engines. The histogram prefix runs
    * as ONE bounded `aggregate()` fold over the collected ≤2001-row
    * histogram (the epochOrder pattern) — no window, no global sort,
    * and the corpus is touched by exactly one grouped aggregate, so
    * the plan is identical at any corpus size. Precision/recall/F1 of
    * the classifier's hard `keep` decision ride along in integer
    * milli from the same pass.
    *
    * Arithmetic bound: the U2 accumulator reaches 2·n_pos·n_neg, so
    * exact-long evaluation requires n_pos·n_neg < 2^62 — i.e. up to
    * ~2.1e9 docs per class (≈4.3e9 balanced labeled docs, far beyond
    * any per-evaluation corpus; 100 TB of 4 KB docs is 2.5e10 total,
    * so a >2e9-PER-CLASS eval set would need sampling first, which is
    * what a calibration pass does anyway). Beyond that bound Spark's
    * long wraps silently while DuckDB HUGEINT widens — evaluate on a
    * ≤2^31-per-class sample to stay in the exact-parity regime. */
  def classifierAucOf(docs: DataFrame): DataFrame = {
    val scored = qualityClassifierOf(docs)
      .select(col("doc_id"), col("mean_w_milli").as("score"), col("keep"))
    val labeled = gopherQualityOf(docs)
      .select(col("doc_id"), col("gopher_pass"))
    val hist = scored.join(labeled, "doc_id")
      .groupBy("score")
      .agg(
        sum(when(col("gopher_pass"), 1L).otherwise(0L)).as("np"),
        sum(when(!col("gopher_pass"), 1L).otherwise(0L)).as("nn"),
        sum(when(col("keep") && col("gopher_pass"), 1L).otherwise(0L)).as("kp"),
        sum(when(col("keep") && !col("gopher_pass"), 1L).otherwise(0L)).as("kn"))
    hist
      .agg(sort_array(collect_list(struct(col("score"), col("np"),
        col("nn"), col("kp"), col("kn")))).as("xs"))
      .select(expr(
        """aggregate(xs,
          |  named_struct('cumneg', 0L, 'u2', 0L, 'p', 0L, 'n', 0L,
          |               'tp', 0L, 'fp', 0L),
          |  (acc, x) -> named_struct(
          |    'cumneg', acc.cumneg + x.nn,
          |    'u2', acc.u2 + x.np * (2 * acc.cumneg + x.nn),
          |    'p', acc.p + x.np,
          |    'n', acc.n + x.nn,
          |    'tp', acc.tp + x.kp,
          |    'fp', acc.fp + x.kn))""".stripMargin).as("r"))
      .select(col("r.p").as("n_pos"), col("r.n").as("n_neg"),
        col("r.u2").as("u2"), col("r.tp").as("tp"), col("r.fp").as("fp"),
        (col("r.p") - col("r.tp")).as("fn"),
        (col("r.n") - col("r.fp")).as("tn"))
      .select(col("*"),
        // single-class corpus: AUC is undefined — NULL, not Inf/NaN
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("u2").cast("double") /
            (lit(2.0) * col("n_pos").cast("double") * col("n_neg").cast("double")))
          .as("auc"),
        expr("tp * 1000 div greatest(tp + fp, 1)").as("precision_milli"),
        expr("tp * 1000 div greatest(tp + fn, 1)").as("recall_milli"),
        expr("2 * tp * 1000 div greatest(2 * tp + fp + fn, 1)").as("f1_milli"))
  }

  def classifierAuc(spark: SparkSession, dir: String): DataFrame =
    classifierAucOf(Tables.documents(spark, dir))

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

  val queries: Map[String, Q] = Map(
    "text_bpe_merges" -> ((s, d) => bpeMerges(s, d)),
    "text_bpe_encode" -> ((s, d) => bpeEncode(s, d)),
    "text_stats" -> ((s, d) => textStats(s, d)),
    "text_lang_id" -> ((s, d) => langId(s, d)),
    "text_fingerprints" -> ((s, d) => fingerprints(s, d)),
    "text_token_counts" -> ((s, d) => tokenCounts(s, d)),
    "text_fertility_by_lang" -> ((s, d) => fertilityByLang(s, d)),
    "text_normalize" -> ((s, d) => normalize(s, d)),
    "text_pii_mask" -> ((s, d) => piiMask(s, d)),
    "text_vocab_topk" -> ((s, d) => vocabTopK(s, d)),
    "text_heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "text_bm25_topk" -> ((s, d) => bm25(s, d)),
    "text_keywords" -> ((s, d) => keywords(s, d)),
    "text_length_histogram" -> ((s, d) => lengthHistogram(s, d)),
    "text_token_drift" -> ((s, d) => tokenDrift(s, d)),
    "text_doc_rarity" -> ((s, d) => docRarity(s, d)),
    "text_gopher_quality" -> ((s, d) => gopherQuality(s, d)),
    "curation_importance" -> ((s, d) => importanceWeights(s, d)),
    "text_lm_xent" -> ((s, d) => lmCrossEntropy(s, d)),
    "text_quality_classifier" -> ((s, d) => qualityClassifier(s, d)),
    "text_classifier_auc" -> ((s, d) => classifierAuc(s, d)),
    "curation_quality_prune" -> ((s, d) => qualityPrune(s, d)),
    "curation_mixture_weights" -> ((s, d) => mixtureWeights(s, d)),
    "curation_epoch_plan" -> ((s, d) => epochPlan(s, d)),
    "curation_anneal_schedule" -> ((s, d) => annealSchedule(s, d)),
    "text_boilerplate" -> ((s, d) => boilerplateStats(s, d)),
    "u3_extract_text" -> ((s, d) => extractTextQuery(s, d)))

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Replays [[qualityClassifierOf]]'s hash → bucket → weight chain in
    * integral arithmetic (the folded sum is order-independent, so
    * list_reduce and Spark's aggregate agree exactly). */
  private def classifierOracle: String =
    s"""WITH t AS (
       |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
       |         list_reduce(list_prepend(0::BIGINT, list_transform(toks,
       |           x -> ((len(x)::BIGINT * 256 + ascii(x)::BIGINT) * 48271
       |                 % $ClassifierBuckets) * 2654435761 % 2001)),
       |           (a, b) -> a + b) AS w_sum
       |  FROM t)
       |SELECT doc_id, n_tokens, w_sum,
       |       w_sum // greatest(n_tokens, 1) AS mean_w_milli,
       |       w_sum > CAST(n_tokens AS BIGINT) * 1000 AS keep
       |FROM s""".stripMargin

  val oracles: Map[String, String] = Map(
    "text_bpe_merges" -> bpeOracle,
    "text_bpe_encode" -> bpeEncodeOracle,
    "text_quality_classifier" -> classifierOracle,
    // same quality formula + quantized grid as the o8 decile oracle,
    // grouped per source; quantile_cont == Spark exact percentile
    "curation_quality_prune" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, source, CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_distinct(toks)) AS INT) AS n_uniq
        |  FROM t),
        |q AS (
        |  SELECT doc_id, source,
        |         least(greatest(
        |           least(CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
        |           + (CAST(n_uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 0.5::DOUBLE,
        |           0.0::DOUBLE), 1.0::DOUBLE) AS quality_score
        |  FROM s),
        |qb AS (
        |  SELECT doc_id, source, quality_score,
        |         CAST(floor(quality_score * 10000.0::DOUBLE) AS BIGINT) AS qbin
        |  FROM q),
        |e AS (
        |  SELECT source, quantile_cont(qbin, 0.3) AS edge
        |  FROM qb GROUP BY source)
        |SELECT doc_id, source, quality_score
        |FROM qb JOIN e USING (source)
        |WHERE CAST(qbin AS DOUBLE) >= edge""".stripMargin,
    // integer isqrt: float seed + exact two-step correction, identical
    // to the Spark chain; all divisions integral on non-negative longs
    "curation_mixture_weights" ->
      """WITH s AS (
        |  SELECT source,
        |         CAST(sum(len(list_filter(string_split(text, ' '),
        |           x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |r0 AS (
        |  SELECT source, n_tokens,
        |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
        |  FROM s),
        |r1 AS (
        |  SELECT source, n_tokens,
        |         s0 - CASE WHEN s0 * s0 > n_tokens THEN 1 ELSE 0 END AS s1
        |  FROM r0),
        |r2 AS (
        |  SELECT source, n_tokens,
        |         s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN 1 ELSE 0 END
        |           AS sqrt_tokens
        |  FROM r1),
        |t AS (SELECT CAST(sum(sqrt_tokens) AS BIGINT) AS total_sqrt FROM r2)
        |SELECT source, n_tokens, sqrt_tokens,
        |       sqrt_tokens * 1000 // total_sqrt AS weight_milli
        |FROM r2 CROSS JOIN t""".stripMargin,
    "text_boilerplate" ->
      s"""WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |raw AS (
        |  SELECT doc_id,
        |         unnest([array_to_string(
        |            toks[i * $BoilerplateSegTokens + 1 :
        |                 i * $BoilerplateSegTokens + $BoilerplateSegTokens], ' ')
        |           for i in range(0, len(toks) // $BoilerplateSegTokens)]) AS s
        |  FROM t WHERE len(toks) >= $BoilerplateSegTokens),
        |sent AS (SELECT DISTINCT doc_id, s FROM raw),
        |d AS (SELECT s, count(*) AS df FROM sent GROUP BY 1)
        |SELECT doc_id, count(*) AS n_segments,
        |       CAST(sum(CASE WHEN df >= $BoilerplateDf THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_boilerplate,
        |       CAST(coalesce(sum(CASE WHEN df < $BoilerplateDf
        |                              THEN length(s) END), 0)
        |         AS BIGINT) AS kept_chars
        |FROM sent JOIN d USING (s)
        |GROUP BY doc_id""".stripMargin,
    "curation_anneal_schedule" ->
      """WITH s AS (
        |  SELECT source,
        |         CAST(sum(len(list_filter(string_split(text, ' '),
        |           x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |r0 AS (
        |  SELECT source, n_tokens,
        |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
        |  FROM s),
        |r1 AS (
        |  SELECT source, n_tokens,
        |         s0 - CASE WHEN s0 * s0 > n_tokens THEN 1 ELSE 0 END AS s1
        |  FROM r0),
        |r2 AS (
        |  SELECT source, n_tokens,
        |         s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN 1 ELSE 0 END
        |           AS sqrt_tokens
        |  FROM r1),
        |tt AS (SELECT CAST(sum(sqrt_tokens) AS BIGINT) AS total_sqrt FROM r2),
        |bulk AS (
        |  SELECT source, 'bulk' AS phase,
        |         CAST(sqrt_tokens * 1000 // total_sqrt AS BIGINT) AS weight_milli
        |  FROM r2 CROSS JOIN tt),
        |tok AS (
        |  SELECT doc_id, source,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |st AS (
        |  SELECT doc_id, source, CAST(len(toks) AS INT) AS n_tokens,
        |         CAST(len(list_distinct(toks)) AS INT) AS n_uniq
        |  FROM tok),
        |qb AS (
        |  SELECT source,
        |         CAST(floor(least(greatest(
        |           least(CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
        |           + (CAST(n_uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE)) * 0.5::DOUBLE,
        |           0.0::DOUBLE), 1.0::DOUBLE) * 10000.0::DOUBLE) AS BIGINT) AS qbin
        |  FROM st),
        |mq AS (
        |  SELECT source, CAST(sum(qbin) // count(*) AS BIGINT) AS mean_qbin
        |  FROM qb GROUP BY 1),
        |tq AS (SELECT CAST(sum(mean_qbin) AS BIGINT) AS tq FROM mq),
        |ann AS (
        |  SELECT source, 'anneal' AS phase,
        |         CAST(mean_qbin * 1000 // NULLIF(tq, 0) AS BIGINT)
        |           AS weight_milli
        |  FROM mq CROSS JOIN tq)
        |SELECT * FROM bulk UNION ALL SELECT * FROM ann""".stripMargin,
    "curation_epoch_plan" ->
      s"""WITH s AS (
        |  SELECT source,
        |         CAST(sum(len(list_filter(string_split(text, ' '),
        |           x -> x <> ''))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |r0 AS (
        |  SELECT source, n_tokens,
        |         CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) AS s0
        |  FROM s),
        |r1 AS (
        |  SELECT source, n_tokens,
        |         s0 - CASE WHEN s0 * s0 > n_tokens THEN 1 ELSE 0 END AS s1
        |  FROM r0),
        |r2 AS (
        |  SELECT source, n_tokens,
        |         s1 + CASE WHEN (s1 + 1) * (s1 + 1) <= n_tokens THEN 1 ELSE 0 END
        |           AS sqrt_tokens
        |  FROM r1),
        |t AS (SELECT CAST(sum(sqrt_tokens) AS BIGINT) AS total_sqrt FROM r2),
        |w AS (
        |  SELECT source, n_tokens,
        |         sqrt_tokens * 1000 // total_sqrt AS weight_milli
        |  FROM r2 CROSS JOIN t),
        |p AS (
        |  SELECT source, n_tokens, weight_milli,
        |         least(${EpochTokenBudget} * weight_milli // 1000, n_tokens)
        |           AS planned_tokens
        |  FROM w)
        |SELECT source, n_tokens, weight_milli, planned_tokens,
        |       n_tokens // greatest(planned_tokens, 1)
        |         AS epochs_until_exhausted
        |FROM p""".stripMargin,
    // integral `div`/`//` on longs in both engines — no FP anywhere
    "text_doc_rarity" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         unnest(list_distinct(list_filter(string_split(text, ' '),
        |           x -> x <> ''))) AS tok
        |  FROM documents),
        |d AS (SELECT tok, count(*) AS df FROM p GROUP BY tok),
        |a AS (
        |  SELECT doc_id, count(*) AS n_uniq,
        |         CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
        |         CAST(sum(df) AS BIGINT) AS df_sum
        |  FROM p JOIN d USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_uniq, n_hapax, df_sum,
        |       n_hapax * 1000 // n_uniq AS hapax_milli,
        |       df_sum * 1000 // n_uniq AS mean_df_milli
        |FROM a""".stripMargin,
    // the div chain is spelled identically in both engines — order of
    // integral divisions is part of the operator's definition
    "curation_importance" ->
      """WITH tk AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS tok
        |  FROM documents),
        |c AS (
        |  SELECT tok, CAST(count(*) AS BIGINT) AS c_r,
        |         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS c_t
        |  FROM tk GROUP BY tok),
        |t AS (
        |  SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
        |         CAST(sum(c_t) AS BIGINT) AS n_t FROM c),
        |lr AS (
        |  SELECT tok, ((c_t * 1000 // c_r) * (n_r * 1000 // n_t)) // 1000 AS lr_milli
        |  FROM c CROSS JOIN t),
        |a AS (
        |  SELECT doc_id, count(*) AS n_tokens,
        |         CAST(sum(lr_milli) AS BIGINT) AS lr_sum
        |  FROM tk JOIN lr USING (tok) GROUP BY doc_id)
        |SELECT doc_id, n_tokens, lr_sum // n_tokens AS importance_milli
        |FROM a""".stripMargin,
    // the fixed-point log2 (len(bin) + milli-interpolation) is spelled
    // identically in both engines — bin() is unpadded in both
    "text_lm_xent" ->
      """WITH d AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, is_t, p.w1 AS w1, p.w2 AS w2 FROM (
        |    SELECT doc_id, is_t,
        |           unnest(list_transform(range(2, len(toks) + 1),
        |                  i -> {'w1': toks[i-1], 'w2': toks[i]})) AS p
        |    FROM d WHERE len(toks) >= 2)),
        |lm AS (
        |  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
        |  FROM b WHERE is_t GROUP BY 1, 2),
        |ctx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_ctx FROM lm GROUP BY 1),
        |v AS (SELECT CAST(count(DISTINCT w2) AS BIGINT) AS v FROM b WHERE is_t),
        |j AS (
        |  SELECT b.doc_id,
        |         COALESCE(l.c_bg, 0) + 1 AS num,
        |         COALESCE(c.c_ctx, 0) + v.v AS den
        |  FROM b LEFT JOIN lm l USING (w1, w2)
        |         LEFT JOIN ctx c USING (w1) CROSS JOIN v),
        |bits AS (
        |  SELECT doc_id,
        |         ((length(bin(den))-1)*1000
        |           + den*1000 // CAST(pow(2, length(bin(den))-1) AS BIGINT) - 1000)
        |       - ((length(bin(num))-1)*1000
        |           + num*1000 // CAST(pow(2, length(bin(num))-1) AS BIGINT) - 1000)
        |         AS bits_milli
        |  FROM j)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(bits_milli) AS BIGINT) // count(*) AS xent_milli
        |FROM bits GROUP BY doc_id""".stripMargin,
    "text_gopher_quality" -> gopherOracle,
    "text_classifier_auc" -> classifierAucOracle) ++ moreOracles

  /** Composes [[classifierOracle]] (scores) and [[gopherOracle]]
    * (ground truth) as subqueries — their nested WITHs are scoped to
    * each branch — then replays the bounded-histogram U statistic:
    * cum_neg_below via a window over the ≤2001-row histogram (fine in
    * the oracle; the Spark plan uses the bounded fold instead), the
    * same integer tie-credit formula, and the one double division in
    * the same expression order. */
  private def classifierAucOracle: String =
    s"""WITH cls AS ($classifierOracle),
       |gq AS ($gopherOracle),
       |h AS (
       |  SELECT mean_w_milli AS score,
       |         CAST(sum(CASE WHEN gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS np,
       |         CAST(sum(CASE WHEN NOT gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS nn,
       |         CAST(sum(CASE WHEN keep AND gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS kp,
       |         CAST(sum(CASE WHEN keep AND NOT gopher_pass THEN 1 ELSE 0 END) AS BIGINT) AS kn
       |  FROM cls JOIN gq USING (doc_id) GROUP BY 1),
       |w AS (
       |  SELECT np, nn, kp, kn,
       |         CAST(COALESCE(sum(nn) OVER (ORDER BY score
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           AS BIGINT) AS cumneg
       |  FROM h),
       |agg AS (
       |  SELECT CAST(sum(np) AS BIGINT) AS n_pos,
       |         CAST(sum(nn) AS BIGINT) AS n_neg,
       |         CAST(sum(np * (2 * cumneg + nn)) AS BIGINT) AS u2,
       |         CAST(sum(kp) AS BIGINT) AS tp,
       |         CAST(sum(kn) AS BIGINT) AS fp
       |  FROM w)
       |SELECT n_pos, n_neg, u2, tp, fp,
       |       n_pos - tp AS fn, n_neg - fp AS tn,
       |       CASE WHEN n_pos > 0 AND n_neg > 0
       |            THEN CAST(u2 AS DOUBLE) /
       |              (2.0::DOUBLE * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
       |       END AS auc,
       |       CAST(tp * 1000 // greatest(tp + fp, 1) AS BIGINT)
       |         AS precision_milli,
       |       CAST(tp * 1000 // greatest(tp + (n_pos - tp), 1) AS BIGINT)
       |         AS recall_milli,
       |       CAST(2 * tp * 1000 // greatest(2 * tp + fp + (n_pos - tp), 1)
       |         AS BIGINT) AS f1_milli
       |FROM agg""".stripMargin

  /** Extracted as a def so [[classifierAucOracle]] can compose it as a
    * ground-truth subquery — byte-identical to the round-9 literal. */
  private def gopherOracle: String =
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |b AS (
        |  SELECT doc_id, toks,
        |         CAST(len(toks) AS BIGINT) AS n_words,
        |         CAST(list_sum(list_transform(toks,
        |           w -> CAST(length(w) AS BIGINT))) AS BIGINT) AS sum_len,
        |         CAST(len(list_filter(toks,
        |           w -> regexp_matches(w, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |         CASE WHEN len(toks) >= 5
        |              THEN list_transform(range(1, len(toks) - 3),
        |                     i -> array_to_string(toks[i:i+4], ' '))
        |              ELSE [] END AS g5
        |  FROM t),
        |c AS (
        |  SELECT doc_id, n_words, sum_len, n_alpha,
        |         CAST(len(g5) AS BIGINT) AS n5,
        |         CAST(len(list_distinct(g5)) AS BIGINT) AS n5d
        |  FROM b),
        |g2 AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(toks)),
        |           i -> array_to_string(toks[i:i+1], ' '))) AS gram
        |  FROM t WHERE len(toks) >= 2),
        |m AS (
        |  SELECT doc_id, CAST(max(cnt) AS BIGINT) AS top_bigram_n
        |  FROM (SELECT doc_id, gram, count(*) AS cnt FROM g2 GROUP BY 1, 2)
        |  GROUP BY doc_id),
        |v AS (
        |  SELECT c.doc_id, n_words,
        |         sum_len * 1000 // greatest(n_words, 1) AS mean_word_len_milli,
        |         n_alpha * 1000 // greatest(n_words, 1) AS alpha_word_milli,
        |         COALESCE(top_bigram_n, 0) * 2000 // greatest(n_words, 1)
        |           AS top_bigram_milli,
        |         CASE WHEN n5 > 0 THEN (n5 - n5d) * 1000 // n5 ELSE 0 END
        |           AS rep5_milli
        |  FROM c LEFT JOIN m ON c.doc_id = m.doc_id)
        |SELECT doc_id, n_words, mean_word_len_milli, alpha_word_milli,
        |       top_bigram_milli, rep5_milli,
        |       (n_words >= 10 AND mean_word_len_milli BETWEEN 1000 AND 10000
        |        AND alpha_word_milli >= 500 AND top_bigram_milli <= 200
        |        AND rep5_milli <= 150) AS gopher_pass
        |FROM v""".stripMargin

  // lazy: referenced by `oracles` above, declared below it
  private lazy val moreOracles: Map[String, String] = Map(
    "u3_extract_text" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         '<html>' || chr(10) || '<body>' || chr(9) || '<h1>Doc ' ||
        |         doc_id::VARCHAR || '</h1>' || chr(1) || '<p>' || text ||
        |         ' &amp; tail&nbsp;&lt;EOF&gt;</p>' || chr(7) ||
        |         '</body></html>' AS markup
        |  FROM documents),
        |x AS (
        |  SELECT doc_id,
        |         replace(replace(replace(replace(replace(
        |           regexp_replace(markup, '<[^>]*>', ' ', 'g'),
        |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |           '&nbsp;', ' '), '&amp;', '&') AS s1
        |  FROM m),
        |y AS (
        |  SELECT doc_id,
        |         regexp_replace(s1, '[\x00-\x1f\x7f]', ' ', 'g') AS s2
        |  FROM x)
        |SELECT doc_id,
        |       trim(regexp_replace(s2, ' +', ' ', 'g')) AS text_clean,
        |       CAST(length(trim(regexp_replace(s2, ' +', ' ', 'g'))) AS BIGINT)
        |         AS n_chars_clean
        |FROM y""".stripMargin,
    "text_token_counts" ->
      """SELECT doc_id,
        |       CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS INT) AS n_words,
        |       CAST(len(regexp_extract_all(text, '\p{L}+|\d+|[^\p{L}\d\s]')) AS INT) AS n_bpe_pieces,
        |       CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0::DOUBLE) AS BIGINT) AS n_chars_div4
        |FROM documents""".stripMargin,
    "text_fertility_by_lang" ->
      """WITH d AS (
        |  SELECT lang,
        |         CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS w,
        |         CAST(len(regexp_extract_all(text, '\p{L}+|\d+|[^\p{L}\d\s]')) AS BIGINT) AS p,
        |         CAST(length(text) AS BIGINT) AS c,
        |         list_distinct(list_filter(string_split(text, ' '), x -> x <> '')) AS dt
        |  FROM documents),
        |g AS (
        |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(w) AS BIGINT) AS n_words,
        |         CAST(sum(p) AS BIGINT) AS n_pieces,
        |         CAST(sum(c) AS BIGINT) AS n_chars
        |  FROM d GROUP BY 1),
        |ty AS (
        |  SELECT lang, CAST(count(DISTINCT tok) AS BIGINT) AS n_types
        |  FROM (SELECT lang, unnest(dt) AS tok FROM d) GROUP BY 1)
        |SELECT g.lang, n_docs, n_words, n_pieces, n_chars,
        |       coalesce(n_types, 0) AS n_types,
        |       1000 * n_pieces // greatest(n_words, 1) AS fertility_milli,
        |       1000 * n_types // greatest(n_words, 1) AS ttr_milli
        |FROM g LEFT JOIN ty ON g.lang = ty.lang""".stripMargin,
    "text_stats" ->
      s"""WITH t AS (
         |  SELECT doc_id, n_chars,
         |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, n_chars,
         |         CAST(len(toks) AS INT) AS n_tokens,
         |         CAST(len(list_distinct(toks)) AS INT) AS n_uniq,
         |         list_reduce(list_prepend(0::BIGINT,
         |           list_transform(toks, x -> len(x)::BIGINT)), (a, b) -> a + b) AS sum_len,
         |         CAST(len(list_filter(toks, x -> x IN ${inList(stopwords)})) AS INT) AS n_stop
         |  FROM t),
         |r AS (
         |  SELECT doc_id, n_chars, n_tokens, n_uniq,
         |         CAST(sum_len AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS avg_token_len,
         |         CAST(n_stop AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS stopword_ratio,
         |         CAST(n_uniq AS DOUBLE) / CAST(greatest(n_tokens, 1) AS DOUBLE) AS lexical_density
         |  FROM s)
         |SELECT r.*,
         |       least(greatest(
         |         least(CAST(n_tokens AS DOUBLE) / 100.0::DOUBLE, 1.0::DOUBLE) * 0.5::DOUBLE
         |         + lexical_density * 0.5::DOUBLE, 0.0::DOUBLE), 1.0::DOUBLE) AS quality_score
         |FROM r""".stripMargin,
    "text_lang_id" ->
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |         list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
         |  FROM documents),
         |s AS (
         |  SELECT doc_id, lang,
         |         CAST(len(list_filter(toks, x -> x IN ('the','a','of','and','is'))) AS INT) AS s_en,
         |         CAST(len(list_filter(toks, x -> x IN ('der','die','das','und','ist'))) AS INT) AS s_de,
         |         CAST(len(list_filter(toks, x -> x IN ('le','la','et','est','les'))) AS INT) AS s_fr,
         |         CAST(len(list_filter(toks, x -> x IN ('el','los','y','es','las'))) AS INT) AS s_es,
         |         regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS has_cjk
         |  FROM t),
         |p AS (
         |  SELECT s.*,
         |         CASE WHEN has_cjk THEN 'zh'
         |              WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
         |              WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
         |              WHEN s_fr >= s_es THEN 'fr'
         |              ELSE 'es' END AS lang_pred
         |  FROM s)
         |SELECT p.*, lang_pred = lang AS is_correct FROM p""".stripMargin,
    "text_fingerprints" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents)
        |SELECT doc_id,
        |       list_reduce(list_prepend(0::BIGINT,
        |         list_transform(toks, x -> len(x)::BIGINT * 256 + ascii(x)::BIGINT)),
        |         (a, b) -> (a * 31 + b) % 1000000007) AS fingerprint
        |FROM t""".stripMargin,
    "text_normalize" ->
      """SELECT doc_id, n_chars,
        |       lower(trim(regexp_replace(
        |         regexp_replace(text, '[^\p{L}\d\s]', ' ', 'g'),
        |         '\s+', ' ', 'g'))) AS norm_text,
        |       CAST(length(lower(trim(regexp_replace(
        |         regexp_replace(text, '[^\p{L}\d\s]', ' ', 'g'),
        |         '\s+', ' ', 'g')))) AS INT) AS n_chars_norm
        |FROM documents""".stripMargin,
    "text_pii_mask" ->
      """WITH n AS (
        |  SELECT doc_id,
        |         'Contact agent' || doc_id::VARCHAR || '@firm.co.uk or 07' ||
        |         lpad((doc_id * 7 % 1000)::VARCHAR, 3, '0') || ' ' ||
        |         lpad((doc_id * 48271 % 1000000)::VARCHAR, 6, '0') ||
        |         ' re: ' || substr(text, 1, 40) AS note
        |  FROM documents)
        |SELECT doc_id,
        |       regexp_replace(regexp_replace(note,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |         '07\d{3} \d{6}', '<PHONE>', 'g') AS masked_text,
        |       CAST(len(regexp_extract_all(note,
        |         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        |       CAST(len(regexp_extract_all(note, '07\d{3} \d{6}')) AS INT) AS n_phones
        |FROM n""".stripMargin,
    "text_vocab_topk" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        |tf AS (SELECT doc_id, token, count(*) AS tf FROM t GROUP BY 1, 2)
        |SELECT token, CAST(sum(tf) AS BIGINT) AS freq, count(*) AS df
        |FROM tf GROUP BY token
        |ORDER BY freq DESC, token ASC LIMIT 100""".stripMargin,
    // exact-threshold set: the oracle counts the full vocabulary (fine
    // at oracle scale); the Spark side must land on the same set via
    // the Misra–Gries candidate pass + exact recount
    "text_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM t),
        |c AS (SELECT token, CAST(count(*) AS BIGINT) AS freq FROM t GROUP BY 1)
        |SELECT c.token, c.freq, n.n_total
        |FROM c CROSS JOIN n
        |WHERE c.freq * 200 > n.n_total
        |ORDER BY freq DESC, token ASC""".stripMargin,
    // same fixed-point chain as the Spark side: Lucene idf in log2m
    // milli-bits over integer forms, integral tf normalization
    "text_bm25_topk" ->
      """WITH d AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |         CAST(sum(len(toks)) AS BIGINT) * 1000
        |           // CAST(count(*) AS BIGINT) AS avgdl_milli
        |  FROM d),
        |t AS (
        |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, unnest(toks) AS token
        |  FROM d),
        |tf AS (
        |  SELECT doc_id, dl, token, CAST(count(*) AS BIGINT) AS tf
        |  FROM t WHERE token IN ('dup', 'vector', 'window')
        |  GROUP BY 1, 2, 3),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |c AS (
        |  SELECT doc_id,
        |         ((length(bin(2 * n_docs + 2)) - 1) * 1000
        |            + (2 * n_docs + 2) * 1000
        |              // CAST(pow(2, length(bin(2 * n_docs + 2)) - 1) AS BIGINT) - 1000)
        |         - ((length(bin(2 * df + 1)) - 1) * 1000
        |            + (2 * df + 1) * 1000
        |              // CAST(pow(2, length(bin(2 * df + 1)) - 1) AS BIGINT) - 1000)
        |           AS idf_milli,
        |         tf * 1000 + 1200 * (250 + 750 * (dl * 1000000 // avgdl_milli) // 1000)
        |           // 1000 AS den_milli,
        |         tf
        |  FROM tf JOIN df USING (token) CROSS JOIN s)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |       CAST(sum(idf_milli * (tf * 2200 * 1000 // den_milli) // 1000)
        |         AS BIGINT) AS bm25_milli
        |FROM c GROUP BY doc_id
        |ORDER BY bm25_milli DESC, doc_id ASC LIMIT 20""".stripMargin,
    "text_keywords" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
         |  FROM documents),
         |tf AS (
         |  SELECT doc_id, token, count(*) AS tf FROM t
         |  WHERE token NOT IN ${inList(stopwords)} GROUP BY 1, 2),
         |df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         |r AS (
         |  SELECT tf.doc_id, tf.token, tf.tf, df.df,
         |         row_number() OVER (PARTITION BY tf.doc_id
         |           ORDER BY tf.tf DESC, df.df ASC, tf.token ASC) AS rank
         |  FROM tf JOIN df USING (token))
         |SELECT doc_id, CAST(rank AS INT) AS rank, token, tf, df
         |FROM r WHERE rank <= 3""".stripMargin,
    "text_length_histogram" ->
      """WITH b AS (
        |  SELECT CASE WHEN length(text) = 0 THEN -1
        |              ELSE CAST(length(printf('%b', length(text))) - 1 AS INT)
        |         END AS log2_bucket
        |  FROM documents)
        |SELECT log2_bucket, count(*) AS n_docs,
        |       CASE WHEN log2_bucket = -1 THEN 0::BIGINT
        |            ELSE (1::BIGINT << log2_bucket) END AS bucket_lo
        |FROM b GROUP BY 1""".stripMargin,
    "text_token_drift" ->
      """WITH ta AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id % 2 = 0),
        |tb AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS token
        |  FROM documents WHERE doc_id % 2 = 1),
        |ca AS (SELECT token, count(*) AS c_a FROM ta GROUP BY 1),
        |cb AS (SELECT token, count(*) AS c_b FROM tb GROUP BY 1),
        |j AS (
        |  SELECT coalesce(ca.token, cb.token) AS token,
        |         coalesce(c_a, 0) AS c_a, coalesce(c_b, 0) AS c_b
        |  FROM ca FULL OUTER JOIN cb ON ca.token = cb.token),
        |t AS (SELECT CAST(sum(c_a) AS BIGINT) AS n_a,
        |             CAST(sum(c_b) AS BIGINT) AS n_b FROM j),
        |s AS (
        |  SELECT token, c_a, c_b,
        |         abs(CAST(c_a AS HUGEINT) * n_b
        |             - CAST(c_b AS HUGEINT) * n_a) AS num, n_a, n_b
        |  FROM j, t),
        |r AS (
        |  SELECT *, row_number() OVER (ORDER BY num DESC, token ASC) AS rank
        |  FROM s)
        |SELECT CAST(rank AS INT) AS rank, token, c_a, c_b,
        |       CAST(num AS DOUBLE) / (2.0::DOUBLE * n_a * n_b) AS tv_contrib
        |FROM r WHERE rank <= 10""".stripMargin)
}
