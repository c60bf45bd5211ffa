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
  *
  * Round 11: the implementation lives in four cohesive traits —
  * [[TextTokenOps]] (tokenize/stats/PII/vocab/BM25),
  * [[TextQualityOps]] (rarity/Gopher/DSIR/LM cross-entropy),
  * [[TextModelOps]] (BPE + quality classifier),
  * [[TextCurationOps]] (prune/mixture/epoch/boilerplate) — mixed into
  * this object, which keeps the public entry points and the
  * queries/oracles registration. Call sites are unchanged.
  */
object TextOps extends TextTokenOps with TextQualityOps
    with TextModelOps with TextCurationOps with TextRetrievalOps {

  type Q = (SparkSession, String) => DataFrame

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
    "text_zipf_slope" -> ((s, d) => zipfSlope(s, d)),
    "text_heavy_hitters" -> ((s, d) => heavyHitters(s, d)),
    "text_bm25_topk" -> ((s, d) => bm25(s, d)),
    "text_keywords" -> ((s, d) => keywords(s, d)),
    "text_length_histogram" -> ((s, d) => lengthHistogram(s, d)),
    "text_heaps_curve" -> ((s, d) => heapsCurve(s, d)),
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
    "text_prox_rerank_topk" -> ((s, d) => proxRerankTopk(s, d)),
    "text_prox_rerank_audit" -> ((s, d) => proxRerankAudit(s, d)),
    "text_prox_rerank_panel" -> ((s, d) => proxRerankPanel(s, d)),
    "text_prox_rerank_panel_wide" -> ((s, d) => proxRerankPanelWide(s, d)),
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
    // the ≤10-row cumulative prefix replays as a plain window here (the
    // oracle states semantics; the Spark side uses the bounded fold)
    "text_heaps_curve" ->
      """WITH mx AS (SELECT max(doc_id) AS max_id FROM documents),
        |d AS (
        |  SELECT doc_id, least(doc_id * 10 // (max_id + 1), 9) AS bucket,
        |         list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents CROSS JOIN mx),
        |pb AS (
        |  SELECT bucket, count(*) AS n_docs,
        |         CAST(sum(len(toks)) AS BIGINT) AS n_toks
        |  FROM d GROUP BY 1),
        |tk AS (SELECT bucket, unnest(toks) AS tok FROM d),
        |fs AS (SELECT tok, min(bucket) AS fb FROM tk GROUP BY 1),
        |nt AS (SELECT fb AS bucket, count(*) AS new_types FROM fs GROUP BY 1),
        |j AS (
        |  SELECT pb.bucket, pb.n_docs, pb.n_toks,
        |         coalesce(nt.new_types, 0) AS new_types
        |  FROM pb LEFT JOIN nt USING (bucket)),
        |c AS (
        |  SELECT bucket,
        |         CAST(sum(n_docs) OVER w AS BIGINT) AS docs_cum,
        |         CAST(sum(n_toks) OVER w AS BIGINT) AS tokens_cum,
        |         CAST(sum(new_types) OVER w AS BIGINT) AS vocab_cum
        |  FROM j WINDOW w AS (ORDER BY bucket
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT bucket, docs_cum, tokens_cum, vocab_cum,
        |       CAST(vocab_cum * 1000000 // NULLIF(tokens_cum, 0) AS BIGINT)
        |         AS ttr_micro
        |FROM c""".stripMargin,
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
    "text_classifier_auc" -> classifierAucOracle,
    "text_prox_rerank_topk" -> proxTopkOracle,
    "text_prox_rerank_audit" -> proxAuditOracle,
    "text_prox_rerank_panel" -> proxPanelOracle,
    "text_prox_rerank_panel_wide" -> proxPanelWideOracle) ++ moreOracles

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
    // rank/freq milli-log2s and the one slope division replayed exactly
    // (numerator non-negative by Chebyshev: freq is rank-sorted)
    "text_zipf_slope" -> {
      def l2(x: String): String =
        s"((length(bin($x)) - 1) * 1000 + ($x) * 1000" +
          s" // CAST(pow(2, length(bin($x)) - 1) AS BIGINT) - 1000)"
      s"""WITH t AS (
        |  SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS token
        |  FROM documents),
        |v AS (
        |  SELECT token, CAST(count(*) AS BIGINT) AS freq
        |  FROM t GROUP BY token
        |  ORDER BY freq DESC, token ASC LIMIT 30),
        |r AS (
        |  SELECT freq, CAST(row_number() OVER
        |    (ORDER BY freq DESC, token ASC) AS BIGINT) AS rank FROM v),
        |l AS (SELECT ${l2("rank")} AS lx, ${l2("freq")} AS ly FROM r),
        |s AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |         CAST(sum(lx) AS BIGINT) AS sx, CAST(sum(ly) AS BIGINT) AS sy,
        |         CAST(sum(lx * ly) AS BIGINT) AS sxy,
        |         CAST(sum(lx * lx) AS BIGINT) AS sxx
        |  FROM l)
        |SELECT n_terms,
        |       CAST((sx * sy - n_terms * sxy) * 1000
        |         // nullif(n_terms * sxx - sx * sx, 0) AS BIGINT)
        |         AS neg_slope_milli,
        |       CAST(-((sx * sy - n_terms * sxy) * 1000
        |         // nullif(n_terms * sxx - sx * sx, 0)) AS BIGINT)
        |         AS slope_milli
        |FROM s""".stripMargin
    },
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
