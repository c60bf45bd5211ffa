package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expr.Exprs
import graft.functions.ArrayOps

/** Deduplication operators for a training-data pipeline: exact content
  * hashing, inverted-index n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup pairs. Extends the reference surface (its
  * only dedup is the vector content_hash at database/models.py:81) per the
  * north-star mandate.
  *
  * Scale design: nothing here does all-pairs against the full corpus. The
  * exact path is a single hash shuffle; the n-gram/MinHash/SimHash paths
  * build inverted indexes (explode -> equi-join on shingle/band/chunk) so
  * candidate generation is a hash join keyed on shared substructure, with
  * a document-frequency cap to drop degenerate hot keys (the classic
  * stop-shingle guard — skew protection at 100 TB).
  */
object Dedup extends DedupShingleOps with DedupSignatureOps
    with DedupClusterOps with DedupEmbeddingOps {
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "dedup_exact_groups" -> ((s, d) => exactGroups(s, d)),
    "dedup_exact_survivors" -> ((s, d) => exactSurvivors(s, d)),
    "dedup_ngram_pairs" -> ((s, d) => ngramJaccardPairs(s, d)),
    "dedup_containment_pairs" -> ((s, d) => containmentPairs(s, d)),
    "dedup_prefix_pairs" -> ((s, d) => prefixFilterPairs(s, d)),
    "dedup_minhash_pairs" -> ((s, d) => minhashPairs(s, d)),
    "dedup_blocking_recall" -> ((s, d) => blockingRecall(s, d)),
    "dedup_incremental_admit" -> ((s, d) => incrementalAdmit(s, d)),
    "dedup_simhash_pairs" -> ((s, d) => simhashPairs(s, d)),
    "dedup_simhash_pairs_adaptive" -> ((s, d) => simhashPairsAdaptive(s, d)),
    "dedup_winnow_pairs" -> ((s, d) => winnowPairs(s, d)),
    "dedup_winnow_pairs_adaptive" -> ((s, d) => winnowPairsAdaptive(s, d)),
    "dedup_embedding_pairs" -> ((s, d) => embeddingPairs(s, d)),
    "dedup_embedding_lsh_pairs" -> ((s, d) => embeddingLshPairs(s, d)),
    "sim_knn_graph" -> ((s, d) => embeddingKnnGraph(s, d)),
    "sim_rknn_counts" -> ((s, d) => reverseKnnCounts(s, d)),
    "dedup_cluster_size_hist" -> ((s, d) => clusterSizeHistogram(s, d)),
    "dedup_embedding_clusters" -> ((s, d) => embeddingClusters(s, d)),
    "dedup_ngram_clusters" -> ((s, d) => ngramClusters(s, d)),
    "dedup_quality_survivors" -> ((s, d) => qualitySurvivors(s, d)),
    "o11_dedup_aware_split" -> ((s, d) => dedupAwareSplit(s, d)),
    "curation_soft_dedup_weights" -> ((s, d) => softDedupWeights(s, d)),
    "curation_contamination" -> ((s, d) => contamination(s, d)),
    "curation_contamination_bloom" -> ((s, d) => contaminationBloom(s, d)),
    "curation_span_dedup" -> ((s, d) => spanDedupStats(s, d)),
    "curation_span_remove" -> ((s, d) => spanRemove(s, d)),
    "curation_pack_sequences" -> ((s, d) => packSequences(s, d)))

  private[graft] val shingleCte: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |sh0 AS (
      |  SELECT doc_id,
      |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                               for i in range(1, len(toks) - 1)])) AS s
      |  FROM t WHERE len(toks) >= 3),
      |hot AS (SELECT s FROM sh0 GROUP BY s HAVING count(*) > 1000),
      |sh AS (SELECT doc_id, s FROM sh0 WHERE s NOT IN (SELECT s FROM hot))""".stripMargin

  /** Shared transitive-closure chain for the n-gram cluster oracles:
    * shingle inverted-index pairs at jaccard >= 0.7, undirected edges,
    * recursive reachability, min-reachable-id labels (`cl`). Used by
    * both the cluster dump and the dedup-aware split. */
  private val ngramClusterCtes: String =
    s"""${shingleCte.replace("WITH t", "WITH RECURSIVE t")},
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |p0 AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |np AS (
       |  SELECT doc_a, doc_b FROM p0
       |  JOIN sz sa ON sa.doc_id = doc_a
       |  JOIN sz sb ON sb.doc_id = doc_b
       |  WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.7::DOUBLE),
       |e AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM np
       |  UNION ALL SELECT doc_b, doc_a FROM np),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
       |cl AS (
       |  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
       |  FROM reach GROUP BY src)""".stripMargin

  /** Shared signature chain for the minhash oracles — replays
    * minhashIndexOf hash-for-hash: the char-polynomial shingle hash
    * (ShinglePoly3), the affine permutation family of MinhashSig, and
    * the polynomial band fold are all plain integer arithmetic. */
  private val minhashSigCte: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |shs AS (
      |  SELECT doc_id,
      |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                               for i in range(1, len(toks) - 1)])) AS s
      |  FROM t WHERE len(toks) >= 3),
      |hs AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(0::BIGINT,
      |           list_transform(range(1, len(s) + 1), i -> unicode(s[i])::BIGINT)),
      |           (a, c) -> (a * 31 + c) % 1000000007) AS h
      |  FROM shs),
      |sigc AS (
      |  SELECT doc_id, k,
      |         min((h * (1 + 2*k) + 40503 * (k + 1)) % 2147483647) AS comp
      |  FROM hs, range(0, 32) r(k)
      |  GROUP BY doc_id, k),
      |sigs AS (
      |  SELECT doc_id, list(comp ORDER BY k) AS sig FROM sigc GROUP BY doc_id),
      |bands AS (
      |  SELECT doc_id, b,
      |         list_reduce(list_prepend(0::BIGINT, list_slice(sig, b*4 + 1, b*4 + 4)),
      |           (a, v) -> (a * 1000003 + v) % 1000000007) AS bh
      |  FROM sigs, range(0, 8) rb(b))""".stripMargin

  val oracles: Map[String, String] = Map(
    "curation_span_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |         unnest([list_aggregate(list_slice(toks, i, i + 9), 'string_agg', ' ')
        |                 for i in range(1, len(toks) - 8)]) AS span
        |  FROM t WHERE len(toks) >= 10),
        |hot AS (SELECT span FROM s GROUP BY span HAVING count(*) >= 2),
        |per AS (
        |  SELECT doc_id, count(*) AS n_spans,
        |         CAST(sum(CASE WHEN span IN (SELECT span FROM hot)
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated
        |  FROM s GROUP BY doc_id)
        |SELECT doc_id, n_spans, n_repeated,
        |       CAST(n_repeated AS DOUBLE) / n_spans AS repeat_ratio
        |FROM per""".stripMargin,
    // removal twin: same span CTE grouped by the literal string (the
    // Spark side's 64-bit fold is itself under test, as in span_dedup);
    // covered = union of [pos, pos+9] over repeated spans
    "curation_span_remove" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
        |p AS (
        |  SELECT doc_id, toks, unnest(range(0, len(toks) - 9)) AS pos
        |  FROM t WHERE len(toks) >= 10),
        |sp AS (
        |  SELECT doc_id, pos,
        |         list_aggregate(list_slice(toks, pos + 1, pos + 10), 'string_agg', ' ') AS span
        |  FROM p),
        |hot AS (SELECT span FROM sp GROUP BY span HAVING count(*) >= 2),
        |cov0 AS (
        |  SELECT doc_id, unnest(range(pos, pos + 10)) AS tpos
        |  FROM sp WHERE span IN (SELECT span FROM hot)),
        |cov AS (SELECT DISTINCT doc_id, tpos FROM cov0),
        |tok AS (
        |  SELECT doc_id, unnest(range(0, len(toks))) AS tpos, toks FROM t),
        |tok2 AS (SELECT doc_id, tpos, toks[tpos + 1] AS token FROM tok),
        |surv AS (
        |  SELECT tok2.doc_id, tok2.tpos, tok2.token FROM tok2
        |  ANTI JOIN cov ON tok2.doc_id = cov.doc_id AND tok2.tpos = cov.tpos),
        |agg AS (
        |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
        |         string_agg(token, ' ' ORDER BY tpos) AS clean_text
        |  FROM surv GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |       coalesce(n_kept, 0) AS n_kept,
        |       CAST(len(toks) AS BIGINT) - coalesce(n_kept, 0) AS n_removed,
        |       coalesce(clean_text, '') AS clean_text
        |FROM t LEFT JOIN agg ON t.doc_id = agg.doc_id""".stripMargin,
    "dedup_exact_groups" ->
      """SELECT sha256(text) AS content_hash, min(doc_id) AS keep_id,
        |       count(*) AS n_docs
        |FROM documents GROUP BY sha256(text)""".stripMargin,
    "dedup_exact_survivors" ->
      """SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)""".stripMargin,
    "dedup_ngram_pairs" ->
      s"""$shingleCte,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) AS jaccard
         |FROM pairs
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(sa.n + sb.n - inter AS DOUBLE) >= 0.7::DOUBLE""".stripMargin,
    "dedup_containment_pairs" ->
      s"""$shingleCte,
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(inter * 1000 // sa.n AS BIGINT) AS cont_a_in_b_milli,
         |       CAST(inter * 1000 // sb.n AS BIGINT) AS cont_b_in_a_milli
         |FROM pairs
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |WHERE inter * 1000 // sa.n >= 900 OR inter * 1000 // sb.n >= 900""".stripMargin,
    // prefix filtering is LOSSLESS, so the oracle is the plain
    // UNCAPPED inverted-index join — the naive-but-correct answer the
    // subquadratic plan must reproduce exactly (integer milli-Jaccard)
    "dedup_prefix_pairs" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id,
         |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                               for i in range(1, len(toks) - 1)])) AS s
         |  FROM t WHERE len(toks) >= 3),
         |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |       CAST(1000 * inter // (sa.n + sb.n - inter) AS BIGINT) AS jm
         |FROM pairs
         |JOIN sz sa ON sa.doc_id = doc_a
         |JOIN sz sb ON sb.doc_id = doc_b
         |WHERE 1000 * inter // (sa.n + sb.n - inter) >= $PrefixThresholdMilli""".stripMargin,
    "dedup_ngram_clusters" ->
      s"""$ngramClusterCtes
         |SELECT doc_id, cluster_id FROM cl""".stripMargin,
    "dedup_cluster_size_hist" ->
      s"""$ngramClusterCtes,
         |fam AS (
         |  SELECT cluster_id, count(*) AS family_size
         |  FROM cl GROUP BY 1)
         |SELECT family_size, count(*) AS n_families
         |FROM fam GROUP BY 1""".stripMargin,
    "dedup_quality_survivors" ->
      s"""$ngramClusterCtes
         |SELECT cluster_id, doc_id AS keep_id, n_chars FROM (
         |  SELECT cl.cluster_id, cl.doc_id, d.n_chars,
         |         row_number() OVER (PARTITION BY cl.cluster_id
         |           ORDER BY d.n_chars DESC, cl.doc_id ASC) AS rn
         |  FROM cl JOIN documents d ON d.doc_id = cl.doc_id)
         |WHERE rn = 1""".stripMargin,
    "curation_soft_dedup_weights" ->
      s"""$ngramClusterCtes,
         |wdoc AS (
         |  SELECT d.doc_id, d.source, coalesce(cl.cluster_id, d.doc_id) AS cid
         |  FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id),
         |szc AS (SELECT cid, count(*) AS csize FROM wdoc GROUP BY 1),
         |wm AS (SELECT source, CAST(1000 // csize AS BIGINT) AS w_milli
         |       FROM wdoc JOIN szc USING (cid))
         |SELECT source, count(*) AS n_docs,
         |       CAST(sum(w_milli) AS BIGINT) AS sum_w_milli,
         |       CAST(sum(w_milli) * sum(w_milli)
         |         // NULLIF(sum(w_milli * w_milli), 0) AS BIGINT) AS ess_docs,
         |       CAST(sum(w_milli) // NULLIF(count(*), 0) AS BIGINT)
         |         AS mean_w_milli
         |FROM wm GROUP BY 1""".stripMargin,
    "o11_dedup_aware_split" ->
      s"""$ngramClusterCtes
         |SELECT d.doc_id,
         |       coalesce(cl.cluster_id, d.doc_id) AS cid,
         |       CASE WHEN (coalesce(cl.cluster_id, d.doc_id) * 48271) % 100000 % 100 < 80 THEN 'train'
         |            WHEN (coalesce(cl.cluster_id, d.doc_id) * 48271) % 100000 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id""".stripMargin,
    // The adaptive sample ladder replayed verbatim (integer product, one
    // ×2 per doubling past the base corpus; hash-threshold membership) —
    // sf0.01/sf0.1 fall below the base, so the oracle there is the FULL
    // exact pair set; at 10x/100x both engines select the identical
    // bounded sample.
    "dedup_embedding_pairs" ->
      s"""$embQuantCte,
         |smod AS (SELECT CAST($embSampleLadderSql AS BIGINT) AS m FROM s),
         |sv AS (
         |  SELECT s.vec_id, s.qv, s.nsq FROM s, smod
         |  WHERE (((s.vec_id % $EmbPairsSamplePrime) * $EmbPairsSampleMul
         |          + $EmbPairsSampleAdd)
         |         % $EmbPairsSamplePrime) * m < $EmbPairsSamplePrime)
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       CAST(CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS DOUBLE) /
         |         (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
         |FROM sv a JOIN sv b ON a.vec_id < b.vec_id
         |WHERE CAST(list_dot_product(a.qv, b.qv) AS BIGINT) > 0
         |  AND CAST(list_dot_product(a.qv, b.qv) AS BIGINT) *
         |      CAST(list_dot_product(a.qv, b.qv) AS BIGINT) * 25 > a.nsq * b.nsq * 4""".stripMargin,
    "curation_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         len(list_filter(string_split(text, ' '), x -> x <> ''))::BIGINT
        |           AS n_tokens,
        |         doc_id % 8 AS shard
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, n_tokens, shard,
        |         sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
        |  FROM t)
        |SELECT doc_id, n_tokens, CAST(shard AS BIGINT) AS shard,
        |       CAST((cum - n_tokens) // 2048 AS BIGINT) AS bin
        |FROM c""".stripMargin,
    // Replays portable winnowing end to end: codepoint k-gram poly
    // hashes (each gram recomputed independently — modular arithmetic
    // matches the Spark side's rolling form exactly), window-16 mins,
    // distinct, then the same inverted-index overlap join with the
    // df-cap guard. The fixed arm interpolates [[WinnowDfCapBase]]
    // (winnowPairsOf's default) so a base-cap change cannot
    // desynchronize Spark from the oracle; the adaptive arm replays the
    // round-18 candidate-bounded twin — identical k-12 grams and capped
    // score index, candidates from the halving-ladder rare join UNION
    // the prefix rescue ([[DedupSignatureOps.winnowPairsAdaptiveOf]]'s
    // scaladoc has the losslessness argument).
    "dedup_winnow_pairs" ->
      winnowPairsOracleSql(
        s"SELECT CAST(12 AS BIGINT) AS k," +
          s" CAST($WinnowDfCapBase AS BIGINT) AS dfcap"),
    "dedup_winnow_pairs_adaptive" -> winnowPairsAdaptiveOracleSql,
    // Replays the portable SimHash end to end: char-level poly token hash
    // (as in the minhash oracle), parity bit-plane votes, sign take — the
    // signature is carried as a 64-element bit LIST (no int64 sign-bit
    // hazards), chunk blocking folds each slice (plus the e adaptive
    // extension bits cyclically following it) to an integer (any
    // bijective encoding gives the identical candidate set), and
    // verification counts differing bits. ONE builder serves both arms:
    // the fixed form is e = 0 (7 chunks of 9 bits, the last absorbing
    // 10 — simhashPairsOfSigs at the default maxHamming=6), the
    // adaptive form draws e from the corpus-doubling ladder.
    "dedup_simhash_pairs" ->
      simhashPairsOracleSql("SELECT CAST(0 AS BIGINT) AS e"),
    "dedup_simhash_pairs_adaptive" ->
      simhashPairsOracleSql(
        s"SELECT CAST($adaptWidthLadderSql AS BIGINT) AS e" +
          " FROM documents"),
    "dedup_minhash_pairs" ->
      s"""$minhashSigCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b,
         |       CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 AS est_jaccard
         |FROM cand
         |JOIN sigs sa ON sa.doc_id = doc_a
         |JOIN sigs sb ON sb.doc_id = doc_b
         |WHERE CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 >= 0.5::DOUBLE""".stripMargin,
    // the truth side re-states the uncapped prefix-truth join with
    // p-prefixed CTE names (the sig CTE already owns t); the detector
    // side shares the signature CTEs verbatim
    "dedup_blocking_recall" ->
      s"""$minhashSigCte,
         |mcand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id),
         |mh AS (
         |  SELECT doc_a, doc_b FROM mcand
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b
         |  WHERE CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i]))
         |             AS DOUBLE) / 32 >= 0.5::DOUBLE),
         |psh AS (
         |  SELECT doc_id,
         |         unnest(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                               for i in range(1, len(toks) - 1)])) AS s
         |  FROM t WHERE len(toks) >= 3),
         |psz AS (SELECT doc_id, count(*) AS n FROM psh GROUP BY doc_id),
         |ppairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
         |  FROM psh a JOIN psh b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |tp AS (
         |  SELECT doc_a, doc_b FROM ppairs
         |  JOIN psz sa ON sa.doc_id = doc_a
         |  JOIN psz sb ON sb.doc_id = doc_b
         |  WHERE 1000 * inter // (sa.n + sb.n - inter) >= $PrefixThresholdMilli),
         |c1 AS (SELECT CAST(count(*) AS BIGINT) AS n_true FROM tp),
         |c2 AS (SELECT CAST(count(*) AS BIGINT) AS n_detected FROM mh),
         |c3 AS (SELECT CAST(count(*) AS BIGINT) AS n_hit
         |       FROM tp JOIN mh USING (doc_a, doc_b))
         |SELECT n_true, n_detected, n_hit,
         |       CAST(n_hit * 1000 // NULLIF(n_true, 0) AS BIGINT) AS recall_milli
         |FROM c1, c2, c3""".stripMargin,
    // candidate arms mirror incrementalAdmitOf: corpus->batch (any
    // direction) plus batch->batch keep-first; same signature CTE as
    // the pair oracle, same 0.5 gate, min-neighbor as dup_of
    "dedup_incremental_admit" ->
      s"""$minhashSigCte,
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bh = b.bh
         |  WHERE b.doc_id % 10 >= 8
         |    AND (a.doc_id % 10 < 8 OR a.doc_id < b.doc_id)
         |    AND a.doc_id <> b.doc_id),
         |m AS (
         |  SELECT doc_b AS doc_id, min(doc_a) AS dup_of
         |  FROM cand
         |  JOIN sigs sa ON sa.doc_id = doc_a
         |  JOIN sigs sb ON sb.doc_id = doc_b
         |  WHERE CAST(len(list_filter(range(1, 33), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / 32 >= 0.5::DOUBLE
         |  GROUP BY doc_b)
         |SELECT d.doc_id, m.dup_of,
         |       CASE WHEN m.dup_of IS NULL THEN 'admit' ELSE 'reject' END AS status
         |FROM documents d LEFT JOIN m ON d.doc_id = m.doc_id
         |WHERE d.doc_id % 10 >= 8""".stripMargin,
    "dedup_embedding_lsh_pairs" -> embeddingLshPairsOracle,
    "sim_knn_graph" -> knnGraphOracle,
    "sim_rknn_counts" -> (
      s"""$embLshCandCte,
         |sym AS (
         |  SELECT vec_a AS src, vec_b AS dst FROM cand
         |  UNION ALL
         |  SELECT vec_b, vec_a FROM cand),
         |sc AS (
         |  SELECT sym.src, sym.dst,
         |         CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) AS dot
         |  FROM sym
         |  JOIN s sa ON sa.vec_id = sym.src
         |  JOIN s sb ON sb.vec_id = sym.dst),
         |r AS (
         |  SELECT src, dst,
         |         row_number() OVER (PARTITION BY src
         |                            ORDER BY dot DESC, dst ASC) AS rank
         |  FROM sc),
         |cnt AS (
         |  SELECT dst AS vec_id, count(*) AS n_referrers
         |  FROM r WHERE rank <= 5 GROUP BY 1)
         |SELECT e.vec_id, coalesce(cnt.n_referrers, 0) AS n_referrers
         |FROM embeddings e LEFT JOIN cnt ON cnt.vec_id = e.vec_id""".stripMargin),
    "dedup_embedding_clusters" -> embeddingClustersOracle,
    // string shingles in the oracle vs 64-bit hashed shingles in the
    // plan: identical counts barring a 2^-64 collision (the documented
    // dedup_ngram_pairs precedent)
    "curation_contamination" ->
      s"""$shingleCte,
         |tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
         |ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 2 = 1)
         |SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM ev JOIN tr ON ev.s = tr.s
         |GROUP BY ev.doc_id
         |HAVING count(*) >= 3""".stripMargin,
    // the bloom-pruned twin is EXACT (the final equi-join removes the
    // filter's false positives), so its oracle is the same query
    "curation_contamination_bloom" ->
      s"""$shingleCte,
         |tr AS (SELECT DISTINCT s FROM sh WHERE doc_id % 2 = 0),
         |ev AS (SELECT doc_id, s FROM sh WHERE doc_id % 2 = 1)
         |SELECT ev.doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |FROM ev JOIN tr ON ev.s = tr.s
         |GROUP BY ev.doc_id
         |HAVING count(*) >= 3""".stripMargin)

  /** The [[adaptiveSampleMod]] ladder as SQL — the same integer product,
    * one ×2 per corpus doubling past [[EmbPairsSampleBase]] (shared with
    * the crossmodal parent's query-side sample, [[Multimodal]]). */
  private[ml] def embSampleLadderSql: String =
    (0 until EmbPairsSampleSteps).map { j =>
      s"(CASE WHEN count(*) > ${EmbPairsSampleBase * (1L << j)} THEN 2 ELSE 1 END)"
    }.mkString(" * ")

  /** [[adaptWidthStepsFor]] as SQL: +1 per corpus doubling past
    * [[AdaptWidthBase]] — the adaptive simhash oracle's extension-bit
    * count (winnowing no longer widens, round 18). */
  private def adaptWidthLadderSql: String =
    (0 until AdaptWidthSteps).map { j =>
      s"(CASE WHEN count(*) > ${AdaptWidthBase * (1L << j)} THEN 1 ELSE 0 END)"
    }.mkString(" + ")

  /** [[adaptDfCapFor]] as SQL: the base cap integer-divided by the same
    * ladder as a ×2 product. The Scala side's `>>` equals this floor
    * division exactly for EVERY ladder depth (logical right shift of a
    * non-negative int IS floor division by 2^steps, and steps <=
    * [[AdaptWidthSteps]] = 12 keeps the SQL product far from overflow);
    * past step 6 both sides sit on the [[WinnowDfCapFloor]] anyway. */
  private def adaptDfCapLadderSql: String = {
    val pow2 = (0 until AdaptWidthSteps).map { j =>
      s"(CASE WHEN count(*) > ${AdaptWidthBase * (1L << j)} THEN 2 ELSE 1 END)"
    }.mkString(" * ")
    s"GREATEST($WinnowDfCapBase // ($pow2), $WinnowDfCapFloor)"
  }

  /** Shared winnowing-fingerprint CTE head: codepoint k-gram poly
    * hashes, window-16 mins, distinct — `kvSelect` must yield one row
    * whose `k` column is the gram length (plus any arm-specific scalar
    * the tail reads from `kv`). Ends at the `fp` (doc_id, f) relation. */
  private def winnowFpCtes(kvSelect: String): String =
    s"""WITH cps AS (
      |  SELECT doc_id,
      |         list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cp
      |  FROM documents),
      |kv AS ($kvSelect),
      |grams AS (
      |  SELECT doc_id,
      |         [list_reduce(list_prepend(0::BIGINT, list_slice(cp, i, i + k - 1)),
      |            (a, c) -> (a * 31 + c) % 1000000007)
      |          for i in range(1, len(cp) - k + 2)] AS hs
      |  FROM cps, kv WHERE len(cp) >= k),
      |mins AS (
      |  SELECT doc_id,
      |         CASE WHEN len(hs) <= 16 THEN [list_min(hs)]
      |              ELSE [list_min(list_slice(hs, i, i + 15))
      |                    for i in range(1, len(hs) - 14)] END AS ms
      |  FROM grams),
      |fp AS (SELECT doc_id, unnest(list_distinct(ms)) AS f FROM mins)""".stripMargin

  /** The FIXED winnowing-pair oracle chain (`kSelect` must yield one
    * row with columns `k` — gram length — and `dfcap` — the hot-
    * fingerprint document-frequency cap). */
  private def winnowPairsOracleSql(kSelect: String): String =
    s"""${winnowFpCtes(kSelect)},
      |hot AS (SELECT f FROM fp GROUP BY f
      |        HAVING count(*) > (SELECT dfcap FROM kv)),
      |idx AS (SELECT fp.doc_id, fp.f FROM fp LEFT JOIN hot ON fp.f = hot.f
      |        WHERE hot.f IS NULL),
      |sz AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS ninter
      |  FROM idx a JOIN idx b ON a.f = b.f AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(ninter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE) AS overlap
      |FROM inter
      |JOIN sz na ON na.doc_id = doc_a
      |JOIN sz nb ON nb.doc_id = doc_b
      |WHERE CAST(ninter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
      |      >= 0.5::DOUBLE""".stripMargin

  /** The ADAPTIVE winnowing-pair oracle chain — the round-18 candidate-
    * bounded twin, replaying [[DedupSignatureOps.winnowPairsAdaptiveOf]]
    * clause for clause: same k-12 grams, score index capped at
    * [[WinnowDfCapBase]], candidates = rare-fingerprint join under the
    * halving ladder (`capgen` from `kv`) UNION the prefix rescue
    * ((u + R) globally-rarest per doc by (df, f) order vs the full
    * capped index, >= min(R, n) matches — lossless for overlap >=
    * [[WinnowPrefixThetaPct]]%), then the fixed arm's exact overlap on
    * the candidate set only. */
  private def winnowPairsAdaptiveOracleSql: String =
    s"""${winnowFpCtes(
        s"SELECT CAST(12 AS BIGINT) AS k," +
          s" CAST($adaptDfCapLadderSql AS BIGINT) AS capgen" +
          " FROM documents")},
      |dfr AS (SELECT f, count(*) AS df FROM fp GROUP BY f),
      |idx AS (SELECT fp.doc_id, fp.f, dfr.df FROM fp
      |        JOIN dfr ON fp.f = dfr.f
      |        WHERE dfr.df <= $WinnowDfCapBase),
      |sz AS (SELECT doc_id, count(*) AS n FROM idx GROUP BY doc_id),
      |rk AS (SELECT doc_id, f, df,
      |              row_number() OVER (PARTITION BY doc_id ORDER BY df, f) AS rk,
      |              count(*) OVER (PARTITION BY doc_id) AS n
      |       FROM idx),
      |pref AS (SELECT doc_id, f, n FROM rk
      |         WHERE rk <= (n * ${100 - WinnowPrefixThetaPct}) // 100
      |                     + $WinnowPrefixSlack),
      |cp AS (SELECT least(a.doc_id, b.doc_id) AS doc_a,
      |              greatest(a.doc_id, b.doc_id) AS doc_b
      |       FROM pref a JOIN idx b ON a.f = b.f AND a.doc_id <> b.doc_id
      |       GROUP BY a.doc_id, b.doc_id, a.n
      |       HAVING count(*) >= least($WinnowPrefixSlack, a.n)),
      |cr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      |       FROM idx a JOIN idx b ON a.f = b.f AND a.doc_id < b.doc_id, kv
      |       WHERE a.df <= kv.capgen AND b.df <= kv.capgen),
      |cand AS (SELECT DISTINCT doc_a, doc_b
      |         FROM (SELECT doc_a, doc_b FROM cp
      |               UNION ALL SELECT doc_a, doc_b FROM cr) u),
      |inter AS (SELECT c.doc_a, c.doc_b, count(*) AS ninter
      |          FROM cand c
      |          JOIN idx a ON a.doc_id = c.doc_a
      |          JOIN idx b ON b.doc_id = c.doc_b AND b.f = a.f
      |          GROUP BY 1, 2)
      |SELECT doc_a, doc_b,
      |       CAST(ninter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE) AS overlap
      |FROM inter
      |JOIN sz na ON na.doc_id = doc_a
      |JOIN sz nb ON nb.doc_id = doc_b
      |WHERE CAST(ninter AS DOUBLE) / CAST(least(na.n, nb.n) AS DOUBLE)
      |      >= 0.5::DOUBLE""".stripMargin

  /** One simhash-pair oracle chain for the fixed and adaptive arms,
    * parameterized on the extension-bit scalar CTE body (`eSelect` must
    * yield one row, column `e`; e = 0 reproduces the fixed blocking —
    * range(0, 0) is empty, so the concat folds the bare chunk slice). */
  private def simhashPairsOracleSql(eSelect: String): String =
    s"""WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      |  FROM documents),
      |ext AS ($eSelect),
      |tok AS (
      |  SELECT doc_id, unnest(toks) AS s FROM t WHERE len(toks) > 0),
      |hs AS (
      |  SELECT doc_id,
      |         list_reduce(list_prepend(0::BIGINT,
      |           list_transform(range(1, len(s) + 1), i -> unicode(s[i])::BIGINT)),
      |           (a, c) -> (a * 31 + c) % 1000000007) AS h
      |  FROM tok),
      |votes AS (
      |  SELECT doc_id, b,
      |         sum(CASE WHEN ((h*h % 1000000007) * (2*b + 1) + h * (4*b + 7)
      |                        + 40503 * (b + 1)) % 1000000007 % 2 = 1
      |                  THEN 1 ELSE -1 END) AS v
      |  FROM hs, range(0, 64) r(b)
      |  GROUP BY doc_id, b),
      |bits AS (
      |  SELECT doc_id,
      |         list(CASE WHEN v > 0 THEN 1::BIGINT ELSE 0::BIGINT END ORDER BY b) AS bits
      |  FROM votes GROUP BY doc_id),
      |chunks AS (
      |  SELECT doc_id, c,
      |         list_reduce(list_prepend(0::BIGINT,
      |           list_concat(
      |             list_slice(bits, c*9 + 1, CASE WHEN c = 6 THEN 64 ELSE c*9 + 9 END),
      |             [bits[1 + ((CASE WHEN c = 6 THEN 64 ELSE c*9 + 9 END) + j) % 64]
      |              for j in range(0, e)])),
      |           (a, v) -> a * 2 + v) AS ch
      |  FROM bits, range(0, 7) rc(c), ext),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM chunks a JOIN chunks b
      |    ON a.c = b.c AND a.ch = b.ch AND a.doc_id < b.doc_id)
      |SELECT doc_a, doc_b,
      |       CAST(len(list_filter(range(1, 65), i -> ba.bits[i] <> bb.bits[i])) AS INT) AS hamming
      |FROM cand
      |JOIN bits ba ON ba.doc_id = doc_a
      |JOIN bits bb ON bb.doc_id = doc_b
      |WHERE len(list_filter(range(1, 65), i -> ba.bits[i] <> bb.bits[i])) <= 6""".stripMargin

  /** Shared quantization CTE: L2-normalize, scale by 1e4, round to
    * BIGINT — byte-identical to [[quantized]]. */
  private def embQuantCte: String =
    """WITH q AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(round(
      |           CAST(x AS DOUBLE) / sqrt(list_reduce(list_prepend(0.0::DOUBLE,
      |             list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
      |             (a, b) -> a + b)) * 10000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |s AS (SELECT vec_id, qv,
      |             CAST(list_dot_product(qv, qv) AS BIGINT) AS nsq
      |      FROM q)""".stripMargin

  /** Oracle for the LSH-mined pair query: the same deterministic
    * hyperplanes ([[Similarity.plane]]) inlined as integer literals, the
    * same sign-bit buckets, the same integer threshold — so DuckDB and
    * Spark compute the identical candidate set, not just the same final
    * filter. Plane dots stay < 2^30, exact in any arithmetic. */
  /** CTE chain shared by the LSH pair and cluster oracles: quantize ->
    * per-table sign-bit buckets (plane constants inlined) -> distinct
    * colliding id pairs. */
  private def embLshCandCte: String = {
    // the adaptive plane count replayed as the same integer threshold
    // ladder the Spark side folds (one comparison per doubling past the
    // base corpus — no FP log in either engine)
    val ladder = (0 until (EmbLshPlanesMax - EmbLshPlanes)).map { j =>
      s"(CASE WHEN count(*) > ${EmbLshBaseCorpus * (1L << j)} THEN 1 ELSE 0 END)"
    }.mkString(" + ")
    val bucketSelects = (0 until EmbLshTables).map { t =>
      val bucket = (0 until EmbLshPlanesMax).map { k =>
        // plane vectors at the FIXED base arity for every k, matching
        // lshBucketAdaptive: bits 0..7 identical to the 8-plane hash,
        // higher bits only exist once the corpus has doubled past them
        val planeLit = Similarity.plane(t, k, EmbLshPlanes).mkString("[", ", ", "]")
        s"(CASE WHEN $k < pl.pl AND list_dot_product(qv, $planeLit) >= 0 THEN ${1L << k} ELSE 0 END)"
      }.mkString(" + ")
      s"  SELECT vec_id, $t AS tbl, $bucket AS bucket FROM s, pl"
    }.mkString("\n  UNION ALL\n")
    s"""$embQuantCte,
       |pl AS (SELECT $EmbLshPlanes + $ladder AS pl FROM s),
       |bk AS (
       |$bucketSelects),
       |cand AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
       |  FROM bk a JOIN bk b
       |    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id < b.vec_id)""".stripMargin
  }

  /** DuckDB twin of [[embeddingKnnGraphOf]]: same blocking CTE, pairs
    * symmetrized, per-source row_number over (dot DESC, dst ASC). */
  private def knnGraphOracle: String =
    s"""$embLshCandCte,
       |sym AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM cand
       |  UNION ALL
       |  SELECT vec_b, vec_a FROM cand),
       |sc AS (
       |  SELECT sym.src, sym.dst,
       |         CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) AS dot
       |  FROM sym
       |  JOIN s sa ON sa.vec_id = sym.src
       |  JOIN s sb ON sb.vec_id = sym.dst),
       |r AS (
       |  SELECT src, dst, dot,
       |         row_number() OVER (PARTITION BY src
       |                            ORDER BY dot DESC, dst ASC) AS rank
       |  FROM sc)
       |SELECT src, dst, dot, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= 5""".stripMargin

  private def embeddingLshPairsOracle: String =
    s"""$embLshCandCte
       |SELECT cand.vec_a, cand.vec_b,
       |       CAST(CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) AS DOUBLE) /
       |         (sqrt(CAST(sa.nsq AS DOUBLE)) * sqrt(CAST(sb.nsq AS DOUBLE))) AS cosine
       |FROM cand
       |JOIN s sa ON sa.vec_id = cand.vec_a
       |JOIN s sb ON sb.vec_id = cand.vec_b
       |WHERE CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) > 0
       |  AND CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) *
       |      CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) * 25 > sa.nsq * sb.nsq * 4""".stripMargin

  /** Transitive closure over the gated LSH pairs — the DuckDB twin of
    * [[embeddingClusters]]'s label propagation. */
  private def embeddingClustersOracle: String =
    s"""${embLshCandCte.replace("WITH q", "WITH RECURSIVE q")},
       |np AS (
       |  SELECT cand.vec_a, cand.vec_b
       |  FROM cand
       |  JOIN s sa ON sa.vec_id = cand.vec_a
       |  JOIN s sb ON sb.vec_id = cand.vec_b
       |  WHERE CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) > 0
       |    AND CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) *
       |        CAST(list_dot_product(sa.qv, sb.qv) AS BIGINT) * 25 > sa.nsq * sb.nsq * 4),
       |e AS (
       |  SELECT vec_a AS src, vec_b AS dst FROM np
       |  UNION ALL SELECT vec_b, vec_a FROM np),
       |reach(src, dst) AS (
       |  SELECT src, dst FROM e
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src)
       |SELECT src AS vec_id, least(src, min(dst)) AS cluster_id
       |FROM reach GROUP BY src""".stripMargin
}
