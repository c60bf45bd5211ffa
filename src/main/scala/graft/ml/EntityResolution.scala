package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Entity resolution (record linkage): match records that refer to the
  * same real-world entity across two sources that share no key — the
  * classic CRM problem behind the reference's case-reconciliation surface
  * (the reference reconciles on exact case refs, `etl/flows/
  * sync_daily.py:324-436`; this is the fuzzy arm for when refs are
  * absent), and a core training-data curation step (cross-source identity
  * dedup before mixing corpora).
  *
  * Shape: blocking -> candidate scoring -> best-match selection ->
  * quality audit. All arithmetic is integer/fixed-point (trigram Jaccard
  * in milli-units), so every stage replays bit-for-bit in the DuckDB
  * oracles.
  *
  * The two "sources" are synthesized deterministically from `customer`:
  * names are a 6-digit syllable encoding of the key (position-rotated so
  * adjacent keys do not produce degenerate repetitive strings), and the
  * B side carries realistic noise — one character doubled at a
  * key-dependent position plus case noise — with 1-in-5 records missing.
  * Ground truth (key equality) is never consulted by the matcher, only by
  * the quality audit.
  *
  * Scale design: blocking is a plain equi-join on an 8-char name prefix —
  * ONE hash shuffle, with per-block candidate volume bounded by the
  * block-size cap guard ([[blockCap]]): oversized blocks (a skewed or
  * degenerate blocking key at 100 TB) are counted first and EXCLUDED from
  * the quadratic join rather than melting one reducer — the same df-cap
  * pattern as Dedup's inverted indexes. Best-match is a window
  * partitioned by the high-cardinality left id; the audit is one
  * aggregate. Nothing global, nothing quadratic in the corpus.
  */
object EntityResolution {

  /** Matcher threshold (milli-Jaccard) — measured on the synthetic noise
    * model: true-pair scores floor at 700, false-pair p99 is 666. */
  val MatchThreshold = 700

  /** Blocks larger than this are excluded from the quadratic candidate
    * join (inert on the test corpus — max block size is ~100 — but the
    * guard is the 100 TB contract for degenerate blocking keys). */
  val blockCap = 1000

  private val syllables =
    Seq("ba", "ni", "ro", "ka", "lu", "me", "to", "sa", "ve", "zu")

  /** 6-digit key -> 12-char syllable name; position-rotated alphabet
    * ((digit + position) mod 10) so runs of equal digits still produce
    * varied trigrams. */
  private def syllableName(key: Column): Column = {
    val padded = lpad(key.cast("string"), 6, "0")
    array_join(
      transform(sequence(lit(1), lit(6)), i =>
        elt((((substr(padded, i, lit(1)).cast("int") + i) % 10) + 1) +:
          syllables.map(lit): _*)),
      "")
  }

  /** Source A: clean syllable names. */
  def sourceA(spark: SparkSession, dir: String): DataFrame =
    Tables.customer(spark, dir)
      .select(col("c_custkey").as("a_id"),
        syllableName(col("c_custkey")).as("a_name"))

  /** Source B: 4 of 5 records present; name carries one doubled character
    * at a key-dependent suffix position (9..12) plus case noise. */
  def sourceB(spark: SparkSession, dir: String): DataFrame = {
    val p = (lit(9) + (col("c_custkey") % 4)).cast("int")
    Tables.customer(spark, dir)
      .filter(col("c_custkey") % 5 =!= 0)
      .select(col("c_custkey").as("b_id"),
        syllableName(col("c_custkey")).as("base"), p.as("p"))
      .select(col("b_id"),
        upper(concat(
          substr(col("base"), lit(1), col("p")),
          substr(col("base"), col("p"), lit(1)),
          substr(col("base"), col("p") + 1, lit(20)))).as("b_name_raw"))
  }

  /** Distinct character trigrams of a (already normalized, lowercase)
    * name, packed injectively into ints (base-26 over 'a'..'z') — set
    * intersection/union over ints is far cheaper than over 3-char
    * strings at millions of candidate pairs, and Jaccard is invariant
    * under any injective recoding. */
  private def trigrams(s: Column): Column =
    sort_array(array_distinct(transform(sequence(lit(0), length(s) - 3), i =>
      (ascii(substr(s, i + 1, lit(1))) - 97) * 676 +
        (ascii(substr(s, i + 2, lit(1))) - 97) * 26 +
        (ascii(substr(s, i + 3, lit(1))) - 97))))

  /** Blocked candidate pairs with milli-Jaccard trigram scores — the
    * quadratic stage, bounded per block and capped by `cap`
    * (default [[blockCap]]). */
  def scoredPairsOf(a: DataFrame, b: DataFrame,
      cap: Int = blockCap): DataFrame = {
    // trigram sets are extracted per RECORD before the join — computed
    // once per row, not once per candidate pair (~80x less work). The
    // persist() is the projection barrier (same as Dedup's quantized
    // vectors): without it CollapseProject inlines the transform() back
    // through the join into every per-pair use.
    val an = a.select(col("a_id"),
      substring(col("a_name"), 1, 8).as("block"),
      trigrams(col("a_name")).as("ga"))
      .persist()
    val bn = b.select(col("b_id"), lower(col("b_name_raw")).as("b_name"))
      .select(col("b_id"), substring(col("b_name"), 1, 8).as("block"),
        trigrams(col("b_name")).as("gb"))
      .persist()
    // block-size cap on BOTH sides: per-block candidate volume is
    // |A_block| x |B_block|, and a degenerate blocking key can be hot on
    // either side, so a block is admitted only if neither side exceeds
    // the cap. Blocks present on one side only produce no candidates, so
    // the inner join loses nothing. The ok-list stays tiny -> broadcast.
    // The B-side count reads the RAW names (same block rows as bn), not
    // the persisted trigram projection — the cap scan then runs without
    // waiting on bn's (much heavier) trigram materialization.
    val bCounts = b
      .select(substring(lower(col("b_name_raw")), 1, 8).as("block"))
      .groupBy("block").agg(count(lit(1)).as("nb"))
    val okBlocks = an.groupBy("block").agg(count(lit(1)).as("na"))
      .join(bCounts, "block")
      .filter(col("na") <= cap && col("nb") <= cap)
      .select("block")
    // per-pair scoring is a single codegen'd merge pass over the two
    // sorted code arrays (SortedOverlapCount) — no per-pair set building
    an.join(broadcast(okBlocks), "block")
      .join(bn, "block")
      .select(col("a_id"), col("b_id"),
        graft.functions.ArrayOps.sorted_overlap(col("ga"), col("gb")).as("ov"),
        size(col("ga")).as("sa"), size(col("gb")).as("sb"))
      .select(col("a_id"), col("b_id"),
        expr("1000 * ov div (sa + sb - ov)").as("jm"))
  }

  def scoredPairs(spark: SparkSession, dir: String): DataFrame =
    scoredPairsOf(sourceA(spark, dir), sourceB(spark, dir))

  /** Best match per left record above the threshold: window over the
    * high-cardinality a_id, score-desc with a total tie-break. */
  def matchesOf(pairs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("jm").desc, col("b_id").asc)
    pairs.filter(col("jm") >= MatchThreshold)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("a_id", "b_id", "jm")
  }

  def matches(spark: SparkSession, dir: String): DataFrame =
    matchesOf(scoredPairs(spark, dir))

  /** Transitive closure over the match pairs — the ENTITY table that
    * MDM actually keys on: best-match links chain (two A-records
    * matching the same B-record are the same entity even though they
    * were never compared), so the entity id must come from connected
    * components, not from the pair list. Nodes are side-encoded
    * (a·10 / b·10+1 — the two sources share a key domain but are
    * distinct records), components resolve via [[Dedup.clustersOf]]'s
    * fused label-prop/pointer-jump (log-diameter rounds, checkpoint
    * reclamation), and each record row carries its entity id and
    * entity size. Downstream, [[goldenRecords]]-style survivorship can
    * run per entity instead of per pair. */
  def entityClusters(spark: SparkSession, dir: String): DataFrame = {
    val m = matches(spark, dir)
      .select((col("a_id") * 10).as("doc_a"), (col("b_id") * 10 + 1).as("doc_b"))
    val cl = Dedup.clustersOf(m)
      .select(col("doc_id").as("node"), col("cluster_id").as("entity_id"))
    val sz = cl.groupBy("entity_id").agg(count(lit(1)).as("entity_size"))
    cl.join(sz, "entity_id")
      .select(when(col("node") % 10 === 0, "a").otherwise("b").as("side"),
        expr("node div 10").as("record_id"), col("entity_id"),
        col("entity_size"))
  }

  /** MDM merge — golden-record construction after linkage: one merged
    * record per A-side entity with FIELD-LEVEL survivorship (the step
    * after matching that master-data pipelines actually ship). Rules:
    * the clean source keeps the canonical name; the freshness stamp is
    * the max across linked records; the phone survives from the FRESHER
    * source when it has one, else whichever source has one at all —
    * with a provenance column recording the decision (the audit column
    * an MDM merge must carry). Attributes are synthesized
    * deterministically (freshness from the portable serial hash, phones
    * from key arithmetic with per-source null channels), so the whole
    * merge — including every survivorship CASE — replays in the oracle.
    * Unmatched A records pass through as golden singletons.
    *
    * Scale: two narrow projections + the match table + two key joins —
    * the same shuffle profile as the linkage itself; survivorship is
    * per-row CASE logic, free inside the join projection. */
  def goldenRecords(spark: SparkSession, dir: String): DataFrame = {
    val serial = (c: Column) => (c * 48271L) % 100000L
    val a = sourceA(spark, dir).select(col("a_id"), col("a_name"),
      (serial(col("a_id")) % 997L).as("a_updated"),
      when(col("a_id") % 3 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("+1-"),
          lpad((col("a_id") * 7919L % 10000000L).cast("string"), 7, "0")))
        .as("a_phone"))
    val b = sourceB(spark, dir).select(col("b_id"),
      (serial(col("b_id") * 7L) % 997L).as("b_updated"),
      when(col("b_id") % 4 === 0, lit(null).cast("string"))
        .otherwise(concat(lit("+1-"),
          lpad((col("b_id") * 104729L % 10000000L).cast("string"), 7, "0")))
        .as("b_phone"))
    a.join(matches(spark, dir).select("a_id", "b_id"), Seq("a_id"), "left_outer")
      .join(b, Seq("b_id"), "left_outer")
      .select(col("a_id").as("entity_id"),
        col("b_id").isNotNull.as("matched"),
        lower(col("a_name")).as("canonical_name"),
        greatest(col("a_updated"), coalesce(col("b_updated"), lit(-1L)))
          .as("last_updated"),
        when(coalesce(col("b_updated"), lit(-1L)) > col("a_updated") &&
            col("b_phone").isNotNull, col("b_phone"))
          .otherwise(coalesce(col("a_phone"), col("b_phone"))).as("phone"),
        when(coalesce(col("b_updated"), lit(-1L)) > col("a_updated") &&
            col("b_phone").isNotNull, "B")
          .when(col("a_phone").isNotNull, "A")
          .when(col("b_phone").isNotNull, "B")
          .otherwise("none").as("phone_src"))
  }

  /** Linkage quality vs ground truth (key equality — consulted here
    * ONLY): precision over emitted matches, recall over linkable records
    * (those with a surviving B row), in milli-units. One aggregate over
    * the match table joined to nothing — truth is key arithmetic. */
  /** Edit-distance rescoring of the accepted matches: Levenshtein between
    * the normalized names — the classic second-opinion fuzzy metric
    * (trigram Jaccard is positional-noise-tolerant; edit distance counts
    * the literal repairs). Runs ONLY over the already-matched pairs (a
    * per-match projection, never the candidate volume), joining the two
    * name tables back by id — broadcast-sized joins at any corpus scale
    * where matches fit the usual dimension budget, hash joins otherwise. */
  def editDistanceRescore(spark: SparkSession, dir: String): DataFrame = {
    val a = sourceA(spark, dir)
    val b = sourceB(spark, dir)
      .select(col("b_id"), lower(col("b_name_raw")).as("b_name"))
    matches(spark, dir)
      .join(a, "a_id")
      .join(b, "b_id")
      .select(col("a_id"), col("b_id"), col("jm"),
        levenshtein(col("a_name"), col("b_name")).as("edit_dist"))
  }

  def matchQuality(spark: SparkSession, dir: String): DataFrame = {
    val linkable = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 5 =!= 0)
      .agg(count(lit(1)).as("n_linkable"))
    matches(spark, dir)
      .agg(
        count(lit(1)).as("n_matches"),
        sum(when(col("a_id") === col("b_id"), 1L).otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(linkable))
      .select(col("n_matches"), col("n_correct"), col("n_linkable"),
        expr("n_correct * 1000 div n_matches").as("precision_milli"),
        expr("n_correct * 1000 div n_linkable").as("recall_milli"))
  }

  /** Threshold sweep — the evaluation curve behind [[MatchThreshold]]:
    * precision/recall at each candidate gate, so an operator can pick
    * the threshold from data instead of folklore. Computed WITHOUT
    * re-running the linkage per threshold: under jm-desc ranking a
    * threshold filter keeps a PREFIX of each record's ranked list, so
    * the overall rank-1 row is the match at every threshold it clears —
    * one window pass, then a 5-way conditional count over the tiny
    * best-match table. NULLIF guards the empty-match thresholds in both
    * engines. */
  def thresholdSweep(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("jm").desc, col("b_id").asc)
    val best = scoredPairs(spark, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("a_id", "b_id", "jm")
    val linkable = Tables.customer(spark, dir)
      .filter(col("c_custkey") % 5 =!= 0)
      .agg(count(lit(1)).as("n_linkable"))
    best
      .select(explode(array(Seq(500, 600, 700, 800, 900).map(lit): _*))
        .as("threshold"), col("a_id"), col("b_id"), col("jm"))
      .groupBy("threshold")
      .agg(
        sum(when(col("jm") >= col("threshold"), 1L).otherwise(0L))
          .as("n_matches"),
        sum(when(col("jm") >= col("threshold") && col("a_id") === col("b_id"),
          1L).otherwise(0L)).as("n_correct"))
      .crossJoin(broadcast(linkable))
      .select(col("threshold"), col("n_matches"), col("n_correct"),
        expr("n_correct * 1000 div nullif(n_matches, 0)").as("precision_milli"),
        expr("n_correct * 1000 div n_linkable").as("recall_milli"))
  }

  /** Blocking diagnostics — the dq_key_skew of the linkage blocker: per
    * joint block, both side counts, the candidate volume na·nb the pair
    * join would materialize, and whether the cap admits it. The top-20
    * by volume is what an operator tunes the prefix length and cap
    * against; TakeOrderedAndProject keeps it a heap, never a sort. */
  def blockingStats(spark: SparkSession, dir: String,
                    cap: Int = blockCap, top: Int = 20): DataFrame = {
    val ca = sourceA(spark, dir)
      .select(substring(col("a_name"), 1, 8).as("block"))
      .groupBy("block").agg(count(lit(1)).as("na"))
    val cb = sourceB(spark, dir)
      .select(substring(lower(col("b_name_raw")), 1, 8).as("block"))
      .groupBy("block").agg(count(lit(1)).as("nb"))
    ca.join(cb, "block")
      .select(col("block"), col("na"), col("nb"),
        (col("na") * col("nb")).as("volume"),
        (col("na") <= cap && col("nb") <= cap).as("admitted"))
      .orderBy(col("volume").desc, col("block").asc)
      .limit(top)
  }

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "er_scored_pairs" -> ((s, d) => scoredPairs(s, d)),
    "er_matches" -> ((s, d) => matches(s, d)),
    "er_golden_records" -> ((s, d) => goldenRecords(s, d)),
    "er_entity_clusters" -> ((s, d) => entityClusters(s, d)),
    "er_match_quality" -> ((s, d) => matchQuality(s, d)),
    "er_edit_distance" -> ((s, d) => editDistanceRescore(s, d)),
    "er_threshold_sweep" -> ((s, d) => thresholdSweep(s, d)),
    "er_blocking_stats" -> ((s, d) => blockingStats(s, d)))

  private val erCtes: String =
    """WITH a AS (
      |  SELECT c_custkey AS a_id,
      |         array_to_string(list_transform(range(1,7),
      |           i -> (['ba','ni','ro','ka','lu','me','to','sa','ve','zu'])
      |                [(CAST(substr(lpad(CAST(c_custkey AS VARCHAR),6,'0'), i, 1) AS INT) + i) % 10 + 1]), '') AS a_name
      |  FROM customer),
      |b0 AS (
      |  SELECT c_custkey AS b_id,
      |         array_to_string(list_transform(range(1,7),
      |           i -> (['ba','ni','ro','ka','lu','me','to','sa','ve','zu'])
      |                [(CAST(substr(lpad(CAST(c_custkey AS VARCHAR),6,'0'), i, 1) AS INT) + i) % 10 + 1]), '') AS base,
      |         9 + CAST(c_custkey % 4 AS INT) AS p
      |  FROM customer WHERE c_custkey % 5 <> 0),
      |b AS (
      |  SELECT b_id,
      |         upper(substr(base,1,p) || substr(base,p,1) || substr(base,p+1)) AS b_name_raw
      |  FROM b0),
      |bn AS (SELECT b_id, lower(b_name_raw) AS b_name FROM b),
      |blocks AS (
      |  SELECT ca.block FROM
      |    (SELECT substr(a_name,1,8) AS block, count(*) AS na
      |     FROM a GROUP BY 1) ca
      |  JOIN (SELECT substr(b_name,1,8) AS block, count(*) AS nb
      |        FROM bn GROUP BY 1) cb USING (block)
      |  WHERE na <= 1000 AND nb <= 1000),
      |cand AS (
      |  SELECT a_id, b_id,
      |         list_distinct(list_transform(range(0, length(a_name)-2),
      |           i -> (ascii(substr(a_name, i+1, 1)) - 97) * 676
      |              + (ascii(substr(a_name, i+2, 1)) - 97) * 26
      |              + (ascii(substr(a_name, i+3, 1)) - 97))) AS ga,
      |         list_distinct(list_transform(range(0, length(b_name)-2),
      |           i -> (ascii(substr(b_name, i+1, 1)) - 97) * 676
      |              + (ascii(substr(b_name, i+2, 1)) - 97) * 26
      |              + (ascii(substr(b_name, i+3, 1)) - 97))) AS gb
      |  FROM a
      |  JOIN blocks ON substr(a_name,1,8) = blocks.block
      |  JOIN bn ON substr(a_name,1,8) = substr(b_name,1,8)),
      |scored AS (
      |  SELECT a_id, b_id,
      |         (1000 * len(list_intersect(ga,gb)))
      |           // len(list_distinct(list_concat(ga,gb))) AS jm
      |  FROM cand),
      |best AS (
      |  SELECT a_id, b_id, jm FROM (
      |    SELECT a_id, b_id, jm,
      |           row_number() OVER (PARTITION BY a_id
      |                              ORDER BY jm DESC, b_id ASC) AS rn
      |    FROM scored WHERE jm >= 700)
      |  WHERE rn = 1)""".stripMargin

  val oracles: Map[String, String] = Map(
    "er_scored_pairs" -> (erCtes + "\nSELECT a_id, b_id, jm FROM scored"),
    "er_matches" -> (erCtes + "\nSELECT a_id, b_id, jm FROM best"),
    // true connected components via a recursive reach closure — the
    // engine-independent semantics the fixed-round label-prop converges
    // to (components here are tiny chains through shared B-records)
    "er_entity_clusters" -> (erCtes.replaceFirst("WITH a", "WITH RECURSIVE a") +
      """,
        |ee AS (
        |  SELECT a_id * 10 AS src, b_id * 10 + 1 AS dst FROM best
        |  UNION ALL SELECT b_id * 10 + 1, a_id * 10 FROM best),
        |reach(src, dst) AS (
        |  SELECT src, dst FROM ee
        |  UNION
        |  SELECT r.src, ee.dst FROM reach r JOIN ee ON r.dst = ee.src),
        |cl AS (
        |  SELECT src AS node, least(src, min(dst)) AS entity_id
        |  FROM reach GROUP BY src),
        |sz AS (SELECT entity_id, CAST(count(*) AS BIGINT) AS entity_size
        |       FROM cl GROUP BY 1)
        |SELECT CASE WHEN node % 10 = 0 THEN 'a' ELSE 'b' END AS side,
        |       CAST(node // 10 AS BIGINT) AS record_id, entity_id,
        |       entity_size
        |FROM cl JOIN sz USING (entity_id)""".stripMargin),
    "er_golden_records" -> (erCtes +
      """,
        |attrs_a AS (
        |  SELECT a_id, a_name,
        |         (a_id * 48271) % 100000 % 997 AS a_updated,
        |         CASE WHEN a_id % 3 = 0 THEN NULL
        |              ELSE '+1-' || lpad(CAST(a_id * 7919 % 10000000 AS VARCHAR), 7, '0')
        |         END AS a_phone
        |  FROM a),
        |attrs_b AS (
        |  SELECT b_id,
        |         ((b_id * 7) * 48271) % 100000 % 997 AS b_updated,
        |         CASE WHEN b_id % 4 = 0 THEN NULL
        |              ELSE '+1-' || lpad(CAST(b_id * 104729 % 10000000 AS VARCHAR), 7, '0')
        |         END AS b_phone
        |  FROM b)
        |SELECT aa.a_id AS entity_id,
        |       best.b_id IS NOT NULL AS matched,
        |       lower(aa.a_name) AS canonical_name,
        |       greatest(aa.a_updated, COALESCE(ab.b_updated, -1)) AS last_updated,
        |       CASE WHEN COALESCE(ab.b_updated, -1) > aa.a_updated
        |                 AND ab.b_phone IS NOT NULL THEN ab.b_phone
        |            ELSE COALESCE(aa.a_phone, ab.b_phone) END AS phone,
        |       CASE WHEN COALESCE(ab.b_updated, -1) > aa.a_updated
        |                 AND ab.b_phone IS NOT NULL THEN 'B'
        |            WHEN aa.a_phone IS NOT NULL THEN 'A'
        |            WHEN ab.b_phone IS NOT NULL THEN 'B'
        |            ELSE 'none' END AS phone_src
        |FROM attrs_a aa
        |LEFT JOIN best ON best.a_id = aa.a_id
        |LEFT JOIN attrs_b ab ON ab.b_id = best.b_id""".stripMargin),
    "er_edit_distance" -> (erCtes +
      """
        |SELECT best.a_id, best.b_id, best.jm,
        |       CAST(levenshtein(a.a_name, bn.b_name) AS INT) AS edit_dist
        |FROM best
        |JOIN a ON a.a_id = best.a_id
        |JOIN bn ON bn.b_id = best.b_id""".stripMargin),
    "er_match_quality" -> (erCtes +
      """,
        |q AS (
        |  SELECT count(*) AS n_matches,
        |         CAST(sum(CASE WHEN a_id = b_id THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |  FROM best),
        |l AS (
        |  SELECT count(*) AS n_linkable FROM customer WHERE c_custkey % 5 <> 0)
        |SELECT n_matches, n_correct, n_linkable,
        |       n_correct * 1000 // NULLIF(n_matches, 0) AS precision_milli,
        |       n_correct * 1000 // n_linkable AS recall_milli
        |FROM q CROSS JOIN l""".stripMargin),
    "er_blocking_stats" -> (erCtes +
      """,
        |ca AS (
        |  SELECT substr(a_name, 1, 8) AS block, count(*) AS na
        |  FROM a GROUP BY 1),
        |cb AS (
        |  SELECT substr(b_name, 1, 8) AS block, count(*) AS nb
        |  FROM bn GROUP BY 1),
        |j AS (
        |  SELECT ca.block, na, nb, na * nb AS volume,
        |         na <= 1000 AND nb <= 1000 AS admitted
        |  FROM ca JOIN cb USING (block))
        |SELECT block, na, nb, CAST(volume AS BIGINT) AS volume, admitted
        |FROM j ORDER BY volume DESC, block ASC LIMIT 20""".stripMargin),
    "er_threshold_sweep" -> (erCtes +
      """,
        |ball AS (
        |  SELECT a_id, b_id, jm FROM (
        |    SELECT a_id, b_id, jm,
        |           row_number() OVER (PARTITION BY a_id
        |                              ORDER BY jm DESC, b_id ASC) AS rn
        |    FROM scored)
        |  WHERE rn = 1),
        |thr AS (SELECT unnest([500, 600, 700, 800, 900]) AS threshold),
        |l AS (
        |  SELECT count(*) AS n_linkable FROM customer WHERE c_custkey % 5 <> 0),
        |q AS (
        |  SELECT threshold,
        |         CAST(sum(CASE WHEN jm >= threshold THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_matches,
        |         CAST(sum(CASE WHEN jm >= threshold AND a_id = b_id
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
        |  FROM thr CROSS JOIN ball GROUP BY 1)
        |SELECT threshold, n_matches, n_correct,
        |       CAST(n_correct * 1000 // NULLIF(n_matches, 0) AS BIGINT)
        |         AS precision_milli,
        |       CAST(n_correct * 1000 // n_linkable AS BIGINT) AS recall_milli
        |FROM q CROSS JOIN l""".stripMargin))
}
