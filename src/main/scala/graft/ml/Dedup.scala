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
object Dedup {

  /** 3-token shingles (distinct), for docs with >= 3 tokens. */
  def shingles(text: Column): Column = {
    val t = TextOps.tokens(text)
    when(size(t) >= 3,
      array_distinct(transform(sequence(lit(1), size(t) - 2), i =>
        concat_ws(" ", element_at(t, i), element_at(t, i + 1), element_at(t, i + 2)))))
      .otherwise(array().cast("array<string>"))
  }

  /** doc_id -> distinct hashed 3-gram shingles, as one generated pass
    * (graft.functions.ShingleHash3) — no shingle strings materialized. */
  def hashedShingles(text: Column): Column =
    ArrayOps.shingle_hash3(TextOps.tokens(text))

  /** doc_id -> exploded distinct shingle hashes, hot shingles dropped
    * (df cap). The inverted index joins on the 64-bit shingle hash
    * instead of the string itself: same counts (collision odds
    * ~n^2/2^64), far cheaper join keys; persisted because the pair query
    * reads it three times (sizes + both join sides). */
  private def shingleIndex(docs: DataFrame, dfCap: Int): DataFrame = {
    val sh = graft.scale.Scale.spread(docs) // few-split input: spread the shingle kernel
      .select(col("doc_id"), explode(hashedShingles(col("text"))).as("hs"))
    val hot = sh.groupBy("hs").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("hs")
    sh.join(broadcast(hot), Seq("hs"), "left_anti").persist()
  }

  /** Benchmark decontamination: flag eval-side documents (odd doc_id)
    * that share >= `minShared` distinct shingles with ANY train-side
    * document (even doc_id) — the train/benchmark overlap check every
    * training-data pipeline runs before a model ships. Same inverted-
    * index shape as the near-dup blockers: explode shingles, semi-join
    * the eval postings against the distinct train shingle set (a hash
    * join keyed on the 64-bit shingle hash), count per eval doc. The
    * hot-shingle df cap keeps stop-phrase postings from flooding the
    * join at corpus scale. */
  def contaminationOf(docs: DataFrame, minShared: Int = 3,
                      dfCap: Int = 1000): DataFrame = {
    val sh = shingleIndex(docs, dfCap)
    val trainShingles = sh.filter(col("doc_id") % 2 === 0)
      .select("hs").distinct()
    sh.filter(col("doc_id") % 2 =!= 0)
      .join(trainShingles, "hs")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Bloom-pruned decontamination — IDENTICAL result to
    * [[contaminationOf]] (so it shares its oracle), with the train side
    * pruned map-side before any shuffle: build a Bloom filter over the
    * eval side's distinct shingle hashes (the SMALL side — benchmarks
    * are thousands of docs, the corpus is billions), embed it in the
    * plan as a binary literal, and gate the corpus-side shingle stream
    * with Spark's own codegen'd `BloomFilterMightContain` predicate —
    * the same expression Catalyst's runtime row-level filtering
    * injects. Corpus shingles that cannot match any eval shingle never
    * reach the distinct/join exchanges; the exact equi-join afterwards
    * discards the filter's false positives, which is why the output is
    * exact at any `fpp`. At 100 TB this turns the join's big-side
    * shuffle from |corpus shingles| into |bloom survivors| ≈
    * |eval ∩ corpus| + fpp·|corpus| — the standard semi-join-reduction
    * a distributed engine wants here. */
  def contaminationBloomOf(docs: DataFrame, minShared: Int = 3,
                           dfCap: Int = 1000, fpp: Double = 0.03): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftops.ColumnBridge
    val sh = shingleIndex(docs, dfCap)
    val evalPost = sh.filter(col("doc_id") % 2 =!= 0)
    val evalDistinct = evalPost.select("hs").distinct()
    val bf = evalDistinct.stat.bloomFilter(
      "hs", math.max(evalDistinct.count(), 1L), fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
      ColumnBridge.expression(col("hs"))))
    val trainShingles = sh.filter(col("doc_id") % 2 === 0)
      .filter(mightContain) // map-side gate: prunes BEFORE the exchanges
      .select("hs").distinct()
    evalPost.join(trainShingles, "hs")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  def contaminationBloom(spark: SparkSession, dir: String): DataFrame =
    contaminationBloomOf(Tables.documents(spark, dir))

  /** Repeated-span detection — the exact-substring dedup of "Deduplicating
    * Training Data Makes Language Models Better" (Lee et al. 2021) at
    * k-token granularity, and C4's repeated-span removal rule: every
    * k-gram occurring >= `minCount` times ANYWHERE in the corpus is a
    * repeated span, and each document reports how much of it is built
    * from such spans (the cut list a cleaning pass would act on).
    *
    * Scale shape: one narrow pass explodes per-position k-grams and
    * immediately folds each to a 64-bit xxhash — the span STRING never
    * leaves the map side, so the global-count shuffle carries 16 bytes a
    * row, not ~6·k-byte strings; ONE shuffle aggregates global span
    * counts; the repeated-span set semi-joins back against the positions
    * (hash join on the 64-bit key — broadcastable when the hot set is
    * small, as repetition is by definition rare in clean corpora). No
    * window, no driver state. The hash is invisible in the OUTPUT (only
    * per-doc counts surface), so the DuckDB oracle can group by the
    * literal string while Spark groups by the hash: any 2^-64-birthday
    * collision at verify scale would break the hash compare — it is
    * itself under test. */
  def spanDedupStatsOf(docs: DataFrame, k: Int = 10,
                       minCount: Int = 2): DataFrame = {
    val toks = docs
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= k)
    val spans = toks.select(col("doc_id"),
      explode(transform(sequence(lit(0), size(col("toks")) - k),
        i => xxhash64(array_join(slice(col("toks"), i + 1, lit(k)), " "))))
        .as("h"))
    val hot = spans.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount).select("h")
    // n_spans is closed-form (size - k + 1): a narrow projection, not a
    // second corpus-wide explode + shuffle
    val perDoc = toks.select(col("doc_id"),
      (size(col("toks")) - (k - 1)).cast("long").as("n_spans"))
    val repeated = spans.join(hot, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_repeated"))
    perDoc.join(repeated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_spans"),
        coalesce(col("n_repeated"), lit(0L)).as("n_repeated"),
        (coalesce(col("n_repeated"), lit(0L)).cast("double") /
          col("n_spans")).as("repeat_ratio"))
  }

  def spanDedupStats(spark: SparkSession, dir: String): DataFrame =
    spanDedupStatsOf(Tables.documents(spark, dir))

  /** Repeated-span REMOVAL — the cleaning pass [[spanDedupStatsOf]]
    * only reports: every token covered by at least one corpus-repeated
    * k-gram is cut, and the document is re-emitted as its surviving
    * token stream (single-space rejoined — token-level cleaning at the
    * same granularity the stats operator measures). This is the
    * destructive arm of Lee et al. 2021 / C4's repeated-span rule,
    * with the deterministic all-occurrences policy (keeping exactly one
    * global occurrence needs a cross-corpus arbitrary choice; removing
    * all is order-free and reproducible anywhere).
    *
    * Scale shape: span hashes fold map-side exactly as in the stats
    * operator (the k-token string never shuffles); covered positions
    * explode only from REPEATED spans — rare in clean corpora, so the
    * covered set is small; the token stream then pays exactly two
    * narrow-row exchanges: one anti-join keyed (doc_id, tpos) against
    * the covered set, one per-doc regroup to rebuild the text (per-doc
    * partitions are bounded by document length, never corpus size). The
    * array-native alternative (broadcast covered positions per doc,
    * filter with array_contains) avoids the second exchange but is
    * quadratic in pathological fully-repeated documents — linear
    * exchanges beat quadratic CPU at 100 TB. */
  def spanRemoveOf(docs: DataFrame, k: Int = 10, minCount: Int = 2): DataFrame = {
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    val spans = toks.filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), size(col("toks")) - k),
          i => struct(i.as("pos"),
            xxhash64(array_join(slice(col("toks"), i + 1, lit(k)), " ")).as("h"))))
          .as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.h").as("h"))
    val hot = spans.groupBy("h").agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount).select("h")
    val covered = spans.join(hot, Seq("h"), "left_semi")
      .select(col("doc_id"), explode(sequence(col("pos"), col("pos") + (k - 1)))
        .as("tpos"))
      .distinct()
    val surviving = toks
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("tpos", "token")))
      .join(covered, Seq("doc_id", "tpos"), "left_anti")
    val rebuilt = surviving.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tpos"), col("token")))),
          s => s.getField("token")), " ").as("clean_text"))
    toks.select(col("doc_id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  def spanRemove(spark: SparkSession, dir: String): DataFrame =
    spanRemoveOf(Tables.documents(spark, dir))

  /** Sequence packing for training batches: assign documents to
    * fixed-token-budget bins by contiguous fill — doc d joins bin
    * floor(cum_before(d) / budget) within its shard. The window is
    * PARTITIONED BY a shard key (doc_id mod `shards`), never global: at
    * 100 TB a single ORDER BY over the corpus is the textbook
    * one-reducer window, while per-shard packing keeps every partition's
    * state bounded and bins are globally named by (shard, bin). Packing
    * quality is unaffected — fill happens within each shard and the
    * budget overshoot stays bounded by one document either way.
    * Deterministic integer arithmetic end to end (token count = the
    * whitespace tokenizer shared with every text operator), so the
    * assignment carries a full SQL oracle. */
  def packSequencesOf(docs: DataFrame, budget: Int = 2048,
                      shards: Int = 8): DataFrame = {
    require(budget > 0 && shards > 0)
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"),
        (col("doc_id") % shards).as("shard"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      // (cum - n) and budget are non-negative longs < 2^53: the double
      // division is exact and the cast truncates = floor
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        ((col("cum") - col("n_tokens")) / lit(budget.toLong)).cast("long")
          .as("bin"))
  }

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequencesOf(Tables.documents(spark, dir))

  def contamination(spark: SparkSession, dir: String): DataFrame =
    contaminationOf(Tables.documents(spark, dir))

  /** Exact dedup groups: content-hash -> surviving (minimum) doc_id +
    * group size. Survivor selection is an aggregate, not a window — one
    * shuffle on the hash. */
  def exactGroupsOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(Exprs.contentHash(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_docs"))

  def exactGroups(spark: SparkSession, dir: String): DataFrame =
    exactGroupsOf(Tables.documents(spark, dir))

  /** Exact-dedup survivors: one row per distinct content hash. */
  def exactSurvivorsOf(docs: DataFrame): DataFrame =
    docs
      .groupBy(Exprs.contentHash(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")

  def exactSurvivors(spark: SparkSession, dir: String): DataFrame =
    exactSurvivorsOf(Tables.documents(spark, dir))

  /** N-gram Jaccard near-dup pairs >= `threshold`, via inverted index:
    * explode shingles, self-join on shingle, count = |A ∩ B|, then
    * |A ∪ B| = |A| + |B| - |A ∩ B|. Integer counts -> the division is
    * reproducible bit-for-bit. */
  def ngramJaccardPairsOf(docs: DataFrame,
                          threshold: Double = 0.7, dfCap: Int = 1000): DataFrame = {
    val sh = shingleIndex(docs, dfCap)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def ngramJaccardPairs(spark: SparkSession, dir: String,
                        threshold: Double = 0.7, dfCap: Int = 1000): DataFrame =
    ngramJaccardPairsOf(Tables.documents(spark, dir), threshold, dfCap)

  /** Shingle-CONTAINMENT pairs — the near-superset detector Jaccard
    * structurally misses: a short document quoted inside a long one has
    * |A∩B|/|A| ≈ 1 but Jaccard ≈ |A|/|B| ≈ 0, so the 0.7 gate never
    * fires. Emits both directions in integer milli (containment of the
    * smaller side in the larger and vice versa) for pairs where either
    * clears the gate. Same df-capped inverted index and plan shape as
    * [[ngramJaccardPairsOf]] — one extra projection, no new scan
    * pattern; containment is measured over the capped shingle sets
    * (identical caveat to the Jaccard form, mirrored in the oracle). */
  def containmentPairsOf(docs: DataFrame,
                         thresholdMilli: Long = 900L,
                         dfCap: Int = 1000): DataFrame = {
    val sh = shingleIndex(docs, dfCap)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.hs") === col("b.hs") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        expr("inter * 1000 div na").as("cont_a_in_b_milli"),
        expr("inter * 1000 div nb").as("cont_b_in_a_milli"))
      .filter(col("cont_a_in_b_milli") >= thresholdMilli ||
        col("cont_b_in_a_milli") >= thresholdMilli)
  }

  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairsOf(Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // Prefix filtering (AllPairs / PPJoin family) — the LOSSLESS
  // subquadratic similarity join
  // -------------------------------------------------------------------

  /** Milli-Jaccard threshold for [[prefixFilterPairsOf]]. */
  val PrefixThresholdMilli = 800L

  /** Exact Jaccard-similarity self-join at threshold t = 0.8 via PREFIX
    * FILTERING (Bayardo et al., WWW'07; Chaudhuri et al., ICDE'06): sort
    * every document's shingles by one GLOBAL total order — ascending
    * document frequency, rarest first — and index only each document's
    * first |x| − ceil(t·|x|) + 1 shingles. Any pair with J ≥ t must
    * share a prefix token under that order (its suffix has only
    * ceil(t·|x|) − 1 elements, fewer than the required overlap), so the
    * candidate set is a SUPERSET of the answer and the exact
    * sorted-merge verification makes the whole join LOSSLESS — unlike
    * the df-cap heuristic of [[ngramJaccardPairsOf]] or the
    * probabilistic recall of MinHash LSH.
    *
    * Scale: hot (stop-phrase) shingles have maximal df, sort LAST, and
    * almost never enter a prefix — skew protection falls out of the
    * algorithm instead of a tuning knob. Candidate volume is the index
    * join on rare tokens only (~(1−t)·|x| postings per doc); the only
    * per-doc state is one row_number window over the high-cardinality
    * doc_id. Verification is one codegen'd merge pass per candidate on
    * the persisted sorted-hash arrays. */
  def prefixFilterPairsOf(docs: DataFrame,
      thresholdMilli: Long = PrefixThresholdMilli): DataFrame = {
    val spread = graft.scale.Scale.spread(docs)
    // full per-doc sorted shingle-hash sets: the verification operand,
    // persisted so the shingle kernel runs once per doc, not per use
    val base = spread
      .select(col("doc_id"), sort_array(hashedShingles(col("text"))).as("sh"))
      .filter(size(col("sh")) >= 1)
      .persist()
    val ex = base.select(col("doc_id"), size(col("sh")).as("len"),
      explode(col("sh")).as("h"))
    val dfCounts = ex.groupBy("h").agg(count(lit(1)).as("df"))
    // global order = (df asc, hash asc); prefix keeps the rarest
    // len - ceil(t*len) + 1 tokens (integer: ceil(0.8*len) = (8len+9)/10)
    val rk = Window.partitionBy("doc_id").orderBy("df", "h")
    val prefix = ex.join(dfCounts, "h")
      .withColumn("rk", row_number().over(rk))
      .filter(col("rk") <= col("len") - expr("(len * 8 + 9) div 10") + 1)
      .select("doc_id", "h")
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(base.select(col("doc_id").as("doc_a"), col("sh").as("sha")), "doc_a")
      .join(base.select(col("doc_id").as("doc_b"), col("sh").as("shb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        ArrayOps.sorted_overlap(col("sha"), col("shb")).as("ov"),
        size(col("sha")).cast("long").as("sa"),
        size(col("shb")).cast("long").as("sb"))
      .select(col("doc_a"), col("doc_b"),
        expr("1000 * ov div (sa + sb - ov)").as("jm"))
      .filter(col("jm") >= thresholdMilli)
  }

  def prefixFilterPairs(spark: SparkSession, dir: String): DataFrame =
    prefixFilterPairsOf(Tables.documents(spark, dir))

  /** Blocker audit — the recall report a dedup pipeline keeps on its
    * dashboard: the LOSSLESS prefix-filter join ([[prefixFilterPairsOf]],
    * exact J ≥ 0.8) is the ground truth; the banded-MinHash detector
    * ([[minhashPairsOf]], est ≥ 0.5) is the probabilistic production
    * arm under audit. One row: true pair count, detected count, hits,
    * and detector recall in milli. When a config change (band count,
    * signature length, gate) silently drops recall, THIS number moves —
    * the alarm you want before a contaminated training run, not after.
    *
    * Scale: both inputs are the existing subquadratic joins; the audit
    * adds one key-key semi join and three scalar counts.
    *
    * Cache contract: the two pair frames are persisted (each feeds two
    * counts), the one-row result is materialized EAGERLY, and both are
    * unpersisted before returning — a library caller looping this audit
    * accumulates nothing (the r9 kCoreOf convention). The upstream
    * detectors' own projection barriers (shingle index, signature
    * frame) remain under the module cache contract: Bench/Verify
    * clearCache() between queries; a long-lived session should too. */
  def blockingRecallOf(docs: DataFrame): DataFrame = {
    val truth = prefixFilterPairsOf(docs).select("doc_a", "doc_b").persist()
    val detected = minhashPairsOf(docs).select("doc_a", "doc_b").persist()
    try {
      val nTrue = truth.agg(count(lit(1)).as("n_true"))
      val nDet = detected.agg(count(lit(1)).as("n_detected"))
      val nHit = truth.join(detected, Seq("doc_a", "doc_b"), "left_semi")
        .agg(count(lit(1)).as("n_hit"))
      // one action materializes all three counts; the returned frame is
      // a local one-row relation with no lineage into the persisted pair
      // frames, so they can be released immediately
      val row = nTrue.crossJoin(broadcast(nDet)).crossJoin(broadcast(nHit))
        .head()
      val spark = docs.sparkSession
      import spark.implicits._
      Seq((row.getLong(0), row.getLong(1), row.getLong(2)))
        .toDF("n_true", "n_detected", "n_hit")
        .select(col("n_true"), col("n_detected"), col("n_hit"),
          expr("n_hit * 1000 div nullif(n_true, 0)").as("recall_milli"))
    } finally {
      truth.unpersist(blocking = false)
      detected.unpersist(blocking = false)
    }
  }

  def blockingRecall(spark: SparkSession, dir: String): DataFrame =
    blockingRecallOf(Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // MinHash + LSH — every hash ENGINE-PORTABLE (char-level polynomial
  // shingle hash, affine permutations mod 2^31-1, polynomial band fold),
  // so the DuckDB oracle reproduces the signatures bit-for-bit and the
  // registered query gets a full rows+schema+hash check; the ScalaTest
  // recall spec against exact Jaccard is kept on top.
  // -------------------------------------------------------------------

  val MinhashK = 32          // signature length
  val LshBands = 8           // bands of 4 rows each
  private val RowsPerBand = MinhashK / LshBands
  private val Prime = 2147483647L // 2^31 - 1
  private val PolyP = 1000000007L

  /** MinHash signature column: one generated pass over the shingles
    * (graft.functions.MinhashSig) instead of K interpreted
    * array_min(transform(...)) passes — the hot kernel of this module. */
  def minhashSignature(shingleArr: Column): Column =
    ArrayOps.minhash_sig(shingleArr, MinhashK, Prime)

  /** Banded LSH index rows for a document frame: one row per
    * (doc_id, band) carrying the full signature and the band's
    * polynomial fold `bh` — exactly what a production pipeline
    * MATERIALIZES once (parquet partitioned/bucketed by (band, bh))
    * and then appends to per ingest batch. Every admit/reject
    * decision over a new batch is then an equi-join against this
    * table instead of a corpus re-scan; see [[incrementalAdmitOf]].
    * The band key is a polynomial fold of the band's components
    * (mod 1e9+7) rather than a JVM hash — 4 multiply-adds per band,
    * engine-portable, and the oracle mirrors it. */
  def minhashIndexOf(docTable: DataFrame): DataFrame = {
    val docs = graft.scale.Scale.spread(docTable) // spread the sig kernel
      .select(col("doc_id"), ArrayOps.shingle_poly3(TextOps.tokens(col("text"))).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), minhashSignature(col("sh")).as("sig"))
    docs.select(
      col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(LshBands - 1)), b =>
        struct(b.as("band"),
          aggregate(
            slice(col("sig"), b * lit(RowsPerBand) + lit(1), lit(RowsPerBand)),
            lit(0L), (acc, v) => (acc * lit(1000003L) + v) % lit(PolyP)).as("bh"))))
        .as("bb"))
      .select(col("doc_id"), col("sig"), col("bb.band"), col("bb.bh"))
  }

  /** LSH candidate pairs + signature-estimated Jaccard >= threshold.
    * Banding: equal 4-row band => candidate; then the estimate is the
    * fraction of equal signature components. */
  def minhashPairsOf(docTable: DataFrame,
                     threshold: Double = 0.5): DataFrame = {
    val bands = minhashIndexOf(docTable)
      // persisted: the candidate self-join reads both sides, and the
      // signature pipeline above is the expensive part
      .persist()
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand.select(col("doc_a"), col("doc_b"),
        (size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
          x === y), b => b)).cast("double") / MinhashK).as("est_jaccard"))
      .filter(col("est_jaccard") >= threshold)
  }

  def minhashPairs(spark: SparkSession, dir: String,
                   threshold: Double = 0.5): DataFrame =
    minhashPairsOf(Tables.documents(spark, dir), threshold)

  /** Incremental near-dup admission — the ingest-time form of MinHash
    * dedup (reference runs dedup per sync batch, not per corpus rebuild:
    * caseguard/sync/incremental.py's batch loop). A new batch document is
    * REJECTED when its signature matches an already-indexed corpus
    * document (any), or an earlier (smaller doc_id) document of its own
    * batch — the keep-first-occurrence rule exactGroupsOf uses for exact
    * dedup, applied to the near-dup graph. `dup_of` is the smallest
    * matching neighbor; admitted docs carry NULL.
    *
    * Scale design: the corpus side is `corpusIndex` — the materialized
    * (doc_id, sig, band, bh) table from [[minhashIndexOf]], built ONCE
    * and appended to per batch, never recomputed. Each batch pays only
    * its own signature kernel. The batch is small relative to the corpus
    * by definition, so its banded rows are BROADCAST against the index:
    * the 100 TB side is probed with zero shuffle and zero sort (a
    * bucketed-by-(band,bh) index even keeps the probe partition-pruned).
    * The batch-internal self-join shuffles only the batch. */
  def incrementalAdmitOf(corpusIndex: DataFrame, batch: DataFrame,
                         threshold: Double = 0.5): DataFrame =
    incrementalVerdicts(corpusIndex, minhashIndexOf(batch).persist(),
      batch.select("doc_id"), threshold)

  /** [[incrementalAdmitOf]] with the batch's index rows precomputed —
    * for callers that need the probe twice (the streaming pipeline
    * appends the admitted docs' rows to the durable index, and must not
    * pay the signature kernel again). `batchIds` supplies the verdict
    * row set: docs too short to shingle have no probe rows but still
    * get an 'admit'. */
  private[graft] def incrementalVerdicts(corpusIndex: DataFrame,
                                         probe: DataFrame,
                                         batchIds: DataFrame,
                                         threshold: Double): DataFrame = {
    val crossCand = corpusIndex.as("a")
      .join(broadcast(probe).as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh"))
    val selfCand = probe.as("a")
      .join(probe.as("b"),
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc_id") < col("b.doc_id"))
    def pairs(j: DataFrame): DataFrame =
      j.select(col("b.doc_id").as("doc_id"), col("a.doc_id").as("nbr"),
        col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
    val matches = pairs(crossCand).unionByName(pairs(selfCand))
      .dropDuplicates("doc_id", "nbr")
      .filter(size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) =>
        x === y), b => b)).cast("double") / MinhashK >= threshold)
      .groupBy("doc_id").agg(min(col("nbr")).as("dup_of"))
    batchIds.join(matches, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"),
        when(col("dup_of").isNull, lit("admit"))
          .otherwise(lit("reject")).as("status"))
  }

  /** Registered form: docs with doc_id % 10 >= 8 arrive as the new
    * batch against the index of the other 80% (the corpus). */
  def incrementalAdmit(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    incrementalAdmitOf(
      minhashIndexOf(docs.filter(col("doc_id") % 10 < 8)),
      docs.filter(col("doc_id") % 10 >= 8))
  }

  // -------------------------------------------------------------------
  // SimHash (64-bit; ScalaTest-verified)
  // -------------------------------------------------------------------

  /** 64-bit SimHash over token hashes: per bit, sum +1/-1 by a
    * pseudo-random bit of the token hash, take sign. One generated pass
    * per document (graft.functions.SimhashPolySig) — a narrow map stage,
    * no shuffle of exploded tokens at all. The token hash is the
    * ENGINE-PORTABLE char-level polynomial fold (mod 1e9+7) with parity
    * bit-planes, so the registered pairs query carries a full DuckDB
    * oracle; the XXH64 variant (ArrayOps.simhash_sig) remains for callers
    * who prefer the stronger mixing over portability. */
  def simhashOf(docs: DataFrame): DataFrame =
    graft.scale.Scale.spread(docs) // spread the sig kernel
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      // token-less docs carry no signal — dropping them matches the old
      // explode+aggregate form and keeps m empty docs from flooding the
      // chunk join with m^2/2 spurious hamming-0 pairs on signature 0
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), ArrayOps.simhash_poly_sig(col("toks")).as("simhash"))

  def simhash(spark: SparkSession, dir: String): DataFrame =
    simhashOf(Tables.documents(spark, dir))

  /** SimHash near-dup pairs with GUARANTEED recall at the gate: block on
    * `maxHamming + 1` disjoint bit-chunks — by pigeonhole a pair within
    * hamming distance `maxHamming` differs in at most `maxHamming` chunks,
    * so it SHARES at least one chunk and must surface as a candidate.
    * Verification is an exact popcount of XOR <= maxHamming. (The earlier
    * fixed 4x16-bit blocking only guaranteed recall to hamming 3 while
    * the default gate advertised 6; the chunk count now tracks the
    * threshold — 7 chunks of 9 bits at the default — and DedupSpec proves
    * blocked == brute-force at the gate.) */
  def simhashPairsOf(docs: DataFrame, maxHamming: Int = 6): DataFrame =
    simhashPairsOfSigs(simhashOf(docs), maxHamming)

  /** Blocking + verification over a precomputed (doc_id, simhash) frame —
    * the unit DedupSpec plants adversarial signatures into (pairs at
    * exactly `maxHamming` with flips spread one-per-chunk of the OLD
    * fixed blocking must still surface). */
  def simhashPairsOfSigs(sh: DataFrame, maxHamming: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val nChunks = maxHamming + 1
    val w = 64 / nChunks // last chunk absorbs the remainder bits
    def mask(width: Int): Long = if (width >= 64) -1L else (1L << width) - 1L
    val chunkArr = array((0 until nChunks).map { i =>
      val width = if (i == nChunks - 1) 64 - w * (nChunks - 1) else w
      struct(lit(i).as("chunk"),
        shiftright(col("simhash"), i * w).bitwiseAND(lit(mask(width))).as("ch"))
    }: _*)
    val chunks = sh
      .select(col("doc_id"), col("simhash"), explode(chunkArr).as("cc"))
      .select(col("doc_id"), col("simhash"),
        col("cc.chunk").as("chunk"), col("cc.ch").as("ch"))
    val cand = chunks.as("a")
      .join(chunks.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.ch") === col("b.ch") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("ha"), col("b.simhash").as("hb"))
      .dropDuplicates("doc_a", "doc_b")
    cand.select(col("doc_a"), col("doc_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 6): DataFrame =
    simhashPairsOf(Tables.documents(spark, dir), maxHamming)

  // -------------------------------------------------------------------
  // Winnowing fingerprints (char-level rolling hash; spec-verified)
  // -------------------------------------------------------------------

  /** Near-dup pairs by shared winnowing fingerprints: same inverted-index
    * shape as the n-gram path but char-level and tokenization-agnostic.
    * Overlap = |F_a ∩ F_b| / min(|F_a|, |F_b|) >= threshold. The
    * fingerprints use the PORTABLE mod-1e9+7 codepoint hash
    * (Winnow.winnow_poly_fingerprints), so the registered query carries a
    * full DuckDB oracle that recomputes every gram hash and window min. */
  def winnowPairsOf(docs: DataFrame, threshold: Double = 0.5,
                    dfCap: Int = 1000): DataFrame = {
    val fp = graft.scale.Scale.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.Winnow.winnow_poly_fingerprints(col("text"))).as("f"))
    val hot = fp.groupBy("f").agg(count(lit(1)).as("df"))
      .filter(col("df") > dfCap).select("f")
    val idx = fp.join(broadcast(hot), Seq("f"), "left_anti").persist()
    val sz = idx.groupBy("doc_id").agg(count(lit(1)).as("n"))
    idx.as("a")
      .join(idx.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sz.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("overlap"))
      .filter(col("overlap") >= threshold)
  }

  def winnowPairs(spark: SparkSession, dir: String): DataFrame =
    winnowPairsOf(Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // Near-dup clusters: connected components over the pair graph
  // -------------------------------------------------------------------

  /** Connected components over near-dup pairs by iterative min-label
    * propagation (the DataFrame form of large-star/small-star): each doc
    * starts as its own cluster, every round adopts the minimum of its
    * neighborhood labels AND its label's label (pointer jumping — path
    * lengths halve each round, so convergence is O(log diameter), and
    * maxIters=20 covers components with diameters up to ~2^19, not 20
    * hops). This is the step that turns pairwise similarity into dedup
    * groups with a canonical survivor — cluster_id IS the minimum
    * (surviving) doc_id. Only documents that appear in some pair are
    * emitted; singletons are their own trivial cluster. */
  def clustersOf(pairsIn: DataFrame, maxIters: Int = 20): DataFrame = {
    val sc = pairsIn.sparkSession.sparkContext
    // localCheckpoint leaves its RDD blocks in the block manager until the
    // ContextCleaner happens to GC the reference — across an iterative
    // loop that is (iters+1) superseded label tables pinned in executor
    // memory. Read the checkpointed RDD's id straight off the returned
    // frame's LogicalRDD leaf (scoped to OUR checkpoint — a concurrent
    // thread's persist in a shared session can never be swept, unlike a
    // global getPersistentRDDs diff) and free a round's blocks as soon as
    // the next round has materialized.
    def ckptRddIds(df: DataFrame): Set[Int] =
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
      }.toSet
    def dropBlocks(ids: Set[Int]): Unit =
      sc.getPersistentRDDs.filter { case (id, _) => ids(id) }
        .values.foreach(_.unpersist(blocking = false))
    // both union branches read the pair pipeline — materialize it once
    val pairs = pairsIn.persist()
    // edges are re-joined on dst EVERY round — shuffle them onto the join
    // key once here, so each round's neighbor-min join is exchange-free on
    // the edge side (labels below are checkpointed hash-partitioned on
    // doc_id, and LogicalRDD preserves outputPartitioning)
    val edges = pairs
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .repartition(col("dst"))
      .persist()
    // localCheckpoint (not persist) each round: the label table is
    // referenced three times per iteration (neighbor-min, both sides of
    // the pointer-jump self-join), so without lineage TRUNCATION the
    // logical plan grows 3^iterations and plan handling itself OOMs.
    // On a cluster with unreliable executors use reliable checkpoint
    // (sc.setCheckpointDir + .checkpoint()) — same shape, durable.
    var labels = edges.select(col("dst").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint()
    var labelBlocks = ckptRddIds(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // FUSED pass: neighbor-min and pointer-jump both probe the SAME
      // label table, so resolve both in one union + grouped min instead
      // of two probe joins feeding a 3-way reassembly join (the round-8
      // shape — ~2x the jobs/round of this one). The pointer arm is the
      // label table joined to itself (my label's current label); its rows
      // also carry the OLD label, so change detection falls out of the
      // same aggregate with no compare-with-old join. Labels obey
      // cluster_id <= doc_id (init equal, updates are mins), so the
      // pointer arm covers every doc and the grouped output is total.
      val nbrHit = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .select(edges("src").as("src"), col("cluster_id").as("cand"),
          lit(null).cast("long").as("old"))
      val ptrHit = labels.as("a")
        .join(labels.as("b"), col("a.cluster_id") === col("b.doc_id"))
        .select(col("a.doc_id").as("src"), col("b.cluster_id").as("cand"),
          col("a.cluster_id").as("old"))
      // min(cand) <= old always (the pointer arm's cand is <= the old
      // label), so the grouped min IS the new label; min(old) ignores the
      // neighbor arm's nulls and recovers the unique old label per doc
      val next = nbrHit.unionByName(ptrHit)
        .groupBy(col("src"))
        .agg(min(col("cand")).as("cluster_id"), min(col("old")).as("old_cid"))
        .select(col("src").as("doc_id"), col("cluster_id"),
          (col("cluster_id") < col("old_cid")).as("_changed"))
      val nextCkpt = next.localCheckpoint() // eager: materializes and cuts lineage
      val nextBlocks = ckptRddIds(nextCkpt)
      // coalesce: sum over ZERO rows (no pairs at all) is null, and a
      // legal empty input must return an empty cluster table, not NPE
      val changed = nextCkpt
        .agg(coalesce(sum(when(col("_changed"), 1L).otherwise(0L)), lit(0L)))
        .head().getLong(0)
      // nextCkpt is materialized — the previous round's checkpoint blocks
      // are now dead weight; free them instead of waiting on the GC-driven
      // ContextCleaner (which pins iters× label tables in executor memory)
      dropBlocks(labelBlocks)
      labelBlocks = nextBlocks
      labels = nextCkpt.drop("_changed")
      converged = changed == 0
      iter += 1
    }
    edges.unpersist()
    pairs.unpersist()
    labels
  }

  /** Registered form: clusters of the n-gram Jaccard pairs. */
  def ngramClusters(spark: SparkSession, dir: String): DataFrame =
    clustersOf(ngramJaccardPairs(spark, dir))

  /** O11 — leakage-safe dataset split: near-duplicate CLUSTERS (not
    * documents) are the unit of assignment, so two near-copies can never
    * straddle train and test — the contamination channel a plain per-doc
    * hash split (o7) leaves open. Unclustered docs are their own
    * singleton cluster; the split arithmetic is o7's portable hash
    * applied to the canonical cluster id. One left join against the
    * (small) cluster table on top of the cluster pipeline's cost. */
  def dedupAwareSplit(spark: SparkSession, dir: String): DataFrame =
    dedupAwareSplitOf(Tables.documents(spark, dir), ngramClusters(spark, dir))

  /** Library form over a PRECOMPUTED cluster table — a real pipeline
    * materializes clusters once (they feed survivor selection, stats,
    * and the split), so the split must not re-run the whole pair+cluster
    * pipeline the way the self-contained registered query does. */
  def dedupAwareSplitOf(docs: DataFrame, clusters: DataFrame): DataFrame = {
    val cid = coalesce(col("cluster_id"), col("doc_id"))
    val bucket = (cid * 48271) % 100000 % 100
    docs.select(col("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"), cid.as("cid"),
        when(bucket < 80, "train").when(bucket < 90, "val")
          .otherwise("test").as("split"))
  }

  /** Quality-aware survivor selection: within each near-dup cluster keep
    * the LONGEST member (tie-break min doc_id) instead of the min-id
    * canonical — the standard curation policy (near-dups are usually
    * truncations/extractions of one another, so length is the cheap
    * quality proxy; swap the order column for a model score without
    * changing the shape). A window over cluster_id — cluster tables are
    * tiny relative to the corpus, so the exchange is negligible. */
  def qualitySurvivorsOf(clusters: DataFrame, docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id").asc)
    clusters.join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keep_id"), col("n_chars"))
  }

  /** Registered self-contained form (the oracle re-runs the cluster
    * pipeline; a real pipeline feeds [[qualitySurvivorsOf]] the
    * materialized cluster table). */
  def qualitySurvivors(spark: SparkSession, dir: String): DataFrame =
    qualitySurvivorsOf(ngramClusters(spark, dir), Tables.documents(spark, dir))

  // -------------------------------------------------------------------
  // Embedding-cosine near-dup pairs (integer-quantized => oracle-portable)
  // -------------------------------------------------------------------

  /** L2-normalize then quantize to ints (x/||x|| * 10000, rounded). The
    * norm is a left-fold double sum -> identical in any engine; rounding
    * to ints makes all downstream comparisons exact integer arithmetic.
    * One generated pass (graft.functions.QuantizeVec). */
  def quantized(emb: Column): Column = ArrayOps.quantize_vec(emb, 10000)

  /** Integer threshold gate shared by every embedding-pair form:
    * cos(a,b) > 0.4 decided entirely in integers —
    * dot > 0 && 25*dot^2 > 4*|a|^2*|b|^2  (0.4^2 = 4/25).
    *
    * The persist() is the projection barrier the pair queries need:
    * without it CollapseProject/filter-pushdown inlines the dot product
    * into the post-join condition AND the cosine projection — three
    * evaluations per candidate pair (measured 3x slower at sf0.1 on the
    * round-2 shape). Bench/Verify clearCache() between queries. */
  private def gated(scored: DataFrame): DataFrame =
    scored.persist()
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * 25 > col("na") * col("nb") * 4)
      .select(col("vec_a"), col("vec_b"),
        (col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cosine"))

  private def quantizedWithNorm(vectors: DataFrame): DataFrame =
    vectors
      .select(col("vec_id"), quantized(col("embedding")).as("q"))
      .select(col("vec_id"), col("q"),
        ArrayOps.dot_long(col("q"), col("q")).as("nsq"))

  /** EXACT cos>0.4 pairs via a distributed tile self-join.
    *
    * Exact all-pairs similarity at a noise-level gate (0.4 in 64-d is
    * barely above orthogonal) is inherently Θ(n²) work — no blocking
    * scheme separates cos≈0.42 pairs from cos≈0 noise with usable recall
    * (sign-LSH ρ ≈ 0.66 at this gate; measured on this corpus: 50%
    * recall at 23% candidate fraction). What CAN scale is the plan
    * shape: instead of one driver-broadcast nested loop, each vector is
    * hashed to one of B tiles and replicated across a tile-pair key, so
    * the pair space becomes B(B+1)/2 independent equi-join tasks — a
    * plain hash shuffle, per-task work n²/B² with bounded memory, no
    * broadcast of the corpus. B follows the session's parallelism.
    * [[embeddingLshPairsOf]] below is the subquadratic approximate form
    * for thresholds where blocking actually works.
    *
    * A pair (x in tile i, y in tile j, i <= j) meets exactly once: at
    * tile key (i, j), x arriving via the a-side explode (i..B-1) and y
    * via the b-side explode (0..j). Same-tile pairs are ordered by the
    * id predicate; cross-tile pairs are emitted as (least, greatest). */
  def embeddingPairsOf(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    val tiles = math.max(4, math.min(64, spark.sparkContext.defaultParallelism))
    val sq = quantizedWithNorm(graft.scale.Scale.spread(vectors))
      .withColumn("tile", pmod(xxhash64(col("vec_id")), lit(tiles.toLong)))
      .persist() // quantize HOF is interpreted; both join sides re-read this
    val aSide = sq
      .withColumn("tj", explode(sequence(col("tile"), lit(tiles.toLong - 1))))
      .select(col("tile").as("ti"), col("tj"),
        col("vec_id").as("aid"), col("q").as("qa"), col("nsq").as("na"))
    val bSide = sq
      .withColumn("ti", explode(sequence(lit(0L), col("tile"))))
      .select(col("ti"), col("tile").as("tj"),
        col("vec_id").as("bid"), col("q").as("qb"), col("nsq").as("nb"))
    val scored = aSide
      .join(bSide,
        Seq("ti", "tj"))
      .filter(col("ti") =!= col("tj") || col("aid") < col("bid"))
      .select(
        least(col("aid"), col("bid")).as("vec_a"),
        greatest(col("aid"), col("bid")).as("vec_b"),
        ArrayOps.dot_long(col("qa"), col("qb")).as("dot"), // symmetric
        col("na"), col("nb"))
    gated(scored)
  }

  /** Naive O(n²) theta-join form — spec-only equality yardstick for the
    * tiled plan ([[embeddingPairsOf]] must return the identical set). */
  def embeddingPairsExactOf(vectors: DataFrame): DataFrame = {
    val sq = quantizedWithNorm(vectors)
    val scored = sq.as("a")
      .join(sq.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        ArrayOps.dot_long(col("a.q"), col("b.q")).as("dot"),
        col("a.nsq").as("na"), col("b.nsq").as("nb"))
    gated(scored) // gated() persists — the projection barrier
  }

  // Sign-bit LSH shape for the SUBQUADRATIC mining form: 8 planes per
  // table x 16 OR-amplified tables. At a real near-dup gate (cos 0.9,
  // p_bit ≈ 0.857) a true pair collides in some table with probability
  // 1-(1-0.857^8)^16 ≈ 0.996 while random pairs collide at ~6% — real
  // blocking. At the synthetic 0.4 gate recall is ~0.36 by construction
  // (documented above); the oracle mirrors the blocking so the result is
  // still bit-exact, and DedupSpec proves planted cos>=0.9 pairs are all
  // recovered.
  val EmbLshPlanes = 8
  val EmbLshTables = 16

  /** Subquadratic LSH-mined near-dup pairs: candidates collide in some
    * (table, sign-bucket); the integer gate then decides exactly. The
    * candidate join carries ids only (narrow shuffle); vectors are
    * re-fetched after the distinct (AQE broadcasts the small quantized
    * side here; at corpus scale it is a co-partitioned shuffle join).
    *
    * `planes` is the LSH-theory scale knob: with a FIXED plane count,
    * RANDOM same-bucket candidate volume grows as n²/2^planes, so a
    * corpus growing c-fold wants ~log2(c) extra planes to hold
    * candidate density constant. That trade is only free at a real
    * near-dup gate (cos 0.9: per-pair recall 0.996 at 8 planes, 0.96
    * at 11); at the registered demo gate (cos 0.4 — barely above
    * noise) extra planes cost recall directly (p_bit ≈ 0.63 there),
    * and no blocking can beat the gate's own quadratic TRUE-pair
    * density: on the 10x synthetic scale-up the gated output itself
    * grew 109x (330 → 35,963 genuine cos>0.4 pairs) while wall-time
    * grew only 4.7x (BENCH_sf1_spot.json) — the plan absorbs
    * output-volume growth, and the knob is for candidate density at
    * production gates. */
  def embeddingLshPairsOf(vectors: DataFrame,
      planes: Int = EmbLshPlanes, tables: Int = EmbLshTables): DataFrame = {
    val sq = quantizedWithNorm(graft.scale.Scale.spread(vectors)).persist()
    val scored = lshCandidatesOf(sq, planes, tables)
      .join(sq.select(col("vec_id").as("vec_a"), col("q").as("qa"), col("nsq").as("na")), "vec_a")
      .join(sq.select(col("vec_id").as("vec_b"), col("q").as("qb"), col("nsq").as("nb")), "vec_b")
      .select(col("vec_a"), col("vec_b"),
        ArrayOps.dot_long(col("qa"), col("qb")).as("dot"),
        col("na"), col("nb"))
    gated(scored)
  }

  /** Distinct colliding id pairs (vec_a < vec_b) of the OR-amplified
    * sign-LSH blocking — the candidate miner shared by the pair, cluster
    * and k-NN-graph forms. `sq` must be the quantizedWithNorm projection
    * (persisted by the caller — both explode sides re-read it). */
  private def lshCandidatesOf(sq: DataFrame,
      planes: Int = EmbLshPlanes, tables: Int = EmbLshTables): DataFrame = {
    // persisted: the self-join below would otherwise evaluate the 16x8
    // plane dots once per side; the bucket table is 3 longs/row
    val bucketed = sq.select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          Similarity.lshBucket(col("q"), t, planes).as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .persist()
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
  }

  /** k-NN graph over the corpus embeddings (sim family — completes the
    * similarity surface with the all-documents neighbor structure that
    * SemDeDup pruning and graph clustering consume): for EVERY vector,
    * its top-k nearest candidates by exact integer cosine rank (vectors
    * are L2-normalized and quantized, so the raw dot IS the cosine
    * order), candidates mined by the same OR-amplified sign-LSH blocking
    * as the near-dup pairs — never an n² scan. Rank ties break on
    * neighbor id, so the graph is fully deterministic.
    *
    * Scale: candidate mining is the subquadratic LSH equi-join; the
    * per-source top-k is a window over each source's bounded candidate
    * list. Degree-k output: |V|·k rows regardless of corpus size. */
  def embeddingKnnGraphOf(vectors: DataFrame, k: Int = 5): DataFrame = {
    val sq = quantizedWithNorm(graft.scale.Scale.spread(vectors)).persist()
    val cand = lshCandidatesOf(sq)
    val sym = cand.select(col("vec_a").as("src"), col("vec_b").as("dst"))
      .union(cand.select(col("vec_b").as("src"), col("vec_a").as("dst")))
    val scored = sym
      .join(sq.select(col("vec_id").as("src"), col("q").as("qs")), "src")
      .join(sq.select(col("vec_id").as("dst"), col("q").as("qd")), "dst")
      .select(col("src"), col("dst"),
        ArrayOps.dot_long(col("qs"), col("qd")).as("dot"))
    val w = Window.partitionBy(col("src")).orderBy(col("dot").desc, col("dst").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("src", "dst", "dot", "rank")
  }

  def embeddingKnnGraph(spark: SparkSession, dir: String): DataFrame =
    embeddingKnnGraphOf(Tables.embeddings(spark, dir))

  /** Reverse-k-NN counts over the [[embeddingKnnGraphOf]] edges: how
    * many vectors list each vector among their top-k — the hub/medoid
    * signal (a vector many others point at is a cluster center; one
    * nobody points at is an outlier) that SemDeDup-style pruning and
    * coreset selection rank by. One map-side-combined groupBy over the
    * |V|·k-row graph; emitted for every corpus vector (zero for
    * never-referenced ones) so the distribution is complete. */
  def reverseKnnCountsOf(vectors: DataFrame): DataFrame = {
    val in = embeddingKnnGraphOf(vectors)
      .groupBy(col("dst").as("vec_id"))
      .agg(count(lit(1)).as("n_referrers"))
    vectors.select(col("vec_id"))
      .join(in, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_referrers"), lit(0L)).as("n_referrers"))
  }

  def reverseKnnCounts(spark: SparkSession, dir: String): DataFrame =
    reverseKnnCountsOf(Tables.embeddings(spark, dir))

  /** Duplicate-family size distribution — the reporting view of the
    * n-gram cluster pipeline: how many families of each size the corpus
    * holds (size 1 = unique documents). The number every dedup run
    * reports first ("X% of the corpus sits in families of ≥ 2"), and a
    * drift signal across ingests. Two map-side-combined aggregates over
    * the cluster table; output is bounded by the largest family size. */
  def clusterSizeHistogramOf(clusters: DataFrame): DataFrame =
    clusters
      .groupBy("cluster_id").agg(count(lit(1)).as("family_size"))
      .groupBy("family_size").agg(count(lit(1)).as("n_families"))

  def clusterSizeHistogram(spark: SparkSession, dir: String): DataFrame =
    clusterSizeHistogramOf(ngramClusters(spark, dir))

  def embeddingPairs(spark: SparkSession, dir: String): DataFrame =
    embeddingPairsOf(Tables.embeddings(spark, dir))

  def embeddingLshPairs(spark: SparkSession, dir: String): DataFrame =
    embeddingLshPairsOf(Tables.embeddings(spark, dir))

  /** SemDeDup-shaped completion of the embedding path: connected
    * components over the LSH-mined pair graph (same min-label
    * propagation + pointer jumping as the n-gram clusters), so the
    * embedding near-dups collapse to a canonical survivor per semantic
    * cluster. Oracle = recursive-CTE transitive closure over the
    * mirrored-blocking pair SQL. */
  def embeddingClusters(spark: SparkSession, dir: String): DataFrame =
    clustersOf(embeddingLshPairs(spark, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
      .select(col("doc_id").as("vec_id"), col("cluster_id"))

  // -------------------------------------------------------------------
  // Registration
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
    "dedup_winnow_pairs" -> ((s, d) => winnowPairs(s, d)),
    "dedup_embedding_pairs" -> ((s, d) => embeddingPairs(s, d)),
    "dedup_embedding_lsh_pairs" -> ((s, d) => embeddingLshPairs(s, d)),
    "sim_knn_graph" -> ((s, d) => embeddingKnnGraph(s, d)),
    "sim_rknn_counts" -> ((s, d) => reverseKnnCounts(s, d)),
    "dedup_cluster_size_hist" -> ((s, d) => clusterSizeHistogram(s, d)),
    "dedup_embedding_clusters" -> ((s, d) => embeddingClusters(s, d)),
    "dedup_ngram_clusters" -> ((s, d) => ngramClusters(s, d)),
    "dedup_quality_survivors" -> ((s, d) => qualitySurvivors(s, d)),
    "o11_dedup_aware_split" -> ((s, d) => dedupAwareSplit(s, d)),
    "curation_contamination" -> ((s, d) => contamination(s, d)),
    "curation_contamination_bloom" -> ((s, d) => contaminationBloom(s, d)),
    "curation_span_dedup" -> ((s, d) => spanDedupStats(s, d)),
    "curation_span_remove" -> ((s, d) => spanRemove(s, d)),
    "curation_pack_sequences" -> ((s, d) => packSequences(s, d)))

  private[ml] val shingleCte: String =
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
    "o11_dedup_aware_split" ->
      s"""$ngramClusterCtes
         |SELECT d.doc_id,
         |       coalesce(cl.cluster_id, d.doc_id) AS cid,
         |       CASE WHEN (coalesce(cl.cluster_id, d.doc_id) * 48271) % 100000 % 100 < 80 THEN 'train'
         |            WHEN (coalesce(cl.cluster_id, d.doc_id) * 48271) % 100000 % 100 < 90 THEN 'val'
         |            ELSE 'test' END AS split
         |FROM documents d LEFT JOIN cl ON cl.doc_id = d.doc_id""".stripMargin,
    "dedup_embedding_pairs" ->
      s"""$embQuantCte
         |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |       CAST(CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS DOUBLE) /
         |         (sqrt(CAST(a.nsq AS DOUBLE)) * sqrt(CAST(b.nsq AS DOUBLE))) AS cosine
         |FROM s a JOIN s b ON a.vec_id < b.vec_id
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
    // Replays portable winnowing end to end: codepoint 12-gram poly
    // hashes (each gram recomputed independently — modular arithmetic
    // matches the Spark side's rolling form exactly), window-16 mins,
    // distinct, then the same inverted-index overlap join with the
    // df-cap guard. Constants mirror winnowPairsOf's defaults.
    "dedup_winnow_pairs" ->
      """WITH cps AS (
        |  SELECT doc_id,
        |         list_transform(string_split(text, ''), c -> unicode(c)::BIGINT) AS cp
        |  FROM documents),
        |grams AS (
        |  SELECT doc_id,
        |         [list_reduce(list_prepend(0::BIGINT, list_slice(cp, i, i + 11)),
        |            (a, c) -> (a * 31 + c) % 1000000007)
        |          for i in range(1, len(cp) - 10)] AS hs
        |  FROM cps WHERE len(cp) >= 12),
        |mins AS (
        |  SELECT doc_id,
        |         CASE WHEN len(hs) <= 16 THEN [list_min(hs)]
        |              ELSE [list_min(list_slice(hs, i, i + 15))
        |                    for i in range(1, len(hs) - 14)] END AS ms
        |  FROM grams),
        |fp AS (SELECT doc_id, unnest(list_distinct(ms)) AS f FROM mins),
        |hot AS (SELECT f FROM fp GROUP BY f HAVING count(*) > 1000),
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
        |      >= 0.5::DOUBLE""".stripMargin,
    // Replays the portable SimHash end to end: char-level poly token hash
    // (as in the minhash oracle), parity bit-plane votes, sign take — the
    // signature is carried as a 64-element bit LIST (no int64 sign-bit
    // hazards), chunk blocking folds each slice to an integer (any
    // bijective encoding gives the identical candidate set), and
    // verification counts differing bits. Constants mirror
    // simhashPairsOfSigs at the default maxHamming=6: 7 chunks of 9 bits,
    // the last absorbing 10.
    "dedup_simhash_pairs" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        |  FROM documents),
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
        |           list_slice(bits, c*9 + 1, CASE WHEN c = 6 THEN 64 ELSE c*9 + 9 END)),
        |           (a, v) -> a * 2 + v) AS ch
        |  FROM bits, range(0, 7) rc(c)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM chunks a JOIN chunks b
        |    ON a.c = b.c AND a.ch = b.ch AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b,
        |       CAST(len(list_filter(range(1, 65), i -> ba.bits[i] <> bb.bits[i])) AS INT) AS hamming
        |FROM cand
        |JOIN bits ba ON ba.doc_id = doc_a
        |JOIN bits bb ON bb.doc_id = doc_b
        |WHERE len(list_filter(range(1, 65), i -> ba.bits[i] <> bb.bits[i])) <= 6""".stripMargin,
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
    val bucketSelects = (0 until EmbLshTables).map { t =>
      val bucket = (0 until EmbLshPlanes).map { k =>
        val planeLit = Similarity.plane(t, k, EmbLshPlanes).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(qv, $planeLit) >= 0 THEN ${1 << k} ELSE 0 END)"
      }.mkString(" + ")
      s"  SELECT vec_id, $t AS tbl, $bucket AS bucket FROM s"
    }.mkString("\n  UNION ALL\n")
    s"""$embQuantCte,
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
