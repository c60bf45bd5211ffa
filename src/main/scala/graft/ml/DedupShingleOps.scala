package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expr.Exprs
import graft.functions.ArrayOps

/** Shingle-indexed dedup surface of [[Dedup]]: exact groups/survivors,
  * contamination (exact + Bloom), repeated-span stats/removal, sequence
  * packing, n-gram Jaccard, containment, the lossless AllPairs/PPJoin
  * prefix filter, and the blocking-recall audit (round-11 split; the
  * registration stays on the object).
  */
private[graft] trait DedupShingleOps {

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
    // df-cap via ONE count window over the shingle exchange: the prior
    // hot-list groupBy + broadcast anti-join evaluated the shingle
    // kernel twice (build + probe) while materializing this cache —
    // the kernel dominates per-row cost, the (doc_id, hs) shuffle the
    // window adds is 16 bytes/row (guide §2.4; same rewrite as the
    // winnow arms). Row set identical: df > cap dropped either way.
    sh.withColumn("df", count(lit(1)).over(Window.partitionBy("hs")))
      .filter(col("df") <= dfCap)
      .select("doc_id", "hs").persist()
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

  /** Train-side decontamination — the direction a corpus build ACTS on,
    * where [[contaminationOf]] reports the eval side for audit: flag
    * train documents whose df-capped shingle set is >= 50% CONTAINED in
    * the union of the benchmark slice's shingles (eval = doc_id %
    * `evalMod` == 0, the realistic "benchmark is a ~1% sliver of the
    * corpus" shape). Containment, not an absolute shared count: with a
    * shared template vocabulary every long doc eventually shares a few
    * 3-grams with SOME benchmark doc, so an absolute threshold degrades
    * to "drop everything" as the corpus grows, while the containment
    * fraction is scale-free and flags exactly the near-dup twins of
    * benchmark content. Both counts (shared and total) come from the
    * same df-capped index, so hot-shingle drops cancel. Integer-exact
    * (2·n_shared >= n_sh). Same inverted-index shape as the near-dup
    * blockers; one persisted shingle index read by the hot-df pass and
    * all three arms (sizes + both join sides). */
  def trainContaminationOf(docs: DataFrame, evalMod: Long = 97L,
                           dfCap: Int = 1000): DataFrame = {
    val sh = shingleIndex(docs, dfCap)
    val evalShingles = sh.filter(col("doc_id") % evalMod === 0)
      .select("hs").distinct()
    val train = sh.filter(col("doc_id") % evalMod =!= 0)
    val sizes = train.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    train.join(evalShingles, "hs")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes, "doc_id")
      .filter(col("n_shared") * 2 >= col("n_sh"))
      .select(col("doc_id"), col("n_shared"), col("n_sh"))
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
}
