package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The adaptive blocking knobs: the corpus-doubling key-width ladder
  * for simhash chunks (round 16) and the candidate-bounding ladder +
  * prefix rescue for winnowing (round 18 — the gram stays k = 12).
  * Four contracts:
  *
  *  1. the ladder is the pinned integer formula of the corpus size
  *     (a revert to fixed width would pass every sf0.01 oracle — only
  *     at 10-100x does bucket occupancy explode);
  *  2. below the base corpus the adaptive forms are BIT-IDENTICAL to
  *     the fixed, complete forms (so the correctness gate checks the
  *     same pair sets);
  *  3. above the base, planted true near-dups must still surface
  *     (simhash: through the widened keys; winnow: through the rare
  *     join or the prefix rescue);
  *  4. the winnow prefix rescue is LOSSLESS for the >= 0.95 band even
  *     when every shared fingerprint is template-common — the exact
  *     failure mode the r16/r17 gram-widening arm had at 100x.
  */
class DedupAdaptiveSpec extends SparkSpec {

  test("adaptive width ladder: 0 below the base, +1 per corpus doubling") {
    assert(Dedup.AdaptWidthBase === 4096L)
    def steps(n: Long) = Dedup.adaptWidthStepsFor(n)
    assert(steps(500L) === 0)     // sf0.01 documents: fixed width
    assert(steps(4096L) === 0)    // at the base: still fixed
    assert(steps(4097L) === 1)    // first doubling
    assert(steps(5000L) === 1)    // sf0.1 documents
    assert(steps(50000L) === 4)   // 10x synthetic corpus
    assert(steps(500000L) === 7)  // 100x synthetic corpus
    assert(steps(1L << 40) === Dedup.AdaptWidthSteps) // capped
  }

  test("adaptive df-cap ladder: 1000 below the base, halved per corpus " +
    "doubling, floored at 16") {
    def cap(n: Long) = Dedup.adaptDfCapFor(n)
    assert(cap(500L) === 1000)    // sf0.01: fixed cap -> bit-identical arm
    assert(cap(4096L) === 1000)   // at the base: still fixed
    assert(cap(5000L) === 500)    // sf0.1 (1 step)
    assert(cap(50000L) === 62)    // 10x synthetic corpus (4 steps)
    assert(cap(500000L) === 16)   // 100x (7 steps: 1000 >> 7 = 7 -> floor)
    assert(cap(1L << 40) === 16)  // floor holds past the ladder cap
  }

  test("below the base corpus the adaptive arms equal the fixed arms " +
    "exactly (sf0.01 pair sets)") {
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet(Dedup.simhashPairsAdaptive(spark, sf)) ===
      pairSet(Dedup.simhashPairs(spark, sf)))
    spark.catalog.clearCache()
    assert(pairSet(Dedup.winnowPairsAdaptive(spark, sf)) ===
      pairSet(Dedup.winnowPairs(spark, sf)))
    spark.catalog.clearCache()
  }

  test("zero extension bits reproduce the fixed simhash blocking on any " +
    "signature frame") {
    import spark.implicits._
    val sigs = Seq((1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdeeL),
      (3L, -1L), (4L, -3L), (5L, 0L))
      .toDF("doc_id", "simhash")
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getAs[Int]("hamming"))).toSet
    assert(asSet(Dedup.simhashPairsAdaptiveOfSigs(sigs, 6, 0)) ===
      asSet(Dedup.simhashPairsOfSigs(sigs, 6)))
  }

  test("widened keys: identical signatures ALWAYS collide; extension " +
    "bits only drop pairs whose flips reach every widened window") {
    import spark.implicits._
    // identical signatures agree on every watched bit at ANY width ->
    // recall 1.0 for exact dups by construction
    val twin = Seq((1L, 0x5a5a5a5a5a5a5a5aL), (2L, 0x5a5a5a5a5a5a5a5aL))
      .toDF("doc_id", "simhash")
    assert(Dedup.simhashPairsAdaptiveOfSigs(twin, 6, 7).count() === 1L)
    // a 1-bit flip lands in exactly one base chunk; with e extension
    // bits it additionally taints the <= e windows watching that bit —
    // at e = 7 and 7 chunks of ~9 bits a single flip can reach at most
    // 1 + 1 = 2 windows' extensions... measure the real guarantee: for
    // EVERY single-bit flip position, the pair must still surface
    // (5 clean windows always remain)
    val base = 0x0f0f0f0f0f0f0f0fL
    val flips = (0 until 64).map(b => (100L + b, base ^ (1L << b)))
    val frame = ((99L, base) +: flips).toDF("doc_id", "simhash")
    val found = Dedup.simhashPairsAdaptiveOfSigs(frame, 6, 7)
      .filter(col("doc_a") === 99L || col("doc_b") === 99L).count()
    assert(found === 64L,
      s"a 1-flip near-dup failed to surface through widened keys: $found/64")
  }

  test("winnow prefix rescue: a template-contained doc whose EVERY " +
    "fingerprint is hotter than the rare-join cap still surfaces in " +
    "the duplicate band above the base corpus") {
    import spark.implicits._
    // 4,200 distinct filler docs push the corpus past the base
    // (capgen = 500); a 600-doc template family makes every template
    // fingerprint's df ~600 — above capgen, below the 1000 score cap —
    // so the rare join is BLIND to pairs inside the family. The
    // contained doc is a pure template substring: its overlap with any
    // family member is ~1.0 (dup band), and only the prefix rescue
    // ((u+R) rarest fingerprints vs the full capped index) can surface
    // it. The r16/r17 gram-widening arm missed exactly this shape.
    val filler = (0L until 4200L).map { i =>
      (i, (0 until 30).map(t => s"w${(i * 31 + t * 7) % 9973}").mkString(" "))
    }
    val template = (0 until 60).map(t => s"boilerplate$t").mkString(" ")
    val family = (0 until 600).map { m =>
      (20000L + m, s"$template familytail$m")
    }
    val contained = (30000L, template)
    val docs = (filler ++ family :+ contained).toDF("doc_id", "text")
    val out = Dedup.winnowPairsAdaptiveOf(docs)
      .filter(col("doc_a") === 30000L || col("doc_b") === 30000L)
      .collect()
    // the contained doc must pair with family members at overlap ~1.0
    assert(out.length >= 550,
      s"prefix rescue surfaced only ${out.length}/600 containment pairs")
    assert(out.forall(_.getAs[Double]("overlap") >= 0.95),
      "a containment pair scored below the duplicate band")
    spark.catalog.clearCache()
  }

  test("above the base corpus: planted near-dup documents surface " +
    "through both adaptive arms at their gates") {
    import spark.implicits._
    // 4,200 distinct filler docs (> base -> 1 extension bit / k = 13)
    // + 40 planted twin pairs differing in ONE trailing token
    val filler = (0L until 4200L).map { i =>
      (i, (0 until 30).map(t => s"w${(i * 31 + t * 7) % 9973}").mkString(" "))
    }
    val twins = (0 until 40).flatMap { p =>
      // 120 shared tokens + 1 differing: per-bit vote margins ~sqrt(121)
      // dwarf the one-token ±2 swing, so the twins are REAL near-dups
      // (hamming well inside the gate for almost all pairs)
      val core = (0 until 120).map(t => s"dup${p}tok${t}x").mkString(" ")
      Seq((10000L + p * 2, s"$core alpha"), (10001L + p * 2, s"$core beta"))
    }
    val docs = (filler ++ twins).toDF("doc_id", "text")
    val planted = (0 until 40)
      .map(p => (10000L + p * 2, 10001L + p * 2)).toSet
    // a one-token change can legitimately push hamming past the gate —
    // the simhash expectation is the planted pairs that PASS it (the
    // deterministic signatures decide which), and the adaptive blocking
    // must surface every one of those
    val sigById = Dedup.simhashOf(docs)
      .filter(col("doc_id") >= 10000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val simExpected = planted.filter { case (a, b) =>
      java.lang.Long.bitCount(sigById(a) ^ sigById(b)) <= 6
    }
    assert(simExpected.size >= 20,
      s"fixture too adversarial: only ${simExpected.size}/40 within the gate")
    val simFound = Dedup.simhashPairsAdaptiveOf(docs)
      .filter(col("doc_a") >= 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(simExpected.subsetOf(simFound),
      s"simhash adaptive missed ${simExpected.diff(simFound).size}/" +
        s"${simExpected.size} in-gate planted pairs")
    // near-identical docs share almost every window minimum -> overlap
    // ~1, far above the 0.5 gate at any adaptive k
    val winFound = Dedup.winnowPairsAdaptiveOf(docs)
      .filter(col("doc_a") >= 10000L).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(planted.subsetOf(winFound),
      s"winnow adaptive missed ${planted.diff(winFound).size}/40 planted pairs")
    spark.catalog.clearCache()
  }
}
