package graft.ml

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.expr.Exprs
import graft.functions.ArrayOps

/** Embedding-space dedup surface of [[Dedup]]: integer-quantized cosine
  * pairs (tiled exact + sign-LSH subquadratic), SemDeDup-style clusters,
  * k-NN graph, reverse-kNN, cluster-size histogram (round-11 split;
  * registration stays on the object).
  */
private[graft] trait DedupEmbeddingOps extends DedupClusterOps {
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

  // Scale-honest sampling for the exactness yardstick: Θ(n²) all-pairs
  // at the noise-level gate can never finish at the second decade
  // (500k vectors ≈ 2.5e11 candidate pairs filled the 100x sweep
  // host's disk in shuffle spill — BENCH_sf10_spot.json r15), so the
  // registered yardstick runs on a DETERMINISTIC doc-id sample whose
  // size is held ~constant by the same corpus-doubling integer ladder
  // as the LSH plane count: the sample modulus doubles per doubling
  // past EmbPairsSampleBase, so the kept fraction is ~1/2^ceil(log2(n/
  // base)) and the sampled all-pairs work is bounded at every decade.
  // Membership is a pure integer hash of vec_id ((id·c + a) mod p,
  // Knuth multiplicative constant, prime modulus) — portable verbatim
  // to the SQL oracle, stable across runs, and NESTED across decades
  // (the threshold form means the 100x sample is a subset of the 10x
  // sample over the same ids). Below the base corpus the modulus is 1
  // and the yardstick is the full exact all-pairs — sf0.01 and sf0.1
  // are unsampled, so the correctness gate still checks the complete
  // pair set there.
  val EmbPairsSampleBase = 4096L
  val EmbPairsSampleSteps = 20
  private[ml] val EmbPairsSampleMul = 2654435761L
  private[ml] val EmbPairsSampleAdd = 12345L
  private[ml] val EmbPairsSamplePrime = 1000003L

  /** Sample modulus as a pure integer product ladder — one ×2 per
    * corpus doubling past [[EmbPairsSampleBase]] (no FP log in either
    * engine; AdaptiveIndexSpec pins the formula). Evaluated driver-side
    * from one bounded count (the [[adaptWidthStepsFor]] convention):
    * inlining the modulus as a literal keeps the gate a plain codegen
    * Filter on the scan — no scalar-anchor join in the plan at all. */
  private[ml] def sampleModFor(n: Long): Long =
    (0 until EmbPairsSampleSteps).map { j =>
      if (n > EmbPairsSampleBase * (1L << j)) 2L else 1L
    }.product

  /** Deterministic threshold-sample membership at rate ~1/smod:
    * hash(id)·smod < prime. The threshold form makes samples NESTED in
    * smod (larger corpus ⊂ smaller corpus's sample over shared ids).
    * The id is reduced mod the prime BEFORE the multiply — same
    * residues (modular arithmetic), but the product stays < 2^52 for
    * ANY 64-bit id, where the unreduced form overflows Long past
    * id ≈ 3.5e9: Spark would wrap silently (negative remainder passes
    * the gate unconditionally — sample unbounded) while DuckDB errors,
    * so engine and oracle would diverge exactly at design scale. */
  private[ml] def sampleGate(id: Column, smod: Long): Column =
    (((id % lit(EmbPairsSamplePrime)) * lit(EmbPairsSampleMul)
      + lit(EmbPairsSampleAdd))
      % lit(EmbPairsSamplePrime)) * lit(smod) < lit(EmbPairsSamplePrime)

  /** EXACT cos>0.4 pairs via a distributed tile self-join, over the
    * adaptive deterministic sample above (full corpus below
    * [[EmbPairsSampleBase]]).
    *
    * Exact all-pairs similarity at a noise-level gate (0.4 in 64-d is
    * barely above orthogonal) is inherently Θ(n²) work — no blocking
    * scheme separates cos≈0.42 pairs from cos≈0 noise with usable recall
    * (sign-LSH ρ ≈ 0.66 at this gate; measured on this corpus: 50%
    * recall at 23% candidate fraction). The sample ladder is what makes
    * the yardstick scale-HONEST: exactness is preserved within the
    * sample (this is still the zero-miss reference the blocked arms are
    * audited against), while the work stays ~[[EmbPairsSampleBase]]²
    * at any corpus size instead of Θ(n²). The plan shape is also
    * scale-safe: instead of one driver-broadcast nested loop, each
    * sampled vector is hashed to one of B tiles and replicated across a
    * tile-pair key, so the pair space becomes B(B+1)/2 independent
    * equi-join tasks — a plain hash shuffle, per-task work s²/B² with
    * bounded memory, no broadcast of the corpus. B follows the
    * session's parallelism. [[embeddingLshPairsOf]] below is the
    * subquadratic approximate form over the FULL corpus for thresholds
    * where blocking actually works.
    *
    * A pair (x in tile i, y in tile j, i <= j) meets exactly once: at
    * tile key (i, j), x arriving via the a-side explode (i..B-1) and y
    * via the b-side explode (0..j). Same-tile pairs are ordered by the
    * id predicate; cross-tile pairs are emitted as (least, greatest). */
  def embeddingPairsOf(vectors: DataFrame): DataFrame = {
    val spark = vectors.sparkSession
    val tiles = math.max(4, math.min(64, spark.sparkContext.defaultParallelism))
    // the ladder reads ONE corpus count (vec_id column only — pruned
    // scan) as a bounded driver control fold; inlined as a literal, the
    // gate is a plain codegen Filter that prunes BEFORE quantization,
    // so the interpreted quantize HOF runs over the bounded sample, not
    // the corpus — and the pair plan stays join-free upstream
    val smod = sampleModFor(vectors.count())
    val sampled = graft.scale.Scale.spread(vectors)
      .filter(sampleGate(col("vec_id"), smod))
    val sq = quantizedWithNorm(sampled)
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
    * tiled plan. Below [[EmbPairsSampleBase]] vectors [[embeddingPairsOf]]
    * must return the identical set; above it the tiled plan runs the
    * deterministic vec_id sample, so equality holds restricted to the
    * sampled ids (DedupSpec checks exactly that). */
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
  // table x 16 OR-amplified tables at the base corpus size. At a real
  // near-dup gate (cos 0.9, p_bit ≈ 0.857) a true pair collides in some
  // table with probability 1-(1-0.857^8)^16 ≈ 0.996 while random pairs
  // collide at ~6% — real blocking. At the synthetic 0.4 gate recall is
  // ~0.36 by construction (documented above); the oracle mirrors the
  // blocking so the result is still bit-exact, and DedupSpec proves
  // planted cos>=0.9 pairs are all recovered.
  //
  // The plane count ADAPTS to the corpus: every doubling beyond
  // EmbLshBaseCorpus adds one plane (integer threshold ladder — exactly
  // ceil(log2(n/base)), no FP log parity risk), holding the RANDOM
  // same-bucket candidate density n²/2^planes constant instead of
  // letting it grow quadratically. With the fixed 8-plane shape the 100x
  // corpus put ~780 vectors in the average bucket and the candidate
  // shuffle (~1.2e9 id pairs) filled the sandbox disk; adaptive planes
  // hold the average bucket at a constant handful. The LSH trade is
  // explicit: per-table collision at cos 0.9 drops as p_bit^planes, so
  // recall at 15 planes/16 tables is ~0.81 — the standard (AND, OR)
  // density/recall exchange; a deployment that needs the 0.996 recall at
  // scale raises EmbLshTables alongside (tables ~ n^rho growth, the LSH
  // theorem's price, linear in candidate volume).
  val EmbLshPlanes = 8
  val EmbLshTables = 16
  val EmbLshPlanesMax = 24
  val EmbLshBaseCorpus = 2048L

  /** ceil(log2(n/base)) extra planes as a pure integer threshold ladder:
    * one `n > base·2^j` comparison per doubling, portable verbatim to
    * the SQL oracle (no floating-point log in either engine). Capped so
    * base + extras <= [[EmbLshPlanesMax]]. */
  // private[ml]: AdaptiveIndexSpec pins the one-plane-per-doubling ladder
  // (base at n = EmbLshBaseCorpus, +1 per doubling, EmbLshPlanesMax cap)
  private[ml] def adaptivePlaneCount(n: Column, base: Int): Column =
    (0 until (EmbLshPlanesMax - base)).map { j =>
      when(n > lit(EmbLshBaseCorpus) * lit(1L << j), 1).otherwise(0)
    }.foldLeft(lit(base).cast("int"))(_ + _)

  /** Subquadratic LSH-mined near-dup pairs: candidates collide in some
    * (table, sign-bucket); the integer gate then decides exactly. The
    * candidate join carries ids only (narrow shuffle); vectors are
    * re-fetched after the distinct (AQE broadcasts the small quantized
    * side here; at corpus scale it is a co-partitioned shuffle join).
    *
    * `planes` is the BASE plane count; the effective count adapts to
    * the corpus (one extra plane per doubling past
    * [[EmbLshBaseCorpus]] — see the shape comment above), holding
    * RANDOM same-bucket candidate volume n²/2^planes constant where a
    * fixed count lets it grow quadratically. The trade is cheap at a
    * real near-dup gate (cos 0.9: per-pair recall 0.996 at 8 planes,
    * ~0.81 at 15/16 tables); at the registered demo gate (cos 0.4 —
    * barely above noise, p_bit ≈ 0.63) no blocking can beat the
    * gate's own quadratic TRUE-pair density anyway: on the 10x
    * synthetic scale-up the gated output itself grew 109x (330 →
    * 35,963 genuine cos>0.4 pairs) while wall-time grew only 4.7x
    * (BENCH_sf1_spot.json) — the plan absorbs output-volume growth. */
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
    // adaptive plane count via the broadcast scalar-anchor idiom (one
    // 1-row aggregate, no driver action); bit k > planes only exists
    // when the corpus has doubled past base·2^(k-planes)
    val pl = sq.agg(
      adaptivePlaneCount(count(lit(1)), planes).cast("long").as("pl"))
    // persisted: the self-join below would otherwise evaluate the per-
    // table plane dots once per side; the bucket table is 3 longs/row
    val bucketed = sq.crossJoin(broadcast(pl)).select(col("vec_id"),
      explode(array((0 until tables).map(t =>
        struct(lit(t).as("tbl"),
          Similarity.lshBucketAdaptive(col("q"), t, planes,
            EmbLshPlanesMax, col("pl")).as("bucket"))): _*)).as("tb"))
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
}
