package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Multimodal-column pipeline: media payloads as opaque binary columns +
  * typed metadata, with decode/feature-extraction as a batched
  * mapPartitions stage (the Scala analog of a vectorized pandas-UDF
  * stage). The reference stores documents as raw bytes with MIME metadata
  * (caseguard/proclaim/soap_downloader.py FORMAT_TO_MIME;
  * technical-details.md:92-163) and parses them through an external
  * service (docproc/format_config.py:147-230).
  *
  * The actual media decode is STUBBED (no image/audio codecs in this
  * environment): `decodeStub` derives deterministic pseudo-features from
  * the bytes. Everything around it — binary column, schema, partition-wise
  * batching, feature vector shape — is the real Spark plumbing a decoder
  * would plug into.
  */
object Multimodal {

  /** Input row: media id + raw bytes + declared MIME. */
  final case class MediaRecord(doc_id: Long, content: Array[Byte], mime: String)

  /** Output row: metadata + fixed-width feature vector. */
  final case class MediaFeatures(
      doc_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, features: Array[Float])

  /** STUB decoder — stands in for an image/audio codec. Deterministic pure
    * function of the bytes: byte-histogram moments as "features",
    * byte-length-derived "dimensions". A real deployment swaps only this
    * function; the pipeline shape is unchanged. */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val n = r.content.length
    var sum = 0L; var sumSq = 0L
    var i = 0
    while (i < n) {
      val b = r.content(i) & 0xff
      sum += b; sumSq += b.toLong * b
      i += 1
    }
    val mean = if (n > 0) sum.toDouble / n else 0.0
    val variance = if (n > 0) sumSq.toDouble / n - mean * mean else 0.0
    MediaFeatures(
      r.doc_id, r.mime, n,
      width = 64 + (n % 512), height = 64 + ((n / 7) % 512),
      features = Array(
        n.toFloat, mean.toFloat, variance.toFloat,
        (sum % 1000000007L).toFloat))
  }

  /** Media table synthesized from documents: text bytes as the binary
    * payload, MIME assigned round-robin. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      col("text").cast("binary").as("content"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"))

  /** The decode/feature stage: partition-batched typed map. Narrow (no
    * shuffle); at scale this is where a codec library would run once per
    * executor over arrow-sized batches. */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions(_.map(decodeStub))
      .toDF()
  }

  /** Registered form: feature vector unpacked to scalar columns. The
    * driver's rows-only check sorts every column in pandas, where array
    * cells are unhashable — registered outputs must be scalar. */
  def extractFeaturesFlat(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).select(
      col("doc_id"), col("mime"), col("n_bytes"), col("width"), col("height"),
      element_at(col("features"), 1).as("f_len"),
      element_at(col("features"), 2).as("f_mean"),
      element_at(col("features"), 3).as("f_var"),
      element_at(col("features"), 4).as("f_checksum"))

  /** Media metadata (no decode): payload size, MIME, derived dimensions.
    * This is the SQL-expressible half of the multimodal pipeline — the
    * codec stays in `extractFeatures`, everything schema/metadata-shaped
    * is a plain projection and gets a DuckDB oracle. */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"), col("mime"),
      length(col("content")).as("n_bytes"),
      (lit(64) + col("doc_id") % 7).cast("int").as("frame_rate"))

  /** Resize planning: fit each media item into a 224x224 box preserving
    * aspect ratio (the standard vision-model preprocessing step). The
    * *dimensions* come from the stub decode (pure arithmetic of the byte
    * length), so the whole resize plan is SQL-expressible and
    * oracle-checked; a real codec changes only where width/height come
    * from. Narrow projection — no shuffle. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val n = length(col("content"))
    val w = (lit(64) + n % 512).cast("int")
    // n/7 must be INTEGER division (Column `/` is double division): floor
    // of the double quotient equals n//7 for positive n
    val h = (lit(64) + floor(n.cast("double") / 7.0).cast("int") % 512).cast("int")
    val scale = lit(224.0) / greatest(w, h).cast("double")
    mediaTable(spark, dir).select(
      col("doc_id"), col("mime"), w.as("width"), h.as("height"),
      scale.as("scale"),
      floor(w.cast("double") * scale).cast("int").as("out_w"),
      floor(h.cast("double") * scale).cast("int").as("out_h"))
  }

  /** Frame sampling: for video rows, k evenly-spaced frame offsets over
    * the (stub) duration — one output row per sampled frame via a
    * generated index array + explode (the UDTF shape). At scale this is
    * the fan-out stage feeding a frame decoder; it stays narrow. */
  def frameSamples(spark: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val dur = length(col("content")).cast("double") / 1000.0
    mediaTable(spark, dir)
      .filter(col("mime") === "video/mp4")
      .select(col("doc_id"), dur.as("duration_s"),
        explode(sequence(lit(0), lit(k - 1))).as("frame_idx"))
      .select(col("doc_id"), col("duration_s"), col("frame_idx"),
        (col("frame_idx").cast("double") * col("duration_s") / k).as("offset_s"))
  }

  // -------------------------------------------------------------------
  // Second arm: a bit-packed stub image codec with REAL byte-level work
  // -------------------------------------------------------------------

  /** Encode: quantize each payload byte to its high nibble (a 16-level
    * grayscale "pixel") and pack two 4-bit pixels per output byte — the
    * classic bit-packed raster layout. Genuine per-byte work (masking,
    * shifting, re-packing), unlike [[decodeStub]]'s pass-over-the-bytes
    * statistics. */
  def packNibbles(bytes: Array[Byte]): Array[Byte] = {
    val n = bytes.length
    val out = new Array[Byte]((n + 1) / 2)
    var i = 0
    while (i < n) {
      val hi = (bytes(i) & 0xff) >> 4
      val lo = if (i + 1 < n) (bytes(i + 1) & 0xff) >> 4 else 0
      out(i / 2) = ((hi << 4) | lo).toByte
      i += 2
    }
    out
  }

  /** Decode: unpack `n` 4-bit pixels back out of the packed raster. */
  def unpackNibbles(packed: Array[Byte], n: Int): Array[Int] = {
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val b = packed(i / 2) & 0xff
      out(i) = if (i % 2 == 0) b >> 4 else b & 0x0f
      i += 1
    }
    out
  }

  /** Decoded-raster statistics: moments + a 16-bin pixel histogram (the
    * corpus is ASCII, so only bins 0-7 are populated; all 8 are emitted
    * as scalar columns for the driver's pandas compare). */
  final case class CodecStats(
      doc_id: Long, mime: String, n_raw: Int, n_encoded: Int,
      px_sum: Long, px_sumsq: Long,
      h0: Long, h1: Long, h2: Long, h3: Long,
      h4: Long, h5: Long, h6: Long, h7: Long)

  /** The codec pipeline: encode -> decode -> per-pixel statistics, all
    * inside one partition-batched typed map (narrow, no shuffle — the
    * exact stage shape a libjpeg/libpng call would occupy). The
    * quantize+pack+unpack is deterministic integer arithmetic, so the
    * DuckDB oracle replays the decoded pixels as codepoint >> 4 and the
    * encoded length as ceil(n/2) — while the Spark side genuinely
    * round-trips every byte through the packed raster. */
  def codecFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir)
      .as[MediaRecord]
      .mapPartitions(_.map { r =>
        val packed = packNibbles(r.content)
        val px = unpackNibbles(packed, r.content.length)
        var s = 0L; var s2 = 0L
        val hist = new Array[Long](16)
        var i = 0
        while (i < px.length) {
          val v = px(i)
          s += v; s2 += v.toLong * v
          hist(v) += 1
          i += 1
        }
        CodecStats(r.doc_id, r.mime, r.content.length, packed.length, s, s2,
          hist(0), hist(1), hist(2), hist(3), hist(4), hist(5), hist(6), hist(7))
      })
      .toDF()
  }

  // -------------------------------------------------------------------
  // Third arm: audio-shaped frame features over the stub signal
  // -------------------------------------------------------------------

  /** Audio feature extraction over the stub signal: the payload's
    * centered sample stream (codepoint - 64) framed into win=64 / hop=32
    * windows, emitting per-frame ENERGY (sum of squares) and
    * ZERO-CROSSING counts — the two classic cheap audio descriptors
    * (silence/voicing detection) and exactly the stage shape an
    * STFT/MFCC stage occupies. Work per doc is frames x win = 2n — the
    * linear framed-DSP budget — and the whole pipeline is a narrow
    * explode + builtin slice/aggregate (codegen'd, no UDF, no shuffle).
    * Integer arithmetic end to end, so DuckDB replays every frame. */
  def audioFramesOf(docs: DataFrame, win: Int = 64, hop: Int = 32): DataFrame = {
    val sig = transform(
      filter(split(col("text"), ""), x => x =!= ""),
      c => (ascii(c) - lit(64)).cast("long"))
    docs.filter(col("doc_id") % 3 === 1) // the audio/wav rows of mediaTable
      .select(col("doc_id"), sig.as("s"))
      .withColumn("n", size(col("s")))
      .filter(col("n") >= win)
      .withColumn("frame_idx",
        explode(sequence(lit(0), expr(s"CAST((n - $win) div $hop AS INT)"))))
      .withColumn("start", col("frame_idx") * hop)
      .select(col("doc_id"), col("frame_idx"),
        aggregate(slice(col("s"), col("start") + 1, lit(win)), lit(0L),
          (acc, x) => acc + x * x).as("energy"),
        aggregate(zip_with(
          slice(col("s"), col("start") + 1, lit(win - 1)),
          slice(col("s"), col("start") + 2, lit(win - 1)),
          (a, b) => when(a * b < 0, 1L).otherwise(0L)), lit(0L),
          (acc, x) => acc + x).as("zero_crossings"))
  }

  def audioFrames(spark: SparkSession, dir: String): DataFrame =
    audioFramesOf(Tables.documents(spark, dir))

  /** Voice-activity segmentation over the framed energy track: frames
    * at-or-above their document's mean energy are "active", and
    * consecutive active frames coalesce into segments (the
    * gaps-and-islands trick on frame index) — the VAD-shaped cut list
    * (start frame, end frame, length, energy mass) an audio pipeline
    * feeds to a transcription or silence-trim stage. A real VAD model
    * would swap in behind the same plumbing by replacing the
    * threshold predicate.
    *
    * Scale shape: one bounded per-doc mean join onto the frame track,
    * then a window partitioned by doc (frames-per-doc bounded by clip
    * length, never corpus size) and a grouped segment rollup. */
  def voiceSegmentsOf(docs: DataFrame, win: Int = 64,
      hop: Int = 32): DataFrame = {
    val frames = audioFramesOf(docs, win, hop)
      .select("doc_id", "frame_idx", "energy")
    val thr = frames.groupBy("doc_id")
      .agg(expr("sum(energy) div count(1)").as("thr"))
    val active = frames.join(thr, "doc_id")
      .filter(col("energy") >= col("thr"))
    val w = Window.partitionBy("doc_id").orderBy("frame_idx")
    active.withColumn("grp", col("frame_idx") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp"))
      .agg(min(col("frame_idx")).as("seg_start"),
        max(col("frame_idx")).as("seg_end"),
        count(lit(1)).as("n_frames"), sum(col("energy")).as("seg_energy"))
      .select("doc_id", "seg_start", "seg_end", "n_frames", "seg_energy")
  }

  def voiceSegments(spark: SparkSession, dir: String): DataFrame =
    voiceSegmentsOf(Tables.documents(spark, dir))

  /** Video-shaped motion detection over the stub signal: consecutive
    * non-overlapping 64-sample "frames" compared samplewise; per frame
    * pair, the summed absolute difference (the frame-difference motion
    * metric scene-cut detection thresholds on). Same narrow explode +
    * zip_with/aggregate shape as [[audioFramesOf]] — a real frame-delta
    * kernel would swap in behind the identical plumbing. */
  def motionDeltasOf(docs: DataFrame, win: Int = 64): DataFrame = {
    val sig = transform(
      filter(split(col("text"), ""), x => x =!= ""),
      c => (ascii(c) - lit(64)).cast("long"))
    docs.filter(col("doc_id") % 3 === 2) // the video/mp4 rows of mediaTable
      .select(col("doc_id"), sig.as("s"))
      .withColumn("n", size(col("s")))
      .filter(col("n") >= 2 * win) // need at least two full frames
      .withColumn("frame_idx",
        explode(sequence(lit(0), expr(s"CAST(n div $win - 2 AS INT)"))))
      .select(col("doc_id"), col("frame_idx"),
        aggregate(zip_with(
          slice(col("s"), col("frame_idx") * win + 1, lit(win)),
          slice(col("s"), (col("frame_idx") + 1) * win + 1, lit(win)),
          (a, b) => abs(b - a)), lit(0L), (acc, x) => acc + x).as("motion"))
  }

  def motionDeltas(spark: SparkSession, dir: String): DataFrame =
    motionDeltasOf(Tables.documents(spark, dir))

  /** Max hamming distance for a perceptual near-dup pair. With 4 chunk
    * blocks, pigeonhole makes the blocking LOSSLESS at this gate: ≤ 3
    * differing bits cannot touch all 4 chunks, so every qualifying pair
    * collides on at least one unchanged chunk. */
  val PhashMaxHamming = 3L

  /** Image near-dup pairs via a perceptual average-hash (aHash) — the
    * multimodal twin of the text SimHash dedup: each image-typed
    * payload's 4-bit raster downsamples into 64 stride cells, each cell
    * votes against the global mean for one hash bit, and pairs are
    * mined by 16-bit chunk blocking + an exact popcount filter at
    * hamming ≤ [[PhashMaxHamming]] (lossless by pigeonhole). The whole
    * pipeline is builtin higher-order functions — no UDF — and integer
    * floor arithmetic end to end, so the oracle replays every bit.
    *
    * Scale: hashing is one narrow pass; the only join carries (chunk id,
    * 16-bit value) postings, and the final rescore touches candidates
    * only — the same subquadratic shape as every other blocked
    * dedup arm. */
  def phashPairsOf(images: DataFrame): DataFrame = {
    val hashed = images
      .filter(length(col("text")) >= 64)
      .select(col("doc_id"),
        expr("transform(split(text, ''), c -> CAST(ascii(c) AS BIGINT) div 16)")
          .as("px"))
      .withColumn("stride", expr("CAST(size(px) div 64 AS INT)"))
      .withColumn("cells", expr(
        """transform(sequence(0, 63), j ->
          |  aggregate(slice(px, j * stride + 1, stride), 0L, (a, x) -> a + x)
          |    div stride)""".stripMargin))
      .withColumn("gmean", expr("aggregate(cells, 0L, (a, x) -> a + x) div 64"))
      .select(col("doc_id"), expr(
        """transform(sequence(0, 3), k ->
          |  aggregate(sequence(0, 15), 0L, (acc, j) ->
          |    acc + IF(element_at(cells, 16 * k + j + 1) > gmean,
          |             shiftleft(1L, j), 0L)))""".stripMargin).as("chunks"))
      .persist() // blocking reads it twice, rescore twice more
    val bk = hashed.select(col("doc_id"),
      posexplode(col("chunks")).as(Seq("k", "chunk")))
    val cand = bk.as("a")
      .join(bk.as("b"),
        col("a.k") === col("b.k") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(hashed.select(col("doc_id").as("doc_a"), col("chunks").as("ca")), "doc_a")
      .join(hashed.select(col("doc_id").as("doc_b"), col("chunks").as("cb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), expr(
        "aggregate(zip_with(ca, cb, (x, y) -> bit_count(x ^ y)), 0L, (a, x) -> a + x)")
        .as("hamming"))
      .filter(col("hamming") <= PhashMaxHamming)
  }

  def phashPairs(spark: SparkSession, dir: String): DataFrame =
    phashPairsOf(graft.Tables.documents(spark, dir)
      .filter(col("doc_id") % 3 === 0)) // the image-typed payloads

  // -------------------------------------------------------------------
  // Cross-modal retrieval: image features -> shared embedding space
  // -------------------------------------------------------------------

  /** Every [[CrossModalQueryStride]]-th image-typed doc is a cross-modal
    * query (composed with the `doc_id % 3 = 0` image assignment). */
  val CrossModalQueryStride = 60
  val CrossModalK = 5

  /** Query-side sample gate for the registered exhaustive parent: the
    * stride panel co-scales with the corpus, so the exact serve is
    * queries × corpus = Θ(n²) — 1,326.8 s at the 100× sweep, 27% of the
    * whole sweep on its own (VERDICT r17 #3). The
    * [[Dedup.sampleModFor]] ladder (the `dedup_embedding_pairs`
    * precedent, same constants) holds the sampled panel ~constant
    * instead: the modulus doubles per CORPUS doubling past the base, so
    * sampled-queries × corpus stays ~linear in the corpus. Membership is
    * the same pure integer hash threshold on doc_id
    * ([[Dedup.sampleGate]]) — portable verbatim to the oracle, stable
    * across runs, and NESTED across decades (a 100× sampled query doc
    * that exists at 10× is in the 10× sample too). Below the base the
    * modulus is 1: sf0.01 (500 vectors) and sf0.1 (2,000) run the
    * COMPLETE stride panel, so the correctness gate still checks the
    * unsampled serve, and each sampled query remains an EXACT full-
    * corpus top-k (sampling thins the panel, never a query's answer) —
    * the complete-gate role is intact where it is checkable. The
    * production serving shape stays [[crossModalTopKFixedQ]]. */
  private def crossModalSampleMod(corpus: DataFrame): Long =
    Dedup.sampleModFor(corpus.select("vec_id").count())

  /** Deterministic projection constant for (histogram bin j, embedding
    * dim d) — the "CLIP image tower" stub: a fixed pseudo-random
    * integer matrix in the same constant family as
    * [[Similarity.plane]], so the projection replays bit-for-bit in
    * any engine. A trained encoder swaps in behind the identical
    * pipeline shape (per-row matrix multiply + normalize). */
  def crossProj(j: Int, d: Int): Long = {
    val raw = (j + 1).toLong * (2654435761L % 100003L) * (d + 17) +
      j * 131L + d * 977L
    ((raw % 2001L) + 2001L) % 2001L - 1000L
  }

  /** Cross-modal top-k (the CLIP-retrieval serving shape): each query
    * image's decoded 16-bin nibble histogram (the [[codecFeatures]]
    * raster moments) projects into the 64-dim text-embedding space via
    * the fixed integer matrix [[crossProj]], is L2-normalized and
    * quantized by the SAME `quantize_vec` kernel as the text corpus,
    * and retrieves its top-k text vectors by exact integer dot —
    * completing the multimodal family from per-modality features to
    * cross-modal search.
    *
    * Scale shape: the query side is a tiny stride sample (broadcast);
    * the corpus is scanned once with a codegen'd dot per row and a
    * per-query windowed top-k — identical plan profile to
    * [[Similarity.bruteForceTopKOf]], and the same LSH/IVF bucketing
    * applies unchanged once the images share the corpus's vector space. */
  def crossModalTopKOf(imageDocs: DataFrame, corpus: DataFrame,
      k: Int = CrossModalK): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vExpr = (0 until 64).map { d =>
      (0 until 16).map(j =>
        s"element_at(hist, ${j + 1}) * (${crossProj(j, d)}L)").mkString(" + ")
    }.mkString("array(", ", ", ")")
    val queries = imageDocs
      .select(col("doc_id"), expr(
        "transform(filter(split(text, ''), c -> c <> ''), " +
          "c -> CAST(ascii(c) AS BIGINT) div 16)").as("px"))
      .select(col("doc_id"), expr(
        "transform(sequence(0, 15), " +
          "j -> CAST(size(filter(px, x -> x = j)) AS BIGINT))").as("hist"))
      .select(col("doc_id"), expr(vExpr).as("v"))
      .select(col("doc_id"),
        graft.functions.ArrayOps.quantize_vec(
          transform(col("v"), x => x.cast("double")), 10000).as("qv"))
    val corpusQ = corpus
      .select(col("vec_id"), Dedup.quantized(col("embedding")).as("q"))
      .transform(graft.scale.Scale.spread)
    val scored = corpusQ.crossJoin(broadcast(queries))
      .select(col("doc_id"), col("vec_id"),
        graft.functions.ArrayOps.dot_long(col("qv"), col("q")).as("dot"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("dot").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc_id", "vec_id", "dot", "rank")
  }

  def crossModalTopK(spark: SparkSession, dir: String,
      k: Int = CrossModalK): DataFrame = {
    val corpus = Tables.embeddings(spark, dir)
    // one bounded driver control fold (pruned vec_id count) feeds the
    // ladder; inlined as a literal so the gate is a plain codegen Filter
    val smod = crossModalSampleMod(corpus)
    crossModalTopKOf(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 3 === 0 &&
          col("doc_id") % CrossModalQueryStride === 0 &&
          Dedup.sampleGate(col("doc_id"), smod)),
      corpus, k)
  }

  /** Fixed-panel production twin of [[crossModalTopK]]: the first
    * [[graft.ml.Retrieval.FixedPanelSize]] query images only — constant
    * as the corpus grows, so the serve is panel × corpus (linear in the
    * corpus) where the proportional stride form co-scales queries with
    * the corpus (the 100× sweep's single largest row, 1345 s — an
    * exhaustive-gate shape, not a serving shape). Same fixture-size
    * constant as the sim/retrieval `_fixedq` family. */
  def crossModalTopKFixedQ(spark: SparkSession, dir: String,
      k: Int = CrossModalK): DataFrame =
    crossModalTopKOf(
      Tables.documents(spark, dir)
        .filter(col("doc_id") % 3 === 0 &&
          col("doc_id") % CrossModalQueryStride === 0 &&
          col("doc_id") <
            lit(Retrieval.FixedPanelSize.toLong * CrossModalQueryStride)),
      Tables.embeddings(spark, dir), k)

  /** Generated oracle for [[crossModalTopK]]: histogram, the inlined
    * projection matrix, the quantize_vec replay (sequential double sum,
    * round-half-away, zero-norm guard — the trainedCentroids oracle
    * convention), the windowed top-k, and the query-side sample ladder
    * (the `dedup_embedding_pairs` oracle's smod CTE + hash-threshold
    * gate, verbatim over the embeddings count). */
  private def crossModalOracle: String = crossModalOracleFor(
    s" AND (((doc_id % ${Dedup.EmbPairsSamplePrime})" +
      s" * ${Dedup.EmbPairsSampleMul} + ${Dedup.EmbPairsSampleAdd})" +
      s" % ${Dedup.EmbPairsSamplePrime}) * (SELECT m FROM smod)" +
      s" < ${Dedup.EmbPairsSamplePrime}")

  private def crossModalOracleFixedQ: String = crossModalOracleFor(
    s" AND doc_id < ${Retrieval.FixedPanelSize.toLong * CrossModalQueryStride}")

  private def crossModalOracleFor(extraPred: String): String = {
    val vExprs = (0 until 64).map { d =>
      (0 until 16).map(j => s"hist[${j + 1}] * (${crossProj(j, d)})")
        .mkString(" + ")
    }.mkString("[", ",\n         ", "]")
    s"""WITH smod AS (
       |  SELECT CAST(${Dedup.embSampleLadderSql} AS BIGINT) AS m
       |  FROM embeddings),
       |img AS (
       |  SELECT doc_id,
       |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
       |              ELSE list_transform(string_split(text, ''),
       |                                  c -> unicode(c)::BIGINT // 16)
       |         END AS px
       |  FROM documents
       |  WHERE doc_id % 3 = 0 AND doc_id % $CrossModalQueryStride = 0$extraPred),
       |h AS (
       |  SELECT doc_id,
       |         [CAST(len(list_filter(px, x -> x = j)) AS BIGINT)
       |          for j in range(0, 16)] AS hist
       |  FROM img),
       |v AS (
       |  SELECT doc_id,
       |         $vExprs AS v
       |  FROM h),
       |qi AS (
       |  SELECT doc_id,
       |         list_transform(v, x -> CASE WHEN norm = 0
       |           THEN CAST(0 AS BIGINT)
       |           ELSE CAST(round(CAST(x AS DOUBLE) / norm * 10000) AS BIGINT)
       |         END) AS qv
       |  FROM (SELECT doc_id, v,
       |          sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |            list_transform(v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
       |            (a, b) -> a + b)) AS norm
       |        FROM v)),
       |q AS (
       |  SELECT vec_id,
       |         list_transform(embedding, x -> CAST(round(
       |           CAST(x AS DOUBLE) / sqrt(list_reduce(list_prepend(0.0::DOUBLE,
       |             list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
       |             (a, b) -> a + b)) * 10000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |scored AS (
       |  SELECT qi.doc_id, q.vec_id,
       |         CAST(list_dot_product(qi.qv, q.qv) AS BIGINT) AS dot
       |  FROM qi CROSS JOIN q),
       |r AS (
       |  SELECT doc_id, vec_id, dot,
       |         row_number() OVER (PARTITION BY doc_id
       |                            ORDER BY dot DESC, vec_id ASC) AS rank
       |  FROM scored)
       |SELECT doc_id, vec_id, dot, CAST(rank AS INT) AS rank
       |FROM r WHERE rank <= $CrossModalK""".stripMargin
  }

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "multimodal_phash_pairs" -> ((s, d) => phashPairs(s, d)),
    "multimodal_features" -> ((s, d) => extractFeaturesFlat(s, d)),
    "multimodal_meta" -> ((s, d) => mediaMeta(s, d)),
    "multimodal_resize" -> ((s, d) => resizePlan(s, d)),
    "multimodal_frames" -> ((s, d) => frameSamples(s, d)),
    "multimodal_codec" -> ((s, d) => codecFeatures(s, d)),
    "multimodal_audio_frames" -> ((s, d) => audioFrames(s, d)),
    "multimodal_voice_segments" -> ((s, d) => voiceSegments(s, d)),
    "multimodal_motion" -> ((s, d) => motionDeltas(s, d)),
    "multimodal_crossmodal_topk" -> ((s, d) => crossModalTopK(s, d)),
    "multimodal_crossmodal_topk_fixedq" ->
      ((s, d) => crossModalTopKFixedQ(s, d)))

  // multimodal_features: the stub decode is integer arithmetic over the
  // UTF-8 payload bytes, and the corpus is ASCII (verified across all SFs),
  // so codepoints == bytes and DuckDB replays the whole decode per
  // codepoint — the same portable technique as the winnowing oracle. The
  // double-precision mean is computed once and reused for the variance
  // before the final float32 narrowing, mirroring decodeStub exactly.
  val oracles: Map[String, String] = Map(
    "multimodal_crossmodal_topk" -> crossModalOracle,
    "multimodal_crossmodal_topk_fixedq" -> crossModalOracleFixedQ,
    "multimodal_phash_pairs" ->
      """WITH img AS (
        |  SELECT doc_id,
        |         list_transform(string_split(text, ''),
        |                        c -> unicode(c)::BIGINT // 16) AS px
        |  FROM documents WHERE doc_id % 3 = 0 AND length(text) >= 64),
        |p AS (SELECT doc_id, px, CAST(len(px) // 64 AS INT) AS stride FROM img),
        |c AS (
        |  SELECT doc_id,
        |         [list_aggregate(px[j*stride+1 : (j+1)*stride], 'sum') // stride
        |          for j in range(0, 64)] AS cells
        |  FROM p),
        |g AS (
        |  SELECT doc_id, cells,
        |         list_aggregate(cells, 'sum') // 64 AS gmean
        |  FROM c),
        |h AS (
        |  SELECT doc_id,
        |         [list_aggregate([CASE WHEN cells[16*k+j+1] > gmean
        |                               THEN (1::BIGINT << j) ELSE 0::BIGINT END
        |                          for j in range(0, 16)], 'sum')
        |          for k in range(0, 4)] AS chunks
        |  FROM g),
        |bk AS (
        |  SELECT doc_id, k, chunks[k+1] AS chunk
        |  FROM h CROSS JOIN (SELECT unnest(range(0, 4)) AS k)),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM bk a JOIN bk b
        |    ON a.k = b.k AND a.chunk = b.chunk AND a.doc_id < b.doc_id),
        |sc AS (
        |  SELECT doc_a, doc_b,
        |         CAST(list_aggregate(
        |           [bit_count(xor(ha.chunks[i+1], hb.chunks[i+1]))::BIGINT
        |            for i in range(0, 4)], 'sum') AS BIGINT) AS hamming
        |  FROM cand
        |  JOIN h ha ON ha.doc_id = doc_a
        |  JOIN h hb ON hb.doc_id = doc_b)
        |SELECT doc_a, doc_b, hamming FROM sc WHERE hamming <= 3""".stripMargin,
    "multimodal_features" ->
      """WITH cps AS (
        |  SELECT doc_id,
        |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |              ELSE list_transform(string_split(text, ''),
        |                                  c -> unicode(c)::BIGINT)
        |         END AS cp
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, len(cp) AS n,
        |         coalesce(list_aggregate(cp, 'sum'), 0)::BIGINT AS s1,
        |         coalesce(list_aggregate(list_transform(cp, x -> x * x), 'sum'),
        |                  0)::BIGINT AS s2
        |  FROM cps),
        |m AS (
        |  SELECT doc_id, n, s1, s2,
        |         CASE WHEN n > 0 THEN CAST(s1 AS DOUBLE) / n
        |              ELSE 0.0::DOUBLE END AS mean_d
        |  FROM s)
        |SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(n AS INT) AS n_bytes,
        |       CAST(64 + n % 512 AS INT) AS width,
        |       CAST(64 + (n // 7) % 512 AS INT) AS height,
        |       CAST(n AS REAL) AS f_len,
        |       CAST(mean_d AS REAL) AS f_mean,
        |       CAST(CASE WHEN n > 0 THEN CAST(s2 AS DOUBLE) / n - mean_d * mean_d
        |            ELSE 0.0::DOUBLE END AS REAL) AS f_var,
        |       CAST(s1 % 1000000007 AS REAL) AS f_checksum
        |FROM m""".stripMargin,
    "multimodal_meta" ->
      """SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(64 + doc_id % 7 AS INT) AS frame_rate
        |FROM documents""".stripMargin,
    "multimodal_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |              WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |              ELSE 'video/mp4' END AS mime,
        |         octet_length(encode(text)) AS n
        |  FROM documents),
        |d AS (
        |  SELECT doc_id, mime,
        |         CAST(64 + n % 512 AS INT) AS width,
        |         CAST(64 + (n // 7) % 512 AS INT) AS height
        |  FROM m)
        |SELECT doc_id, mime, width, height,
        |       224.0::DOUBLE / CAST(greatest(width, height) AS DOUBLE) AS scale,
        |       CAST(floor(CAST(width AS DOUBLE) *
        |         (224.0::DOUBLE / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS out_w,
        |       CAST(floor(CAST(height AS DOUBLE) *
        |         (224.0::DOUBLE / CAST(greatest(width, height) AS DOUBLE))) AS INT) AS out_h
        |FROM d""".stripMargin,
    "multimodal_codec" ->
      """WITH cps AS (
        |  SELECT doc_id,
        |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |              ELSE list_transform(string_split(text, ''),
        |                                  c -> unicode(c)::BIGINT // 16)
        |         END AS px
        |  FROM documents)
        |SELECT doc_id,
        |       CASE WHEN doc_id % 3 = 0 THEN 'image/png'
        |            WHEN doc_id % 3 = 1 THEN 'audio/wav'
        |            ELSE 'video/mp4' END AS mime,
        |       CAST(len(px) AS INT) AS n_raw,
        |       CAST((len(px) + 1) // 2 AS INT) AS n_encoded,
        |       coalesce(list_aggregate(px, 'sum'), 0)::BIGINT AS px_sum,
        |       coalesce(list_aggregate(list_transform(px, x -> x * x), 'sum'),
        |                0)::BIGINT AS px_sumsq,
        |       CAST(len(list_filter(px, x -> x = 0)) AS BIGINT) AS h0,
        |       CAST(len(list_filter(px, x -> x = 1)) AS BIGINT) AS h1,
        |       CAST(len(list_filter(px, x -> x = 2)) AS BIGINT) AS h2,
        |       CAST(len(list_filter(px, x -> x = 3)) AS BIGINT) AS h3,
        |       CAST(len(list_filter(px, x -> x = 4)) AS BIGINT) AS h4,
        |       CAST(len(list_filter(px, x -> x = 5)) AS BIGINT) AS h5,
        |       CAST(len(list_filter(px, x -> x = 6)) AS BIGINT) AS h6,
        |       CAST(len(list_filter(px, x -> x = 7)) AS BIGINT) AS h7
        |FROM cps""".stripMargin,
    "multimodal_audio_frames" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |              ELSE list_transform(string_split(text, ''),
        |                                  c -> unicode(c)::BIGINT - 64) END AS s
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT doc_id, s,
        |         unnest(range(0, (len(s) - 64) // 32 + 1)) AS frame_idx
        |  FROM sig WHERE len(s) >= 64)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(list_reduce(list_prepend(0::BIGINT,
        |         list_transform(list_slice(s, frame_idx*32 + 1, frame_idx*32 + 64),
        |                        x -> x * x)), (a, b) -> a + b) AS BIGINT) AS energy,
        |       CAST(list_reduce(list_prepend(0::BIGINT,
        |         [CASE WHEN s[j] * s[j + 1] < 0 THEN 1::BIGINT ELSE 0::BIGINT END
        |          for j in range(frame_idx*32 + 1, frame_idx*32 + 64)]),
        |         (a, b) -> a + b) AS BIGINT) AS zero_crossings
        |FROM f""".stripMargin,
    // audio-frame CTE shared with multimodal_audio_frames; threshold
    // and islands replayed with the same integer mean and window trick
    "multimodal_voice_segments" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |              ELSE list_transform(string_split(text, ''),
        |                                  c -> unicode(c)::BIGINT - 64) END AS s
        |  FROM documents WHERE doc_id % 3 = 1),
        |f AS (
        |  SELECT doc_id, s,
        |         unnest(range(0, (len(s) - 64) // 32 + 1)) AS frame_idx
        |  FROM sig WHERE len(s) >= 64),
        |af AS (
        |  SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |         CAST(list_reduce(list_prepend(0::BIGINT,
        |           list_transform(list_slice(s, frame_idx*32 + 1, frame_idx*32 + 64),
        |                          x -> x * x)), (a, b) -> a + b) AS BIGINT)
        |           AS energy
        |  FROM f),
        |t AS (SELECT doc_id, CAST(sum(energy) // count(*) AS BIGINT) AS thr
        |      FROM af GROUP BY 1),
        |a AS (SELECT af.doc_id, af.frame_idx, af.energy
        |      FROM af JOIN t USING (doc_id) WHERE energy >= thr),
        |g AS (
        |  SELECT doc_id, frame_idx, energy,
        |         frame_idx - row_number() OVER (PARTITION BY doc_id
        |                                        ORDER BY frame_idx) AS grp
        |  FROM a)
        |SELECT doc_id, CAST(min(frame_idx) AS INT) AS seg_start,
        |       CAST(max(frame_idx) AS INT) AS seg_end,
        |       CAST(count(*) AS BIGINT) AS n_frames,
        |       CAST(sum(energy) AS BIGINT) AS seg_energy
        |FROM g GROUP BY doc_id, grp""".stripMargin,
    "multimodal_motion" ->
      """WITH sig AS (
        |  SELECT doc_id,
        |         CASE WHEN text = '' THEN CAST([] AS BIGINT[])
        |              ELSE list_transform(string_split(text, ''),
        |                                  c -> unicode(c)::BIGINT - 64) END AS s
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, s,
        |         unnest(range(0, len(s) // 64 - 1)) AS frame_idx
        |  FROM sig WHERE len(s) >= 128)
        |SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
        |       CAST(list_reduce(list_prepend(0::BIGINT,
        |         [abs(s[j + 64] - s[j])
        |          for j in range(frame_idx*64 + 1, frame_idx*64 + 65)]),
        |         (a, b) -> a + b) AS BIGINT) AS motion
        |FROM f""".stripMargin,
    "multimodal_frames" ->
      """WITH v AS (
        |  SELECT doc_id,
        |         CAST(octet_length(encode(text)) AS DOUBLE) / 1000.0::DOUBLE
        |           AS duration_s
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (SELECT CAST(i AS INT) AS frame_idx FROM range(5) t(i))
        |SELECT doc_id, duration_s, frame_idx,
        |       CAST(frame_idx AS DOUBLE) * duration_s / 5 AS offset_s
        |FROM v CROSS JOIN f""".stripMargin)
}
