package graft.ml

import graft.SparkSpec

/** The multimodal pipeline's plumbing is real (binary column, typed
  * partition-batched map); only the codec is stubbed. These tests pin the
  * stub's determinism and the end-to-end schema/row contract. */
class MultimodalSpec extends SparkSpec {

  test("decodeStub is a deterministic pure function of the bytes") {
    val r = Multimodal.MediaRecord(7L, "hello world".getBytes("UTF-8"), "image/png")
    val a = Multimodal.decodeStub(r)
    val b = Multimodal.decodeStub(r)
    assert(a.n_bytes == 11)
    assert(a.features.toSeq == b.features.toSeq)
    assert(a.width == b.width && a.height == b.height)
    assert(a.features.length == 4)
  }

  test("feature extraction runs end-to-end over the media table") {
    val feats = Multimodal.extractFeatures(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf).count()
    assert(feats.length == docs)
    feats.foreach { r =>
      assert(r.getAs[Int]("n_bytes") > 0)
      assert(Seq("image/png", "audio/wav", "video/mp4")
        .contains(r.getAs[String]("mime")))
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 4)
    }
  }

  test("n_bytes equals the UTF-8 byte length of the source text") {
    import org.apache.spark.sql.functions._
    val joined = Multimodal.extractFeatures(spark, sf)
      .join(graft.Tables.documents(spark, sf), "doc_id")
      .select(col("n_bytes"), octet_length(col("text")).as("expected"))
      .collect()
    joined.foreach(r => assert(r.getAs[Int]("n_bytes") == r.getAs[Int]("expected")))
  }

  test("nibble codec: pack halves the bytes, unpack restores every " +
      "quantized pixel, odd lengths pad") {
    for (s <- Seq("", "a", "ab", "abc", "hello world", " test")) {
      val bytes = s.getBytes("UTF-8")
      val packed = Multimodal.packNibbles(bytes)
      assert(packed.length == (bytes.length + 1) / 2)
      val px = Multimodal.unpackNibbles(packed, bytes.length)
      assert(px.toSeq == bytes.toSeq.map(b => (b & 0xff) >> 4))
    }
  }

  test("audio frames: frame arithmetic, energy and zero-crossings on " +
      "crafted signals") {
    import spark.implicits._
    val sAlt = "A?" * 32   // 'A'=65 -> +1, '?'=63 -> -1: alternating signal
    val sFlat = "@" * 96   // '@'=64 -> 0: silence
    val docs = Seq((1L, sAlt), (4L, sFlat), (7L, "short"))
      .toDF("doc_id", "text")
    val out = Multimodal.audioFramesOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")) ->
        ((r.getAs[Long]("energy"), r.getAs[Long]("zero_crossings")))).toMap
    // 64-sample alternating frame: energy 64x1, every adjacent pair crosses
    assert(out((1L, 0)) == ((64L, 63L)))
    // 96 zero samples -> exactly two hop-32 frames of silence
    assert(out((4L, 0)) == ((0L, 0L)) && out((4L, 1)) == ((0L, 0L)))
    // sub-window doc contributes no frames; nothing else leaks in
    assert(out.size == 3)
  }

  test("voice segments tile the active frames exactly: threshold, " +
    "coverage, energy conservation") {
    val frames = Multimodal.audioFrames(spark, sf)
      .collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Int]("frame_idx"), r.getAs[Long]("energy")))
    val byDoc = frames.groupBy(_._1)
    val active = byDoc.toSeq.flatMap { case (_, fs) =>
      val thr = fs.map(_._3).sum / fs.length
      fs.filter(_._3 >= thr).toSeq
    }
    val segs = Multimodal.voiceSegments(spark, sf).collect()
    // every segment is a maximal run of active frames; together they
    // cover the active set exactly and conserve its energy
    val activeSet = active.map(a => (a._1, a._2)).toSet
    var covered = 0L
    segs.foreach { s =>
      val doc = s.getAs[Long]("doc_id")
      val (a, b) = (s.getAs[Int]("seg_start"), s.getAs[Int]("seg_end"))
      assert(s.getAs[Long]("n_frames") == b - a + 1L)
      (a to b).foreach(i => assert(activeSet((doc, i)), s"$doc/$i inactive"))
      // maximality: the frames just outside are NOT active
      assert(!activeSet((doc, a - 1)) && !activeSet((doc, b + 1)))
      covered += b - a + 1L
    }
    assert(covered == activeSet.size.toLong)
    assert(segs.map(_.getAs[Long]("seg_energy")).sum == active.map(_._3).sum)
  }

  test("motion deltas: zero between identical frames, exact sum on a " +
      "crafted cut") {
    import spark.implicits._
    // doc 2 (video): frame0 = 64x'@' (zeros), frame1 = 64x'A' (ones),
    // frame2 = 64x'A' -> motion(0)=64, motion(1)=0
    val cut = "@" * 64 + "A" * 64 + "A" * 64
    val docs = Seq((2L, cut), (5L, "@" * 100), (8L, "x")).toDF("doc_id", "text")
    val out = Multimodal.motionDeltasOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("frame_idx")) ->
        r.getAs[Long]("motion")).toMap
    assert(out == Map((2L, 0) -> 64L, (2L, 1) -> 0L)) // <2 frames -> no rows
  }

  test("codec stats: histogram totals the pixels, moments match a direct pass") {
    val rows = Multimodal.codecFeatures(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Int]("n_raw")
      assert(r.getAs[Int]("n_encoded") == (n + 1) / 2)
      val histSum = (0 to 7).map(k => r.getAs[Long](s"h$k")).sum
      assert(histSum == n) // ASCII corpus: every pixel lands in bins 0-7
      // moments are consistent with the histogram
      val s = (0 to 7).map(k => k.toLong * r.getAs[Long](s"h$k")).sum
      val s2 = (0 to 7).map(k => k.toLong * k * r.getAs[Long](s"h$k")).sum
      assert(r.getAs[Long]("px_sum") == s && r.getAs[Long]("px_sumsq") == s2)
    }
  }

  test("perceptual hash: perturbed raster pairs found, distinct rasters not") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 256-pixel "images": A and B differ in ONE pixel (hamming 0 or 1
    // after 4:1 downsampling); C is structurally different
    val a = (0 until 256).map(i => if ((i / 8) % 2 == 0) 'x' else ' ').mkString
    val b = a.updated(3, 'y')
    val c = (0 until 256).map(i => if ((i / 3) % 5 == 0) 'x' else ' ').mkString
    val docs = Seq((10L, a), (11L, b), (12L, c)).toDF("doc_id", "text")
    val pairs = Multimodal.phashPairsOf(docs).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("hamming")))
    assert(pairs.exists { case (x, y, h) =>
      x == 10L && y == 11L && h <= Multimodal.PhashMaxHamming })
    assert(!pairs.exists { case (x, y, _) => x == 12L || y == 12L })
    spark.catalog.clearCache() // phashPairsOf persists the hash table
  }

  test("cross-modal top-k: k ranked text vectors per image query; the " +
    "top-1 dot is the corpus max; empty images degrade to zero vectors") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val out = Multimodal.crossModalTopK(spark, sf).collect()
    val byQ = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      assert(rs.length == Multimodal.CrossModalK, s"query $q")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq ==
        (1 to Multimodal.CrossModalK))
      val dots = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("dot"))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
    }
    // results live in the corpus id space
    val corpusIds = graft.Tables.embeddings(spark, sf)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(out.forall(r => corpusIds(r.getAs[Long]("vec_id"))))
    // an empty-text image projects to the zero vector: still k rows,
    // all dots exactly 0, ranked by the vec_id tie-break
    val zero = Multimodal.crossModalTopKOf(
      Seq((0L, "")).toDF("doc_id", "text"),
      graft.Tables.embeddings(spark, sf), k = 3).collect()
    assert(zero.length == 3 && zero.forall(_.getAs[Long]("dot") == 0L))
  }
}
