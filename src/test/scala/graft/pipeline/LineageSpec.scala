package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LineageSpec extends SparkSpec {

  test("training-corpus flagship: manifest conserves the gated survivors") {
    val docs = graft.Tables.documents(spark, sf)
    val manifest = Lineage.trainingCorpus(spark, sf).collect()
    assert(manifest.nonEmpty)
    assert(manifest.map(_.getAs[String]("split")).toSet
      .subsetOf(Set("train", "val", "test")))
    assert(manifest.map(_.getAs[String]("source")).toSet ==
      docs.select("source").distinct().collect()
        .map(_.getString(0)).toSet)
    // the gate + dedup only ever drop documents
    val kept = manifest.map(_.getAs[Long]("n_docs")).sum
    assert(kept > 0 && kept <= docs.count())
    // token totals are the sum over kept docs, so every manifest row
    // carries at least 10 tokens per doc (the gate's floor)
    manifest.foreach(r =>
      assert(r.getAs[Long]("n_tokens") >= 10 * r.getAs[Long]("n_docs")))
  }

  test("curation flagship equals a driver-side reference pipeline on a " +
    "crafted corpus with planted duplicates and contamination") {
    import spark.implicits._
    // benchmark slice = ids % 97 == 0 (0 and 97 here); the rest is corpus.
    // Planted: an exact-dup pair (21/22), a near-dup of benchmark doc 0
    // (id 5), a too-short doc (id 7), and clean filler.
    // token lengths sit inside the gate's [3, 10] mean-length band
    val bench = (1 to 20).map("ben" + _).mkString(" ")
    val nearBench = (1 to 20).map(i => if (i == 10) "qqqq" else "ben" + i)
      .mkString(" ")
    val dupText = (1 to 15).map("dup" + _).mkString(" ")
    val corpus = Seq(
      (0L, bench), (97L, (1 to 12).map("cor" + _).mkString(" ")),
      (5L, nearBench),                       // contaminated -> dropped
      (21L, dupText), (22L, dupText),        // exact dups -> one survivor
      (7L, "too short"),                     // gated out (< 10 tokens)
      (30L, (1 to 11).map("eee" + _).mkString(" ")),
      (31L, (1 to 13).map("fff" + _).mkString(" ")),
      (32L, (1 to 14).map("ggg" + _).mkString(" ")))
    val docs = corpus.map { case (id, t) => (id, t, "src") }
      .toDF("doc_id", "text", "source")
    val got = Lineage.curationFlagshipOf(docs, budget = 16, shards = 2)
      .collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_bins"))).toMap
    spark.catalog.clearCache()
    // independent driver-side reference of all five stages
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    def sh3(t: String) = { val tk = toks(t)
      if (tk.length >= 3) tk.sliding(3).map(_.mkString(" ")).toSet
      else Set.empty[String] }
    val evalSh = corpus.filter(_._1 % 97 == 0).flatMap(d => sh3(d._2)).toSet
    val gated = corpus.filter(_._1 % 97 != 0).filter { case (_, t) =>
      val tk = toks(t); val n = tk.length.toLong
      val s = tk.map(_.length).sum.toLong
      n >= 10 && s >= 3 * n && s <= 10 * n }
    val survivors = gated.groupBy(_._2).map(_._2.minBy(_._1)).toSeq
    val clean = survivors.filterNot { case (_, t) =>
      val s = sh3(t); val shared = s.intersect(evalSh).size
      shared >= 1 && 2 * shared >= s.size }
    val expected = clean
      .map { case (id, t) =>
        val b = (id * 48271L) % 100000L % 100L
        val split = if (b < 80) "train" else if (b < 90) "val" else "test"
        (id, toks(t).length.toLong, split, id % 2) }
      .groupBy { case (_, _, split, shard) => (split, shard) }
      .map { case (k, ds) =>
        val sorted = ds.sortBy(_._1)
        val cums = sorted.scanLeft(0L)(_ + _._2).init // cum BEFORE each doc
        val bins = cums.map(_ / 16L)
        k -> (sorted.size.toLong, sorted.map(_._2).sum, bins.max + 1L) }
    assert(got == expected, s"got $got\nexpected $expected")
    // the planted semantics actually bit: 5 dropped as contaminated,
    // 21/22 collapsed, 7 gated out
    val keptDocs = got.values.map(_._1).sum
    assert(keptDocs == 4, s"expected 4 clean survivors, got $keptDocs")
  }

  test("reverse-kNN counts: complete over the corpus, edges conserved") {
    val emb = graft.Tables.embeddings(spark, sf)
    val counts = graft.ml.Dedup.reverseKnnCounts(spark, sf)
    assert(counts.count() == emb.count()) // every vector has a row
    val edgeTotal = graft.ml.Dedup.embeddingKnnGraph(spark, sf).count()
    spark.catalog.clearCache()
    assert(counts.agg(sum("n_referrers")).head.getLong(0) == edgeTotal)
    spark.catalog.clearCache()
  }
}
