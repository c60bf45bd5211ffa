package graft.ml

import graft.SparkSpec

/** E2E RAG-serving flagship (RagFlagship.ragServeOf): the composed
  * pipeline's semantics on planted fixtures — both arms reach the fused
  * pool, the query never retrieves itself, RRF decides the first pick,
  * and MMR actually diversifies (an embedding near-duplicate of the
  * first pick is demoted below a diverse lower-RRF document). The
  * registered query is hash-checked against the brute-force composed
  * oracle; these pin the properties the hash can't name. */
class RagServingSpec extends SparkSpec {
  import spark.implicits._

  private val dims = 8
  private def unit(d: Int, scale: Float = 1f): Array[Float] = {
    val a = Array.fill(dims)(0f); a(d) = scale; a
  }

  // doc 0 is the query ("alpha beta gamma" after the stopword drops).
  // 1, 2: strong lexical matches; 5: NO query terms (semantic-only
  // path); 3, 4: weak lexical.
  private def docs = Seq(
    (0L, "the alpha beta gamma"),
    (1L, "alpha beta gamma tail tail"),
    (2L, "alpha beta gamma tail tail"),
    (3L, "alpha junk1 junk2 junk3 junk4"),
    (4L, "beta junk5 junk6 junk7 junk8"),
    (5L, "junk9 junk10 junk11 junk12")).toDF("doc_id", "text")

  // query = e0. docs 1 and 2 are embedding NEAR-DUPLICATES of each
  // other and of the query direction; 3, 4, 5 are mutually diverse.
  // doc 5 shares no token with the query, so only the semantic arm can
  // seat it (rank by dot then vec_id still places every corpus doc
  // inside the 50-deep arm).
  private def embs = Seq(
    (0L, unit(0)),
    (1L, unit(0)),
    (2L, unit(0)),
    (3L, unit(1)),
    (4L, unit(2)),
    (5L, unit(3, 2f))).toDF("vec_id", "embedding")

  // lazy val: the five-stage pipeline runs ONCE for the three tests
  // that read it (a def re-built and re-collected it per test)
  private lazy val served = RagFlagship.ragServeOf(docs, embs).collect()
    .map(r => (r.getAs[Int]("sel_rank"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("rrf_milli"), r.getAs[Long]("mmr")))
    .sortBy(_._1)

  test("every corpus doc is served except the query itself; sel_rank " +
      "is dense from 1") {
    val out = served
    assert(out.map(_._2).toSet == Set(1L, 2L, 3L, 4L, 5L))
    assert(out.map(_._1).toSeq == (1 to 5))
    spark.catalog.clearCache()
  }

  test("the first pick is the RRF argmax and MMR demotes the near-" +
      "duplicate below diverse documents") {
    val out = served
    val byDoc = out.map(t => t._2 -> t).toMap
    // docs 1 and 2 tie on both arms' scores; doc 1 wins every rank
    // tie-break, so it holds the top RRF and is picked first
    assert(out.head._2 == 1L, s"first pick: ${out.head}")
    assert(byDoc(1L)._3 >= out.map(_._3).max)
    // doc 2 has the second-best RRF but is an embedding near-duplicate
    // of pick 1 - MMR must seat BOTH diverse docs (3, 4) and the
    // semantic-only doc 5 ahead of it
    assert(byDoc(2L)._1 == 5,
      s"near-duplicate must be seated last: $out")
    // and its mmr score carries the similarity penalty (negative:
    // 0.7*rel < 0.3*selfsim for unit vectors)
    assert(byDoc(2L)._4 < 0L)
    spark.catalog.clearCache()
  }

  test("both arms feed the pool: a doc with no query terms arrives " +
      "through the semantic arm") {
    val out = served
    // doc 5 shares zero tokens with the query; only cosine can seat it
    assert(out.exists(_._2 == 5L), s"semantic-only doc missing: $out")
    spark.catalog.clearCache()
  }

  test("k caps the output when the pool is deeper than k") {
    val many = (0L to 39L).map(i =>
      (i, if (i == 0L) "alpha beta gamma" else s"alpha filler$i"))
      .toDF("doc_id", "text")
    val manyEmb = (0L to 39L).map { i =>
      val a = Array.fill(dims)(0f); a(0) = 1f; a((i % 7 + 1).toInt) = i / 40f
      (i, a)
    }.toDF("vec_id", "embedding")
    val out = RagFlagship.ragServeOf(many, manyEmb).collect()
    assert(out.length == Similarity.MmrK)
    assert(out.map(_.getAs[Int]("sel_rank")).toSet == (1 to 10).toSet)
    spark.catalog.clearCache()
  }
}
