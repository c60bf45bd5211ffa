package graft.ml

import graft.SparkSpec

/** Two-phase exact retrieval (TextRetrievalOps): the pruned top-k must
  * equal brute force, proximity must actually rerank, and the audit must
  * show the expensive phase touching far fewer docs than the candidate
  * set. The registered queries are oracle-checked against a BRUTE-FORCE
  * DuckDB ranking — the hash match is the losslessness proof at driver
  * scale; these specs pin the same property on crafted corpora where the
  * pruning is adversarially relevant. */
class ProxRerankSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("dup", "vector", "window")

  // 40 weak docs holding a single common term amid filler, plus strong
  // docs with several query terms at varying distances. Filler tokens
  // vary per doc so lengths differ a little.
  private def corpus = {
    val weak = (0 until 40).map { i =>
      (100L + i, s"vector ${("filler " * (3 + i % 5)).trim} alpha beta")
    }
    val strong = Seq(
      (1L, "dup vector window tail tail tail"),          // all adjacent
      (2L, "dup x x vector x x window tail tail tail"),  // spread
      (3L, "dup dup dup tail tail vector tail window"),  // high tf, far
      (4L, "window only here with tail tail tail tail")  // single term
    )
    (weak ++ strong).toDF("doc_id", "text")
  }

  test("pruned top-k equals brute force (k larger than the candidate set)") {
    val k = 5
    val pruned = TextOps.proxRerankTopkOf(corpus, terms, k)
      .collect().map(_.toSeq).toSeq
    // brute force: with k >= |candidates| the seed covers every doc, so
    // nothing is pruned and the ranking is exhaustive by construction
    val brute = TextOps.proxRerankTopkOf(corpus, terms, 1000)
      .collect().map(_.toSeq).toSeq
    assert(brute.size == 44, s"expected all 44 candidates, got ${brute.size}")
    assert(pruned == brute.take(k),
      s"pruned ranking diverged:\n$pruned\nvs brute prefix:\n${brute.take(k)}")
  }

  test("proximity reranks equal-BM25 docs and caps at 1000 milli") {
    val rows = TextOps.proxRerankTopkOf(corpus, terms, 10).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1 (adjacent) must get the capped bonus; doc 2 (distance 3)
    // gets 2000 div 4 = 500; single-term doc 4 gets 0
    assert(rows(1L)._2 == 1000L, s"adjacent bonus: ${rows(1L)}")
    assert(rows(2L)._2 == 500L, s"spread bonus: ${rows(2L)}")
    assert(rows.get(4L).forall(_._2 == 0L))
    // docs 1 and 2 share n_terms and near-equal BM25 structure only if
    // lengths matched — instead pin the ORDER property directly: among
    // docs with the same bm25_milli, higher bonus ranks first
    val ranked = TextOps.proxRerankTopkOf(corpus, terms, 44).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    val full = ranked.map(_._4)
    assert(full.sameElements(full.sortBy(-(_: Long))), "not sorted by full")
  }

  test("audit: expensive phase touches ~k docs, not the candidate set") {
    val a = TextOps.proxRerankAuditOf(corpus, terms, 5).head()
    val (nDocs, nCand, nSurv) =
      (a.getLong(0), a.getLong(1), a.getLong(2))
    assert(nDocs == 44L)
    assert(nCand == 44L) // every doc holds >= 1 query term here
    assert(nSurv >= 5L, s"survivors must cover the top-k: $nSurv")
    // the 40 weak docs share one common term and low tf: their ub
    // (bm25 + 0 single-term bonus... they have 1 term -> ub = bm25)
    // cannot reach the 3-term seeds' full scores
    // measured 12 on this corpus: the top-k seeds plus the few weak
    // docs whose single-term BM25 clears the weakest seed's full score
    assert(nSurv <= 15L,
      s"pruning failed: $nSurv of $nCand candidates fully scored")
  }

  test("panel form: each query's rows equal its single-query run over " +
      "one shared postings scan") {
    val panel = Seq(
      1L -> Seq("dup", "vector", "window"),
      2L -> Seq("vector", "alpha"),
      3L -> Seq("filler", "beta", "dup"))
    val got = TextOps.proxRerankPanelTopkOf(corpus, panel, k = 6)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.toSeq.drop(1)).toSeq).toMap
    for ((qid, terms) <- panel) {
      val single = TextOps.proxRerankTopkOf(corpus, terms, k = 6)
        .collect().map(_.toSeq).toSeq
      assert(got.getOrElse(qid, Seq.empty) == single,
        s"query $qid diverged from its single-query run")
    }
    spark.catalog.clearCache() // panel form caches its candidate table
  }

  test("empty corpus: empty top-k, zeroed audit with null theta") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(TextOps.proxRerankTopkOf(empty, terms).count() == 0L)
    val a = TextOps.proxRerankAuditOf(empty, terms).head()
    assert(a.getLong(0) == 0L && a.getLong(1) == 0L)
    // n_survivors is 0 (not NULL) so the plan agrees with the oracle's
    // count(*) on empty input; theta (min over zero rows) stays NULL
    assert(a.getLong(2) == 0L && a.isNullAt(3))
  }

  test("single-term corpus: no pair exists, bonuses are all zero, " +
      "ranking is pure BM25") {
    val docs = (0 until 8)
      .map(i => (i.toLong, s"vector ${("pad " * (i + 1)).trim}"))
      .toDF("doc_id", "text")
    val rows = TextOps.proxRerankTopkOf(docs, terms, 8).collect()
    assert(rows.length == 8)
    assert(rows.forall(_.getLong(3) == 0L), "no doc can earn a bonus")
    // shorter docs score higher on the same tf (BM25 length norm)
    val ids = rows.map(_.getLong(0)).toSeq
    assert(ids == ids.sorted, s"BM25 length-norm order violated: $ids")
  }
}
