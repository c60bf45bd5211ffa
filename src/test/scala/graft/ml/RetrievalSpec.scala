package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // doc 0 is the query (0 % 200 == 0); 1 matches all three terms, 2 one,
  // 3 none. "the" is a stopword and must not become a query keyword.
  private def docs = Seq(
    (0L, "the alpha beta gamma"),
    (1L, "alpha beta gamma"),
    (2L, "alpha junk1 junk2 junk3"),
    (3L, "junk4 junk5 junk6")).toDF("doc_id", "text")

  // cosine order vs query (1,0,0,0): doc1 > doc2 > doc3
  private def embs = Seq(
    (0L, Array(1f, 0f, 0f, 0f)),
    (1L, Array(1f, 1f, 0f, 0f)),
    (2L, Array(1f, 2f, 0f, 0f)),
    (3L, Array(0f, 1f, 0f, 0f))).toDF("vec_id", "embedding")

  test("query keywords: tf desc / df asc / token asc, stopwords out") {
    val kw = Retrieval.queryKeywordsOf(Retrieval.tokenizedOf(docs))
      .orderBy("token").as[(Long, String)].collect()
    // all tf=1; df: alpha=3, beta=2, gamma=2 -> beta, gamma, alpha all kept
    assert(kw.toSeq == Seq((0L, "alpha"), (0L, "beta"), (0L, "gamma")))
  }

  test("rrf fusion: both-arm docs sum reciprocal ranks, one-arm docs don't") {
    val out = Retrieval.hybridRrfOf(docs, embs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((Option(r.getAs[Integer]("lex_rank")).map(_.toInt),
          Option(r.getAs[Integer]("sem_rank")).map(_.toInt),
          r.getAs[Long]("rrf_milli"), r.getAs[Int]("rank")))).toMap
    // doc1: lex 1 + sem 1 -> 2 * (1000000 div 61)
    assert(out(1L) == ((Some(1), Some(1), 2L * (1000000L / 61), 1)))
    // doc2: lex 2 + sem 2
    assert(out(2L) == ((Some(2), Some(2), 2L * (1000000L / 62), 2)))
    // doc3: semantic arm only; lexical rank is null, contributes 0
    assert(out(3L) == ((None, Some(3), 1000000L / 63, 3)))
    assert(out.size == 3) // the query doc never retrieves itself
  }

  test("hybrid output is exactly k rows per query when candidates suffice") {
    val many = (0L to 24L).map(i =>
      (i, if (i == 0) "alpha beta gamma" else s"alpha filler$i"))
      .toDF("doc_id", "text")
    val manyEmb = (0L to 24L).map(i =>
      (i, Array(1f, i.toFloat / 25f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Retrieval.hybridRrfOf(many, manyEmb, k = 10)
    assert(out.count() == 10)
    assert(out.select(max("rank")).as[Int].head() == 10)
  }
}
