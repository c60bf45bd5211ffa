package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("source cap: two-phase salted top-N equals the plain one-window form") {
    // skewed: one hot source with 60 docs, two small ones
    val docs = ((1 to 60).map(i => (i.toLong, "hot", s"d$i")) ++
      (61 to 70).map(i => (i.toLong, "small_a", s"d$i")) ++
      Seq((71L, "small_b", "d71"))).toDF("doc_id", "source", "text")
    val plain = {
      val w = Window.partitionBy(col("source"))
        .orderBy(((col("doc_id") * 48271) % 100000).asc, col("doc_id").asc)
      docs.withColumn("pick_rank", row_number().over(w))
        .filter(col("pick_rank") <= Curation.CapPerSource)
        .select("doc_id", "source", "pick_rank")
    }
    val capped = Curation.sourceCapOf(docs)
    assert(capped.collect().toSet === plain.collect().toSet)
    // the cap binds on the hot source and not on the small ones
    val bySrc = capped.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(bySrc("hot") == Curation.CapPerSource.toLong)
    assert(bySrc("small_a") == 10L && bySrc("small_b") == 1L)
  }

  test("source cap keeps a hash-ordered prefix, not a doc_id-ordered one") {
    val docs = (1 to 40).map(i => (i.toLong, "s", s"d$i"))
      .toDF("doc_id", "source", "text")
    val kept = Curation.sourceCapOf(docs, cap = 5)
      .select("doc_id").as[Long].collect().toSet
    // hash order must differ from plain id order for the sample claim
    assert(kept != (1L to 5L).toSet)
    val expect = (1 to 40).map(i => i.toLong -> (i.toLong * 48271 % 100000))
      .sortBy { case (id, h) => (h, id) }.take(5).map(_._1).toSet
    assert(kept === expect)
  }

  test("dataset card: crafted corpus summarized exactly in one row") {
    // 4 docs: two sources, two langs, one exact dup pair, one short doc
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "web", 16L),
      (2L, "alpha beta gamma", "en", "web", 16L),      // exact dup of 1
      (3L, ("tok " * 60).trim, "fr", "books", 239L),   // 60 tokens: not short
      (4L, "solo", "fr", "web", 4L))                   // 1 token: short
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.datasetCardOf(docs).head()
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_sources") == 2L)
    assert(r.getAs[Long]("n_langs") == 2L)
    assert(r.getAs[Long]("total_chars") == 275L)
    assert(r.getAs[Long]("total_tokens") == 3L + 3L + 60L + 1L)
    assert(r.getAs[Long]("n_exact_dup_docs") == 1L)
    assert(r.getAs[Long]("n_short_docs") == 3L) // 3+3+1 token docs < 50
    assert(r.getAs[Long]("mean_tokens_milli") == 67L * 1000 / 4)
    assert(r.getAs[Long]("short_docs_milli") == 750L)
  }

  test("exact overlap matrix counts within- and cross-source dup pairs") {
    // "x": 3 copies in A (3 within-pairs), 2 in B (1 within, 6 cross)
    // "y": 1 copy each in A and C (1 cross pair); "z": unique
    val docs = Seq(
      (1L, "A", "x"), (2L, "A", "x"), (3L, "A", "x"),
      (4L, "B", "x"), (5L, "B", "x"),
      (6L, "A", "y"), (7L, "C", "y"),
      (8L, "C", "z")).toDF("doc_id", "source", "text")
    val m = Curation.sourceOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getAs[Long]("n_pairs"), r.getAs[Long]("n_groups")))).toMap
    assert(m(("A", "A")) == ((3L, 1L))) // C(3,2)
    assert(m(("B", "B")) == ((1L, 1L)))
    assert(m(("A", "B")) == ((6L, 1L))) // 3 * 2
    assert(m(("A", "C")) == ((1L, 1L)))
    assert(!m.contains(("C", "C"))) // singletons contribute nothing
  }

  test("near overlap matrix maps jaccard pairs onto ordered source pairs") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, "B", base), (2L, "A", base + " tail"), // cross near-dup pair
      (3L, "C", (40 to 80).map(i => s"z$i").mkString(" "))) // unrelated
      .toDF("doc_id", "source", "text")
    val m = Curation.nearOverlapOf(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_pairs"))
      .toMap
    assert(m == Map(("A", "B") -> 1L)) // least/greatest orders the key
  }
}
