package graft.ml

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Empty-input robustness of the library forms that run driver-folded
  * actions: at 100 TB an empty tenant/partition/filter result is
  * routine, and a library operator must return its empty (or zero)
  * shape — never throw from a head() on nothing or an ANSI division
  * by zero. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val noVecs = Seq.empty[(Long, Array[Float])]
    .toDF("vec_id", "embedding")

  test("power iteration on an empty corpus returns the empty report") {
    val out = Similarity.topDirectionOf(noVecs)
    assert(out.columns.toSeq == Seq("dim", "w_raw", "v_milli"))
    assert(out.count() == 0L)
  }

  test("k-center coreset: empty corpus is empty; k beyond the corpus " +
    "stops at n distinct centers instead of duplicating") {
    assert(Similarity.kcenterCoresetOf(noVecs).count() == 0L)
    val two = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterCoresetOf(two, k = 5).collect()
    assert(got.map(_.getAs[Long]("center_id")).toSeq.sorted == Seq(1L, 2L))
    assert(got.length == 2)
  }

  test("recall report: empty truth and detector yield the all-zeros row") {
    val empty = Seq.empty[(Long, Long)].toDF("query_id", "vec_id")
    val r = Similarity.recallReportOf(empty, empty).head()
    assert(r.getAs[Long]("n_queries") == 0L)
    assert(r.getAs[Long]("n_truth") == 0L)
    assert(r.getAs[Long]("n_detected") == 0L)
    assert(r.getAs[Long]("n_hits") == 0L)
    assert(r.isNullAt(r.fieldIndex("recall_milli")))
  }

  test("recall report library form agrees with exact set counts on " +
    "crafted frames") {
    val truth = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "vec_id")
    val det = Seq((1L, 10L), (1L, 99L), (2L, 10L), (2L, 12L))
      .toDF("query_id", "vec_id")
    val r = Similarity.recallReportOf(truth, det).head()
    assert(r.getAs[Long]("n_truth") == 4L)
    assert(r.getAs[Long]("n_detected") == 4L)
    assert(r.getAs[Long]("n_hits") == 3L)
    assert(r.getAs[Long]("recall_milli") == 750L)
    // worst query: q1 hits 1 of 2 -> 500 milli
    assert(r.getAs[Long]("worst_recall_milli") == 500L)
  }

  test("dataset card on an empty corpus: zero counts, NULL means, no " +
    "division error") {
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Curation.datasetCardOf(noDocs).head()
    assert(r.getAs[Long]("n_docs") == 0L)
    assert(r.isNullAt(r.fieldIndex("mean_tokens_milli")))
    assert(r.isNullAt(r.fieldIndex("short_docs_milli")))
  }

  test("BFS with an empty seed set terminates immediately and empty") {
    val edges = Seq((10L, 21L), (21L, 10L)).toDF("src", "dst")
    val noSeeds = Seq.empty[Long].toDF("node")
    assert(graft.operators.Graph.bfsDistancesOf(edges, noSeeds)
      .count() == 0L)
    spark.catalog.clearCache()
  }
}
