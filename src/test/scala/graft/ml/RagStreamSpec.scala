package graft.ml

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Batch/stream equivalence for the serving read path: the union of the
  * streamed serve's per-micro-batch outputs over ANY split of the fixed
  * query panel must equal the one-shot batch serve
  * ([[RagFlagship.ragServeFixedQ]]) row-for-row. This pins the
  * batch-decomposability claim the foreachBatch twin rests on: every
  * serve stage partitions by query_id while the corpus-global inputs
  * (df, avgdl, n_docs) are independent of which queries are in flight —
  * if any stage ever grew a cross-query dependence (say a panel-scoped
  * df), this equality would break before a user saw drift. */
class RagStreamSpec extends SparkSpec {
  import spark.implicits._

  private def keys(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("streamed serve equals the batch fixed-panel serve under random " +
    "micro-batch splits of the query feed") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
    val embs = graft.Tables.embeddings(spark, sf)
    val want = keys(RagFlagship.ragServeFixedQ(spark, sf).collect())
    assert(want.nonEmpty)
    spark.catalog.clearCache()
    // the full fixed panel's id universe; ids absent at this sf simply
    // select no query docs — same on both sides
    val panel = (0 until Retrieval.FixedPanelSize)
      .map(_.toLong * Retrieval.QueryStride)
    for (seed <- Seq(17L, 4242L)) {
      val rnd = new scala.util.Random(seed)
      val slices = panel.map(id => (rnd.nextInt(3), id))
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val ms = MemoryStream[Long]
      val q = RagFlagship.ragServeStreamOf(ms.toDS(), docs, embs) { df =>
        got ++= keys(df.collect())
      }
      try {
        (0 until 3).foreach { b =>
          ms.addData(rnd.shuffle(slices.filter(_._1 == b).map(_._2)))
          q.processAllAvailable()
        }
      } finally q.stop()
      assert(got.sorted.toSeq == want, s"seed $seed diverged")
      spark.catalog.clearCache()
    }
  }

  test("exactly-once serve: OVERLAPPING feeds still union to the batch " +
    "serve — each re-sent id is served exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val docs = graft.Tables.documents(spark, sf)
    val embs = graft.Tables.embeddings(spark, sf)
    val want = keys(RagFlagship.ragServeFixedQ(spark, sf).collect())
    assert(want.nonEmpty)
    spark.catalog.clearCache()
    val panel = (0 until Retrieval.FixedPanelSize)
      .map(_.toLong * Retrieval.QueryStride)
    // three micro-batches with deliberate overlap: the middle batch
    // re-sends half of batch 1, the last re-sends the whole panel —
    // at-least-once ragServeStreamOf would serve re-sent ids again
    // (duplicating their rows in the union); the keyed-state dedup
    // must collapse every id to exactly one serve
    val feeds = Seq(
      panel.take(24),
      panel.slice(12, 48), // overlaps 12..23
      panel)               // overlaps everything
    val got = scala.collection.mutable.ArrayBuffer[String]()
    val ms = MemoryStream[Long]
    val q = RagFlagship.ragServeExactlyOnceStreamOf(ms.toDS(), docs, embs) {
      df => got ++= keys(df.collect())
    }
    try {
      feeds.foreach { f =>
        ms.addData(f)
        q.processAllAvailable()
      }
    } finally q.stop()
    // equality (not multiset-superset): a duplicated serve would add
    // duplicate rows and break this
    assert(got.sorted.toSeq == want,
      "overlapping feeds diverged from the batch serve under exactly-once")
    spark.catalog.clearCache()
  }
}
