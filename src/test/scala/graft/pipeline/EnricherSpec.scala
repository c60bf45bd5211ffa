package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Enrichment + embedding stub contracts, and the approximate-distinct
  * accuracy bound (no DuckDB oracle exists for HLL bits). */
class EnricherSpec extends SparkSpec {

  test("u1 enrichment: capped issues, clamped confidence, one row per case") {
    val e = Enricher.enrich(spark, sf).cache()
    assert(e.count() == graft.Tables.orders(spark, sf).count())
    e.collect().foreach { r =>
      val conf = r.getAs[Double]("confidence_score")
      assert(conf >= 0.0 && conf <= 1.0)
      assert(r.getAs[Int]("n_key_issues") <= 10)
      assert(r.getAs[String]("case_summary").startsWith("Case "))
    }
  }

  test("u2 embedding stub: deterministic, fixed dim, bounded values") {
    val a = Enricher.embedDocuments(spark, sf).orderBy("doc_id").collect()
    val b = Enricher.embedDocuments(spark, sf).orderBy("doc_id").collect()
    assert(a.length == b.length && a.length > 0)
    a.zip(b).foreach { case (x, y) =>
      val vx = x.getSeq[Float](1)
      assert(vx == y.getSeq[Float](1), "must be deterministic across runs")
      assert(vx.length == 64)
      vx.foreach(v => assert(v >= -1.0f && v <= 1.0f))
    }
  }

  test("u2 chunking: overlap-consistent, lossless reconstruction") {
    val docs = graft.Tables.documents(spark, sf)
      .select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val chunks = Enricher.chunksOf(
        graft.Tables.documents(spark, sf), size = 200, overlap = 50)
      .collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Int]("chunk_idx"))
        .map(_.getAs[String]("chunk_text")).toSeq).toMap
    assert(chunks.nonEmpty)
    chunks.foreach { case (id, cs) =>
      val text = docs(id)
      // dropping each chunk's 50-char overlap tail reconstructs the text
      val rebuilt = cs.init.map(_.take(150)).mkString + cs.last
      assert(rebuilt == text, s"doc $id: chunking lost characters")
      // every chunk but the last covers at least its step (else it could
      // not have a successor) and never exceeds `size`; the final partial
      // window clamps, so penultimate chunks may be shorter than `size`
      cs.init.foreach(c => assert(c.length > 150 && c.length <= 200))
    }
  }

  test("KMV sketch tracks exact distinct counts within its k=64 error bound") {
    val exact = graft.metrics.Dashboard.distinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kmv = graft.metrics.Dashboard.kmvDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == kmv.keySet)
    exact.foreach { case (g, n) =>
      val est = kmv(g)
      if (n < 64) assert(est == n, s"$g: below k must be exact ($est vs $n)")
      // KMV std error ≈ 1/sqrt(k-2) ≈ 12.7% at k=64; 3σ margin
      else assert(math.abs(est - n).toDouble / n <= 0.40, s"$g: $est vs $n")
    }
  }

  test("approx_count_distinct tracks exact within 5%") {
    val exact = graft.metrics.Dashboard.distinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = graft.metrics.Dashboard.approxDistinctUsers(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / math.max(n, 1) <= 0.05, s"$k: $a vs $n")
    }
  }
}
