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
