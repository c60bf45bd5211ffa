package graft.metrics

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Proves the scale-safe quantized decile plan ([[Dashboard.qualityDeciles]],
  * the registered o8 query) agrees with the exact global-sort yardstick
  * ([[Dashboard.qualityDecilesExactOf]], ntile(10) with a doc_id tie-break):
  * identical away from grid-tie edges, within one decile at them. This is the
  * safety argument for shipping the windowless plan — the same exact/approx
  * pairing as dedup_embedding_pairs vs its LSH twin. */
class DashboardSpec extends SparkSpec {
  import spark.implicits._

  test("quantized deciles match ntile(10) away from edges, within 1 at them") {
    val stats = graft.ml.TextOps.textStats(spark, sf)
    val quant = Dashboard.qualityDeciles(spark, sf)
      .select(col("doc_id"), col("decile").as("d_quant"))
    val exact = Dashboard.qualityDecilesExactOf(stats)
      .select(col("doc_id"), col("decile").as("d_exact"))

    // the nine interpolated decile edges on the qbin grid, same aggregate
    // the registered plan broadcasts
    val edges: Seq[Double] = stats
      .select(floor(col("quality_score") * 10000).cast("long").as("qbin"))
      .agg(percentile(col("qbin"), array((1 to 9).map(k => lit(k / 10.0)): _*)))
      .as[Seq[Double]].head()

    val joined = quant.join(exact, "doc_id")
      .join(stats.select(col("doc_id"),
        floor(col("quality_score") * 10000).cast("long").as("qbin")), "doc_id")
      .select($"doc_id", $"d_quant", $"d_exact", $"qbin")
      .as[(Long, Int, Int, Long)].collect()

    assert(joined.length == 500) // inner joins lost nothing: same doc set

    // a row is at a grid-tie edge iff its grid cell abuts an interpolated
    // edge — the only place threshold-binning and equal-count ntile can
    // legitimately disagree (ties at the cut get binned together vs split)
    def atEdge(qbin: Long): Boolean = edges.exists(e => math.abs(qbin - e) <= 1.0)

    val offInterior = joined.filter { case (_, dq, dx, qb) => !atEdge(qb) && dq != dx }
    assert(offInterior.isEmpty,
      s"interior rows must bin identically, got ${offInterior.take(5).toSeq}")

    val offEdge = joined.filter { case (_, dq, dx, _) => math.abs(dq - dx) > 1 }
    assert(offEdge.isEmpty,
      s"edge rows may differ by at most one decile, got ${offEdge.take(5).toSeq}")

    // and the approximation is not vacuous: edge-adjacent rows exist in the
    // corpus, so the interior-exactness assertion above has real teeth
    assert(joined.exists { case (_, _, _, qb) => atEdge(qb) })
  }
}
