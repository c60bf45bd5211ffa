package graft.operators

import graft.SparkSpec

/** Structural properties of the purchase-graph operators. */
class GraphSpec extends SparkSpec {

  test("pagerank: one row per node, and hub suppliers outrank customers") {
    val pr = Graph.pageRank(spark, sf).collect()
    val byType = pr.groupBy(_.getAs[String]("entity_type"))
    // bipartite structure: both sides present, ids unique
    assert(byType.keySet == Set("customer", "supplier"))
    val ids = pr.map(r => (r.getAs[String]("entity_type"), r.getAs[Long]("entity_id")))
    assert(ids.distinct.length == ids.length)
    // every supplier serves many customers while each customer touches
    // few suppliers, so rank mass concentrates on the supplier side —
    // the bipartite hub property the operator exists to surface
    val minSupplier = byType("supplier").map(_.getAs[Long]("pr")).min
    val maxCustomer = byType("customer").map(_.getAs[Long]("pr")).max
    assert(minSupplier > maxCustomer,
      s"supplier floor $minSupplier vs customer ceiling $maxCustomer")
    // ranks stay positive: the (1-d) base term floors every node
    assert(pr.forall(_.getAs[Long]("pr") >= Graph.RankUnit - Graph.DampingMilli * 1000L))
  }

  test("degree histogram masses sum to the node count") {
    val hist = Graph.degreeHistogram(spark, sf).collect()
    val nodes = Graph.pageRank(spark, sf, iters = 1).count()
    assert(hist.map(_.getAs[Long]("n_nodes")).sum == nodes)
    assert(hist.forall(_.getAs[Long]("degree") >= 1L))
  }
}
