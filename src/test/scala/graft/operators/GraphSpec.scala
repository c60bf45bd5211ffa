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

  test("k-core: peels the pendant tail, keeps the clique, reaches fixpoint") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 4-clique {1,2,3,4} (each degree 3) + chain 4-5-6 (degrees 2,1).
    // Peeling at k=3: node 6 (deg 1) falls, then 5, and 4 keeps its 3
    // clique neighbors — a 2-round cascade, so rounds=1 would be wrong.
    val und = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val core = Graph.kCoreOf(edges, k = 3, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // real corpus: the registered round count reaches the fixpoint —
    // every survivor's degree INSIDE the surviving subgraph clears k.
    // (k=10 here: sf0.001's graph is too sparse for the registered
    // K=30, whose non-trivial core the sf0.01 oracle gate covers.)
    val real = Graph.kCore(spark, sf, k = 10).collect()
    assert(real.nonEmpty)
    assert(real.forall(_.getAs[Long]("core_deg") >= 10L),
      "peeling must have converged at the registered round count")
  }

  test("k-core: intermediate round caches are released (only the final " +
    "alive set stays pinned)") {
    import spark.implicits._
    spark.catalog.clearCache()
    val und = Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L),(4L,5L),(5L,6L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val before = spark.sparkContext.getPersistentRDDs.size
    Graph.kCoreOf(edges, k = 3, rounds = 4).count()
    // rounds=4 persists 4 alive frames; all but the last are unpersisted
    // inside the loop, so at most ONE survives the call (ADVICE r9 —
    // repeated library use must not accumulate executor storage).
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1, s"$leaked cached intermediates survived kCoreOf")
    spark.catalog.clearCache()
  }

  test("label propagation: two triangles joined by a bridge settle into " +
      "their own communities") {
    import spark.implicits._
    // triangle {1,2,3}, triangle {7,8,9}, bridge 3-7: majority voting
    // keeps each triangle's labels internal (the bridge is always a
    // 1-vote minority against 2 triangle neighbors)
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.labelPropagationOf(edges, iters = 4).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val left = Set(1L, 2L, 3L).map(got)
    val right = Set(7L, 8L, 9L).map(got)
    assert(left.size == 1, s"left triangle must agree on one community: $got")
    assert(right.size == 1, s"right triangle must agree: $got")
    assert(left != right, s"bridge must not merge the triangles: $got")
    spark.catalog.clearCache() // release the edge barrier
  }

  test("label propagation: the symmetric chain path is bit-identical to " +
      "the general spine path on symmetrized edges") {
    import spark.implicits._
    // random-ish undirected graph (ring + chords), symmetrized — the
    // precondition of the fast path. Both paths must agree node-for-node
    // at every round count, since the spine coalesce provably never
    // fires when every node has an in-edge.
    val und = (0L until 40L).map(i => (i, (i + 1) % 40)) ++
      Seq((0L, 13L), (5L, 27L), (11L, 33L), (2L, 21L), (8L, 30L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val general = Graph.labelPropagationOf(edges, iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val chain = Graph.labelPropagationOf(edges, iters, symmetric = true)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(chain == general,
        s"iters=$iters: chain path diverged from spine path")
      spark.catalog.clearCache()
    }
  }

  test("label propagation: source-only nodes keep their labels on " +
      "asymmetric edge input (library-form guard)") {
    import spark.implicits._
    // 5 -> 1, 5 -> 2, 1 <-> 2: node 5 never appears as dst, so it
    // receives no votes in any round — the label spine must carry its
    // own label forward instead of silently dropping it after round 1
    // (the pre-round-12 pure-update form returned only {1, 2} here)
    val edges = Seq((5L, 1L), (5L, 2L), (1L, 2L), (2L, 1L))
      .toDF("src", "dst")
    val got = Graph.labelPropagationOf(edges, iters = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == Set(1L, 2L, 5L),
      s"node universe must be src ∪ dst, retained every round: $got")
    assert(got(5L) == 5L,
      s"a node with no in-edges keeps its own label: $got")
    spark.catalog.clearCache()
  }

  test("triangles: each counted once on a known graph") {
    import spark.implicits._
    // 4-clique {1,2,3,4} (4 triangles), disjoint triangle {8,9,10},
    // disjoint path 5-6-7 (0 triangles)
    val e0 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (8L, 9L), (8L, 10L), (9L, 10L), (5L, 6L), (6L, 7L))
      .toDF("u", "v")
    val tri = Graph.trianglesOf(e0).collect()
      .map(r => Set(r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(tri.length == 5, "4 clique triangles + 1 standalone")
    assert(tri.distinct.length == 5, "orientation must count each once")
    assert(tri.count(_.subsetOf(Set(1L, 2L, 3L, 4L))) == 4)
    assert(tri.contains(Set(8L, 9L, 10L)))
    assert(tri.forall(s => !s.exists(Set(5L, 6L, 7L))))
  }

  test("clustering coefficient: internally consistent on real data") {
    val row = Graph.clusteringCoefficient(spark, sf).collect().head
    val (nodes, edges, wedges, tris, cc) = (row.getAs[Long]("n_nodes"),
      row.getAs[Long]("n_edges"), row.getAs[Long]("n_wedges"),
      row.getAs[Long]("n_triangles"), row.getAs[Long]("global_cc_milli"))
    assert(nodes > 0 && edges > 0 && wedges >= edges)
    assert(cc == 3 * tris * 1000 / wedges)
    // per-node participation sums to 3 per triangle
    val perNode = Graph.triangleCounts(spark, sf).collect()
    assert(perNode.map(_.getAs[Long]("n_tri")).sum == 3 * tris)
  }

  test("association rules: mirrored pairs, symmetric lift, sane confidence") {
    val rules = Graph.associationRules(spark, sf).collect()
      .map(r => (r.getAs[Long]("lhs"), r.getAs[Long]("rhs")) ->
        (r.getAs[Long]("support"), r.getAs[Long]("conf_milli"),
          r.getAs[Long]("lift_milli"))).toMap
    assert(rules.nonEmpty)
    rules.foreach { case ((lhs, rhs), (support, conf, lift)) =>
      assert(lhs != rhs && support >= Graph.TriMinSupport)
      assert(conf >= 0 && conf <= 1000, s"confidence must be a probability")
      // the mirrored rule exists with the same support and lift
      // (lift is symmetric by definition; confidence is not)
      val (s2, _, l2) = rules((rhs, lhs))
      assert(s2 == support && l2 == lift)
    }
  }

  test("degree histogram masses sum to the node count") {
    val hist = Graph.degreeHistogram(spark, sf).collect()
    val nodes = Graph.pageRank(spark, sf, iters = 1).count()
    assert(hist.map(_.getAs[Long]("n_nodes")).sum == nodes)
    assert(hist.forall(_.getAs[Long]("degree") >= 1L))
  }

  test("modularity: two bridged triangles score the hand-computed Q, and " +
    "identities hold on the real graph") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // triangles {1,2,3} and {4,5,6} + bridge 3-4: LPA settles on one
    // community per triangle; m2 = 14, each side intra2 = 6, deg_sum = 7
    // -> observed 6e6 div 14 = 428571, expected (7000 div 14)^2 = 250000
    val und = Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(4L,6L),(5L,6L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.modularityOf(edges, iters = 4).collect()
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("e_intra"),
         r.getAs[Long]("deg_sum"), r.getAs[Long]("contrib_micro"))).toMap
    assert(got.size == 2 &&
      got.values.toSet == Set((3L, 3L, 7L, 428571L - 250000L)),
      s"got $got")
    spark.catalog.clearCache()

    // real purchase graph: degree mass is fully assigned (Σ deg_sum = m2),
    // intra-edges never exceed a community's degree volume, and each
    // row's contribution is exactly observed − expected. Q itself is
    // NEGATIVE here and that is the audit doing its job: the sf0.001
    // purchase graph is near-complete bipartite — LPA's documented
    // failure mode — and the modularity report is precisely the gate
    // that tells a pipeline not to trust that partition.
    val m = Graph.modularity(spark, sf).collect()
    val m2 = Graph.degreeHistogram(spark, sf).collect()
      .map(r => r.getAs[Long]("degree") * r.getAs[Long]("n_nodes")).sum
    assert(m.map(_.getAs[Long]("deg_sum")).sum == m2)
    assert(m.forall(r => 2 * r.getAs[Long]("e_intra") <= r.getAs[Long]("deg_sum")))
    m.foreach { r =>
      assert(r.getAs[Long]("contrib_micro") ==
        r.getAs[Long]("observed_micro") - r.getAs[Long]("expected_micro"))
      assert(r.getAs[Long]("observed_micro") <= 1000000L)
      assert(r.getAs[Long]("expected_micro") <= 1000000L)
    }
    spark.catalog.clearCache()
  }

  test("conductance: bridged triangles score 1000 div 7 per side; " +
    "real-graph identities hold") {
    import spark.implicits._
    // same two-triangle graph as the modularity case: each side's cut is
    // the single bridge half-edge, vol = 7, m2 = 14 -> 1000 div 7 = 142
    val und = Seq((1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L),(4L,6L),(5L,6L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.conductanceOf(edges, iters = 4).collect()
      .map(r => r.getAs[Long]("community") ->
        (r.getAs[Long]("n_nodes"), r.getAs[Long]("deg_sum"),
         r.getAs[Long]("cut"), r.getAs[Long]("conductance_milli"))).toMap
    assert(got.size == 2 && got.values.toSet == Set((3L, 7L, 1L, 142L)),
      s"got $got")
    spark.catalog.clearCache()

    // real purchase graph: volumes tile the half-edge total; total cut is
    // even (each inter-community edge is cut once from each side); phi is
    // exactly cut*1000 div min(vol, m2-vol), bounded by 1000, NULL only
    // for a whole-graph community
    val rows = Graph.conductance(spark, sf).collect()
    val m2 = rows.map(_.getAs[Long]("deg_sum")).sum
    assert(rows.map(_.getAs[Long]("cut")).sum % 2 == 0)
    rows.foreach { r =>
      val cut = r.getAs[Long]("cut"); val vol = r.getAs[Long]("deg_sum")
      assert(cut <= vol)
      if (vol < m2) {
        val phi = r.getAs[Long]("conductance_milli")
        assert(phi == cut * 1000 / math.min(vol, m2 - vol) && phi <= 1000,
          s"phi $phi vol $vol cut $cut")
      } else assert(r.isNullAt(r.fieldIndex("conductance_milli")))
    }
    spark.catalog.clearCache()
  }

  test("BFS distances: exact hops on a crafted path, early convergence, " +
    "and real-graph local consistency") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // path 10-20-30-40-50 (customer-encoded ids) plus isolated seed 90
    val und = Seq((10L, 20L), (20L, 30L), (30L, 40L), (40L, 50L))
    val edges = und.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val seeds = Seq(10L, 90L).toDF("node")
    val gotMap = Graph.bfsDistancesOf(edges, seeds, rounds = 10).collect()
      .map(r => r.getAs[Long]("entity_id") -> r.getAs[Long]("dist")).toMap
    assert(gotMap == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L,
      9L -> 0L), s"got $gotMap")
    spark.catalog.clearCache()

    // real graph: seeds at distance 0, every edge differs by at most 1
    // hop, and every non-seed's dist is 1 + min over its neighbors
    val rows = Graph.bfsDistances(spark, sf).collect()
    val dist = rows.map(r => (r.getAs[Long]("entity_id") * 10 +
      (if (r.getAs[String]("entity_type") == "customer") 0 else 1)) ->
      r.getAs[Long]("dist")).toMap
    val seedsReal = graft.Tables.customer(spark, sf)
      .filter(col("c_custkey") % Graph.BfsSeedStride === 0)
      .collect().map(_.getAs[Long]("c_custkey") * 10).toSet
    seedsReal.foreach(s => assert(dist.get(s).contains(0L)))
    assert(rows.count(_.getAs[Long]("dist") == 0L) == seedsReal.size)
    val e = graft.Tables.orders(spark, sf)
      .join(graft.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 10).as("src"),
        (col("l_suppkey") * 10 + 1).as("dst")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val adj = (e ++ e.map(p => (p._2, p._1))).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    dist.foreach { case (n, d) =>
      if (d > 0) {
        val best = adj.getOrElse(n, Array.empty[Long])
          .flatMap(dist.get).minOption
        assert(best.contains(d - 1), s"node $n dist $d neighbors $best")
      }
    }
    spark.catalog.clearCache()
  }

  test("link Jaccard: edge commons sum to 3x the triangle count, milli bounded") {
    import org.apache.spark.sql.functions._
    val lj = Graph.linkJaccard(spark, sf)
    val nTri = Graph
      .trianglesOf(Graph.copurchaseEdgesOf(graft.Tables.lineitem(spark, sf)))
      .count()
    // each triangle contributes one common neighbor to each of its edges
    assert(lj.agg(sum("common")).head.getLong(0) == 3 * nTri)
    assert(lj.filter(col("jaccard_milli") > 1000).count() == 0)
    // zero-common edges exist and carry 0 or NULL (degree-1 twins) milli
    assert(lj.filter(col("common") === 0).count() > 0)
    spark.catalog.clearCache()
  }
}
