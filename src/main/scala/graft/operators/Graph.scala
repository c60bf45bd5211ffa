package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Graph operators over the purchase graph (customer —bought-from—
  * supplier, induced by orders ⋈ lineitem): iterative PageRank and the
  * degree distribution — the entity-importance and connectivity-shape
  * analyses a relationship-heavy corpus (CRM cases ↔ parties, documents
  * ↔ entities) runs before sampling or weighting by centrality.
  *
  * Determinism: ranks are integer micro-units with `div` at every
  * division, so iteration is exact and the generated fixed-round DuckDB
  * oracle replays it bit-for-bit (same pattern as the IVF/MMR oracles).
  *
  * Scale design: the edge table is built ONCE (one join, one distinct),
  * pre-joined with out-degrees, and persisted — each PageRank round then
  * costs one shuffle of the (node, rank) table into the edge partitions
  * plus one aggregate; the edge side never re-shuffles. That is the
  * Pregel message-passing shape expressed in plain relational ops, and
  * rounds are a constant, so total cost is O(iters · |E|/cluster).
  */
object Graph {

  val PrIters = 5
  /** Damping 0.85 in milli-units; rank unit = 1e6 micro. */
  val DampingMilli = 850L
  val RankUnit = 1000000L

  /** Undirected purchase edges with node ids disambiguated by type:
    * customer c -> 10c, supplier s -> 10s+1. */
  private def edgesOf(spark: SparkSession, dir: String): DataFrame = {
    // persist() the directed set: the undirected expansion and the degree
    // aggregate both read it, and a union of two full plan copies would
    // re-run the orders x lineitem join + distinct per branch. The
    // expansion itself is a narrow explode, not a second pass.
    val directed = Tables.orders(spark, dir)
      .join(Tables.lineitem(spark, dir),
        col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 10).as("src"),
        (col("l_suppkey") * 10 + 1).as("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    directed.select(explode(array(
      struct(col("src"), col("dst")),
      struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
  }

  /** (src, dst, outdeg) — the per-round join input, built once. */
  private def edgesWithDeg(spark: SparkSession, dir: String): DataFrame = {
    val e = edgesOf(spark, dir)
    val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
    e.join(deg, "src")
  }

  /** Integer PageRank over the undirected purchase graph:
    * r0 = 1e6; r' = (1-d)·1e6 + d · Σ_in (r(u) div outdeg(u)), all in
    * micro-units with floor division. Every node has degree ≥ 1 (the
    * graph is induced by edges), so there is no dangling mass. */
  def pageRank(spark: SparkSession, dir: String,
      iters: Int = PrIters): DataFrame = {
    val e = edgesWithDeg(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var ranks = e.select(col("src").as("node")).distinct()
      .select(col("node"), lit(RankUnit).as("pr"))
    for (_ <- 1 to iters) {
      ranks = e.join(ranks, e("src") === ranks("node"))
        .select(col("dst"), expr("pr div outdeg").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("s"))
        .select(col("dst").as("node"),
          (lit(RankUnit - DampingMilli * 1000L) +
            expr(s"$DampingMilli * s div 1000")).as("pr"))
    }
    ranks.select(
      when(col("node") % 10 === 0, "customer").otherwise("supplier")
        .as("entity_type"),
      expr("node div 10").as("entity_id"),
      col("pr"))
  }

  /** Degree distribution of the purchase graph: how many nodes have each
    * degree — the connectivity-shape (power-law) check. Two aggregates. */
  def degreeHistogram(spark: SparkSession, dir: String): DataFrame =
    edgesOf(spark, dir)
      .groupBy("src").agg(count(lit(1)).as("degree"))
      .groupBy("degree").agg(count(lit(1)).as("n_nodes"))

  // -------------------------------------------------------------------
  // Registration
  // -------------------------------------------------------------------

  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "graph_pagerank" -> ((s, d) => pageRank(s, d)),
    "graph_degree_histogram" -> ((s, d) => degreeHistogram(s, d)))

  /** Generated fixed-round PageRank oracle — MATERIALIZED per round (the
    * default CTE inlining would expand the chain exponentially). */
  private def prOracle: String = {
    val base = RankUnit - DampingMilli * 1000L
    val sb = new StringBuilder
    sb ++= s"""WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 10 AS src, l_suppkey * 10 + 1 AS dst
      |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
      |edges AS MATERIALIZED (
      |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
      |deg AS MATERIALIZED (
      |  SELECT src, count(*) AS outdeg FROM edges GROUP BY 1),
      |e AS MATERIALIZED (
      |  SELECT edges.src, edges.dst, deg.outdeg
      |  FROM edges JOIN deg USING (src)),
      |r0 AS MATERIALIZED (
      |  SELECT src AS node, CAST($RankUnit AS BIGINT) AS pr
      |  FROM deg)""".stripMargin
    for (t <- 1 to PrIters) {
      sb ++= s""",
        |r$t AS MATERIALIZED (
        |  SELECT dst AS node,
        |         $base + $DampingMilli * CAST(sum(pr // outdeg) AS BIGINT)
        |           // 1000 AS pr
        |  FROM e JOIN r${t - 1} ON r${t - 1}.node = e.src
        |  GROUP BY dst)""".stripMargin
    }
    sb ++= s"""
      |SELECT CASE WHEN node % 10 = 0 THEN 'customer' ELSE 'supplier' END
      |         AS entity_type,
      |       node // 10 AS entity_id, pr
      |FROM r$PrIters""".stripMargin
    sb.toString
  }

  val oracles: Map[String, String] = Map(
    "graph_pagerank" -> prOracle,
    "graph_degree_histogram" ->
      """WITH e0 AS (
        |  SELECT DISTINCT o_custkey * 10 AS src, l_suppkey * 10 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0),
        |d AS (SELECT src, count(*) AS degree FROM edges GROUP BY 1)
        |SELECT degree, count(*) AS n_nodes FROM d GROUP BY 1""".stripMargin)
}
