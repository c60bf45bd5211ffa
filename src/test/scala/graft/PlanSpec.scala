package graft

import graft.SparkSpec

/** Physical-plan regression guards: the properties that keep these
  * queries scalable are asserted on the executed plan, so a refactor that
  * silently loses pushdown/broadcast/codegen fails here, not at 100 TB.
  */
class PlanSpec extends SparkSpec {

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("watermark join: filters reach the parquet scan, join broadcasts") {
    val df = graft.sync.Reconcile.needsUpdate(spark, sf)
    df.collect() // finalize AQE — the static plan may still show SMJ
    val plan = planOf(df)
    assert(plan.contains("PushedFilters:") &&
      plan.contains("EqualTo(o_orderstatus,O)"),
      s"status filter must be pushed to the scan:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"snapshot join should broadcast at this scale:\n$plan")
  }

  test("dimension join broadcasts the supplier side") {
    val plan = planOf(graft.metrics.Dashboard.revenueBySupplier(spark, sf))
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("pricing summary runs inside whole-stage codegen with pruned columns") {
    val df = graft.metrics.Dashboard.pricingSummary(spark, sf)
    // collect() (not count(), which builds its own plan) so THIS dataframe's
    // AQE plan finalizes and codegen spans appear
    df.collect()
    val plan = planOf(df)
    // codegen stages render as "*(n) Op" in the executed-plan string
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan)
    // column pruning: the scan must not read l_comment-style extra fields —
    // schema should only contain the five columns the query touches
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan must prune unused columns: $readSchema")
  }

  test("anti joins plan as broadcast/hash anti joins, not cartesian") {
    val plan = planOf(graft.sync.Reconcile.newCases(spark, sf))
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("top-k limit plans as TakeOrderedAndProject, not a full sort") {
    val plan = planOf(graft.metrics.Dashboard.recentEvents(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("as-of join plans as ONE shuffle on the key plus a window, no join node") {
    val df = graft.operators.Temporal.purchaseAsofBrowse(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("Join"), s"as-of must not degrade to a join:\n$plan")
    // exactly one exchange: the partitionBy(user_id) shuffle (the union
    // branches feed it directly; REPARTITION/broadcast would add more).
    // Count only the AQE final plan — the "Initial Plan" section repeats
    // every node.
    val finalPlan = plan.split("== Initial Plan ==").head
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange") && !l.contains("reuse"))
    assert(exchanges == 1, s"expected 1 shuffle, saw $exchanges:\n$finalPlan")
  }

  test("token drift top-K plans windowless: TakeOrderedAndProject, no WindowExec") {
    val df = graft.ml.TextOps.tokenDrift(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-K must heap-select, not sort globally:\n$plan")
    assert(!plan.contains("Window"),
      s"the former global-sort window must stay gone:\n$plan")
    spark.catalog.clearCache() // release tokenDriftOf's persisted count table
  }

  test("segmented as-of: corpus shuffles once on (key, bucket), carry broadcasts back") {
    val df = graft.operators.Temporal.purchaseAsofBrowseSalted(spark, sf)
    df.collect()
    val plan = planOf(df)
    // the event-scale window must be keyed by BOTH columns — a bare-key
    // window would mean the skew protection silently regressed
    val windowed = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windowed.exists(l => l.contains("user_id") && l.contains("bkt")),
      s"per-event window must partition on (key, bucket):\n$plan")
    // the carry lands on probe rows without re-shuffling the big side
    assert(plan.contains("BroadcastHashJoin"),
      s"bucket-level carry should come back as a broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("repeated-span counts hash map-side: no span strings in any exchange") {
    val df = graft.ml.Dedup.spanDedupStats(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("xxhash64"),
      s"span keys must fold to 64-bit before shuffling:\n$plan")
    // every aggregate must have a map-side partial stage
    assert(plan.contains("partial_count") || plan.contains("HashAggregate"),
      s"span counting needs map-side partials:\n$plan")
    // the span string is born and dies inside the same projection: no
    // exchange carries an array_join output column
    val exchanges = plan.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.nonEmpty && !exchanges.exists(_.contains("array_join")),
      s"no exchange may carry the joined span string:\n$plan")
  }

  test("embedding pair queries: partitioned equi-joins, no nested loop over the corpus") {
    // the round-2 shape was a corpus x corpus BroadcastNestedLoopJoin on
    // vec_id < vec_id — fatal at scale. The exact form must be the tiled
    // hash join; the LSH form must be the (tbl, bucket) hash join. An
    // UNCONDITIONED nested loop is the 1-row scalar-anchor broadcast
    // (the adaptive plane count) — allowed; a conditioned one (a theta
    // join over the corpus) is the fatal shape.
    for (q <- Seq(graft.ml.Dedup.embeddingPairs(spark, sf),
                  graft.ml.Dedup.embeddingLshPairs(spark, sf))) {
      q.collect() // finalize AQE
      val plan = planOf(q)
      val thetaNlj = plan.linesIterator.exists(l =>
        l.contains("BroadcastNestedLoopJoin") && l.contains("vec_"))
      assert(!thetaNlj && !plan.contains("CartesianProduct"),
        s"embedding pair candidates must come from a partitioned equi-join:\n$plan")
      spark.catalog.clearCache()
    }
  }

  test("every scalar-anchor cross join plans as a broadcast nested loop") {
    // scalar anchors (1-row aggregate totals joined onto a detail table)
    // must broadcast deterministically — not rely on AQE noticing the
    // 1-row side at runtime
    for (df <- Seq(graft.sync.Reconcile.summary(spark, sf),
                   graft.sync.Reconcile.qualityValidation(spark, sf),
                   graft.ml.TextOps.tokenDrift(spark, sf))) {
      df.collect()
      val plan = planOf(df)
      assert(plan.contains("BroadcastNestedLoopJoin") ||
        plan.contains("BroadcastExchange"),
        s"scalar anchor must broadcast:\n$plan")
      assert(!plan.contains("CartesianProduct"), plan)
      spark.catalog.clearCache()
    }
  }

  test("band join broadcasts the interval table, never shuffles the fact side") {
    val df = graft.operators.Temporal.priceBandStats(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"band table must broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("flagship lineage composes five stages into one barrier-free plan") {
    val df = graft.pipeline.Lineage.flagship(spark, sf)
    df.collect() // finalize AQE
    val plan = planOf(df).split("== Initial Plan ==").head
    // no barrier: no cache/persist materialization between stages — the
    // whole recon -> enrich -> dedup -> index chain is one Catalyst plan
    assert(!plan.contains("InMemoryRelation") && !plan.contains("InMemoryTableScan"),
      s"flagship lineage must not materialize intermediates:\n$plan")
    // the recon snapshot filters still reach the scans through 4 operators
    assert(plan.contains("EqualTo(o_orderstatus,O)"),
      s"snapshot status filter must stay pushed down:\n$plan")
    // stage fusion keeps the shuffle count intrinsic: 2 snapshot exchanges
    // + the lineitem history aggregate + the changed-set broadcast prep +
    // the dedup aggregate — composition must not add exchanges beyond them
    val exchanges = plan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("reuse"))
    assert(exchanges <= 5, s"composition added shuffles ($exchanges):\n$plan")
    // the index bucket assignment is a codegen'd projection, not a join
    assert(plan.contains("dotproductlong"), plan)
  }

  test("tenant ANN: rank-limit pushdown, broadcast probes, tenant isolation " +
      "lives in the bucket key — never a join predicate") {
    val df = graft.ml.Similarity.tenantAnnTopK(spark, sf)
    df.collect() // finalize AQE
    val plan = planOf(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    // per-query top-k must compile to WindowGroupLimit Partial -> Final:
    // each map task ships at most k candidates per query before the shuffle
    assert(finalPlan.contains("WindowGroupLimit"),
      s"top-k must use the rank-limit pushdown:\n$finalPlan")
    assert(finalPlan.contains("Partial") && finalPlan.contains("Final"),
      s"WindowGroupLimit needs both Partial and Final stages:\n$finalPlan")
    // the 2-probes x LshTables query side broadcasts; the corpus bucket
    // pass is narrow and never shuffles for the join
    val joins = finalPlan.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    assert(joins.nonEmpty, s"probe join must broadcast the query side:\n$finalPlan")
    // isolation BY CONSTRUCTION: tenant_id rides the high bits of the
    // bucket key, so no join condition may mention it — a residual
    // tenant predicate would mean the keying regressed to filter-based
    // isolation (droppable, leak-prone)
    assert(!joins.exists(_.contains("tenant")),
      s"tenant must be inside the bucket key, not a join predicate:\n$joins")
    assert(!finalPlan.contains("CartesianProduct") &&
      !finalPlan.contains("BroadcastNestedLoopJoin"), finalPlan)
    // whole plan = candidate dedup + the bounded query_id shuffle
    val exchanges = finalPlan.linesIterator.count(l =>
      l.contains("Exchange hashpartitioning") && !l.contains("reuse"))
    assert(exchanges <= 2, s"expected <=2 shuffles, saw $exchanges:\n$finalPlan")
    spark.catalog.clearCache() // release the quantized-corpus barrier
  }

  test("tenant IVF: candidate join keyed (tenant_id, centroid_id) with " +
      "broadcast query lists and rank-limit pushdown") {
    val df = graft.ml.Similarity.tenantIvfTopK(spark, sf)
    df.collect()
    val plan = planOf(df)
    val finalPlan = plan.split("== Initial Plan ==").head
    assert(finalPlan.contains("WindowGroupLimit"),
      s"top-k must use the rank-limit pushdown:\n$finalPlan")
    // the inverted-list lookup REQUIRES tenant equality: the join key is
    // the composite (tenant_id, centroid_id) — dropping either key would
    // silently widen candidates across tenants or across lists
    val joins = finalPlan.linesIterator.filter(_.contains("BroadcastHashJoin")).toSeq
    assert(joins.exists(l => l.contains("tenant_id") && l.contains("centroid_id")),
      s"list join must key on (tenant_id, centroid_id):\n$joins")
    // the tiny trained codebook legitimately broadcasts against every
    // vector for coarse assignment (the scalar-anchor idiom) — only an
    // UNHINTED cartesian is forbidden
    assert(!finalPlan.contains("CartesianProduct"), finalPlan)
    spark.catalog.clearCache() // release corpus + centroid barriers
  }

  test("rollup aggregates with partial (map-side) aggregation via Expand") {
    val df = graft.operators.Temporal.statusPriorityRollup(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("Expand"), plan)
    assert(plan.contains("partial"), s"rollup must partial-aggregate map-side:\n$plan")
  }

  test("power-iteration round: ONE dim-width exchange, codegen'd dot, " +
    "map-side partial sums") {
    import org.apache.spark.sql.functions._
    // the round subplan emb_top_direction folds three times: its only
    // exchange must be the 64-key hashpartitioning(j) after the partial
    // aggregate — nothing row-scale ever crosses the wire
    val q = graft.Tables.embeddings(spark, sf)
      .select(graft.ml.Dedup.quantized(col("embedding")).as("q"))
    val vlit = array(Seq.fill(64)(lit(1L)): _*)
    val round = q
      .select(col("q"),
        graft.functions.ArrayOps.dot_long(col("q"), vlit).as("s"))
      .select(posexplode(col("q")).as(Seq("j", "qj")), col("s"))
      .groupBy("j").agg(sum(col("qj") * col("s")).as("w"))
    round.collect()
    val plan = planOf(round).split("== Initial Plan ==").head
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hash"))
      .toSeq
    assert(exchanges.size == 1 && exchanges.head.contains("(j#"),
      s"exactly one exchange, keyed j:\n$plan")
    assert(plan.contains("partial_sum"),
      s"per-partition accumulators must combine map-side:\n$plan")
    assert(plan.contains("dotproductlong"),
      s"the broadcast-literal dot must be the codegen'd kernel:\n$plan")
  }

  test("BFS round: frontier hash join + grouped min, no cartesian, " +
    "edge filters stay off the label side") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edges = Seq((10L, 21L), (21L, 10L), (20L, 31L), (31L, 20L))
      .toDF("src", "dst")
    val labels = Seq((10L, 0L)).toDF("node", "dist")
    val next = labels
      .unionByName(edges.join(labels, edges("src") === labels("node"))
        .select(edges("dst").as("node"), (col("dist") + 1).as("dist")))
      .groupBy("node").agg(min(col("dist")).as("dist"))
    next.collect()
    val plan = planOf(next)
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"),
      s"frontier expansion must be a hash/merge join:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_min"),
      s"the relabel min must combine map-side:\n$plan")
  }

  test("k-center round selects its argmax via TakeOrdered, not a global sort") {
    import org.apache.spark.sql.functions._
    val q = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), graft.ml.Dedup.quantized(col("embedding")).as("q"))
    val c0 = array(Seq.fill(64)(lit(1L)): _*)
    val round = q
      .select(col("vec_id"),
        (graft.functions.ArrayOps.dot_long(col("q"), col("q"))
          - lit(2L) * graft.functions.ArrayOps.dot_long(col("q"), c0)).as("d"))
      .orderBy(col("d").desc, col("vec_id").asc).limit(1)
    round.collect()
    val plan = planOf(round)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-1 must plan as TakeOrdered:\n$plan")
    assert(!plan.linesIterator.exists(l =>
      l.contains("Sort ") && l.contains("global=true")),
      s"no global sort in the selection round:\n$plan")
  }

  test("embed stub: the token-hash fold materializes ONCE behind the " +
    "projection barrier, never per vector component") {
    val df = graft.pipeline.Enricher.embedDocuments(spark, sf)
    df.collect()
    val plan = planOf(df)
    // the hash's modulus appears only inside the cached (doc_id, h)
    // projection; the component lambda must reference the h ATTRIBUTE.
    // Without the barrier CollapseProject inlines the fold into the
    // lambda and it re-runs dim (64) times per row — the regression
    // that made u2_embed_stub the most expensive anchor query.
    assert(plan.contains("InMemoryTableScan") || plan.contains("Scan In-memory"),
      s"hash projection must be the persisted barrier:\n$plan")
    val outerProject = plan.linesIterator
      .find(l => l.contains("transform(") && l.contains("40503")).getOrElse("")
    assert(outerProject.nonEmpty && !outerProject.contains("1000000007"),
      s"component lambda must not contain the token fold:\n$outerProject")
    spark.catalog.clearCache()
  }

  test("dataset card: one scan, one shared Expand for the three distincts, " +
    "map-side partials") {
    val df = graft.ml.Curation.datasetCard(spark, sf)
    df.collect()
    val plan = planOf(df).split("== Initial Plan ==").head
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"the card must cost exactly one scan:\n$plan")
    assert(plan.linesIterator.count(_.contains(" Expand [")) == 1,
      s"the three distincts must share ONE Expand:\n$plan")
    assert(plan.contains("partial"), s"distinct pass must partial-aggregate:\n$plan")
  }

  test("FD audit: per-FD arms aggregate keyed by determinant value, " +
    "no cartesian anywhere") {
    val df = graft.plans.DataQuality.fdAudit(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("partial_count"),
      s"determinant counts must combine map-side:\n$plan")
  }

  test("takedown: the dual argmin rides ONE aggregate (old and new " +
    "representatives in the same functions list), no cartesian") {
    val df = graft.pipeline.Takedown.manifestOf(
      graft.Tables.documents(spark, sf))
    df.collect() // finalize AQE
    val plan = planOf(df)
    // both argmins and the revoked sum must appear inside a single
    // functions=[...] bracket — a second pass over the corpus to find
    // successors is exactly what this design avoids — and the bracket
    // must belong to a HASH aggregate: the conditional-min encoding
    // (min(CASE WHEN not revoked THEN doc_id END)) keeps it off the
    // SortAggregate fallback that a struct-valued min would take,
    // which sorts the corpus by its content hash around the exchange
    val dual = ("functions=\\[[^\\]]*partial_min\\([^\\]]*" +
      "partial_min\\([^\\]]*partial_min\\(").r
    assert(dual.findFirstIn(plan).isDefined,
      s"dual argmin must share one partial aggregate:\n$plan")
    assert(!plan.contains("SortAggregate"),
      s"cluster election must hash-aggregate, not sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("takedown repack: dirty-shard prune broadcasts before a " +
    "partitioned (never global) packing window") {
    val df = graft.pipeline.Takedown.repackOf(
      graft.Tables.documents(spark, sf))
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"the bounded dirty list must broadcast:\n$plan")
    assert(plan.contains("windowspecdefinition(split"),
      s"packing window must partition by (split, shard):\n$plan")
  }

  test("ivm merge: full-outer join of two MV-sized aggregates, " +
    "map-side partial aggregation on both inputs") {
    val df = graft.sync.Ivm.mergeRefresh(spark, sf)
    df.collect()
    val plan = planOf(df)
    assert(plan.contains("FullOuter"), plan)
    // both the base MV and the changelog fold partial-aggregate before
    // their exchange — the merge never shuffles fact-sized data
    assert("partial_sum".r.findAllIn(plan).size >= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("takedown mv refresh: hash-aggregated cluster election feeding an " +
    "MV-sized full-outer merge — no SortAggregate, no cartesian, and the " +
    "corpus never rescanned on the merge side") {
    val df = graft.pipeline.Takedown.mvRefresh(spark, sf)
    df.collect()
    val plan = planOf(df)
    // the merge core: base MV ⊕ signed deltas over the composite key
    assert(plan.contains("FullOuter"), plan)
    // election rides hash aggregation (the curation/takedown convention)
    assert(!plan.contains("SortAggregate"),
      s"cluster election must hash-aggregate, not sort:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("ivm touched-key minmax: AQE broadcasts the small touched set " +
    "(no forced hint — a backfill delta may not be broadcastable)") {
    // The expectation is tied to the stats that justify it: pin the
    // broadcast threshold to the stock default (so a session-conf shift
    // can't silently change the bar) and assert the fixture's touched
    // set actually measures far under it — ~8 bytes/key leaves orders
    // of magnitude of headroom, so AQE choosing broadcast is implied by
    // the measured delta size, not by luck of the testdata scale.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      val nTouched = graft.sync.Ivm.touchedKeysCount(spark, sf)
      assert(nTouched > 0 && nTouched * 8L < 10485760L / 4,
        s"fixture drifted: $nTouched touched keys no longer clearly " +
          "broadcastable — re-pick the fixture or drop the plan assertion")
      val df = graft.sync.Ivm.touchedMinMax(spark, sf)
      df.collect() // finalize AQE — hint-free join must still broadcast
      val plan = planOf(df)
      assert(plan.contains("BroadcastHashJoin"), plan)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed tables join with NO exchange on the join keys: bucketing " +
    "is the write-once co-location that kills the repeated-join shuffle") {
    import org.apache.spark.sql.functions._
    // the 100 TB pattern: both fact tables written bucketed on the join
    // key ONCE; every later join reads co-located buckets and the only
    // exchange left in the plan is the downstream aggregation's
    val dir = java.nio.file.Files.createTempDirectory("graft_buckets")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      graft.Tables.orders(spark, sf)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .write.mode("overwrite").option("path", s"$dir/b_orders")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .write.mode("overwrite").option("path", s"$dir/b_lineitem")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")
      val j = spark.table("b_orders")
        .join(spark.table("b_lineitem"),
          col("o_orderkey") === col("l_orderkey"))
        .groupBy("o_custkey").agg(sum(col("l_quantity")).as("qty"))
      j.collect()
      val plan = planOf(j)
      assert(plan.contains("SortMergeJoin"), plan)
      // neither join side shuffles: bucket layout IS the partitioning
      assert(!plan.contains("hashpartitioning(o_orderkey") &&
        !plan.contains("hashpartitioning(l_orderkey"),
        s"bucketed join must not re-shuffle its keys:\n$plan")
      // the scan really is bucket-aware, not a plain file read
      assert(plan.contains("Bucketed: true"), plan)
      // the aggregation exchange survives — we removed the JOIN shuffle,
      // not exchanges in general
      assert(plan.contains("hashpartitioning(o_custkey"), plan)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
