package graft.ml

import org.apache.spark.sql.functions.col
import graft.SparkSpec

/** ANN quality vs the brute-force baseline, and contract checks on the
  * top-k shape. */
class SimilaritySpec extends SparkSpec {

  test("brute force: k results per query, self excluded, ranks total") {
    val rows = Similarity.bruteForceTopK(spark, sf, k = 10).collect()
    val byQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (q, rs) =>
      assert(rs.length == 10, s"query $q")
      assert(!rs.exists(_.getAs[Long]("vec_id") == q), "self must be excluded")
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
      // ranked by non-increasing dot
      val dots = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("dot"))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
    }
  }

  test("SQ8: 8-bit grid loses almost no recall vs the exact arm") {
    val exact = Similarity.bruteForceTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val sq8rows = Similarity.sq8TopK(spark, sf, k = 10).collect()
    val sq8 = sq8rows
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // full scoring structure: k per query, ranks total, self excluded
    sq8rows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length == 10 && !rs.exists(_.getAs[Long]("vec_id") == q))
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
    }
    // a 255-level grid on a 10k-scale fixed-point corpus quantizes far
    // inside the ranking margin: near-lossless recall (vs 0.2/0.5
    // floors for the bucketed ANN arms)
    val recall = exact.count(sq8.contains).toDouble / exact.size
    assert(recall >= 0.9, s"SQ8 recall $recall")
  }

  test("PQ: 8-codes-per-vector ADC keeps a real recall floor") {
    val exact = Similarity.bruteForceTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val pqRows = Similarity.pqTopK(spark, sf, k = 10).collect()
    pqRows.groupBy(_.getAs[Long]("query_id")).foreach { case (q, rs) =>
      assert(rs.length == 10 && !rs.exists(_.getAs[Long]("vec_id") == q))
      assert(rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to 10))
      // exact-reranked scores ranked non-increasing
      val dots = rs.sortBy(_.getAs[Int]("rank")).map(_.getAs[Long]("dot"))
      assert(dots.zip(dots.tail).forall { case (a, b) => a >= b })
    }
    val pq = pqRows
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    // deterministic pipeline -> a real floor, not a statistical one.
    // The 8-codes-per-vector ADC scan is coarse on this near-random
    // corpus (raw ADC recall ~0.37); the exact rerank of the top-PqPool
    // short-list recovers what the code scan surfaces.
    val recall = exact.count(pq.contains).toDouble / exact.size
    assert(recall >= 0.6, s"PQ recall $recall")
  }

  test("tenant-scoped ANN: zero cross-tenant rows in CANDIDATES (not just " +
    "results), and a planted cross-tenant near-dup is never surfaced") {
    import spark.implicits._
    // real corpus with the registered tenant derivation: candidate mining
    // itself must never cross tenants (the prefix argument, verified)
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        org.apache.spark.sql.functions.expr(
          s"(vec_id div 7) % ${Similarity.SimTenants}").as("tenant_id"),
        col("embedding"))
    val cand = Similarity.tenantAnnCandidatesOf(corpus)
    assert(cand.count() > 0)
    assert(cand.filter(col("q_tenant") =!= col("c_tenant")).count() == 0L,
      "candidate mining crossed tenants")
    // planted: query 0 (tenant 0) and vec 1 (tenant 1) are near-identical;
    // vec 7 (tenant 1... (7 div 7) % 4 = 1) also near-identical; vec 14
    // (tenant 2) is a same-shape decoy; vec 21 (tenant 3) orthogonal.
    // Only same-tenant vectors may surface for query 0.
    val base = Array.tabulate(64)(i => 0.1f + 0.01f * i)
    val eps = base.map(_ + 0.001f)
    val ortho = Array.tabulate(64)(i => if (i % 2 == 0) 0.5f else -0.5f)
    val planted = Seq(
      (0L, 0L, base), (1L, 0L, eps),       // same tenant: should pair
      (7L, 1L, eps), (14L, 2L, eps),       // near-identical, WRONG tenant
      (21L, 3L, ortho), (28L, 0L, ortho))
      .toDF("vec_id", "tenant_id", "embedding")
    val out = Similarity.tenantAnnTopKOf(planted, k = 5).collect()
    val forQ0 = out.filter(_.getAs[Long]("query_id") == 0L)
    assert(forQ0.nonEmpty, "same-tenant near-dup must be recalled")
    val ids = forQ0.map(_.getAs[Long]("vec_id")).toSet
    assert(ids.contains(1L), "same-tenant near-identical vector missed")
    assert(!ids.contains(7L) && !ids.contains(14L) && !ids.contains(21L),
      s"cross-tenant vector surfaced: $ids")
    assert(forQ0.forall(_.getAs[Long]("tenant_id") == 0L))
    // the IVF arm proves the same two claims through its (tenant,
    // centroid) list key: zero cross-tenant CANDIDATES on the real
    // corpus, and the planted cross-tenant twins never surface even
    // though the shared quantizer puts them in the same centroid
    val ivfCand = Similarity.tenantIvfCandidatesOf(corpus)
    assert(ivfCand.count() > 0)
    assert(ivfCand.filter(col("q_tenant") =!= col("c_tenant")).count() == 0L,
      "IVF candidate mining crossed tenants")
    val ivfOut = Similarity.tenantIvfTopKOf(planted, k = 5).collect()
    val ivfQ0 = ivfOut.filter(_.getAs[Long]("query_id") == 0L)
    assert(ivfQ0.nonEmpty)
    val ivfIds = ivfQ0.map(_.getAs[Long]("vec_id")).toSet
    assert(ivfIds.contains(1L), "same-tenant near-identical vector missed")
    assert(!ivfIds.contains(7L) && !ivfIds.contains(14L) &&
      !ivfIds.contains(21L), s"IVF surfaced cross-tenant: $ivfIds")
    spark.catalog.clearCache()
  }

  test("IVF ANN beats the LSH recall floor and never returns non-corpus rows") {
    val exact = Similarity.bruteForceTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ivf = Similarity.ivfTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(ivf.nonEmpty)
    val recall = exact.count(ivf.contains).toDouble / exact.size
    assert(recall >= 0.2, s"IVF recall $recall")
    ivf.foreach { case (q, v) => assert(q != v) }
  }

  test("multi-probe LSH ANN: recall floor with bounded candidate fraction") {
    import org.apache.spark.sql.functions._
    val exact = Similarity.bruteForceTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val ann = Similarity.annTopK(spark, sf, k = 10).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(ann.nonEmpty, "ANN must produce candidates")
    val recall = exact.count(ann.contains).toDouble / exact.size
    // the whole pipeline is deterministic, so this is a real floor, not a
    // statistical one: measured 0.567 at sf0.001 with the home bucket +
    // flip-1-lowest-margin-bit probe (up from 0.40 home-bucket-only)
    assert(recall >= 0.5, s"ANN recall $recall")
    // every ANN hit must be a real corpus vector with correct ordering
    ann.foreach { case (q, v) => assert(q != v) }

    // multi-probe must NOT degenerate into brute force: reconstruct the
    // bucket join with the public bucket functions and bound the scored
    // candidate fraction of the full queries x corpus rectangle
    val v = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Dedup.quantized(col("embedding")).as("q")).cache()
    val corpus = (0 until Similarity.LshTables).map(t =>
      v.select(col("vec_id"), lit(t).as("tbl"),
        Similarity.lshBucket(col("q"), t).as("bucket"))).reduce(_ unionAll _)
    val qv = v.filter(col("vec_id") % 200 === 0)
    val probes = (0 until Similarity.LshTables).flatMap(t => Seq(
      qv.select(col("vec_id").as("query_id"), lit(t).as("tbl"),
        Similarity.lshBucket(col("q"), t).as("bucket")),
      qv.select(col("vec_id").as("query_id"), lit(t).as("tbl"),
        Similarity.lshNeighborBucket(col("q"), t, Similarity.LshPlanes)
          .as("bucket")))).reduce(_ unionAll _)
    val candidates = corpus.join(probes, Seq("tbl", "bucket"))
      .filter(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").distinct().count()
    val nQueries = qv.count()
    val nCorpus = v.count()
    val fraction = candidates.toDouble / (nQueries * (nCorpus - 1))
    assert(fraction <= 0.55,
      f"candidate fraction $fraction%.3f — probing stopped pruning")
    v.unpersist()
  }

  test("recall audit: counts reconcile with a direct replay of both arms, " +
    "and the pair caches are released") {
    val row = Similarity.annRecallAudit(spark, sf).head()
    val nQ = row.getAs[Long]("n_queries")
    val nTruth = row.getAs[Long]("n_truth")
    val nDet = row.getAs[Long]("n_detected")
    val nHits = row.getAs[Long]("n_hits")
    val recall = row.getAs[Long]("recall_milli")
    val worst = row.getAs[Long]("worst_recall_milli")
    // independent replay from the two arms the audit composes
    val truth = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    val det = Similarity.annTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id")))
    val hits = truth.toSet.intersect(det.toSet)
    assert(nQ == truth.map(_._1).distinct.length)
    assert(nTruth == truth.length && nDet == det.length)
    assert(nHits == hits.size)
    assert(recall == nHits * 1000 / nTruth)
    // worst single-query recall: the tail the mean hides
    val perQ = truth.groupBy(_._1).map { case (q, ts) =>
      ts.count(hits.contains) * 1000L / ts.length }
    assert(worst == perQ.min && worst <= recall)
    spark.catalog.clearCache()
    // eager audit releases its own truth/det persists before returning
    // (the blockingRecallOf contract); what may remain is annTopK's own
    // quantized-vector barrier, governed by the module cache contract
    val before = spark.sparkContext.getPersistentRDDs.size
    Similarity.annRecallAudit(spark, sf).head()
    val leaked = spark.sparkContext.getPersistentRDDs.size - before
    assert(leaked <= 1, s"$leaked cached frames survived annRecallAudit")
    spark.catalog.clearCache()
  }

  test("IVF recall audit reconciles with its arms and clears the suite's " +
    "IVF recall floor") {
    val row = Similarity.ivfRecallAudit(spark, sf).head()
    val truth = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val det = Similarity.ivfTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(row.getAs[Long]("n_truth") == truth.size)
    assert(row.getAs[Long]("n_detected") == det.size)
    assert(row.getAs[Long]("n_hits") == truth.intersect(det).size)
    val recall = row.getAs[Long]("recall_milli")
    assert(recall == truth.intersect(det).size * 1000L / truth.size)
    // the IVF suite test asserts >= 20% vs brute force; the audit row is
    // the same number surfaced as data
    assert(recall >= 200L, s"IVF recall collapsed: $recall milli")
    spark.catalog.clearCache()
  }

  test("top direction: three-round power iteration replays exactly in a " +
    "driver replica; direction is milli-normalized") {
    import org.apache.spark.sql.functions.col
    val q = graft.Tables.embeddings(spark, sf)
      .select(Dedup.quantized(col("embedding")).as("q")).collect()
      .map(_.getSeq[Long](0).toArray)
    val dim = q.head.length
    var v = Array.fill(dim)(1L); var w = Array.fill(dim)(0L)
    for (_ <- 1 to 3) {
      val s = q.map(row => row.indices.map(j => row(j) * v(j)).sum)
      w = Array.tabulate(dim)(j =>
        q.indices.map(i => q(i)(j) * s(i)).sum)
      val wmax = math.max(w.map(math.abs).max, 1L)
      v = w.map(x => math.signum(x) * ((BigInt(x).abs * 1000) / wmax).toLong)
    }
    val got = Similarity.topDirection(spark, sf).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("w_raw"), r.getAs[Long]("v_milli")))).toMap
    assert(got.size == dim)
    (0 until dim).foreach(j => assert(got(j) == ((w(j), v(j))), s"dim $j"))
    assert(got.values.map(t => math.abs(t._2)).max == 1000L)
    spark.catalog.clearCache()
  }

  test("k-center coreset library form: crafted compass points picked in " +
    "farthest-first order") {
    import spark.implicits._
    // unit vectors east, north, west, northeast; seed = min id (east);
    // farthest-first must then take west, north, northeast
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(-1.0f, 0.0f)), (4L, Array(0.7071f, 0.7071f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterCoresetOf(vecs, k = 4).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(got.map(_.getAs[Long]("center_id")).toSeq == Seq(1L, 3L, 2L, 4L))
    val ds = got.map(_.getAs[Long]("d2_from_set"))
    assert(ds.head == 0L)
    assert(ds.drop(1).zip(ds.drop(2)).forall { case (a, b) => b <= a })
  }

  test("k-center coreset: greedy farthest-point replays exactly; covering " +
    "radius is non-increasing") {
    import org.apache.spark.sql.functions.col
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Dedup.quantized(col("embedding")).as("q"))
      .collect().map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1).toArray)
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map(j => (a(j) - b(j)) * (a(j) - b(j))).sum
    var chosen = List((vecs.head._1, vecs.head._2, 0L))
    for (_ <- 2 to 8) {
      val (id, v, d) = vecs.map { case (id, v) =>
        (id, v, chosen.map(c => d2(v, c._2)).min)
      }.maxBy { case (id, _, d) => (d, -id) }
      chosen = chosen :+ ((id, v, d))
    }
    val got = Similarity.kcenterCoreset(spark, sf).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[Long]("center_id"), r.getAs[Long]("d2_from_set")))
    assert(got.toSeq == chosen.map(c => (c._1, c._3)).toSeq)
    // covering radius ladder: monotone non-increasing past the seed
    val ds = got.drop(1).map(_._2)
    assert(ds.zip(ds.drop(1)).forall { case (a, b) => b <= a }, ds.toSeq)
    spark.catalog.clearCache()
  }

  test("PQ recall audit reconciles with its arms and clears the PQ floor") {
    val row = Similarity.pqRecallAudit(spark, sf).head()
    val truth = Similarity.bruteForceTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    val det = Similarity.pqTopK(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("vec_id"))).toSet
    assert(row.getAs[Long]("n_truth") == truth.size)
    assert(row.getAs[Long]("n_detected") == det.size)
    assert(row.getAs[Long]("n_hits") == truth.intersect(det).size)
    // the PQ suite test asserts >= 0.6 vs brute force; same floor here
    assert(row.getAs[Long]("recall_milli") >= 600L,
      s"PQ recall collapsed: ${row.getAs[Long]("recall_milli")} milli")
    spark.catalog.clearCache()
  }

  test("fixed-panel audit twins: on a corpus whose every query vector " +
    "sits inside the panel, each twin equals its proportional gate form") {
    // sf0.001 has 200 vectors, so the every-200th query subset ({0}) is
    // a subset of the first-64-queries panel: the ONLY difference
    // between twin and gate — the query predicate — selects identical
    // sets, and the audits must be row-identical. A predicate drift in
    // either the Spark forms or the panel arithmetic breaks this.
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Similarity.pqRecallAuditFixedQ(spark, sf)) ==
      rows(Similarity.pqRecallAudit(spark, sf)))
    spark.catalog.clearCache()
    assert(rows(Similarity.annRecallAuditFixedQ(spark, sf)) ==
      rows(Similarity.annRecallAudit(spark, sf)))
    spark.catalog.clearCache()
    assert(rows(Similarity.ivfRecallAuditFixedQ(spark, sf)) ==
      rows(Similarity.ivfRecallAudit(spark, sf)))
    spark.catalog.clearCache()
  }

  test("semantic prune: one row per vector; pruned set equals a brute-force " +
    "replay of the gate within the returned clusters") {
    import org.apache.spark.sql.functions._
    val out = Similarity.semanticPrune(spark, sf).collect()
    val nCorpus = graft.Tables.embeddings(spark, sf).count()
    assert(out.length == nCorpus, "exactly one verdict per corpus vector")

    val qvecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Dedup.quantized(col("embedding")).as("q"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Long](1).toArray).toMap
    val cluster = out.map(r =>
      r.getAs[Long]("vec_id") -> r.getAs[Long]("centroid_id")).toMap
    def dot(a: Array[Long], b: Array[Long]): Long =
      a.iterator.zip(b.iterator).map { case (x, y) => x * y }.sum
    val ids = out.map(_.getAs[Long]("vec_id")).sorted
    val expected = ids.filter { b =>
      ids.exists { a =>
        a < b && cluster(a) == cluster(b) && {
          val d = dot(qvecs(a), qvecs(b))
          d > 0 && d * d * 25 > dot(qvecs(a), qvecs(a)) * dot(qvecs(b), qvecs(b)) * 4
        }
      }
    }.toSet
    val got = out.filter(_.getAs[Boolean]("pruned"))
      .map(_.getAs[Long]("vec_id")).toSet
    assert(got == expected, "keep-lowest-id survivor rule must replay exactly")
    assert(got.nonEmpty, "corpus contains cos>0.4 same-cluster pairs")
    // survivors: the lowest id of any within-cluster near-dup group is kept
    assert(!got.contains(ids.min))
  }

  test("semantic prune: planted duplicates land in their original's cluster " +
    "and are pruned (the SemDeDup claim)") {
    import org.apache.spark.sql.functions._
    val base = graft.Tables.embeddings(spark, sf).select("vec_id", "embedding")
    val dups = base.filter(col("vec_id") % 50 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
    val out = Similarity.semanticPruneOf(base.unionByName(dups)).collect()
    val byId = out.map(r => r.getAs[Long]("vec_id") -> r).toMap
    val planted = dups.collect().map(_.getAs[Long]("vec_id"))
    assert(planted.nonEmpty)
    planted.foreach { id =>
      val orig = byId(id - 1000000L)
      val dup = byId(id)
      // identical quantized vectors share the same argmax centroid (the
      // tie-break is deterministic), so the dup can never escape into a
      // cluster its original isn't in...
      assert(dup.getAs[Long]("centroid_id") == orig.getAs[Long]("centroid_id"),
        s"duplicate $id not in its original's cluster")
      // ...and cos(orig, dup) = 1 > 0.4 with the higher id, so it's pruned
      assert(dup.getAs[Boolean]("pruned"), s"planted duplicate $id not pruned")
    }
    spark.catalog.clearCache()
  }

  test("dim stats: exact integer moments and dead-dimension flag") {
    import spark.implicits._
    // quantized rows: [3,4]->[6000,8000], [4,3]->[8000,6000],
    // [0,5]->[0,10000]; dim0 {6000,8000,0}, dim1 {8000,6000,10000}
    val vecs = Seq(
      (1L, Array(3f, 4f)), (2L, Array(4f, 3f)), (3L, Array(0f, 5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.dimStatsOf(vecs).collect()
      .map(r => r.getAs[Int]("dim") ->
        ((r.getAs[Long]("n"), r.getAs[Long]("sum_q"), r.getAs[Long]("sumsq_q"),
          r.getAs[Long]("min_q"), r.getAs[Long]("max_q"),
          r.getAs[Long]("mean_milli"), r.getAs[Boolean]("is_dead")))).toMap
    assert(out(0) == ((3L, 14000L, 100000000L, 0L, 8000L, 4666666L, false)))
    assert(out(1) == ((3L, 24000L, 200000000L, 6000L, 10000L, 8000000L, false)))
    // a genuinely dead dimension: constant zero across the corpus
    val dead = Seq((1L, Array(0f, 1f)), (2L, Array(0f, 2f)))
      .toDF("vec_id", "embedding")
    val d = Similarity.dimStatsOf(dead).collect()
      .map(r => r.getAs[Int]("dim") -> r.getAs[Boolean]("is_dead")).toMap
    assert(d(0) && d(1)) // dim1 is constant 10000 after normalization
  }

  test("MMR re-rank agrees with a naive greedy replay on the real corpus") {
    val mmr = Similarity.mmrTopK(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
    val pool = Similarity.bruteForceTopK(spark, sf, Similarity.MmrPool)
      .collect().groupBy(_.getAs[Long]("query_id"))
    val vecs = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Dedup.quantized(col("embedding")).as("q"))
      .collect().map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Long]]("q").toArray).toMap
    def sim(a: Long, b: Long): Long =
      vecs(a).zip(vecs(b)).map { case (x, y) => x * y }.sum
    assert(mmr.keySet == pool.keySet && mmr.nonEmpty)
    mmr.foreach { case (qid, rows) =>
      // independent greedy reimplementation over the same candidate pool
      val cands = pool(qid)
        .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("dot"))
        .sortBy(_._1)
      var selected = Vector.empty[Long]
      var remaining = cands
      while (selected.size < Similarity.MmrK && remaining.nonEmpty) {
        val pick = remaining.maxBy { case (id, rel) =>
          val ms = if (selected.isEmpty) 0L else selected.map(sim(id, _)).max
          // maxBy keeps the FIRST max; ascending id order = lowest-id tie-break
          (700L * rel - 300L * ms, -id)
        }
        selected :+= pick._1
        remaining = remaining.filterNot(_._1 == pick._1)
      }
      val got = rows.sortBy(_.getAs[Int]("sel_rank")).map(_.getAs[Long]("vec_id")).toSeq
      assert(got == selected, s"query $qid: $got vs naive $selected")
    }
  }

  test("MMR diversifies: with a redundant near-cluster, picks span clusters") {
    import spark.implicits._
    // query (1,0,0); cluster A: 4 near-copies around an OFF-AXIS direction
    // (cos ~ 0.9 to the query, ~1.0 to each other); cluster B: one vector
    // at cos ~ 0.8 to the query but only ~ 0.46 to cluster A. Plain top-2
    // takes two A copies. For MMR's round 2 at lambda = 0.7:
    //   A2: 700*0.899e8 - 300*~1.0e8  ~ 3.3e10
    //   B:  700*0.800e8 - 300*0.458e8 ~ 4.2e10  -> B wins (diversifies).
    // (The off-axis cluster matters: if A sat ON the query axis, every
    // candidate's sim-to-A1 would equal its relevance and no lambda < 1
    // could ever flip.)
    val corpus = Seq(
      (1L, Array(0.900f, 0.436f, 0.000f)), (2L, Array(0.899f, 0.437f, 0.003f)),
      (3L, Array(0.898f, 0.438f, 0.006f)), (4L, Array(0.897f, 0.439f, 0.009f)),
      (5L, Array(0.800f, -0.600f, 0.000f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val plain = Similarity.bruteForceTopKOf(corpus, queries, 2)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(plain == Set(1L, 2L)) // both from cluster A
    val mmr = Similarity.mmrTopKOf(corpus, queries, pool = 5, k = 2)
      .collect().sortBy(_.getAs[Int]("sel_rank")).map(_.getAs[Long]("vec_id"))
    assert(mmr.head == 1L)       // relevance argmax first
    assert(mmr(1) == 5L, s"second pick ${mmr(1)} should cross to cluster B")
  }

  test("norm stats: buckets conserve the corpus, zero vectors flagged") {
    import spark.implicits._
    val rows = Similarity.normStats(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_vectors")).sum ==
      graft.Tables.embeddings(spark, sf).count())
    rows.foreach { r =>
      val b = r.getAs[Long]("bucket")
      assert(r.getAs[Long]("min_norm2") >= b * 1000000L)
      assert(r.getAs[Long]("max_norm2") < (b + 1) * 1000000L)
    }
    // a planted zero vector lands in bucket 0 with the flag set
    val planted = Seq((1L, Array.fill(64)(0.0f)), (2L, Array.fill(64)(0.5f)))
      .toDF("vec_id", "embedding")
    val z = Similarity.normStatsOf(planted).collect()
      .map(r => r.getAs[Long]("bucket") -> r.getAs[Long]("n_zero")).toMap
    assert(z(0L) == 1L)
  }
}
