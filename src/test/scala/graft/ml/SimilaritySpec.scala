package graft.ml

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
}
