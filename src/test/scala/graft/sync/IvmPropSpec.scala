package graft.sync

import graft.SparkSpec

/** The merge == recompute theorem behind the IVM oracles, mechanized on
  * random changelogs: for any base fact set and any consistent signed
  * changelog (deletes/updates of existing facts, inserts of new ones),
  * folding the changelog into the base MV must equal recomputing the MV
  * from the post-changelog facts — including keys that vanish (all rows
  * deleted) and keys born by inserts. The registered fixture exercises
  * ONE changelog shape; this pins the algebra on many. */
class IvmPropSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic LCG world: base facts + a consistent changelog. */
  private def world(seed: Long): (Seq[(Long, Long)], Seq[(Long, Long, Long)],
      Seq[(Long, Long)]) = {
    var s = seed * 2654435761L + 12345L
    def next(mod: Int): Int = { s = (s * 48271) % 2147483647L; (s % mod).toInt }
    val base = (0 until 40).map { i =>
      (next(12).toLong, (next(1000) + 1).toLong)
    }
    val actions = base.map { case (k, v) =>
      (k, v, next(4)) // 0/1: keep, 2: delete, 3: update
    }
    val deletes = actions.filter(_._3 == 2).map { case (k, v, _) => (k, -1L, v) }
    val updates = actions.filter(_._3 == 3).flatMap { case (k, v, _) =>
      Seq((k, -1L, v), (k, 1L, v + next(500) + 1L))
    }
    val inserts = (0 until next(15)).map { _ =>
      (next(20).toLong, 1L, (next(1000) + 1).toLong) // keys 12..19 are fresh
    }
    val changelog = deletes ++ updates ++ inserts
    // post-changelog facts, from the same action assignments
    val kept = actions.filter(a => a._3 <= 1).map { case (k, v, _) => (k, v) }
    val updated = updates.filter(_._2 > 0).map { case (k, _, v) => (k, v) }
    val inserted = inserts.map { case (k, _, v) => (k, v) }
    (base, changelog, kept ++ updated ++ inserted)
  }

  private def mvOf(facts: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    facts.groupBy(_._1).map { case (k, rows) =>
      k -> (rows.size.toLong, rows.map(_._2).sum)
    }

  test("merge equals recompute on random changelogs, three seeds") {
    for (seed <- Seq(7L, 42L, 1001L)) {
      val (base, changelog, newFacts) = world(seed)
      val baseMv = base.toDF("k", "v")
        .groupBy("k")
        .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
          org.apache.spark.sql.functions.sum("v").as("s"))
      val merged = Ivm.mergeOf(baseMv, changelog.toDF("k", "sign", "v"))
        .collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
      assert(merged == mvOf(newFacts), s"seed $seed diverged")
    }
  }

  test("empty changelog is the identity; total deletion empties the MV") {
    val base = Seq((1L, 10L), (1L, 20L), (2L, 5L))
    val baseMv = base.toDF("k", "v")
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
    val idMerged = Ivm.mergeOf(baseMv,
      Seq.empty[(Long, Long, Long)].toDF("k", "sign", "v"))
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(idMerged == mvOf(base))
    val wipe = base.map { case (k, v) => (k, -1L, v) }
    assert(Ivm.mergeOf(baseMv, wipe.toDF("k", "sign", "v")).count() == 0)
  }

  test("CMS cell merge equals a grid rebuild from the new state") {
    import org.apache.spark.sql.functions._
    val merged = Ivm.cmsMergeRefresh(spark, sf).collect()
      .map(r => (r.getAs[Long]("depth"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    val rebuilt = Ivm.newStateOf(graft.Tables.orders(spark, sf))
      .select(explode(graft.metrics.Dashboard.cmsBuckets(col("k"))).as("e"))
      .groupBy(col("e.depth").cast("long").as("depth"),
        col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getAs[Long]("depth"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("cnt")).toMap
    assert(merged == rebuilt)
    assert(merged.nonEmpty)
  }

  test("revocation-shaped changelogs: the takedown MV refresh (signed " +
    "deltas from cluster drops/re-elections through mergeOf) equals the " +
    "post-takedown recompute for varied revocation lists") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val cont = graft.ml.Dedup.trainContaminationOf(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // sparse sliver shapes (the registered fixture among them) plus the
    // dense backfill shape (half the corpus revoked) — the case where a
    // delta-bounded changelog is NOT small relative to the MV
    for ((m, r) <- Seq((131L, 5L), (7L, 3L), (11L, 0L), (2L, 1L))) {
      val rev = (c: org.apache.spark.sql.Column) => c % m === r
      val got = graft.pipeline.Takedown.mvRefreshOf(docs, rev).collect()
        .map(x => (x.getAs[String]("split"), x.getAs[Long]("shard")) ->
          (x.getAs[Long]("n_docs"), x.getAs[Long]("n_tokens"))).toMap
      val post = graft.pipeline.Takedown.clustersOf(docs, rev)
        .filter(col("new_id").isNotNull).select("new_id", "n_toks")
        .collect().map(x => (x.getLong(0), x.getLong(1)))
        .filterNot { case (id, _) => cont(id) }
      val want = post.groupBy { case (id, _) =>
        (graft.pipeline.Takedown.splitOfId(id), id % 8) }
        .map { case (k, rows) =>
          k -> (rows.size.toLong, rows.map(_._2).sum) }
      assert(got == want, s"revocation shape id % $m == $r diverged")
      assert(got.nonEmpty, s"degenerate fixture at id % $m == $r")
      spark.catalog.clearCache()
    }
  }

  test("registered fixture: merge output never rescans post-changelog " +
    "facts yet matches their recompute") {
    val merged = Ivm.mergeRefresh(spark, sf).collect()
      .map(r => r.getAs[Long]("o_custkey") ->
        (r.getAs[Long]("n_orders"), r.getAs[Long]("sum_cents"))).toMap
    val recomputed = Ivm.newStateOf(graft.Tables.orders(spark, sf))
      .groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
      .collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
    assert(merged == recomputed)
    assert(merged.nonEmpty)
  }
}
