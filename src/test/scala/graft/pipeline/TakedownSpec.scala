package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Takedown propagation on planted cluster geometry: re-election keeps
  * the cluster (new representative, possibly relocated), full revocation
  * drops it, member-only revocation leaves artifacts untouched, and
  * contaminated clusters never reach the manifest. Plus the
  * manifest/audit consistency invariants on real testdata. */
class TakedownSpec extends SparkSpec {

  // 10 tokens each, mean token length in [3,10] — passes the gate.
  // Cluster vocabularies are FULLY disjoint so no cluster shares a
  // single 3-gram shingle with the eval doc except X (identical text).
  private val textR = "apple banana cherry damson elder fig grape honey iris jasmine"
  private val textD = "stone river mountain valley forest desert ocean island cloud storm"
  private val textU = "red orange yellow green blue indigo violet black white gray"
  private val textM = "one two three four five six seven eight nine ten"
  private val textX = "lorem ipsum dolor sitam amet consect adipis elitsed dolore magna"

  // Revoked ids satisfy id % 131 == 5 (136, 267, 398, 529, 660); none
  // are % 97 == 0, so all sit on the corpus side of the eval slice.
  private lazy val planted = {
    import spark.implicits._
    Seq(
      194L -> textX, // eval slice (194 % 97 == 0): benchmark doc
      // cluster R: representative 136 revoked, 150 takes over
      136L -> textR, 150L -> textR,
      // cluster D: every member revoked -> dropped
      267L -> textD, 398L -> textD,
      // cluster U: untouched
      20L -> textU, 21L -> textU,
      // cluster M: only a NON-representative member revoked
      30L -> textM, 529L -> textM,
      // cluster X: revoked representative but contaminated (same text
      // as the eval doc -> 100% shingle containment)
      660L -> textX, 661L -> textX
    ).toDF("doc_id", "text").withColumn("source", lit("planted"))
  }

  private def splitOf(id: Long): String = {
    val b = (id * 48271L) % 100000L % 100L
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  test("manifest: re-election moves the cluster, drop removes it, " +
    "member-only and contaminated clusters are absent") {
    val rows = Takedown.manifestOf(planted).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_out"), r.getAs[Long]("n_dropped"),
          r.getAs[Long]("n_in"), r.getAs[Long]("tok_delta"))).toMap
    // cluster R: out at 136's location, in at 150's
    assert(rows((splitOf(136), 136L % 8)) == ((1L, 0L, 0L, -10L)))
    assert(rows((splitOf(150), 150L % 8)) == ((0L, 0L, 1L, 10L)))
    // cluster D: dropped at 267's location (267 = min(267, 398))
    assert(rows((splitOf(267), 267L % 8)) == ((1L, 1L, 0L, -10L)))
    // nothing else is dirty: U untouched, M keeps its representative,
    // X is decontaminated away
    assert(rows.size == 3)
  }

  test("audit: totals, survivor hits, drop/re-elect/relocate, dirty shards") {
    val r = Takedown.auditOf(planted).collect()(0)
    assert(r.getAs[Long]("n_revoked_docs") == 5)     // 136,267,398,529,660
    assert(r.getAs[Long]("n_clusters_touched") == 4) // R, D, M, X
    assert(r.getAs[Long]("n_survivor_hits") == 2)    // R, D (X contaminated)
    assert(r.getAs[Long]("n_clusters_dropped") == 1) // D
    assert(r.getAs[Long]("n_reelected") == 1)        // R
    // 136 % 8 = 0 vs 150 % 8 = 6 -> relocated even within 'train'
    assert(r.getAs[Long]("n_relocated") == 1)
    assert(r.getAs[Long]("n_shards_dirty") == 3)
  }

  test("empty revocation list: zero audit, empty manifest") {
    val calm = planted.filter(col("doc_id") % 131 =!= 5)
    assert(Takedown.manifestOf(calm).count() == 0)
    val r = Takedown.auditOf(calm).collect()(0)
    assert(r.getAs[Long]("n_revoked_docs") == 0)
    assert(r.getAs[Long]("n_clusters_touched") == 0)
    assert(r.getAs[Long]("n_survivor_hits") == 0)
    assert(r.getAs[Long]("n_shards_dirty") == 0)
  }

  test("postings audit: rewrite vs tombstone vs idf-refresh polarities") {
    import spark.implicits._
    // 'common' in docs 1..16 (doc 5 revoked): 1*8 < 16 -> tombstone,
    //   live df drops 1/16 < 10% -> no idf refresh;
    // 'rare' in docs 5+6: 1*8 >= 2 -> rewrite, df halves -> idf refresh;
    // 'clean' in docs 7+8: untouched
    val docs = (1L to 16L).map { id =>
      val extra = if (id == 5 || id == 6) " rare" else ""
      val extra2 = if (id == 7 || id == 8) " clean" else ""
      (id, s"common$extra$extra2")
    }.toDF("doc_id", "text")
    val r = Takedown.postingsAuditOf(docs).collect()(0)
    assert(r.getAs[Long]("n_tokens") == 3)
    assert(r.getAs[Long]("n_tokens_hit") == 2)
    assert(r.getAs[Long]("n_postings_total") == 20)
    assert(r.getAs[Long]("n_postings_revoked") == 2)
    assert(r.getAs[Long]("n_postings_rewrite") == 1)   // rare
    assert(r.getAs[Long]("n_postings_tombstone") == 1) // common
    assert(r.getAs[Long]("n_tombstoned_entries") == 1)
    assert(r.getAs[Long]("n_reclaimed_entries") == 1)
    assert(r.getAs[Long]("n_idf_refresh") == 1)        // rare only
  }

  test("e2e governance flagship: one row carrying all three audits") {
    val row = Takedown.e2eFlagship(spark, sf).collect()(0)
    assert(row.length == 25)
    // the composed arms equal their standalone queries
    val doc = Takedown.audit(spark, sf).collect()(0)
    Seq("n_revoked_docs", "n_clusters_touched", "n_survivor_hits",
      "n_shards_dirty").foreach { c =>
      assert(row.getAs[Long](c) == doc.getAs[Long](c), c)
    }
    val post = Takedown.postingsAudit(spark, sf).collect()(0)
    assert(row.getAs[Long]("n_postings_revoked") ==
      post.getAs[Long]("n_postings_revoked"))
    val ivf = graft.ml.Similarity.ivfTakedownAudit(spark, sf).collect()(0)
    assert(row.getAs[Long]("ivf_n_revoked") == ivf.getAs[Long]("n_revoked"))
    assert(row.getAs[Long]("ivf_n_lists_hit") ==
      ivf.getAs[Long]("n_lists_hit"))
  }

  test("manifest and audit agree on real testdata") {
    val docs = graft.Tables.documents(spark, sf)
    val m = Takedown.manifestOf(docs)
      .agg(coalesce(sum(col("n_out")), lit(0L)).as("o"),
        coalesce(sum(col("n_dropped")), lit(0L)).as("d"),
        coalesce(sum(col("n_in")), lit(0L)).as("i"),
        count(lit(1)).as("dirty"))
      .collect()(0)
    val a = Takedown.auditOf(docs).collect()(0)
    assert(m.getAs[Long]("o") == a.getAs[Long]("n_survivor_hits"))
    assert(m.getAs[Long]("d") == a.getAs[Long]("n_clusters_dropped"))
    assert(m.getAs[Long]("i") == a.getAs[Long]("n_reelected"))
    assert(m.getAs[Long]("dirty") == a.getAs[Long]("n_shards_dirty"))
    // the takedown is a sliver: impacted clusters are a small fraction
    // of the corpus (the revocation list is ~0.8% of docs)
    val total = docs.count()
    assert(a.getAs[Long]("n_survivor_hits") <= total / 50)
  }

  test("mv refresh on planted geometry: re-election keeps the cluster " +
    "seated (relocated), drop removes it, members/contamination inert") {
    val got = Takedown.mvRefreshOf(planted).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    // post-takedown representatives: R -> 150, D dropped, U -> 20,
    // M -> 30 (member-only revocation), X decontaminated away. Every
    // planted text is 10 tokens.
    val reps = Seq(150L, 20L, 30L)
    val want = reps.groupBy(id => (splitOf(id), id % 8))
      .map { case (k, ids) => k -> (ids.size.toLong, ids.size * 10L) }
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("mv refresh equals the post-takedown recompute on real testdata " +
    "and the refreshed totals reconcile with the manifest's token flow") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Takedown.mvRefreshOf(docs).collect()
      .map(r => (r.getAs[String]("split"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))).toMap
    assert(got.nonEmpty)
    // independent driver-side recompute (zero merge algebra): the
    // post-takedown representative set, located and folded in Scala
    val cont = graft.ml.Dedup.trainContaminationOf(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val post = Takedown.clustersOf(docs)
      .filter(col("new_id").isNotNull).select("new_id", "n_toks")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .filterNot { case (id, _) => cont(id) }
    val want = post.groupBy { case (id, _) =>
      (Takedown.splitOfId(id), id % 8) }
      .map { case (k, rows) => k -> (rows.size.toLong, rows.map(_._2).sum) }
    assert(got == want)
    // and the MV delta equals the manifest's declared token flow
    val tokDelta = Takedown.manifestOf(docs)
      .agg(coalesce(sum(col("tok_delta")), lit(0L))).collect()(0).getLong(0)
    val baseTotal = {
      val cl = Takedown.clustersOf(docs)
        .filter(col("old_id").isNotNull).select("old_id", "n_toks")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .filterNot { case (id, _) => cont(id) }
      cl.map(_._2).sum
    }
    assert(got.values.map(_._2).sum == baseTotal + tokDelta)
    spark.catalog.clearCache()
  }

  test("postings panel audit: per-token rows bounded by the wide-panel " +
    "vocabulary, consistent with the whole-index audit's thresholds") {
    val terms = graft.ml.TextOps.ProxPanelWide.flatMap(_._2).distinct
    val rows = Takedown.postingsPanelAuditOf(
      graft.Tables.documents(spark, sf)).collect()
    assert(rows.nonEmpty && rows.length <= terms.size)
    assert(rows.forall(r => terms.contains(r.getAs[String]("token"))))
    rows.foreach { r =>
      val (m, rv) = (r.getAs[Long]("m"), r.getAs[Long]("r"))
      val denom = graft.ml.Similarity.TakedownCompactDenom
      val want =
        if (rv == 0) "clean"
        else if (rv * denom >= m) "rewrite" else "tombstone"
      assert(r.getAs[String]("action") == want, r.toString)
      val wantIdf = if (rv > 0 && (m - rv) * 10 < m * 9) 1L else 0L
      assert(r.getAs[Long]("idf_refresh") == wantIdf, r.toString)
    }
  }
}
