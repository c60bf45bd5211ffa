package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{Revocation, ShardDelta, Takedown}

/** The composed streaming worker loop, end to end — this repo's own
  * components on one interleaved timeline (the reference has no such
  * composed loop; its etl/worker.py is a queue job poller with
  * per-job-type dispatch, which [[graft.sources.Adapters]] models
  * separately): ingest batches flow through the
  * durable near-dup ADMISSION index, a REVOCATION arrives on the
  * governance feed mid-stream, SERVES interleave with both, and the
  * per-(split, shard) corpus MV is maintained continuously from the
  * same delta feed. Each piece has its own batch-equality spec
  * (IncrementalSyncSpec admission, TakedownStreamSpec governance->MV,
  * RagStreamSpec serving, IvmStreamSpec maintenance); THIS spec pins
  * the composition invariants across an interleaved timeline:
  *
  *   1. a serve only ever sees the admitted-minus-revoked corpus —
  *      its results equal the batch serve over exactly that corpus,
  *      at every point in the timeline;
  *   2. rejected near-dups never surface anywhere downstream;
  *   3. the MV equals the batch recompute of the CURRENT curated
  *      corpus after every ingest/revocation event, not just at the
  *      end.
  */
class WorkerLoopStreamSpec extends SparkSpec {
  import spark.implicits._

  private def keys(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("interleaved ingest -> admission -> revocation -> serve keeps the " +
    "serve on the admitted-minus-revoked corpus and the MV consistent " +
    "throughout") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-worker").toString
    val docsAll = graft.Tables.documents(spark, sf)
    val embsAll = graft.Tables.embeddings(spark, sf)
    // driver-side doc universe: id -> (text, whitespace token count);
    // 500 docs — a bounded test fixture, not corpus data
    val universe = docsAll.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(1).split(" ").count(_.nonEmpty).toLong)))
      .toMap

    // --- the MV recompute truth for any curated set -------------------
    def mvTruth(curated: Set[Long]): Map[Long, (Long, Long)] =
      curated.groupBy(id =>
        Takedown.splitIndexOf(Takedown.splitOfId(id)) * 8 + id % 8)
        .map { case (k, ids) =>
          k -> (ids.size.toLong, ids.toSeq.map(universe(_)._2).sum)
        }

    // --- continuous MV maintainer over the shard-delta topic ----------
    val mvLive = scala.collection.mutable.Map[Long, (Long, Long)]()
    val mvFeed = MemoryStream[ShardDelta]
    val mvQ = graft.sync.Ivm
      .mvStreamOf(Takedown.shardDeltasAsMvDeltas(mvFeed.toDS()))
      .writeStream.outputMode("update")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.sync.MvLive], _: Long) =>
          df.collect().foreach { r =>
            if (r.n == 0) mvLive.remove(r.k) else mvLive(r.k) = (r.n, r.s)
          }
      }
      .start()
    def mvApply(deltas: Seq[ShardDelta]): Unit = {
      mvFeed.addData(deltas)
      mvQ.processAllAvailable()
    }
    def seatDeltas(ids: Set[Long]): Seq[ShardDelta] = ids.toSeq.sorted.map(
      id => ShardDelta(Takedown.splitOfId(id), id % 8, 1L, id, universe(id)._2))

    // --- the admission pipeline over the ingest feed -------------------
    IncrementalSync.seedAdmissionIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), s"$dir/index")
    val ingest = MemoryStream[(Long, String)]
    val admitQ = IncrementalSync.admissionPipeline(
      ingest.toDS().toDF("doc_id", "text"), s"$dir/index", s"$dir/out")
    def verdictsNow(): Map[Long, (String, Option[Long])] =
      spark.read.parquet(s"$dir/out/verdicts").collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[String]("status"),
          if (r.isNullAt(r.fieldIndex("dup_of"))) None
          else Some(r.getAs[Long]("dup_of"))))
      }.toMap
    def admittedNow(): Set[Long] =
      verdictsNow().collect { case (id, ("admit", _)) => id }.toSet

    // --- a serve against the CURRENT curated corpus --------------------
    def curatedFrames(curated: Set[Long]): (DataFrame, DataFrame) = (
      docsAll.filter(col("doc_id").isInCollection(curated)),
      embsAll.filter(col("vec_id").isInCollection(curated)))
    def serve(curated: Set[Long], qids: Seq[Long]): Seq[String] = {
      val (docsC, embsC) = curatedFrames(curated)
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val resultDocs = scala.collection.mutable.Set[Long]()
      val qFeed = MemoryStream[Long]
      val q = graft.ml.RagFlagship.ragServeStreamOf(qFeed.toDS(), docsC,
        embsC) { df =>
        val rows = df.collect()
        got ++= keys(rows)
        resultDocs ++= rows.map(_.getAs[Long]("doc_id"))
      }
      try {
        qFeed.addData(qids)
        q.processAllAvailable()
      } finally q.stop()
      // invariant 1: everything served is in the curated corpus
      assert(resultDocs.subsetOf(curated),
        s"serve leaked non-curated docs: ${resultDocs.diff(curated)}")
      // and equals the batch serve over exactly that corpus
      val want = keys(graft.ml.RagFlagship
        .ragServeOf(docsC, embsC, c => c.isInCollection(qids)).collect())
      assert(got.sorted.toSeq == want, "stream serve != batch serve")
      spark.catalog.clearCache()
      got.toSeq
    }

    try {
      // ===== phase A: ingest batch 1 ====================================
      val batch1 = (0L until 250L).map(id => (id, universe(id)._1))
      ingest.addData(batch1)
      admitQ.processAllAvailable()
      val a1 = admittedNow()
      assert(a1.nonEmpty && a1.subsetOf(batch1.map(_._1).toSet))
      mvApply(seatDeltas(a1))
      assert(mvLive.toMap == mvTruth(a1), "MV drifted after ingest 1")

      // ===== phase B: serve 1 (sees exactly A1) ========================
      val qids = a1.toSeq.sorted.take(3)
      val serve1 = serve(a1, qids)
      assert(serve1.nonEmpty)
      val serve1Docs = serve1.map(_.split('|')(2).toLong).toSet

      // ===== phase C: ingest batch 2 (novel + exact dups of A1) ========
      // dup sources: admitted long docs — their copies MUST be rejected
      val dupSrcs = a1.toSeq.sorted.filter(universe(_)._2 >= 5).take(5)
      val batch2 = (250L until 500L).map(id => (id, universe(id)._1)) ++
        dupSrcs.zipWithIndex.map { case (src, i) =>
          (10000L + i, universe(src)._1)
        }
      ingest.addData(batch2)
      admitQ.processAllAvailable()
      val verdicts = verdictsNow()
      dupSrcs.zipWithIndex.foreach { case (src, i) =>
        val (status, dupOf) = verdicts(10000L + i)
        assert(status == "reject" && dupOf.contains(src),
          s"exact copy of admitted $src was not rejected: ${verdicts(10000L + i)}")
      }
      val a12 = admittedNow()
      assert(!a12.exists(_ >= 10000L), "a rejected dup leaked into the corpus")
      mvApply(seatDeltas(a12 -- a1))
      assert(mvLive.toMap == mvTruth(a12), "MV drifted after ingest 2")

      // ===== phase D: revocation arrives on the governance feed ========
      // revoke a doc serve 1 surfaced (not a query), plus a spread of
      // other curated docs — single-doc clusters, so each revocation is
      // a -1 seat with no re-election
      val revokeServed = (serve1Docs -- qids).toSeq.sorted.headOption
      val revoked = (revokeServed.toSeq ++
        (a12 -- qids).toSeq.sorted.takeRight(4)).distinct
      assert(revoked.nonEmpty)
      val members = a12.toSeq.sorted
        .map(id => (s"d$id", id, universe(id)._2)).toDF("h", "doc_id", "n_toks")
      var tdDeltas = Vector.empty[ShardDelta]
      val revFeed = MemoryStream[Revocation]
      val tdQ = Takedown.takedownStreamOf(revFeed.toDS(), members)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ShardDelta],
                         _: Long) => tdDeltas ++= df.collect() }
        .start()
      try {
        revFeed.addData(revoked.map(Revocation(_)))
        tdQ.processAllAvailable()
      } finally tdQ.stop()
      assert(tdDeltas.map(_.rep).toSet == revoked.toSet &&
        tdDeltas.forall(_.delta == -1L))
      mvApply(tdDeltas)
      val curated2 = a12 -- revoked
      assert(mvLive.toMap == mvTruth(curated2), "MV drifted after revocation")

      // ===== phase E: serve 2 (sees exactly A12 minus revoked) =========
      val serve2 = serve(curated2, qids)
      val serve2Docs = serve2.map(_.split('|')(2).toLong).toSet
      revokeServed.foreach { r =>
        assert(!serve2Docs.contains(r),
          s"revoked doc $r still served after takedown")
      }
    } finally {
      admitQ.stop()
      mvQ.stop()
      spark.catalog.clearCache()
    }
  }

  test("checkpoint recovery: the composed loop stopped and restarted " +
    "mid-timeline (between an admission and a revocation) keeps all " +
    "three invariants") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-worker-rs").toString
    val docsAll = graft.Tables.documents(spark, sf)
    val embsAll = graft.Tables.embeddings(spark, sf)
    val universe = docsAll.select("doc_id", "text").collect()
      .map(r => r.getLong(0) ->
        ((r.getString(1), r.getString(1).split(" ").count(_.nonEmpty).toLong)))
      .toMap
    def mvTruth(curated: Set[Long]): Map[Long, (Long, Long)] =
      curated.groupBy(id =>
        Takedown.splitIndexOf(Takedown.splitOfId(id)) * 8 + id % 8)
        .map { case (k, ids) =>
          k -> (ids.size.toLong, ids.toSeq.map(universe(_)._2).sum)
        }
    def seatDeltas(ids: Set[Long]): Seq[ShardDelta] = ids.toSeq.sorted.map(
      id => ShardDelta(Takedown.splitOfId(id), id % 8, 1L, id, universe(id)._2))

    // both stateful queries get DURABLE checkpoints so a restart resumes
    // offsets (admission: which ingest batches are committed) and state
    // (MV: the flatMapGroupsWithState store) instead of replaying from
    // scratch — the worker-restart contract the reference's poller gets
    // from its queue's visibility timeout
    val mvLive = scala.collection.mutable.Map[Long, (Long, Long)]()
    val mvFeed = MemoryStream[ShardDelta]
    def startMv() = graft.sync.Ivm
      .mvStreamOf(Takedown.shardDeltasAsMvDeltas(mvFeed.toDS()))
      .writeStream.outputMode("update")
      .option("checkpointLocation", s"$dir/mvckpt")
      .foreachBatch {
        (df: org.apache.spark.sql.Dataset[graft.sync.MvLive], _: Long) =>
          df.collect().foreach { r =>
            if (r.n == 0) mvLive.remove(r.k) else mvLive(r.k) = (r.n, r.s)
          }
      }
      .start()
    IncrementalSync.seedAdmissionIndex(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), s"$dir/index")
    val ingest = MemoryStream[(Long, String)]
    def startAdmit() = IncrementalSync.admissionPipeline(
      ingest.toDS().toDF("doc_id", "text"), s"$dir/index", s"$dir/out")
    def admittedNow(): Map[Long, (String, Option[Long])] =
      spark.read.parquet(s"$dir/out/verdicts").collect().map { r =>
        r.getAs[Long]("doc_id") -> ((r.getAs[String]("status"),
          if (r.isNullAt(r.fieldIndex("dup_of"))) None
          else Some(r.getAs[Long]("dup_of"))))
      }.toMap

    var admitQ = startAdmit()
    var mvQ = startMv()
    try {
      // ---- phase A: ingest + seat batch 1, then CRASH the worker -----
      val batch1 = (0L until 200L).map(id => (id, universe(id)._1))
      ingest.addData(batch1)
      admitQ.processAllAvailable()
      val a1 = admittedNow().collect { case (id, ("admit", _)) => id }.toSet
      assert(a1.nonEmpty)
      mvFeed.addData(seatDeltas(a1))
      mvQ.processAllAvailable()
      assert(mvLive.toMap == mvTruth(a1), "MV drifted before the restart")
      admitQ.stop()
      mvQ.stop()

      // ---- arrivals while the worker is DOWN -------------------------
      // novel docs + exact copies of pre-restart admissions: the copies
      // can only be rejected if the durable index (and the checkpoint's
      // batch frontier) survived the restart
      val dupSrcs = a1.toSeq.sorted.filter(universe(_)._2 >= 5).take(5)
      val batch2 = (200L until 400L).map(id => (id, universe(id)._1)) ++
        dupSrcs.zipWithIndex.map { case (src, i) => (20000L + i, universe(src)._1) }
      ingest.addData(batch2)

      // ---- RESTART from the checkpoints ------------------------------
      admitQ = startAdmit()
      mvQ = startMv()
      admitQ.processAllAvailable()
      val verdicts = admittedNow()
      // invariant 2 across the restart: copies of admitted docs rejected
      dupSrcs.zipWithIndex.foreach { case (src, i) =>
        val (status, dupOf) = verdicts(20000L + i)
        assert(status == "reject" && dupOf.contains(src),
          s"post-restart copy of admitted $src not rejected: ${verdicts(20000L + i)}")
      }
      // pre-restart verdicts survive unchanged (no replay duplication:
      // one verdict row per doc id)
      assert(batch1.map(_._1).forall(id => verdicts.contains(id)))
      val a12 = verdicts.collect { case (id, ("admit", _)) => id }.toSet
      assert(a1.subsetOf(a12) && !a12.exists(_ >= 20000L))
      mvFeed.addData(seatDeltas(a12 -- a1))
      mvQ.processAllAvailable()
      // invariant 3: the restarted MV state resumed, not restarted at 0
      assert(mvLive.toMap == mvTruth(a12), "MV drifted across the restart")

      // ---- the revocation the restart interrupted --------------------
      val revoked = (a12 -- a1).toSeq.sorted.take(3)
      assert(revoked.nonEmpty)
      val members = a12.toSeq.sorted
        .map(id => (s"d$id", id, universe(id)._2)).toDF("h", "doc_id", "n_toks")
      var tdDeltas = Vector.empty[ShardDelta]
      val revFeed = MemoryStream[Revocation]
      val tdQ = Takedown.takedownStreamOf(revFeed.toDS(), members)
        .writeStream.outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[ShardDelta],
                         _: Long) => tdDeltas ++= df.collect() }
        .start()
      try {
        revFeed.addData(revoked.map(Revocation(_)))
        tdQ.processAllAvailable()
      } finally tdQ.stop()
      mvFeed.addData(tdDeltas)
      mvQ.processAllAvailable()
      val curated = a12 -- revoked
      assert(mvLive.toMap == mvTruth(curated),
        "MV drifted after the post-restart revocation")

      // ---- invariant 1: a serve sees admitted-minus-revoked ----------
      val qids = a1.toSeq.sorted.take(3)
      val docsC = docsAll.filter(col("doc_id").isInCollection(curated))
      val embsC = embsAll.filter(col("vec_id").isInCollection(curated))
      val got = scala.collection.mutable.ArrayBuffer[String]()
      val resultDocs = scala.collection.mutable.Set[Long]()
      val qFeed = MemoryStream[Long]
      val q = graft.ml.RagFlagship.ragServeStreamOf(qFeed.toDS(), docsC,
        embsC) { df =>
        val rows = df.collect()
        got ++= keys(rows)
        resultDocs ++= rows.map(_.getAs[Long]("doc_id"))
      }
      try {
        qFeed.addData(qids)
        q.processAllAvailable()
      } finally q.stop()
      assert(resultDocs.subsetOf(curated),
        s"serve leaked non-curated docs: ${resultDocs.diff(curated)}")
      assert(resultDocs.intersect(revoked.toSet).isEmpty,
        "a revoked doc surfaced in the post-restart serve")
      val want = keys(graft.ml.RagFlagship
        .ragServeOf(docsC, embsC, c => c.isInCollection(qids)).collect())
      assert(got.sorted.toSeq == want,
        "post-restart stream serve != batch serve")
    } finally {
      admitQ.stop()
      mvQ.stop()
      spark.catalog.clearCache()
    }
  }
}
