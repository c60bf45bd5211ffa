package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.pipeline.{Revocation, ShardDelta, Takedown}

/** Restart-point PROPERTY over the composed worker loop (VERDICT r17
  * #6): where WorkerLoopStreamSpec's checkpoint test stops/restarts at
  * ONE chosen boundary, this spec replays the same
  * ingest -> admit -> seat -> ingest -> seat -> revoke -> seat
  * timeline once PER micro-batch boundary, crashing both stateful
  * queries (admission + MV) right after that boundary, letting new
  * arrivals queue while the worker is down — copies of already-admitted
  * docs plus novel docs — and asserting after the restart that:
  *
  *  1. every queued copy of a pre-crash admission is REJECTED with the
  *     correct dup_of (durable index + checkpointed batch frontier
  *     survived);
  *  2. pre-crash verdicts survive unchanged and novel queued docs are
  *     admitted (no replay duplication, no loss);
  *  3. the MV equals the batch recompute of the current curated set at
  *     every subsequent boundary (state resumed, not refolded from
  *     zero), including through the post-restart revocation;
  *  4. a final serve sees exactly admitted-minus-revoked and equals the
  *     batch serve over that corpus.
  *
  * The timeline events and the invariant checks are the SAME closures
  * for every restart point — only the crash position moves — so a
  * regression at any specific boundary (e.g. between a seat and a
  * revocation) is pinned by the failing parameter, not a bespoke test. */
class WorkerLoopRestartPropSpec extends SparkSpec {
  import spark.implicits._

  private def keys(rows: Array[org.apache.spark.sql.Row]): Seq[String] =
    rows.map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted

  test("all three worker-loop invariants hold across a crash-restart at " +
    "EVERY micro-batch boundary of the timeline") {
    implicit val sqlCtx = spark.sqlContext
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

    // one full timeline run with a crash after boundary `crashAfter`
    // (0-based index into the boundary list below); returns unit,
    // failing assertions name the restart point
    def run(crashAfter: Int): Unit = {
      val tag = s"restart@$crashAfter"
      val dir = java.nio.file.Files
        .createTempDirectory(s"graft-worker-rp$crashAfter").toString
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
      def verdictsNow(): Map[Long, (String, Option[Long])] =
        spark.read.parquet(s"$dir/out/verdicts").collect().map { r =>
          r.getAs[Long]("doc_id") -> ((r.getAs[String]("status"),
            if (r.isNullAt(r.fieldIndex("dup_of"))) None
            else Some(r.getAs[Long]("dup_of"))))
        }.toMap
      def admittedNow(): Set[Long] =
        verdictsNow().collect { case (id, ("admit", _)) => id }.toSet

      var admitQ = startAdmit()
      var mvQ = startMv()
      // mutable timeline state threaded through the boundaries
      var admitted = Set.empty[Long]
      var curated = Set.empty[Long]
      var revokedAll = Set.empty[Long]
      def seat(ids: Set[Long]): Unit = {
        mvFeed.addData(ids.toSeq.sorted.map(id => ShardDelta(
          Takedown.splitOfId(id), id % 8, 1L, id, universe(id)._2)))
        mvQ.processAllAvailable()
        curated ++= ids
        assert(mvLive.toMap == mvTruth(curated), s"[$tag] MV drifted at seat")
      }
      def ingestBatch(batch: Seq[(Long, String)]): Unit = {
        ingest.addData(batch)
        admitQ.processAllAvailable()
        admitted = admittedNow()
      }
      def revokeBoundary(): Unit = {
        val revoked = curated.toSeq.sorted.takeRight(3)
        assert(revoked.nonEmpty)
        val members = curated.toSeq.sorted
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
          tdDeltas.forall(_.delta == -1L), s"[$tag] takedown deltas wrong")
        mvFeed.addData(tdDeltas)
        mvQ.processAllAvailable()
        curated = curated -- revoked
        revokedAll ++= revoked
        assert(mvLive.toMap == mvTruth(curated),
          s"[$tag] MV drifted after revocation")
      }

      val batch1 = (0L until 120L).map(id => (id, universe(id)._1))
      val batch2 = (120L until 240L).map(id => (id, universe(id)._1))
      // the boundary list: each entry is one micro-batch boundary of
      // the composed loop (admission or MV micro-batch)
      val boundaries: Seq[() => Unit] = Seq(
        () => ingestBatch(batch1),
        () => seat(admitted -- curated -- revokedAll),
        () => ingestBatch(batch2),
        () => seat(admitted -- curated -- revokedAll),
        () => revokeBoundary())

      try {
        boundaries.zipWithIndex.foreach { case (b, i) =>
          b()
          if (i == crashAfter) {
            // ---- CRASH both stateful queries -------------------------
            admitQ.stop()
            mvQ.stop()
            // arrivals while the worker is down: copies of admitted
            // docs (must be rejected post-restart) + novel docs
            val preAdmitted = admitted
            val dupSrcs = preAdmitted.toSeq.sorted
              .filter(universe(_)._2 >= 5).take(3)
            assert(dupSrcs.nonEmpty, s"[$tag] fixture: no dup sources")
            val novel = (300L until 330L).map(id => (id, universe(id)._1))
            ingest.addData(novel ++ dupSrcs.zipWithIndex.map {
              case (src, j) => (40000L + j, universe(src)._1)
            })
            // ---- RESTART from the checkpoints ------------------------
            admitQ = startAdmit()
            mvQ = startMv()
            admitQ.processAllAvailable()
            val verdicts = verdictsNow()
            dupSrcs.zipWithIndex.foreach { case (src, j) =>
              val (status, dupOf) = verdicts(40000L + j)
              assert(status == "reject" && dupOf.contains(src),
                s"[$tag] post-restart copy of admitted $src not rejected: " +
                  s"${verdicts(40000L + j)}")
            }
            // pre-crash verdicts survived; nothing replayed twice
            assert(preAdmitted.forall(id =>
              verdicts.get(id).exists(_._1 == "admit")),
              s"[$tag] a pre-crash admission verdict was lost")
            admitted = verdicts.collect { case (id, ("admit", _)) => id }.toSet
            assert(!admitted.exists(_ >= 40000L),
              s"[$tag] a rejected dup leaked into the corpus")
            // the MV resumes from checkpointed state: seat the docs
            // admitted while down (never re-seating a revoked doc) and
            // compare against the batch truth
            seat(admitted -- curated -- revokedAll)
          }
        }
        // ---- final serve: sees exactly admitted-minus-revoked --------
        val qids = curated.toSeq.sorted.take(2)
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
          s"[$tag] serve leaked non-curated docs: ${resultDocs.diff(curated)}")
        val want = keys(graft.ml.RagFlagship
          .ragServeOf(docsC, embsC, c => c.isInCollection(qids)).collect())
        assert(got.sorted.toSeq == want,
          s"[$tag] post-restart stream serve != batch serve")
      } finally {
        admitQ.stop()
        mvQ.stop()
        spark.catalog.clearCache()
      }
    }

    // the property: one full timeline run per restart point
    (0 until 5).foreach(run)
  }
}
