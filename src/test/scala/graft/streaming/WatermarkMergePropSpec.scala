package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import IncrementalSync._

/** Property check for the watermark-advance MERGE under two interleaved
  * update feeds (VERDICT r12 ask #3) — FunnelPropSpec's structure on the
  * S9/ST2 path: random corpora, fixed ScalaCheck seeds, streaming result
  * equals a driver-side batch fold.
  *
  * Two MemoryStreams play two concurrent sources (e.g. two CRM regions)
  * emitting updates for the SAME (tenant, case) keys. The production
  * shape for concurrent feeds into ONE stateful merge is a source UNION
  * into a single query — Spark forbids two queries sharing a checkpoint,
  * so "concurrent micro-batches" means both sources contribute rows to
  * each micro-batch, including planted same-key same-round collisions.
  * Last-writer-wins here is max-serial-wins: [[processKey]] is monotone
  * (sorted within batch, conservative on equals) and the per-batch MERGE
  * folds max(last_serialno), so the final table must equal the fold of
  * ALL updates regardless of which stream carried which row, how rounds
  * were split into micro-batches, or arrival order across rounds
  * (later-round stale serials must lose). */
class WatermarkMergePropSpec extends SparkSpec {
  import spark.implicits._

  // heavy collision odds: 2 tenants x 3 cases x serials 1..40 over ~90
  // updates force cross-stream same-key contention and stale re-sends
  private def corpus(seed: Long): Seq[SnapshotUpdate] = {
    val g = for {
      t <- Gen.choose(1L, 2L)
      c <- Gen.choose(1L, 3L)
      s <- Gen.choose(1L, 40L)
    } yield SnapshotUpdate(t, c, s)
    (0 until 90).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
  }

  test("random interleavings of two update streams: merged watermarks " +
    "equal the batch fold (max serial per key), stale writers lose") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(7L, 1729L, 60601L)) {
      val updates = corpus(seed)
      val outDir =
        java.nio.file.Files.createTempDirectory(s"graft-wmerge-$seed").toString
      val a = MemoryStream[SnapshotUpdate]
      val b = MemoryStream[SnapshotUpdate]
      val q = syncPipeline(a.toDS().union(b.toDS()), outDir)
      try {
        val rnd = new scala.util.Random(seed)
        // four rounds; each update lands on a random stream in a random
        // round, shuffled within its slice. Every round BOTH streams also
        // send a forced conflicting update for the hottest key (1, 1) —
        // the same-micro-batch cross-stream contention this spec exists
        // for (one strictly newer, one stale or equal).
        val sliced = updates.map(u => (rnd.nextInt(4), rnd.nextInt(2), u))
        val forced = (0 until 4).map { r =>
          r -> Seq(SnapshotUpdate(1, 1, 10L + 5 * r),
                   SnapshotUpdate(1, 1, 3L + r)) }.toMap
        (0 until 4).foreach { round =>
          val mine = sliced.filter(_._1 == round)
          a.addData(rnd.shuffle(mine.filter(_._2 == 0).map(_._3)
            :+ forced(round).head))
          b.addData(rnd.shuffle(mine.filter(_._2 == 1).map(_._3)
            :+ forced(round)(1)))
          q.processAllAvailable()
        }
        // driver-side batch fold over every update both streams carried
        val all = updates ++ forced.values.flatten
        val want = all.groupBy(u => (u.tenant_id, u.case_ref))
          .map { case (k, us) => k -> us.map(_.serialno).max }
        val marks = IncrementalSync.latestWatermarks(spark, outDir).get
          .collect()
          .map(r => (r.getAs[Long]("tenant_id"), r.getAs[Long]("case_ref")) ->
            r.getAs[Long]("last_serialno")).toMap
        assert(marks == want, s"seed $seed: merged $marks vs fold $want")
        // the change log's frontier agrees with the merged table, and
        // every logged advance is strict (no event for a stale writer)
        val log = spark.read.parquet(s"$outDir/changes")
          .collect()
          .map(r => ((r.getAs[Long]("tenant_id"), r.getAs[Long]("case_ref")),
            r.getAs[Long]("serialno"), r.getAs[Long]("prev_serialno")))
        assert(log.forall { case (_, s, p) => s > p }, s"seed $seed: " +
          "change log contains a non-advancing event")
        val logMax = log.groupBy(_._1)
          .map { case (k, es) => k -> es.map(_._2).max }
        assert(logMax == want,
          s"seed $seed: change-log frontier $logMax vs fold $want")
      } finally q.stop()
    }
  }
}
