package graft.sync

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Batch/stream equivalence for the MV maintainer: the keyed-state
  * streaming fold must reach exactly the batch merge's MV for ANY split
  * of the changelog into micro-batches — including keys that vanish
  * mid-stream and are later re-born, which exercises the n == 0
  * tombstone path a snapshot-only check would miss. */
class IvmStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Same LCG world as IvmPropSpec, changelog only. */
  private def changelog(seed: Long): Seq[MvDelta] = {
    var s = seed * 2654435761L + 12345L
    def next(mod: Int): Int = { s = (s * 48271) % 2147483647L; (s % mod).toInt }
    val base = (0 until 40).map { i =>
      (next(12).toLong, (next(1000) + 1).toLong)
    }
    val actions = base.map { case (k, v) => (k, v, next(4)) }
    // the base enters the MV through the stream too: +1 for every base
    // row first, then the delete/update traffic — so some keys drain to
    // zero and later re-fill
    val born = base.map { case (k, v) => MvDelta(k, 1L, v) }
    val deletes = actions.filter(_._3 == 2)
      .map { case (k, v, _) => MvDelta(k, -1L, v) }
    val updates = actions.filter(_._3 == 3).flatMap { case (k, v, _) =>
      Seq(MvDelta(k, -1L, v), MvDelta(k, 1L, v + next(500) + 1L))
    }
    born ++ deletes ++ updates
  }

  test("streamed MV equals the batch merge under random batch splits") {
    implicit val sqlCtx = spark.sqlContext
    for (seed <- Seq(11L, 303L, 9091L)) {
      val deltas = changelog(seed)
      val live = scala.collection.mutable.Map[Long, (Long, Long)]()
      val ms = MemoryStream[MvDelta]
      val q = Ivm.mvStreamOf(ms.toDS()).writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.Dataset[MvLive], _: Long) =>
          df.collect().foreach { r =>
            if (r.n == 0) live.remove(r.k) else live(r.k) = (r.n, r.s)
          }
        }
        .start()
      try {
        val rnd = new scala.util.Random(seed)
        // split the changelog into 5 micro-batches, order preserved per
        // key is NOT required (the fold is commutative), so shuffle too
        val slices = deltas.map(d => (rnd.nextInt(5), d))
        (0 until 5).foreach { b =>
          ms.addData(rnd.shuffle(slices.filter(_._1 == b).map(_._2)))
          q.processAllAvailable()
        }
      } finally q.stop()
      // batch fold of the same changelog over an EMPTY base MV
      val baseMv = Seq.empty[(Long, Long, Long)].toDF("k", "n", "s")
      val want = Ivm.mergeOf(baseMv,
        deltas.map(d => (d.k, d.sign, d.v)).toDF("k", "sign", "v"))
        .collect()
        .map(r => r.getAs[Long]("k") ->
          (r.getAs[Long]("n"), r.getAs[Long]("s"))).toMap
      assert(live.toMap == want, s"seed $seed: streamed $live vs batch $want")
      assert(want.nonEmpty)
    }
  }
}
