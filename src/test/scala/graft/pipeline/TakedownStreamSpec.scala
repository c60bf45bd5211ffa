package graft.pipeline

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.lit
import graft.SparkSpec

/** Batch/stream equivalence for the takedown: the NET of the streamed
  * shard deltas must equal the batch takedown's final shard state for
  * ANY split and ORDER of the revocation feed — with chained
  * re-elections (the batch form collapses A -> B -> C into one move),
  * duplicate revocations (absorbed by the keyed set), revocations of
  * non-representatives (no emission), and unknown ids (dropped by the
  * stream-static join). */
class TakedownStreamSpec extends SparkSpec {
  import spark.implicits._

  // (cluster, doc_id, n_toks); representatives are the min ids
  private val memberRows = Seq(
    ("A", 136L, 10L), ("A", 150L, 10L),          // re-elect 136 -> 150
    ("B", 267L, 12L), ("B", 398L, 12L),          // both revoked -> drop
    ("C", 20L, 7L), ("C", 21L, 7L),              // untouched
    ("D", 30L, 9L), ("D", 529L, 9L),             // non-rep revoked: no-op
    ("E", 100L, 5L), ("E", 200L, 5L), ("E", 300L, 5L)) // chain 100->200->300
  // 999 is unknown; 136 arrives twice (idempotence)
  private val feed = Seq(136L, 267L, 398L, 529L, 100L, 200L, 999L, 136L)

  private def content(reps: Seq[(Long, Long)]): Map[(String, Long), Set[Long]] =
    reps.groupBy { case (r, _) => (Takedown.splitOfId(r), r % 8) }
      .map { case (k, v) => k -> v.map(_._1).toSet }

  test("net streamed deltas equal the batch final state, any order/split") {
    implicit val sqlCtx = spark.sqlContext
    val members = memberRows.toDF("h", "doc_id", "n_toks")
    val revokedSet = feed.toSet
    val finalReps = memberRows.groupBy(_._1).toSeq.flatMap { case (_, ms) =>
      ms.map(m => (m._2, m._3)).sortBy(_._1).find(m => !revokedSet(m._1))
    }
    val want = content(finalReps)
    for (seed <- Seq(5L, 77L, 4242L)) {
      val rnd = new scala.util.Random(seed)
      // live state starts from the initial representatives
      val initial = memberRows.groupBy(_._1).toSeq.map { case (_, ms) =>
        ms.map(m => (m._2, m._3)).minBy(_._1)
      }
      val live = scala.collection.mutable.Map[(String, Long),
        scala.collection.mutable.Set[Long]]()
      initial.foreach { case (r, _) =>
        live.getOrElseUpdate((Takedown.splitOfId(r), r % 8),
          scala.collection.mutable.Set[Long]()) += r
      }
      var emitted = Vector.empty[ShardDelta]
      val ms = MemoryStream[Revocation]
      val q = Takedown.takedownStreamOf(ms.toDS(), members).writeStream
        .outputMode("update")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[ShardDelta], _: Long) =>
            emitted ++= df.collect()
        }
        .start()
      try {
        val sliced = feed.map(id => (rnd.nextInt(4), id))
        (0 until 4).foreach { b =>
          ms.addData(rnd.shuffle(sliced.filter(_._1 == b).map(t =>
            Revocation(t._2))))
          q.processAllAvailable()
        }
      } finally q.stop()
      emitted.foreach { d =>
        val k = (d.split, d.shard)
        if (d.delta > 0)
          live.getOrElseUpdate(k, scala.collection.mutable.Set[Long]()) += d.rep
        else live(k) -= d.rep
      }
      val got = live.toMap.map { case (k, v) => k -> v.toSet }
        .filter(_._2.nonEmpty)
      assert(got == want, s"seed $seed: net $got vs batch $want")
      // no emission for the untouched cluster or the non-rep revocation
      assert(!emitted.exists(d => d.rep == 20L || d.rep == 30L))
    }
  }

  test("composed streaming governance -> MV chain: takedown deltas fed " +
    "through the streaming MV maintainer reach the batch-truth MV") {
    implicit val sqlCtx = spark.sqlContext
    val members = memberRows.toDF("h", "doc_id", "n_toks")
    val revokedSet = feed.toSet
    // batch truth: per-(split, shard) count and token sum of the final
    // (post-takedown) representatives
    val finalReps = memberRows.groupBy(_._1).toSeq.flatMap { case (_, ms) =>
      ms.map(m => (m._2, m._3)).sortBy(_._1).find(m => !revokedSet(m._1))
    }
    val want = finalReps
      .groupBy { case (r, _) =>
        Takedown.splitIndexOf(Takedown.splitOfId(r)) * 8 + r % 8 }
      .map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    for (seed <- Seq(13L, 9090L)) {
      val rnd = new scala.util.Random(seed)
      // stage 1: the takedown stream emits shard deltas per micro-batch
      var emitted = Vector.empty[ShardDelta]
      val ms = MemoryStream[Revocation]
      val q = Takedown.takedownStreamOf(ms.toDS(), members).writeStream
        .outputMode("update")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[ShardDelta], _: Long) =>
            emitted ++= df.collect()
        }
        .start()
      try {
        val sliced = feed.map(id => (rnd.nextInt(3), id))
        (0 until 3).foreach { b =>
          ms.addData(rnd.shuffle(sliced.filter(_._1 == b).map(t =>
            Revocation(t._2))))
          q.processAllAvailable()
        }
      } finally q.stop()
      // stage 2: the MV maintainer folds the deploy-time seatings (the
      // initial representatives as +1 seat deltas — the pre-takedown MV
      // entering over the topic, the IvmStreamSpec convention) plus the
      // emitted takedown deltas, through the adapter, in feed order
      val baseSeed = memberRows.groupBy(_._1).toSeq.map { case (_, cm) =>
        cm.map(m => (m._2, m._3)).minBy(_._1)
      }.map { case (r, t) =>
        ShardDelta(Takedown.splitOfId(r), r % 8, 1L, r, t)
      }
      val live = scala.collection.mutable.Map[Long, (Long, Long)]()
      val ms2 = MemoryStream[ShardDelta]
      val q2 = graft.sync.Ivm
        .mvStreamOf(Takedown.shardDeltasAsMvDeltas(ms2.toDS()))
        .writeStream
        .outputMode("update")
        .foreachBatch {
          (df: org.apache.spark.sql.Dataset[graft.sync.MvLive], _: Long) =>
            df.collect().foreach { r =>
              if (r.n == 0) live.remove(r.k) else live(r.k) = (r.n, r.s)
            }
        }
        .start()
      try {
        ms2.addData(baseSeed)
        q2.processAllAvailable()
        emitted.grouped(3).foreach { g =>
          ms2.addData(g); q2.processAllAvailable()
        }
      } finally q2.stop()
      assert(live.toMap == want, s"seed $seed: composed MV diverged")
    }
  }

  test("members table shape matches the batch clusters it deploys from") {
    // the deployed member table's n_toks is a cluster constant — the
    // streaming state's min() pick equals any member's value
    val members = memberRows.toDF("h", "doc_id", "n_toks")
    val perCluster = members.groupBy("h")
      .agg(org.apache.spark.sql.functions.countDistinct(
        org.apache.spark.sql.functions.col("n_toks")).as("nv"))
      .filter(org.apache.spark.sql.functions.col("nv") > 1)
    assert(perCluster.count() == 0)
    assert(members.select("doc_id").distinct().count() == memberRows.size)
    // fixture sanity: lit keeps the imports honest
    assert(members.withColumn("one", lit(1)).count() == memberRows.size)
  }
}
