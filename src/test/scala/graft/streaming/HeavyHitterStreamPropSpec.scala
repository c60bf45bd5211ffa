package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec
import IncrementalSync._

/** Property check for the sharded streaming Misra–Gries: on RANDOM
  * Zipf-ish token streams under RANDOM micro-batch splits and
  * within-batch shuffles, the final per-shard snapshots must
  *
  *  1. CONTAIN every token with global frequency > N/k (the MG
  *     guarantee — order-free even though the ride-along set isn't),
  *  2. report only one-sided estimates: est ≤ true count, and
  *     true count − est ≤ n_seen(shard)/k (the decrement bound),
  *  3. agree with the batch recount convention: exact-recounting the
  *     candidate union and filtering freq·k > N yields EXACTLY the
  *     true heavy set — the [[graft.ml.TextOps.heavyHittersOf]] twin
  *     equivalence, now across an arbitrary batch interleaving.
  *
  * Fixed ScalaCheck seeds (no scalatest-plus bridge in the offline
  * cache), matching FunnelPropSpec's harness conventions. */
class HeavyHitterStreamPropSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish: token ids drawn as 60/(rank+1) weights over 60 tokens —
  // a handful of genuinely heavy tokens plus a long interchangeable
  // tail, the regime where MG decrements actually fire
  private def corpus(seed: Long, n: Int): Seq[String] = {
    val g = Gen.frequency(
      (1 to 60).map(r => (60 / r, Gen.const(s"tok$r"))): _*)
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))
  }

  test("random streams: MG guarantee, one-sided bounds, and exact " +
      "recount equivalence hold under random batch splits") {
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val shards = 4
    for (seed <- Seq(7L, 1311L, 424242L)) {
      val toks = corpus(seed, 900)
      val n = toks.size.toLong
      val trueFreq = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val trueHeavy = trueFreq.filter { case (_, f) => f * k > n }.keySet
      assert(trueHeavy.nonEmpty, s"seed $seed produced no heavy token")

      val input = MemoryStream[TokenEvent]
      val q = heavyHittersStream(input.toDS(), k, shards)
        .writeStream.format("memory").queryName(s"hh_prop_$seed")
        .outputMode(OutputMode.Append).start()
      try {
        val rnd = new scala.util.Random(seed)
        // random number of batches (2..5) with random split points
        val nb = 2 + rnd.nextInt(4)
        val cuts = (Seq(0, toks.size) ++
          Seq.fill(nb - 1)(rnd.nextInt(toks.size + 1))).sorted
        cuts.sliding(2).foreach { case Seq(a, b) =>
          input.addData(rnd.shuffle(toks.slice(a, b)).map(TokenEvent(_)))
          q.processAllAvailable()
        }
        val rows = spark.table(s"hh_prop_$seed").as[MgCounter].collect()
        // latest snapshot per shard
        val lastSeq = rows.groupBy(_.shard).view.mapValues(_.map(_.seq).max)
        val snap = rows.filter(r => lastSeq(r.shard) == r.seq)
        // (1) containment
        val candidates = snap.map(_.token).toSet
        assert(trueHeavy.subsetOf(candidates),
          s"seed $seed: heavy ${trueHeavy -- candidates} missing from " +
            s"candidates (${candidates.size} held)")
        // (2) one-sided estimates with the per-shard decrement bound
        snap.foreach { c =>
          val f = trueFreq(c.token)
          assert(c.est <= f, s"seed $seed: est ${c.est} > true $f for ${c.token}")
          assert(f - c.est <= c.n_seen / k,
            s"seed $seed: ${c.token} est ${c.est} vs $f exceeds " +
              s"${c.n_seen}/$k decrement bound")
        }
        // shard bookkeeping: n_seen sums to the stream length, and the
        // shard field matches the module's hash routing
        assert(snap.groupBy(_.shard).values.map(_.head.n_seen).sum == n)
        snap.foreach(c => assert(
          math.floorMod(c.token.hashCode, shards) == c.shard))
        // (3) exact recount over candidates reproduces the true heavy set
        val recount = trueFreq.view.filterKeys(candidates).toMap
          .filter { case (_, f) => f * k > n }.keySet
        assert(recount == trueHeavy, s"seed $seed: recount $recount")
      } finally q.stop()
    }
  }
}
