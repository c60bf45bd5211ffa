package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

import IncrementalSync.Job

/** job_id state migration (IncrementalSync.migrateRetryState): a
  * PLANTED pre-round-12 state dir — arithmetic ids, one garbled row —
  * migrates to xxhash64 ids and RESUMES the retry ladder through
  * retryBatch: the carried succeeding job completes, the mid-ladder
  * job re-queues with attempts+1, the at-cap job dead-letters, and the
  * garbled row is quarantined instead of re-entering the ladder. Also
  * pins that a migrated id equals the id workerPipeline would mint for
  * the same (tenant, case, serial) event — in-flight identity survives
  * the upgrade, not just row contents. */
class StateMigrationSpec extends SparkSpec {
  import spark.implicits._

  private def legacyId(t: Long, c: Long, s: Long): Long =
    t * 1000000L + c * 1000L + s

  // old-format backlog: A succeeds on resume, B is mid-ladder (retries),
  // C is at the cap (dead-letters), G is garbled (id no longer matches
  // its own identity columns)
  private val jobA = Job(legacyId(2, 1, 7), 2L, 1L, 1, 0)
  private val jobB = Job(legacyId(3, 2, 9), 3L, 2L, 1, 1)
  private val jobC = Job(legacyId(1, 2, 0), 1L, 2L, 1, 2)
  private val jobG = Job(999999L, 0L, 3L, 1, 0)

  private def plantOldState(): String = {
    val old = java.nio.file.Files.createTempDirectory("graft-mig-old").toString
    Seq(jobA, jobB, jobC, jobG).toDF()
      .write.parquet(s"$old/backlog/batch=5")
    Seq(5L).toDF("done").write.parquet(s"$old/manifest/batch=5")
    old
  }

  private def mintId(t: Long, c: Long, s: Long): Long =
    spark.range(1).select(xxhash64(lit(t), lit(c), lit(s))).head().getLong(0)

  test("migration re-keys decodable rows to the live xxhash64 identity " +
      "and quarantines garbled rows") {
    val old = plantOldState()
    val nu = java.nio.file.Files.createTempDirectory("graft-mig-new").toString
    IncrementalSync.migrateRetryState(spark, old, nu)
    val migrated = IncrementalSync.retryBacklog(spark, nu, below = 6L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    // the three honest rows carry over with attempts/priority intact,
    // under exactly the id the live pipeline would mint
    assert(migrated.keySet ==
      Set(mintId(2, 1, 7), mintId(3, 2, 9), mintId(1, 2, 0)))
    assert(migrated(mintId(3, 2, 9)) == ((3L, 2L, 1, 1)))
    assert(migrated(mintId(1, 2, 0)) == ((1L, 2L, 1, 2)))
    // the garbled row is quarantined, not silently re-keyed
    val q = spark.read.parquet(s"$nu/quarantine/batch=5").collect()
    assert(q.map(_.getAs[Long]("old_job_id")).toSeq == Seq(999999L))
    assert(q.head.getAs[String]("action") == "quarantine")
  }

  test("a migrated state dir RESUMES the ladder: carried jobs succeed, " +
      "retry with attempts+1, and dead-letter at the cap") {
    val old = plantOldState()
    val nu = java.nio.file.Files.createTempDirectory("graft-mig-new2").toString
    val out = java.nio.file.Files.createTempDirectory("graft-mig-out").toString
    IncrementalSync.migrateRetryState(spark, old, nu)
    // next micro-batch after the migrated frontier: no new arrivals,
    // case 1 succeeds, case 2 keeps failing
    IncrementalSync.retryBatch(Seq.empty[Job].toDF(), batchId = 6L,
      stateDir = nu, outDir = out, succeeds = col("case_ref") === 1L)
    val ok = spark.read.parquet(s"$out/succeeded/batch=6")
      .collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(mintId(2, 1, 7)), "carried job A completes")
    val retried = IncrementalSync.retryBacklog(spark, nu, below = 7L)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(retried == Map(mintId(3, 2, 9) -> ((3, 2))),
      "job B re-queues at priority 3 with attempts+1")
    val dead = spark.read.parquet(s"$out/dead/batch=6")
      .collect().map(r => r.getLong(0) -> r.getInt(4)).toMap
    assert(dead == Map(mintId(1, 2, 0) -> 3),
      "job C dead-letters at the cap")
  }

  test("fresh-checkpoint resume: migrating with resumeFrom=0 parks the " +
      "state below batch 0, and the FIRST micro-batch carries it") {
    // after a breaking upgrade the natural deployment starts a new
    // checkpoint, so batchIds restart at 0 — without the explicit
    // parking batch the migrated backlog would sit at the OLD frontier,
    // never be read (strictly-below rule), and eventually be clobbered
    // by the stream's own partition overwrite
    val old = plantOldState()
    val nu = java.nio.file.Files.createTempDirectory("graft-mig-new3").toString
    val out = java.nio.file.Files.createTempDirectory("graft-mig-out3").toString
    IncrementalSync.migrateRetryState(spark, old, nu, resumeFrom = Some(0L))
    IncrementalSync.retryBatch(Seq.empty[Job].toDF(), batchId = 0L,
      stateDir = nu, outDir = out, succeeds = col("case_ref") === 1L)
    val ok = spark.read.parquet(s"$out/succeeded/batch=0")
      .collect().map(_.getLong(0))
    assert(ok.toSeq == Seq(mintId(2, 1, 7)),
      "carried job A completes in the very first batch")
    val retried = IncrementalSync.retryBacklog(spark, nu, below = 1L)
      .collect().map(r => r.getLong(0) -> (r.getInt(3), r.getInt(4))).toMap
    assert(retried == Map(mintId(3, 2, 9) -> ((3, 2))))
    val dead = spark.read.parquet(s"$out/dead/batch=0")
      .collect().map(_.getLong(0))
    assert(dead.toSeq == Seq(mintId(1, 2, 0)))
  }

  test("classifyLegacyJobs decode: residue recovers serial mod 1000 for " +
      "every honest encode, any case_ref") {
    // case_ref >= 1000 bled into the tenant stride under the OLD
    // encode, but the carried identity columns decode it exactly
    val rows = Seq(
      Job(legacyId(1, 1400, 77), 1L, 1400L, 2, 1),
      Job(legacyId(0, 999, 999), 0L, 999L, 1, 0))
    val got = IncrementalSync.classifyLegacyJobs(rows.toDF())
      .select("old_job_id", "serial_residue", "action")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSet == Set(
      (legacyId(1, 1400, 77), 77L, "migrate"),
      (legacyId(0, 999, 999), 999L, "migrate")))
  }
}
