package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Adapters
import graft.sync.Reconcile
import graft.streaming.IncrementalSync

/** End-to-end golden-case pipeline, mirroring the reference's
  * tests/end_to_end/test_complete_pipeline_nbc200993.py: one known case
  * (NBC200993.001) is followed from CSV discovery through reconciliation,
  * job creation, worker drain, and watermark advance, with assertions at
  * every stage — all services replaced by the engine's deterministic
  * stages.
  */
class GoldenCaseE2ESpec extends SparkSpec {
  import spark.implicits._

  val golden = "NBC200993.001"

  test("golden case flows discovery -> reconcile -> jobs -> drain -> watermark") {
    // 1. Discovery: CRM CSV snapshot (S1)
    val dir = Files.createTempDirectory("graft-e2e")
    Files.writeString(dir.resolve("cases.csv"),
      s"""Solicitor Reference,Status,Category,Client,Handler,Opened
         |$golden,Active,Housing Disrepair,Smith,JD,18/09/2024
         |NBC200994.001,Active,Housing Disrepair,Jones,JD,19/09/2024
         |NBC200995.001,Complete,Clinical Negligence,Brown,KL,1/01/2023
         |NBC200996.001,Active,Housing Disrepair,Green,JD,20/09/2024
         |""".stripMargin)
    val crm = Adapters.csvSnapshot(spark, dir.toString, "fdm_solicitors")
      .filter(col("is_active"))
      .withColumn("tenant_id", lit(0L))
      .withColumn("case_ref_str", col("case_ref"))
      .withColumn("case_ref", abs(xxhash64(col("case_ref"))))
    assert(crm.count() == 3) // Complete case filtered out

    // 2. DB mirror: golden case stale (watermark behind), 994 current,
    //    996 unknown (new); 997 only in DB (deactivated)
    val goldenSerial = crm.filter(col("case_ref_str") === golden)
      .select("serialno").as[Long].head()
    val s994 = crm.filter(col("case_ref_str") === "NBC200994.001")
      .select("serialno").as[Long].head()
    val db = Seq(
      (0L, golden, goldenSerial - 1), // stale -> needs_update
      (0L, "NBC200994.001", s994),    // current -> unchanged
      (0L, "NBC200997.001", 42L))     // gone from CRM -> deactivated
      .toDF("tenant_id", "ref_str", "last_serialno")
      .withColumn("case_ref", abs(xxhash64(col("ref_str"))))

    // 3. Reconcile (Q2)
    val cat = Reconcile.categoriesOf(crm, db).cache()
    def catOf(ref: String) =
      cat.filter(col("case_ref") === abs(xxhash64(lit(ref))))
        .select("category").as[String].head()
    assert(catOf(golden) == "needs_update")
    assert(catOf("NBC200994.001") == "unchanged")
    assert(catOf("NBC200996.001") == "new")
    assert(catOf("NBC200997.001") == "deactivated")

    // 4. Jobs: new cases at priority 1 (full rebuild), updates at 2
    //    (sync_daily.py:250-317), serialized like the queue payloads
    val jobs = cat.filter(col("category").isin("new", "needs_update"))
      .select(
        col("tenant_id"), col("case_ref"),
        coalesce(col("serialno"), lit(0L)).as("serialno"),
        when(col("category") === "new", 1).otherwise(2).as("priority"),
        when(col("category") === "new", "full_rebuild")
          .otherwise("incremental").as("job_type"))
    val payloads = Adapters.jobPayloads(jobs)
    assert(payloads.count() == 2)
    val parsed = Adapters.parsePayloads(payloads)
    assert(parsed.filter(col("priority") === 1).count() == 1)

    // 5. Worker drain (ST3): golden case fails once (transient), then ok
    val goldenKey = parsed.filter(col("job_type") === "incremental")
      .select("case_ref").as[Long].head()
    val workerJobs = parsed.collect().zipWithIndex.map { case (r, i) =>
      IncrementalSync.Job(i.toLong, r.getAs[Long]("tenant_id"),
        r.getAs[Long]("case_ref"), r.getAs[Int]("priority"), 0)
    }.toSeq
    val drained = IncrementalSync.drain(workerJobs,
      j => j.case_ref != goldenKey || j.attempts >= 1)
    assert(drained.succeeded.length == 2 && drained.dead.isEmpty)

    // 6. Watermark advance (S9): golden case's watermark reaches its serial
    val advanced = Reconcile.advanceOf(db,
      cat.filter(col("category") === "needs_update"))
    val goldenAfter = advanced
      .filter(col("case_ref") === abs(xxhash64(lit(golden))))
      .select("last_serialno").as[Long].head()
    assert(goldenAfter == goldenSerial)

    // 7. Per-case ingest (S3 live + U6): the drained job fetches the golden
    //    dossier from the (stub) CRM and canonical fields come out typed —
    //    the process_case.py leg of the reference's e2e test
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/api/case/", { x: com.sun.net.httpserver.HttpExchange =>
      val body =
        s"""{"case_ref":"$golden","tenant_id":"0","status":"Active",
           |"core_details":{"case_status":"active","handler_name":"JD",
           |  "client_name":"Smith","date_opened":"2024-09-18"},
           |"history":[{"description":"settle",
           |  "notes":"Settlement agreed £2,500.00 on 18/9/2024",
           |  "date":"2024-09-18"}],
           |"parties":[{"type":"Client","name":"Smith"},
           |           {"type":"Segment","name":"Housing Disrepair"}],
           |"document_manifest":[]}""".stripMargin
      val bytes = body.getBytes("UTF-8")
      x.sendResponseHeaders(200, bytes.length)
      x.getResponseBody.write(bytes)
      x.close()
    })
    server.start()
    try {
      val fetched = graft.sources.LiveFetch.fetchCaseData(
        Seq(golden).toDS(),
        s"http://127.0.0.1:${server.getAddress.getPort}")
      val canon = graft.pipeline.CaseDocs.canonicalFieldsFromDossiers(
        graft.sources.LiveFetch.parseDossiers(fetched.toDF())).head()
      assert(canon.getAs[String]("client_name") == "Smith")
      assert(canon.getAs[String]("status") == "active")
      assert(canon.getAs[Double]("total_paid") == 2500.00)
      assert(canon.getAs[Boolean]("settlement_mentioned"))
    } finally server.stop(0)
  }

  test("failure-injected sync: torn version ignored, dead-letter recorded, committed replay is a no-op") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import IncrementalSync.SnapshotUpdate
    implicit val sqlCtx = spark.sqlContext
    val outDir = Files.createTempDirectory("graft-e2e-fail").toString

    // two clean micro-batches
    val input = MemoryStream[SnapshotUpdate]
    val q = IncrementalSync.syncPipeline(input.toDS(), outDir)
    try {
      input.addData(SnapshotUpdate(0, 1, 5), SnapshotUpdate(0, 2, 3))
      q.processAllAvailable()
      input.addData(SnapshotUpdate(0, 2, 9))
      q.processAllAvailable()
    } finally q.stop()

    def marks(): Map[Long, Long] =
      IncrementalSync.latestWatermarks(spark, outDir).get.collect()
        .map(r => r.getAs[Long]("case_ref") -> r.getAs[Long]("last_serialno")).toMap
    assert(marks() == Map(1L -> 5L, 2L -> 9L))

    // CRASH: a later batch died mid-write — parquet fragments on disk,
    // no _SUCCESS. The reader must keep serving the last committed state.
    val torn = new java.io.File(s"$outDir/watermarks/v99")
    torn.mkdirs()
    Files.writeString(torn.toPath.resolve("part-00000.parquet"), "torn bytes")
    assert(marks() == Map(1L -> 5L, 2L -> 9L),
      "a torn (uncommitted) version must never be served")

    // RETRY -> DEAD-LETTER: drive the worker over jobs derived from the
    // durable change log; case 2's rebuild fails permanently
    val jobs = spark.read.parquet(s"$outDir/changes")
      .groupBy("tenant_id", "case_ref")
      .agg(max(col("serialno")).as("serialno")).collect()
      .zipWithIndex.map { case (r, i) =>
        IncrementalSync.Job(i.toLong, r.getAs[Long]("tenant_id"),
          r.getAs[Long]("case_ref"), priority = 2, attempts = 0)
      }.toSeq
    val drained = IncrementalSync.drain(jobs, j => j.case_ref != 2L)
    assert(drained.dead.map(_.case_ref).distinct == Seq(2L))
    assert(drained.dead.forall(_.attempts == 3), "dead only after max attempts")
    drained.dead.toDF().write.mode("overwrite").parquet(s"$outDir/dead_letter")
    assert(spark.read.parquet(s"$outDir/dead_letter")
      .select("case_ref").as[Long].collect().toSeq == Seq(2L))

    // REPLAY: attempt 2 of an already-committed batch (checkpoint loss)
    // must not rewrite the durable side — the _SUCCESS guard makes the
    // replay a no-op instead of yanking files from under readers
    val v1File = new java.io.File(s"$outDir/watermarks/v1/_SUCCESS")
    val mtimeBefore = v1File.lastModified()
    val changesBefore = spark.read.parquet(s"$outDir/changes").count()
    // wipe the checkpoint: the restarted query re-derives batch 0 from
    // scratch, exactly the replayed-attempt shape the guard must absorb
    new scala.reflect.io.Directory(new java.io.File(s"$outDir/checkpoint")).deleteRecursively()
    val input3 = MemoryStream[SnapshotUpdate]
    val q3 = IncrementalSync.syncPipeline(input3.toDS(), outDir)
    try {
      input3.addData(SnapshotUpdate(0, 1, 5), SnapshotUpdate(0, 2, 3)) // batch 0 again
      q3.processAllAvailable()
    } finally q3.stop()
    assert(spark.read.parquet(s"$outDir/changes").count() == changesBefore,
      "replaying a committed batch must not duplicate the change log")
    assert(v1File.lastModified() == mtimeBefore,
      "replaying a committed batch must not rewrite its watermark snapshot")
    assert(marks() == Map(1L -> 5L, 2L -> 9L))
  }
}
