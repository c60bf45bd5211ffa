package graft.sources

import java.net.InetSocketAddress
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.sources.LiveFetch.{FetchConf, Fetched}

/** Live per-case dossier fetch (S3/S5 live form) against an in-process
  * stub server: per-partition client reuse, token-bucket rate cap, and
  * breaker open → shed → half-open probe → re-close under injected
  * failures. local[4] executors are threads in this JVM, so the stub's
  * counters observe exactly what real executors sent. */
class LiveFetchSpec extends SparkSpec {
  import spark.implicits._

  // stub: /api/case/OK-*    -> 200 {"case_ref":...,"status":"Active"}
  //       /api/case/FLAKY-* -> 500 on the first hit for that ref, then 200
  //       /api/case/DOWN-*  -> always 500
  private val hits = new AtomicInteger(0)
  private val firstHitNanos = new AtomicLong(0L)
  private val lastHitNanos = new AtomicLong(0L)
  // boxed value type: putIfAbsent's null "was absent" contract needs a
  // reference type — with scala.Boolean the null comparison trips the
  // "comparing Boolean and Null" lint and leans on boxing coincidences
  private val flakySeen = new ConcurrentHashMap[String, java.lang.Boolean]()
  private lazy val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    s.createContext("/api/case/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val now = System.nanoTime()
        firstHitNanos.compareAndSet(0L, now)
        lastHitNanos.set(now)
        hits.incrementAndGet()
        val ref = x.getRequestURI.getPath.split('/').last
        val fail = ref.startsWith("DOWN") ||
          (ref.startsWith("FLAKY") &&
            (flakySeen.putIfAbsent(ref, java.lang.Boolean.TRUE) eq null))
        val body =
          if (fail) """{"error":"boom"}"""
          else if (ref.startsWith("FULL"))
            s"""{"case_ref":"$ref","tenant_id":"t1","status":"Active",
               |"core_details":{"case_status":"active","handler_name":"JD",
               |  "client_name":"Smith","date_opened":"2024-09-18"},
               |"history":[{"description":"settle",
               |  "notes":"Settlement agreed £1,234.56 on 18/9/2024",
               |  "date":"2024-09-18"}],
               |"parties":[{"type":"Client","name":"Smith"},
               |           {"type":"Segment","name":"Housing"}],
               |"document_manifest":[{"code":"D1","format":"PDF",
               |  "filename":"d1.pdf"}]}""".stripMargin
          else s"""{"case_ref":"$ref","tenant_id":"t1","status":"Active"}"""
        val code = if (fail) 500 else 200
        val bytes = body.getBytes("UTF-8")
        x.sendResponseHeaders(code, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    s.createContext("/api/document/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        hits.incrementAndGet()
        val code = x.getRequestURI.getPath.split('/').last
        // deterministic binary payload incl. non-UTF8 bytes
        val bytes = code.getBytes("UTF-8") ++ Array[Byte](0, 1, -1, -128)
        x.sendResponseHeaders(200, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    s.start()
    s
  }
  private lazy val base = s"http://127.0.0.1:${server.getAddress.getPort}"

  test("one client per partition, reused across all of that partition's refs") {
    hits.set(0)
    val clients = spark.sparkContext.longAccumulator("clientsCreated")
    val refs = (1 to 40).map(i => s"OK-$i").toDS().repartition(4)
    val got = LiveFetch.fetchCaseData(refs, base,
      transport = () => { clients.add(1); new LiveFetch.JdkHttp() }).collect()
    assert(got.length == 40 && got.forall(_.state == "ok"))
    assert(got.forall(_.attempts == 1))
    assert(hits.get() == 40)      // exactly one request per ref
    assert(clients.value == 4L)   // one client per PARTITION, not per ref
    // and the bodies parse into the S3 dossier schema downstream
    val parsed = LiveFetch.parseDossiers(
      spark.createDataset(got.toIndexedSeq)(
        org.apache.spark.sql.Encoders.product[Fetched]).toDF())
    assert(parsed.select("case_ref").as[String].collect().toSet ==
      (1 to 40).map(i => s"OK-$i").toSet)
    assert(parsed.columns.contains("parties")) // full nested schema came through
  }

  test("refs with spaces and percent signs survive the URL (path encoding)") {
    hits.set(0)
    // the stub echoes the decoded last path segment back as case_ref, so a
    // round-trip proves encode(ref) -> server-decode(ref) is the identity
    // (an unencoded ' ' or '%' would make URI.create throw or corrupt)
    val awkward = "OK NBC 200993%001"
    val got = LiveFetch.fetchCaseData(Seq(awkward).toDS().repartition(1), base)
      .collect()
    assert(got.length == 1 && got.head.state == "ok")
    assert(got.head.body.contains(s""""case_ref":"$awkward""""))
  }

  test("live ingest path: fetch -> parse -> canonical-field extraction") {
    hits.set(0)
    val refs = Seq("FULL-NBC200993").toDS().repartition(1)
    val fetched = LiveFetch.fetchCaseData(refs, base)
    val dossiers = LiveFetch.parseDossiers(fetched.toDF())
    val canon = graft.pipeline.CaseDocs.canonicalFieldsFromDossiers(dossiers)
      .collect()
    assert(canon.length == 1)
    val r = canon.head
    assert(r.getAs[String]("case_ref") == "FULL-NBC200993")
    assert(r.getAs[String]("client_name") == "Smith")   // party_extraction
    assert(r.getAs[String]("handler") == "Housing")     // segment party
    assert(r.getAs[String]("status") == "active")       // direct
    assert(r.getAs[String]("opened_date") == "2024-09-18")
    assert(r.getAs[Double]("total_paid") == 1234.56)    // costs_extraction
    assert(r.getAs[Boolean]("settlement_mentioned"))    // timeline_search
  }

  test("binary document fetch round-trips payload bytes and resolves MIME") {
    hits.set(0)
    val docs = Seq(("DOC-1", "PDF"), ("DOC-2", "jpg"), ("DOC-3", "xyz"))
      .toDF("doc_code", "format")
    val got = LiveFetch.fetchDocuments(docs.repartition(2), base)
      .collect().map(r => r.getAs[String]("doc_code") -> r).toMap
    assert(got.size == 3 && got.values.forall(_.getAs[String]("state") == "ok"))
    // payload bytes survive exactly, including non-UTF8 values
    val c1 = got("DOC-1").getAs[Array[Byte]]("content")
    assert(c1.sameElements("DOC-1".getBytes("UTF-8") ++ Array[Byte](0, 1, -1, -128)))
    // MIME resolution goes through the same F21 map as the offline path,
    // case-insensitively, with the octet-stream fallback
    assert(got("DOC-1").getAs[String]("mime") == "application/pdf")
    assert(got("DOC-2").getAs[String]("mime") == "image/jpeg")
    assert(got("DOC-3").getAs[String]("mime") == "application/octet-stream")
  }

  test("failed fetches retry up to maxAttempts; transient failures recover") {
    hits.set(0); flakySeen.clear()
    val refs = Seq("FLAKY-a", "OK-b", "DOWN-c").toDS().repartition(1)
    val got = LiveFetch.fetchCaseData(refs, base,
        FetchConf(maxAttempts = 3, breakerThreshold = 100))
      .collect().map(f => f.case_ref -> f).toMap
    assert(got("FLAKY-a").state == "ok" && got("FLAKY-a").attempts == 2)
    assert(got("OK-b").state == "ok" && got("OK-b").attempts == 1)
    assert(got("DOWN-c").state == "failed" && got("DOWN-c").attempts == 3)
  }

  test("token bucket caps the per-partition request rate") {
    hits.set(0); firstHitNanos.set(0L); lastHitNanos.set(0L)
    val refs = (1 to 10).map(i => s"OK-r$i").toDS().repartition(1)
    val got = LiveFetch.fetchCaseData(refs, base,
      FetchConf(ratePerSec = 25.0, burst = 1)).collect()
    assert(got.forall(_.state == "ok"))
    // server-side span between first and last request: 10 requests at 25/s
    // with burst 1 -> 9 enforced 40ms gaps = 360ms; slack for timer jitter
    val spanMs = (lastHitNanos.get() - firstHitNanos.get()) / 1000000L
    assert(spanMs >= 300, s"rate cap not enforced: ${spanMs}ms span for 10 reqs")
  }

  test("breaker opens after threshold, sheds without requests, half-open probe re-closes") {
    hits.set(0)
    // deterministic fake clock: every call advances 1s. Per LiveFetch's
    // clock-call contract (one admission call per ref; on a failed attempt
    // one onFailure call, plus one continue-check only if attempts remain),
    // with maxAttempts=1, threshold=2, timeout=6s the walk is:
    //   DOWN-1: allows(0) ok, onFailure(1) -> failures=1      -> failed
    //   DOWN-2: allows(2) ok, onFailure(3) -> OPEN @3         -> failed
    //   OK-3..OK-7: allows(4..8), all < 3+6                   -> shed x5
    //   OK-8: allows(9), 9-3 >= 6 -> HALF-OPEN probe, 200     -> ok (re-closed)
    //   OK-9: allows(10), closed                              -> ok
    val tick = new AtomicLong(0L)
    val refs = (Seq("DOWN-1", "DOWN-2") ++ (3 to 9).map(i => s"OK-$i"))
      .toDS().repartition(1)
    // repartition shuffles: restore the walk order inside the partition
    // (sort by the numeric suffix so DOWN-1, DOWN-2 lead)
    val got = LiveFetch.fetchCaseData(
        refs.sortWithinPartitions(
          substring_index($"value", "-", -1).cast("int")), base,
        FetchConf(maxAttempts = 1, breakerThreshold = 2, breakerTimeoutSec = 6),
        clockSec = () => tick.getAndIncrement())
      .collect().map(f => f.case_ref -> f.state).toMap
    assert(got("DOWN-1") == "failed" && got("DOWN-2") == "failed")
    (3 to 7).foreach(i => assert(got(s"OK-$i") == "shed", s"OK-$i should shed"))
    assert(got("OK-8") == "ok", "half-open probe should re-close the breaker")
    assert(got("OK-9") == "ok")
    // shed refs never reached the server: 2 failures + 2 successes only
    assert(hits.get() == 4)
  }
}
