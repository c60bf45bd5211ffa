package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import graft.streaming.IncrementalSync.Breaker

/** S3/S5 live form — the per-case REST dossier fetch executed INSIDE the
  * cluster (reference caseguard/proclaim/client.py:180-221: GET
  * /api/case/{ref} with a long-lived authenticated session, retried, then
  * parsed into the nested dossier shape).
  *
  * Spark shape: `mapPartitions` over the reference column — ONE transport
  * client per partition (the reference's session reuse, amortizing
  * connection/auth over thousands of fetches), a token bucket capping the
  * per-partition request rate (ST4; aggregate cluster rate = partitions ×
  * rate, so partition count is the parallelism throttle the reference's
  * worker pool caps, worker.py:283-305), and the [[Breaker]] state machine
  * guarding each partition's stream — consecutive failures OPEN the
  * breaker and remaining refs are SHED untouched instead of hammering a
  * down upstream, with the half-open probe re-closing it after the
  * timeout (core/error_handling.py:165-177).
  *
  * At 100 TB scale this is the only sane topology: the fetch is
  * embarrassingly parallel, state (client, bucket, breaker) is
  * partition-local so nothing coordinates through the driver, and a dead
  * upstream costs each partition `breakerThreshold` probes, not
  * refs-per-partition timeouts. */
object LiveFetch {

  /** Transport abstraction: status code + body. The indirection exists so
    * specs can count client construction and inject failures; production
    * uses [[JdkHttp]]. Factories must be serializable (they ship to
    * executors); the client itself is built per partition and never
    * serialized. */
  trait Http {
    def get(url: String): (Int, String)
    /** Binary GET (the SOAP document-download shape). Default goes
      * through [[get]] for simple stubs; real transports override. */
    def getBytes(url: String): (Int, Array[Byte]) = {
      val (st, body) = get(url); (st, body.getBytes("UTF-8"))
    }
    def close(): Unit = ()
  }

  /** JDK HttpClient-backed transport — one instance per partition,
    * connection pool + keep-alive reused across that partition's refs. */
  final class JdkHttp(timeoutMs: Long = 30000L) extends Http {
    private val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
    private def req(url: String) =
      java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
        .timeout(java.time.Duration.ofMillis(timeoutMs)).GET().build()
    override def get(url: String): (Int, String) = {
      val resp = client.send(req(url),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      (resp.statusCode(), resp.body())
    }
    override def getBytes(url: String): (Int, Array[Byte]) = {
      val resp = client.send(req(url),
        java.net.http.HttpResponse.BodyHandlers.ofByteArray())
      (resp.statusCode(), resp.body())
    }
  }

  /** Classic token bucket over nanoTime: `capacity` tokens burst, refill
    * at `ratePerSec`; acquire blocks until a token is available. Partition
    * -local (no coordination): the cluster-wide cap is rate × partitions,
    * which is exactly how the reference's bounded worker pool scales its
    * jobs/hour limit. */
  final class TokenBucket(ratePerSec: Double, capacity: Double) {
    private var tokens = capacity
    private var last = System.nanoTime()
    def acquire(): Unit = {
      val now = System.nanoTime()
      tokens = math.min(capacity, tokens + (now - last) * ratePerSec / 1e9)
      last = now
      if (tokens < 1.0) {
        val waitNanos = ((1.0 - tokens) / ratePerSec * 1e9).toLong
        Thread.sleep(waitNanos / 1000000L, (waitNanos % 1000000L).toInt)
        val after = System.nanoTime()
        tokens = math.min(capacity, tokens + (after - last) * ratePerSec / 1e9)
        last = after
      }
      tokens -= 1.0
    }
  }

  /** Path-segment encoding for case refs (the reference quote()s them,
    * client.py:193 — refs like "NBC 200993/001" must survive the URL).
    * URLEncoder is form-encoding, so its '+' for space is corrected to
    * the path form %20. */
  def pathEncode(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  /** One fetch outcome. state: "ok" (2xx), "failed" (attempts exhausted or
    * breaker opened mid-retry), "shed" (breaker open — NOT attempted, no
    * request sent, retriable for free in a later batch). */
  final case class Fetched(case_ref: String, status: Int, body: String,
                           attempts: Int, state: String)

  final case class FetchConf(
      maxAttempts: Int = 3,
      ratePerSec: Double = 0.0, // 0 = unlimited
      burst: Int = 1,
      breakerThreshold: Int = 5,
      breakerTimeoutSec: Long = 300L)

  /** The per-partition walk shared by every live fetch: one client, one
    * bucket, one breaker, applied to each item in partition order. Kept
    * generic over the item type `I` (so payload columns ride along) and
    * the body type `A` (text dossiers vs binary documents).
    *
    * Clock-call contract (specs drive a fake clock through open/half-open
    * transitions, so the call sequence is part of the API): exactly one
    * `clockSec()` per item for the admission check; on each failed attempt,
    * one for `Breaker.onFailure` and — only when attempts remain — one for
    * the continue-check; none on success. */
  private def fetchLoop[I, A](it: Iterator[I], conf: FetchConf,
                              transport: () => Http, clockSec: () => Long,
                              doFetch: (Http, I) => (Int, A),
                              errBody: Exception => A, empty: A)
  : Iterator[(I, Int, A, Int, String)] = {
    val http = transport() // ONE per partition — session/connection reuse
    // release on TASK end, not on iterator exhaustion: a downstream
    // limit/head or a mid-stream failure abandons the iterator without
    // draining it, which would leak the client's threads and sockets
    Option(org.apache.spark.TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => http.close()))
    val bucket = if (conf.ratePerSec > 0)
      Some(new TokenBucket(conf.ratePerSec, conf.burst.toDouble)) else None
    var breaker = Breaker(failureThreshold = conf.breakerThreshold,
      timeoutSeconds = conf.breakerTimeoutSec)
    val out = it.map { item =>
      if (!breaker.allows(clockSec())) (item, 0, empty, 0, "shed")
      else {
        var attempts = 0
        var res: (I, Int, A, Int, String) = null
        while (res == null) {
          attempts += 1
          bucket.foreach(_.acquire())
          val (st, body) =
            try doFetch(http, item)
            catch { case e: Exception => (-1, errBody(e)) }
          if (st >= 200 && st < 300) {
            breaker = breaker.onSuccess
            res = (item, st, body, attempts, "ok")
          } else {
            breaker = breaker.onFailure(clockSec())
            if (attempts >= conf.maxAttempts || !breaker.allows(clockSec()))
              res = (item, st, body, attempts, "failed")
          }
        }
        res
      }
    }
    out
  }

  /** Fetch `baseUrl`/api/case/`ref` for every ref — one client + bucket +
    * breaker per partition. */
  def fetchCaseData(refs: Dataset[String], baseUrl: String,
                    conf: FetchConf = FetchConf(),
                    transport: () => Http = () => new JdkHttp(),
                    clockSec: () => Long = () => System.currentTimeMillis() / 1000L)
  : Dataset[Fetched] =
    refs.mapPartitions { it =>
      fetchLoop[String, String](it, conf, transport, clockSec,
        (h, ref) => h.get(s"$baseUrl/api/case/${pathEncode(ref)}"),
        e => String.valueOf(e.getMessage), "")
        .map { case (ref, st, body, attempts, state) =>
          Fetched(ref, st, body, attempts, state) }
    }(Encoders.product[Fetched])

  /** One binary fetch outcome (S5 live form): document code + declared
    * format + raw payload bytes + the resolved MIME (F21 map). */
  final case class FetchedDoc(doc_code: String, format: String, status: Int,
                              content: Array[Byte], attempts: Int, state: String)

  /** S5 live form — the per-document binary download (reference
    * caseguard/proclaim/soap_downloader.py: proGetDocument(sessionid,
    * documentcode, documentformat) → decoded bytes; MIME from the
    * FORMAT_TO_MIME map, technical-details.md:92-163). Same partition
    * topology as [[fetchCaseData]] — one client/bucket/breaker per
    * partition — over (doc_code, format) rows; the payload lands as a
    * binary column ready for [[Adapters.writePartitioned]]-style sinks,
    * and `mime` is resolved by the same F21 map expression the offline
    * path uses. */
  def fetchDocuments(docs: DataFrame, baseUrl: String,
                     conf: FetchConf = FetchConf(),
                     transport: () => Http = () => new JdkHttp(),
                     clockSec: () => Long = () => System.currentTimeMillis() / 1000L)
  : DataFrame = {
    val pairs = docs
      .select(col("doc_code").cast("string"), col("format").cast("string"))
      .as[(String, String)](Encoders.product[(String, String)])
    pairs.mapPartitions { it =>
      fetchLoop[(String, String), Array[Byte]](it, conf, transport, clockSec,
        (h, cf) => h.getBytes(
          s"$baseUrl/api/document/${pathEncode(cf._1)}?format=${pathEncode(cf._2)}"),
        _ => Array.empty[Byte], Array.empty[Byte])
        .map { case ((code, fmt), st, bytes, attempts, state) =>
          FetchedDoc(code, fmt, st, bytes, attempts, state) }
    }(Encoders.product[FetchedDoc])
      .toDF()
      .withColumn("mime", graft.metrics.Dashboard.mimeFor(col("format")))
  }

  /** Parse successful fetches into the nested dossier shape (S3) — the
    * same schema the offline jsonDossiers model reads, so everything
    * downstream of [[Adapters.dossierSchema]] composes unchanged. */
  def parseDossiers(fetched: DataFrame): DataFrame =
    fetched.filter(col("state") === "ok")
      .select(from_json(col("body"), Adapters.dossierSchema).as("dossier"))
      .select("dossier.*")
}
