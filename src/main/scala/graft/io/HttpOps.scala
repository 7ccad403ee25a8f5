package graft.io

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.Semaphore

/** HTTP plumbing with the reference's client semantics
  * (src/io/http-client.ts:28-56, src/conf.ts:223-288): bounded
  * concurrency (default 10), ≤4 retries on 5xx with exponential
  * backoff (factor × 2^attempt), request timeout. One client +
  * semaphore per executor JVM (the Spark-shaped version of the
  * reference's per-step pool).
  */
object HttpOps {

  final case class HttpConf(
      timeoutMs: Long = 60000,
      retries: Int = 4,
      backoffMs: Long = 1000,
      concurrency: Int = 10)

  @transient private lazy val client: HttpClient =
    HttpClient.newBuilder().connectTimeout(Duration.ofSeconds(10)).build()

  private val semaphores = new java.util.concurrent.ConcurrentHashMap[Int, Semaphore]()

  private def gate(conf: HttpConf): Semaphore =
    semaphores.computeIfAbsent(conf.concurrency, n => new Semaphore(n))

  /** Send `body`; retry 5xx per the reference's schedule. Returns the
    * final response (also for non-2xx after retries) — callers decide
    * dead-letter policy. Throws on connect-level failure after
    * retries.
    */
  def send(target: String, method: String, headers: Map[String, String],
           body: String, conf: HttpConf = HttpConf()): HttpResponse[String] = {
    val builder0 = HttpRequest.newBuilder(URI.create(target))
      .timeout(Duration.ofMillis(conf.timeoutMs))
      .method(method, HttpRequest.BodyPublishers.ofString(body))
    val builder = headers.foldLeft(builder0) { case (b, (k, v)) => b.header(k, v) }
    if (!headers.keys.exists(_.equalsIgnoreCase("content-type")))
      builder.header("Content-Type", "application/x-ndjson")
    val req = builder.build()

    val g = gate(conf)
    g.acquire()
    try {
      var attempt = 0
      var resp: HttpResponse[String] = null
      var lastErr: Exception = null
      while (attempt <= conf.retries &&
             (resp == null || resp.statusCode() >= 500)) {
        if (attempt > 0)
          Thread.sleep(conf.backoffMs * (1L << (attempt - 1)))
        try {
          resp = client.send(req, HttpResponse.BodyHandlers.ofString())
          lastErr = null
        } catch {
          case e: java.io.IOException => lastErr = e; resp = null
        }
        attempt += 1
      }
      if (resp == null) throw lastErr
      resp
    } finally g.release()
  }
}
