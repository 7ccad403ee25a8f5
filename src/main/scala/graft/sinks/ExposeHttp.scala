package graft.sinks

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.model.Signatures

/** `expose-http` (reference src/step-functions/expose-http.ts): a
  * driver-resident HTTP server exposing the last `responses` window
  * payloads over GET, with ETag and `Link: rel=next` pagination over
  * the retained ring.
  *
  * The engine core stays executor-safe: the executor side only
  * produces NDJSON payload strings; feeding the ring happens on the
  * driver (per collected batch in batch mode, per micro-batch in
  * `foreachBatch` for streaming).
  */
final class ExposeHttp(endpoint: String, port: Int, responses: Int) {

  private val ring = new java.util.ArrayDeque[(Long, String)]()
  private var nextId = 0L
  private val lock = new Object

  /** Append one exposed payload (an NDJSON document). */
  def offer(payload: String): Unit = lock.synchronized {
    ring.addFirst((nextId, payload))
    nextId += 1
    while (ring.size() > responses) ring.removeLast()
  }

  private var server: HttpServer = _

  def start(): Int = {
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/healthz", (x: HttpExchange) => {
      val b = "OK".getBytes(StandardCharsets.UTF_8)
      x.sendResponseHeaders(200, b.length); x.getResponseBody.write(b); x.close()
    })
    server.createContext(endpoint, (x: HttpExchange) => handle(x))
    server.start()
    server.getAddress.getPort
  }

  /** Bound port after [[start]] (resolves an ephemeral port request). */
  def boundPort: Int = server.getAddress.getPort

  def stop(): Unit = if (server != null) server.stop(0)

  private def handle(x: HttpExchange): Unit = {
    if (x.getRequestMethod != "GET") {
      x.sendResponseHeaders(405, -1); x.close(); return
    }
    val query = Option(x.getRequestURI.getQuery).getOrElse("")
    val rawPrevious = query.split("&").collectFirst {
      case kv if kv.startsWith("previous=") => kv.drop("previous=".length)
    }
    val wanted = rawPrevious.map(v => v.toLongOption)
    if (wanted.exists(_.isEmpty)) { // present but not a number => 400, not a 500
      x.sendResponseHeaders(400, -1); x.close(); return
    }
    val entry = lock.synchronized {
      val it = scala.jdk.CollectionConverters.IteratorHasAsScala(ring.iterator()).asScala.toSeq
      wanted.flatten match {
        case None     => it.headOption
        case Some(id) => it.find(_._1 < id) // next-older than the given id
      }
    }
    entry match {
      case None =>
        x.sendResponseHeaders(404, -1); x.close()
      case Some((id, payload)) =>
        val body = payload.getBytes(StandardCharsets.UTF_8)
        val etag = Signatures.sha1Base64Url(Seq(payload))
        x.getResponseHeaders.add("ETag", "\"" + etag + "\"")
        x.getResponseHeaders.add("Content-Type", "application/x-ndjson")
        x.getResponseHeaders.add("Link", s"<${x.getRequestURI.getPath}?previous=$id>; rel=next")
        val ifNone = Option(x.getRequestHeaders.getFirst("If-None-Match"))
        if (ifNone.contains("\"" + etag + "\"")) {
          x.sendResponseHeaders(304, -1)
        } else {
          x.sendResponseHeaders(200, body.length)
          x.getResponseBody.write(body)
        }
        x.close()
    }
  }
}
