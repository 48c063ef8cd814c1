package graft

import java.net.InetSocketAddress
import java.time.Instant

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.kernel.InMemoryPutClient

/**
 * In-process HTTP object store speaking the S3-flavored conditional-put
 * protocol [[graft.kernel.HttpPutClient]] targets: PUT honors
 * `If-None-Match: *` atomically (412 when the key exists), GET/DELETE are
 * plain, and `GET /?list-type=2&prefix=` returns ListObjectsV2-shaped XML
 * with `IsTruncated`/`NextContinuationToken` pagination (`pageSize` keys per
 * page, like S3's 1000). Storage delegates to [[InMemoryPutClient]] so the
 * mock cannot diverge from the already-conformance-tested CAS semantics;
 * keys are stored BARE (no leading slash), as real stores name objects.
 * Used by ObjectStorePutSpec to prove the ConditionalPutClient boundary is
 * sufficient for a real HTTP backend.
 */
class MockObjectStoreServer(pageSize: Int = 1000) {

  private val store = new InMemoryPutClient

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "mock-object-store"); t.setDaemon(true); t })
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  /** Raw URL path → bare object key (single percent-decode per segment). */
  private def decodeKey(rawPath: String): String =
    rawPath.stripPrefix("/").split("/", -1)
      .map(java.net.URLDecoder.decode(_, "UTF-8")).mkString("/")

  /** Single-decoded query params from the RAW query (getQuery pre-decodes,
    * which would corrupt '+'/'%26' in prefixes on a second decode). */
  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) kv -> ""
        else java.net.URLDecoder.decode(kv.take(i), "UTF-8") ->
          java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
      }.toMap

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def handle(ex: HttpExchange): Unit = try {
    val rawPath = ex.getRequestURI.getRawPath
    val params = queryParams(ex)
    (ex.getRequestMethod, rawPath) match {
      case ("GET", "/") if params.get("list-type").contains("2") =>
        val prefix = params.getOrElse("prefix", "")
        // InMemoryPutClient returns keys sorted; page after the token
        val all = store.listPrefix(prefix)
        val after = params.get("continuation-token")
          .map(t => all.dropWhile(_.key <= t)).getOrElse(all)
        val (page, rest) = after.splitAt(pageSize)
        val items = page.map { m =>
          s"<Contents><Key>${xmlEscape(m.key)}</Key><Size>${m.size}</Size>" +
            s"<LastModified>${Instant.ofEpochMilli(m.mtimeMs)}</LastModified></Contents>"
        }
        val trunc =
          if (rest.nonEmpty)
            s"<IsTruncated>true</IsTruncated><NextContinuationToken>${xmlEscape(page.last.key)}</NextContinuationToken>"
          else "<IsTruncated>false</IsTruncated>"
        val xml = s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>${items.mkString}$trunc</ListBucketResult>"""
        respond(ex, 200, xml.getBytes("UTF-8"))
      case ("PUT", p) =>
        val key = decodeKey(p)
        val body = ex.getRequestBody.readAllBytes()
        val conditional = Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
        if (conditional) respond(ex, if (store.putIfAbsent(key, body)) 200 else 412)
        else { store.delete(key); store.putIfAbsent(key, body); respond(ex, 200) }
      case ("GET", p) =>
        store.get(decodeKey(p)) match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404)
        }
      case ("DELETE", p) =>
        respond(ex, if (store.delete(decodeKey(p))) 204 else 404)
      case _ => respond(ex, 405)
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[mock-object-store] handler error: $e")
      respond(ex, 500)
  }
}
