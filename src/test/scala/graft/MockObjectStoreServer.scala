package graft

import java.net.InetSocketAddress
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/**
 * In-process HTTP object store speaking the S3-flavored conditional-put
 * protocol [[graft.kernel.HttpPutClient]] targets: PUT honors
 * `If-None-Match: *` atomically (412 when the key exists), GET/DELETE are
 * plain, and `GET /?list-type=2&prefix=` returns ListObjectsV2-shaped XML.
 * Used by ObjectStorePutSpec to prove the ConditionalPutClient boundary is
 * sufficient for a real HTTP backend.
 */
class MockObjectStoreServer {

  private case class Blob(bytes: Array[Byte], createdMs: Long)
  private val blobs = new ConcurrentHashMap[String, Blob]()

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = server.stop(0)

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def decodeKey(path: String): String =
    path.split("/", -1).map(java.net.URLDecoder.decode(_, "UTF-8")).mkString("/")

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def handle(ex: HttpExchange): Unit = try {
    val rawPath = ex.getRequestURI.getRawPath
    val query = Option(ex.getRequestURI.getQuery).getOrElse("")
    (ex.getRequestMethod, rawPath) match {
      case ("GET", "/") if query.contains("list-type=2") =>
        val prefix = query.split("&").collectFirst {
          case p if p.startsWith("prefix=") =>
            java.net.URLDecoder.decode(p.stripPrefix("prefix="), "UTF-8")
        }.getOrElse("")
        import scala.jdk.CollectionConverters._
        val items = blobs.entrySet().asScala.toSeq
          .filter(_.getKey.startsWith(prefix)).sortBy(_.getKey)
          .map { e =>
            s"<Contents><Key>${xmlEscape(e.getKey)}</Key>" +
              s"<Size>${e.getValue.bytes.length}</Size>" +
              s"<LastModified>${Instant.ofEpochMilli(e.getValue.createdMs)}</LastModified>" +
              "</Contents>"
          }
        val xml = s"""<?xml version="1.0" encoding="UTF-8"?><ListBucketResult>${items.mkString}</ListBucketResult>"""
        respond(ex, 200, xml.getBytes("UTF-8"))
      case ("PUT", p) =>
        val key = decodeKey(p)
        val body = ex.getRequestBody.readAllBytes()
        val conditional = Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
        if (conditional) {
          val prev = blobs.putIfAbsent(key, Blob(body, System.currentTimeMillis()))
          respond(ex, if (prev == null) 200 else 412)
        } else {
          blobs.put(key, Blob(body, System.currentTimeMillis()))
          respond(ex, 200)
        }
      case ("GET", p) =>
        Option(blobs.get(decodeKey(p))) match {
          case Some(b) => respond(ex, 200, b.bytes)
          case None => respond(ex, 404)
        }
      case ("DELETE", p) =>
        respond(ex, if (blobs.remove(decodeKey(p)) != null) 204 else 404)
      case _ => respond(ex, 405)
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[mock-object-store] handler error: $e")
      respond(ex, 500)
  }
}
