package graft

import java.net.InetSocketAddress
import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.kernel.InMemoryPutClient

/**
 * In-process Azure-Blob-flavored object store for
 * [[graft.kernel.AzureBlobClient]] conformance: `Put Blob` honors
 * `If-None-Match: *` atomically (409 `BlobAlreadyExists` when the blob
 * exists, as real Azure answers) and REQUIRES the `x-ms-blob-type` and
 * `x-ms-version` protocol headers; `Delete Blob` answers 202; listing is
 * `GET ?restype=container&comp=list&prefix=` XML with `NextMarker`
 * pagination (`pageSize` blobs per page, like Azure's 5000). Storage
 * delegates to [[InMemoryPutClient]] so CAS semantics cannot diverge from
 * the conformance-tested client. Shared Key signatures are verified
 * INDEPENDENTLY from the wire by [[SharedKeyVerify]].
 */
class MockAzureBlobServer(pageSize: Int = 1000,
    requireSharedKey: Option[(String, String)] = None) {

  private val store = new InMemoryPutClient

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "mock-azure-blob"); t.setDaemon(true); t })
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  /** Fault injection: the next N LIST calls answer 429. Azure's pace
    * header dialect is selectable — `x-ms-retry-after-ms` (service
    * native) or standard `Retry-After` delta-seconds. */
  @volatile var throttleLists: Int = 0
  @volatile var throttleMsHeader: Option[Long] = None
  @volatile var throttleRetryAfterSecs: Option[Int] = None
  private def takeListThrottle(): Boolean = synchronized {
    if (throttleLists > 0) { throttleLists -= 1; true } else false
  }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def decodeKey(rawPath: String): String =
    rawPath.stripPrefix("/").split("/", -1)
      .map(java.net.URLDecoder.decode(_, "UTF-8")).mkString("/")

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

  private val rfc1123 = DateTimeFormatter.RFC_1123_DATE_TIME.withZone(ZoneOffset.UTC)

  private def handle(ex: HttpExchange): Unit = try {
    val rawPath = ex.getRequestURI.getRawPath
    val params = queryParams(ex)
    val body =
      if (ex.getRequestMethod == "PUT") ex.getRequestBody.readAllBytes()
      else Array.empty[Byte]
    val rejected = requireSharedKey.exists { case (acct, key) =>
      SharedKeyVerify.check(ex, acct, key) match {
        case Some(reason) =>
          System.err.println(s"[mock-azure-blob] SharedKey reject: $reason")
          respond(ex, 403, reason.getBytes("UTF-8"))
          true
        case None => false
      }
    }
    if (rejected) return
    if (Option(ex.getRequestHeaders.getFirst("x-ms-version")).isEmpty) {
      respond(ex, 400, "missing x-ms-version".getBytes("UTF-8"))
      return
    }
    (ex.getRequestMethod, rawPath) match {
      case ("GET", _) if params.get("comp").contains("list") && takeListThrottle() =>
        throttleMsHeader.foreach(ms =>
          ex.getResponseHeaders.set("x-ms-retry-after-ms", ms.toString))
        throttleRetryAfterSecs.foreach(s =>
          ex.getResponseHeaders.set("Retry-After", s.toString))
        respond(ex, 429)
      case ("GET", p) if params.get("comp").contains("list") =>
        if (!params.get("restype").contains("container")) {
          respond(ex, 400, "list requires restype=container".getBytes("UTF-8"))
        } else {
          // path = /<account>/<container> (path-style); keys stored full
          val containerSeg = decodeKey(p).stripSuffix("/")
          val prefix = params.getOrElse("prefix", "")
          val all = store.listPrefix(s"$containerSeg/$prefix")
          // Azure marker = name of the blob the next page STARTS at
          val after = params.get("marker")
            .map(m => all.dropWhile(b => rel(containerSeg, b.key) < m))
            .getOrElse(all)
          val (page, rest) = after.splitAt(pageSize)
          val items = page.map { m =>
            s"<Blob><Name>${xmlEscape(rel(containerSeg, m.key))}</Name><Properties>" +
              s"<Content-Length>${m.size}</Content-Length>" +
              s"<Last-Modified>${rfc1123.format(Instant.ofEpochMilli(m.mtimeMs))}</Last-Modified>" +
              "</Properties></Blob>"
          }
          val nextMarker =
            if (rest.nonEmpty)
              s"<NextMarker>${xmlEscape(rel(containerSeg, rest.head.key))}</NextMarker>"
            else "<NextMarker/>"
          val xml = s"""<?xml version="1.0" encoding="utf-8"?><EnumerationResults>""" +
            s"<Blobs>${items.mkString}</Blobs>$nextMarker</EnumerationResults>"
          respond(ex, 200, xml.getBytes("UTF-8"))
        }
      case ("PUT", p) =>
        if (Option(ex.getRequestHeaders.getFirst("x-ms-blob-type")).isEmpty) {
          respond(ex, 400, "Put Blob requires x-ms-blob-type".getBytes("UTF-8"))
        } else {
          val key = decodeKey(p)
          val conditional =
            Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
          if (conditional) {
            if (store.putIfAbsent(key, body)) respond(ex, 201)
            else respond(ex, 409,
              """<?xml version="1.0" encoding="utf-8"?><Error><Code>BlobAlreadyExists</Code></Error>"""
                .getBytes("UTF-8"))
          } else {
            store.delete(key); store.putIfAbsent(key, body); respond(ex, 201)
          }
        }
      case ("GET", p) =>
        store.get(decodeKey(p)) match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404)
        }
      case ("DELETE", p) =>
        respond(ex, if (store.delete(decodeKey(p))) 202 else 404)
      case _ => respond(ex, 405)
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[mock-azure-blob] handler error: $e")
      respond(ex, 500)
  }

  /** Container-relative blob name, as real Azure returns them. */
  private def rel(containerSeg: String, key: String): String =
    key.stripPrefix(s"$containerSeg/")
}

/** Independent server-side Shared Key verification: reconstruct the
  * string-to-sign from the WIRE (method, received standard headers with
  * the documented zero-length Content-Length rule, received x-ms-*
  * headers lowercased/sorted/whitespace-collapsed, raw path + sorted
  * decoded query as the canonical resource) with straight-line HMAC code
  * — no reuse of the client's signer, so a shared canonicalization bug
  * cannot self-validate. */
object SharedKeyVerify {
  def check(ex: HttpExchange, account: String, base64Key: String): Option[String] = {
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse(return Some("missing Authorization"))
    val re = """SharedKey ([^:]+):([A-Za-z0-9+/=]+)""".r
    val (acct, sig) = auth match {
      case re(a, s) => (a, s)
      case _ => return Some(s"unparseable Authorization: $auth")
    }
    if (acct != account) return Some(s"unknown account $acct")

    import scala.jdk.CollectionConverters._
    val headers = ex.getRequestHeaders.entrySet().asScala
      .map(e => e.getKey.toLowerCase -> e.getValue.asScala.mkString(","))
      .toMap
    def std(name: String): String = headers.getOrElse(name, "")
    val lengthField = std("content-length") match {
      case "" | "0" => ""
      case n => n
    }
    val canonicalHeaders = headers.view
      .filterKeys(_.startsWith("x-ms-")).toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k:${v.trim.replaceAll("\\s+", " ")}\n" }.mkString
    val query = Option(ex.getRequestURI.getRawQuery).getOrElse("").split("&")
      .filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
        java.net.URLDecoder.decode(k, "UTF-8").toLowerCase ->
          java.net.URLDecoder.decode(v, "UTF-8")
      }.sortBy(_._1).map { case (k, v) => s"\n$k:$v" }.mkString
    val canonicalResource = s"/$account${ex.getRequestURI.getRawPath}$query"

    val stringToSign = Seq(
      ex.getRequestMethod,
      std("content-encoding"), std("content-language"), lengthField,
      std("content-md5"), std("content-type"), /* Date */ "",
      std("if-modified-since"), std("if-match"), std("if-none-match"),
      std("if-unmodified-since"), std("range"),
      canonicalHeaders + canonicalResource).mkString("\n")

    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      java.util.Base64.getDecoder.decode(base64Key), "HmacSHA256"))
    val expected = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(stringToSign.getBytes("UTF-8")))
    if (expected != sig)
      Some(s"signature mismatch (expected $expected got $sig)")
    else None
  }
}
