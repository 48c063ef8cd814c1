package graft.kernel

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Instant

/**
 * [[ConditionalPutClient]] over the HTTP conditional-put protocol modern
 * object stores expose — the integration-readiness adapter for a real cloud
 * backend (no cloud SDK jars ship in this environment, so the wire protocol
 * is exercised against a mock server in ObjectStorePutSpec):
 *
 *  - put-if-absent = `PUT` with `If-None-Match: *`; `412 Precondition
 *    Failed` (S3, GCS XML API) or `409 Conflict` (Azure Blob) = key exists
 *    (S3 supports this natively since 2024-08; reference backends:
 *    crates/{aws,gcp,azure});
 *  - list = `GET ?list-type=2&prefix=` returning ListObjectsV2-shaped XML
 *    (`Contents/Key|Size|LastModified`);
 *  - any 5xx / transport error surfaces as IOException, which the commit
 *    loop treats as a transient same-version retry, and a timeout AFTER the
 *    put landed resolves via the ghost-commit txnId check — the exact
 *    ambiguity matrix the fault suite pins.
 *
 * `endpoint` is the bucket root (e.g. `http://localhost:9000/bucket`); keys
 * are slash-prefixed object keys under it.
 */
class HttpPutClient(endpoint: String) extends ConditionalPutClient {

  private val base = endpoint.stripSuffix("/")
  private val http = HttpClient.newHttpClient()

  private def uri(key: String): URI = URI.create(base + encodeKey(key))

  /** Percent-encode each path segment, keeping the '/' separators. */
  private def encodeKey(key: String): String =
    key.split("/", -1).map(seg =>
      java.net.URLEncoder.encode(seg, "UTF-8").replace("+", "%20")).mkString("/")

  private def send[T](req: HttpRequest, handler: HttpResponse.BodyHandler[T]): HttpResponse[T] =
    try http.send(req, handler)
    catch {
      case e: java.io.IOException => throw e
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new java.io.IOException("interrupted during object-store call", e)
    }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val req = HttpRequest.newBuilder(uri(key))
      .header("If-None-Match", "*")
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    send(req, HttpResponse.BodyHandlers.discarding()).statusCode() match {
      case 200 | 201 => true
      case 412 | 409 => false // S3/GCS 412; Azure 409
      case other => throw new java.io.IOException(
        s"conditional put of $key failed: HTTP $other")
    }
  }

  override def get(key: String): Option[Array[Byte]] = {
    val req = HttpRequest.newBuilder(uri(key)).GET().build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case other => throw new java.io.IOException(s"get of $key failed: HTTP $other")
    }
  }

  override def listPrefix(prefix: String): Seq[ObjectMeta] = {
    val q = java.net.URLEncoder.encode(prefix, "UTF-8")
    val req = HttpRequest.newBuilder(
      URI.create(s"$base/?list-type=2&prefix=$q")).GET().build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    if (resp.statusCode() != 200)
      throw new java.io.IOException(s"list of $prefix failed: HTTP ${resp.statusCode()}")
    // ListObjectsV2-shaped XML via the JDK parser (no SDK dependency)
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(resp.body()))
    val contents = doc.getElementsByTagName("Contents")
    (0 until contents.getLength).map { i =>
      val el = contents.item(i).asInstanceOf[org.w3c.dom.Element]
      def text(tag: String): String =
        el.getElementsByTagName(tag).item(0).getTextContent
      ObjectMeta(text("Key"), text("Size").toLong,
        Instant.parse(text("LastModified")).toEpochMilli)
    }.sortBy(_.key)
  }

  override def delete(key: String): Boolean = {
    val req = HttpRequest.newBuilder(uri(key)).DELETE().build()
    send(req, HttpResponse.BodyHandlers.discarding()).statusCode() match {
      case 200 | 204 => true
      case 404 => false
      case other => throw new java.io.IOException(s"delete of $key failed: HTTP $other")
    }
  }
}
