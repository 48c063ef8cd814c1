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
 *    Failed` = key exists (S3 since 2024-08, GCS XML API). `409 Conflict`
 *    is ambiguous across providers: Azure's BlobAlreadyExists means
 *    key-exists, S3's ConditionalRequestConflict means the put did NOT land
 *    and should be retried — disambiguated by the error body's <Code>;
 *  - list = `GET ?list-type=2&prefix=` returning ListObjectsV2-shaped XML
 *    (`Contents/Key|Size|LastModified`), following `IsTruncated` /
 *    `NextContinuationToken` pagination — a >1000-object _delta_log must
 *    not silently truncate (stale latestVersion = blessed data loss);
 *  - any 5xx / transport error / timeout surfaces as IOException, which the
 *    commit loop treats as a transient same-version retry, and a timeout
 *    AFTER the put landed resolves via the ghost-commit txnId check — the
 *    exact ambiguity matrix the fault suite pins. Explicit connect/request
 *    timeouts guarantee a hung connection becomes that IOException instead
 *    of blocking the writer forever.
 *
 * Key space: the trait uses slash-prefixed keys (`/tbl/_delta_log/0.json`);
 * object stores name keys WITHOUT the leading slash. The adapter strips it
 * on the wire (URL path and list prefix) and re-adds it on returned keys,
 * so ObjectStoreLogStore's path handling is identical across backends.
 *
 * `endpoint` is the bucket root (e.g. `http://localhost:9000/bucket`).
 */
class HttpPutClient(
    endpoint: String,
    requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
    signer: Option[SigV4Signer] = None) extends ConditionalPutClient {

  private val base = endpoint.stripSuffix("/")
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def uri(key: String): URI = URI.create(base + "/" + encodeKey(objectKey(key)))

  /** Trait key (slash-prefixed) → object key (bare). */
  private def objectKey(key: String): String = key.stripPrefix("/")

  // strict RFC 3986 unreserved-set form — see PathCodec.rfc3986 for why
  // URLEncoder would break SigV4 verification
  private def rfc3986(s: String): String = PathCodec.rfc3986(s)
  private def encodeKey(key: String): String = PathCodec.rfc3986Key(key)

  private def request(u: URI): HttpRequest.Builder =
    HttpRequest.newBuilder(u).timeout(requestTimeout)

  /** Apply SigV4 headers when a signer is configured (real S3-compatible
    * endpoints; the unsigned form serves anonymous/mock stores). The JDK
    * HttpClient sets Host itself from the URI — identical to the signed
    * value. `extra` headers are both SENT and SIGNED. */
  private def withAuth(b: HttpRequest.Builder, method: String, u: URI,
      payload: Array[Byte], extra: Map[String, String]): HttpRequest.Builder = {
    extra.foreach { case (k, v) => b.header(k, v) }
    signer.foreach(_.sign(method, u, payload, extra)
      .foreach { case (k, v) => b.header(k, v) })
    b
  }

  private def send[T](req: HttpRequest, handler: HttpResponse.BodyHandler[T]): HttpResponse[T] =
    HttpWire.send(http, req, handler, "object-store")

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val u = uri(key)
    val req = withAuth(request(u), "PUT", u, bytes,
      Map("If-None-Match" -> "*"))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 | 201 => true
      case 412 => false
      case 409 =>
        // Azure BlobAlreadyExists = exists; S3 ConditionalRequestConflict =
        // the put did NOT land (concurrent conditional writes) — retryable,
        // so it must surface as IOException, not as a lost commit race
        val body = new String(resp.body(), "UTF-8")
        if (body.contains("ConditionalRequestConflict"))
          throw new java.io.IOException(
            s"conditional put of $key hit concurrent-write contention (S3 409); retry")
        else false
      case s @ (429 | 503) =>
        // SlowDown/throttle: honor the server's Retry-After pace when sent
        // (real S3 paces sustained 503 SlowDown windows; hammering at our
        // own cadence burns the retry budget mid-window)
        HttpWire.throttled(s, resp, s"conditional put of $key")
      case other => throw new java.io.IOException(
        s"conditional put of $key failed: HTTP $other")
    }
  }

  override def get(key: String): Option[Array[Byte]] = {
    val u = uri(key)
    val req = withAuth(request(u), "GET", u, Array.empty, Map.empty).GET().build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case s @ (429 | 503) => HttpWire.throttled(s, resp, s"get of $key")
      case other => throw new java.io.IOException(s"get of $key failed: HTTP $other")
    }
  }

  override def listPrefix(prefix: String): Seq[ObjectMeta] = {
    // strict unreserved-set percent form ('/' encoded too — query values):
    // the canonical query a SigV4 server reconstructs re-encodes with the
    // RFC 3986 unreserved set, so the emitted form must match exactly
    def qEnc(s: String): String = rfc3986(s)
    val q = qEnc(objectKey(prefix))
    val out = Seq.newBuilder[ObjectMeta]
    var token: Option[String] = None
    var more = true
    while (more) {
      val cont = token.fold("")(t => "&continuation-token=" + qEnc(t))
      val listUri = URI.create(s"$base/?list-type=2&prefix=$q$cont")
      val req = withAuth(request(listUri), "GET", listUri, Array.empty,
        Map.empty).GET().build()
      val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
      resp.statusCode() match {
        case 200 => ()
        // a throttled LIST during snapshot load paces exactly like the
        // put paths — the store's pace applies to the whole wire, not
        // just mutations (ObjectStoreLogStore honors it via pacedRetry)
        case s @ (429 | 503) => HttpWire.throttled(s, resp, s"list of $prefix")
        case other => throw new java.io.IOException(
          s"list of $prefix failed: HTTP $other")
      }
      // malformed bodies (missing fields, provider timestamp dialects) must
      // surface as IOException — the commit loop's retry classification —
      // never as a raw NPE/DateTimeParseException mid-conflict-check
      val doc = HttpWire.secureXml(resp.body(), s"list ($prefix)")
      val contents = doc.getElementsByTagName("Contents")
      (0 until contents.getLength).foreach { i =>
        val el = contents.item(i).asInstanceOf[org.w3c.dom.Element]
        def text(tag: String): Option[String] = HttpWire.elemText(el, tag)
        val key = text("Key").getOrElse(throw new java.io.IOException(
          s"list response entry without <Key> for prefix $prefix"))
        val size = text("Size").flatMap(s => scala.util.Try(s.trim.toLong).toOption)
          .getOrElse(0L)
        val mtime = text("LastModified").map(HttpWire.isoMtimeMs).getOrElse(0L)
        out += ObjectMeta("/" + key.stripPrefix("/"), size, mtime)
      }
      def top(tag: String): Option[String] = {
        val ns = doc.getElementsByTagName(tag)
        if (ns.getLength == 0) None else Some(ns.item(0).getTextContent)
      }
      more = top("IsTruncated").contains("true")
      token = top("NextContinuationToken")
      if (more && token.isEmpty)
        throw new java.io.IOException(
          s"list of $prefix claims IsTruncated without a NextContinuationToken")
    }
    out.result().sortBy(_.key)
  }

  override def delete(key: String): Boolean = {
    val u = uri(key)
    val req = withAuth(request(u), "DELETE", u, Array.empty, Map.empty)
      .DELETE().build()
    val resp = send(req, HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case 200 | 204 => true
      case 404 => false
      // honor the server's pace like every sibling verb: a SlowDown window
      // during log cleanup must pace, not abort the whole cycle
      case s @ (429 | 503) => HttpWire.throttled(s, resp, s"delete of $key")
      case other => throw new java.io.IOException(s"delete of $key failed: HTTP $other")
    }
  }
}
