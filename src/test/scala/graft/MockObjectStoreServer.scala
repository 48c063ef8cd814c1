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
class MockObjectStoreServer(pageSize: Int = 1000,
    requireSigV4: Option[(String, String)] = None) {

  private val store = new InMemoryPutClient

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "mock-object-store"); t.setDaemon(true); t })
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  /** Fault injection: the next N conditional PUTs answer 429 with
    * `Retry-After: <retryAfterSecs>` (sustained-throttle window). An
    * empty retryAfterSecs sends the 429 WITHOUT the header. */
  @volatile var throttlePuts: Int = 0
  @volatile var throttleRetryAfterSecs: Option[Int] = Some(1)
  private val throttled429 = new java.util.concurrent.atomic.AtomicInteger(0)
  /** How many PUTs were actually answered 429 since construction. */
  def throttledCount: Int = throttled429.get()
  private def takeThrottle(): Boolean = synchronized {
    if (throttlePuts > 0) { throttlePuts -= 1; throttled429.incrementAndGet(); true }
    else false
  }

  /** Fault injection for the READ side: the next N LIST (list-type=2) and
    * the next N plain GETs answer 429 (same Retry-After dialect knob). */
  @volatile var throttleLists: Int = 0
  @volatile var throttleGets: Int = 0
  private def takeListThrottle(): Boolean = synchronized {
    if (throttleLists > 0) { throttleLists -= 1; throttled429.incrementAndGet(); true }
    else false
  }
  private def takeGetThrottle(): Boolean = synchronized {
    if (throttleGets > 0) { throttleGets -= 1; throttled429.incrementAndGet(); true }
    else false
  }
  private def respondThrottled(ex: HttpExchange): Unit = {
    throttleRetryAfterSecs.foreach(s =>
      ex.getResponseHeaders.set("Retry-After", s.toString))
    respond(ex, 429)
  }

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
    val body =
      if (ex.getRequestMethod == "PUT") ex.getRequestBody.readAllBytes()
      else Array.empty[Byte]
    // no `return` in here: a non-local return would unwind as a
    // ControlThrowable through handle's catch-all and double-respond
    val rejected = requireSigV4.exists { case (a, sec) =>
      SigV4Verify.check(ex, body, a, sec) match {
        case Some(reason) =>
          System.err.println(s"[mock-object-store] SigV4 reject: $reason")
          respond(ex, 403, reason.getBytes("UTF-8"))
          true
        case None => false
      }
    }
    if (rejected) return
    (ex.getRequestMethod, rawPath) match {
      // bucket-root form `/bucket?list-type=2` is S3 path-style addressing
      // (what S3CompatibleStore's per-bucket clients emit); the bare-root
      // form serves the original endpoint-is-the-bucket clients. Returned
      // <Key>s are bucket-relative, as real S3 returns them.
      case ("GET", _) if params.get("list-type").contains("2") && takeListThrottle() =>
        respondThrottled(ex)
      case ("GET", p) if params.get("list-type").contains("2") =>
        val bucketSeg = decodeKey(p).stripSuffix("/")
        val prefix = params.getOrElse("prefix", "")
        val full = if (bucketSeg.isEmpty) prefix else s"$bucketSeg/$prefix"
        // InMemoryPutClient returns keys sorted; page after the token
        val all = store.listPrefix(full)
        val after = params.get("continuation-token")
          .map(t => all.dropWhile(_.key <= t)).getOrElse(all)
        val (page, rest) = after.splitAt(pageSize)
        def rel(k: String): String =
          if (bucketSeg.isEmpty) k else k.stripPrefix(s"$bucketSeg/")
        val items = page.map { m =>
          s"<Contents><Key>${xmlEscape(rel(m.key))}</Key><Size>${m.size}</Size>" +
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
        val conditional = Option(ex.getRequestHeaders.getFirst("If-None-Match")).contains("*")
        if (conditional && takeThrottle()) {
          throttleRetryAfterSecs.foreach(s =>
            ex.getResponseHeaders.set("Retry-After", s.toString))
          respond(ex, 429)
        }
        else if (conditional) respond(ex, if (store.putIfAbsent(key, body)) 200 else 412)
        else { store.delete(key); store.putIfAbsent(key, body); respond(ex, 200) }
      case ("GET", _) if takeGetThrottle() =>
        respondThrottled(ex)
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

/** Shared by every mock AWS-protocol server in the suite. */
object SigV4Verify {
  /** Independent server-side SigV4 verification (what MinIO does):
    * reconstruct the canonical request from the WIRE — method, raw path,
    * sorted raw query pairs, the signed headers as received, the body hash
    * — and recompute the signature with straight-line HMAC code (no reuse
    * of the client's signer, so a shared canonicalization bug cannot
    * self-validate). Returns None when valid, Some(reason) otherwise. */
  def check(ex: HttpExchange, body: Array[Byte],
      access: String, secret: String): Option[String] = {
    def sha256Hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map("%02x".format(_)).mkString
    def hmac(k: Array[Byte], d: String): Array[Byte] = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256"))
      m.doFinal(d.getBytes("UTF-8"))
    }
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
      .getOrElse(return Some("missing Authorization"))
    val re = """AWS4-HMAC-SHA256 Credential=([^/]+)/(\d{8})/([^/]+)/([^/]+)/aws4_request, SignedHeaders=([^,]+), Signature=([0-9a-f]+)""".r
    val (acc, date, region, service, signedHeaders, sig) = auth match {
      case re(a, d, r, sv, sh, sg) => (a, d, r, sv, sh, sg)
      case _ => return Some(s"unparseable Authorization: $auth")
    }
    if (acc != access) return Some(s"unknown access key $acc")
    val headerLines = signedHeaders.split(";").map { h =>
      val v = Option(ex.getRequestHeaders.getFirst(h))
        .getOrElse(return Some(s"signed header $h absent"))
      // published SigV4 rule: trim AND collapse sequential inner spaces
      s"$h:${v.trim.replaceAll("\\s+", " ")}\n"
    }.mkString
    val rawQuery = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    val canonicalQuery = rawQuery.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")
    val payloadHash = sha256Hex(body)
    val canonical = Seq(ex.getRequestMethod, ex.getRequestURI.getRawPath,
      canonicalQuery, headerLines, signedHeaders, payloadHash).mkString("\n")
    val amzDate = Option(ex.getRequestHeaders.getFirst("x-amz-date"))
      .getOrElse(return Some("missing x-amz-date"))
    val scope = s"$date/$region/$service/aws4_request"
    val sts = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonical.getBytes("UTF-8"))).mkString("\n")
    var k = hmac(s"AWS4$secret".getBytes("UTF-8"), date)
    k = hmac(k, region); k = hmac(k, service); k = hmac(k, "aws4_request")
    val expected = hmac(k, sts).map("%02x".format(_)).mkString
    if (expected != sig) Some(s"signature mismatch (expected $expected got $sig)")
    else None
  }
}
