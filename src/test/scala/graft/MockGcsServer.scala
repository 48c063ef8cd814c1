package graft

import java.net.InetSocketAddress
import java.time.Instant
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.kernel.InMemoryPutClient

/**
 * In-process GCS-flavored object store for [[graft.kernel.GcsClient]]
 * conformance: the OAuth token endpoint VERIFIES the service-account JWT
 * independently (straight-line RS256 check with the configured public key
 * + claim validation — no reuse of the client's signer, so a shared
 * encoding bug cannot self-validate) and issues tracked bearer tokens;
 * every storage call then requires a token this server issued. `PUT`
 * honors `x-goog-if-generation-match: 0` atomically (412 when the object
 * exists, as real GCS answers); listing is the JSON API
 * (`/storage/v1/b/{bucket}/o`) with `nextPageToken` pagination; delete
 * answers 204. `inject429` makes the next N conditional puts answer 429
 * (the same-key mutation rate limit). Storage delegates to
 * [[InMemoryPutClient]] so CAS semantics cannot diverge from the
 * conformance-tested client.
 */
class MockGcsServer(pageSize: Int = 1000,
    verifyJwtWith: Option[java.security.PublicKey] = None,
    expiresInSec: Long = 3600L) {

  private val store = new InMemoryPutClient
  private val issued = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val tokenSeq = new AtomicLong(0)
  /** Observability for the spec: token-exchange requests served. */
  val tokenRequests = new AtomicInteger(0)
  /** Pending injected 429s on conditional puts. */
  val inject429 = new AtomicInteger(0)
  /** Fault injection on the LIST endpoint: the next N list requests answer
    * 429 with `Retry-After: throttleRetryAfterSecs` (None = no header) —
    * the read-side pacing path (`HttpWire.throttled` + the log store's
    * `pacedRetry`) for the GCS dialect; a mid-pagination 429 must restart
    * the listing cleanly. */
  val throttleLists = new AtomicInteger(0)
  /** Let this many list requests pass BEFORE throttling — positions the
    * 429 on a later pagination page (mid-listing restart coverage). */
  val throttleSkip = new AtomicInteger(0)
  @volatile var throttleRetryAfterSecs: Option[Int] = Some(1)
  private val throttled429 = new AtomicInteger(0)
  /** How many LISTs were actually answered 429 since construction. */
  def throttledCount: Int = throttled429.get()
  /** Last JWT assertion received, for independent inspection by the spec. */
  @volatile var lastAssertion: Option[String] = None

  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "mock-gcs"); t.setDaemon(true); t })
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", (ex: HttpExchange) => handle(ex))
  server.setExecutor(pool)
  server.start()

  val endpoint: String = s"http://127.0.0.1:${server.getAddress.getPort}"
  val tokenUri: String = s"$endpoint/token"

  def stop(): Unit = { server.stop(0); pool.shutdownNow() }

  private def respond(ex: HttpExchange, code: Int, body: Array[Byte] = Array.empty): Unit = {
    ex.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) ex.getResponseBody.write(body)
    ex.close()
  }

  private def decodeSegs(rawPath: String): String =
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

  private def jstr(s: String): String =
    JsonMethods.compact(JsonMethods.render(JString(s)))

  /** None = authorized; Some(reason) = reject. Auth is only enforced when
    * a verification key is configured (anonymous mode otherwise). */
  private def checkBearer(ex: HttpExchange): Option[String] =
    if (verifyJwtWith.isEmpty) None
    else Option(ex.getRequestHeaders.getFirst("Authorization")) match {
      case Some(a) if a.startsWith("Bearer ") && issued.contains(a.stripPrefix("Bearer ")) => None
      case Some(a) => Some(s"unknown bearer token: $a")
      case None => Some("missing Authorization")
    }

  private def handle(ex: HttpExchange): Unit = try {
    val rawPath = ex.getRequestURI.getRawPath
    (ex.getRequestMethod, rawPath) match {
      case ("POST", "/token") => handleToken(ex)
      case _ =>
        checkBearer(ex) match {
          case Some(reason) =>
            System.err.println(s"[mock-gcs] auth reject: $reason")
            respond(ex, 401, reason.getBytes("UTF-8"))
          case None => handleStorage(ex, rawPath)
        }
    }
  } catch {
    case e: Throwable =>
      System.err.println(s"[mock-gcs] handler error: $e")
      respond(ex, 500)
  }

  /** Independent JWT verification: split, RS256-check the signing input
    * with the configured public key, validate the documented claims. */
  private def handleToken(ex: HttpExchange): Unit = {
    tokenRequests.incrementAndGet()
    val form = new String(ex.getRequestBody.readAllBytes(), "UTF-8")
    val params = form.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      java.net.URLDecoder.decode(kv.take(i max 0), "UTF-8") ->
        java.net.URLDecoder.decode(kv.drop(i + 1), "UTF-8")
    }.toMap
    def reject(reason: String): Unit = {
      System.err.println(s"[mock-gcs] token reject: $reason")
      respond(ex, 400, reason.getBytes("UTF-8"))
    }
    if (!params.get("grant_type").contains("urn:ietf:params:oauth:grant-type:jwt-bearer"))
      return reject(s"bad grant_type: ${params.get("grant_type")}")
    val jwt = params.getOrElse("assertion", return reject("missing assertion"))
    lastAssertion = Some(jwt)
    val parts = jwt.split("\\.")
    if (parts.length != 3) return reject("assertion is not a 3-part JWT")
    val sigOk = verifyJwtWith.forall { pub =>
      val sig = java.security.Signature.getInstance("SHA256withRSA")
      sig.initVerify(pub)
      sig.update((parts(0) + "." + parts(1)).getBytes("UTF-8"))
      try sig.verify(java.util.Base64.getUrlDecoder.decode(parts(2)))
      catch { case _: Exception => false }
    }
    if (!sigOk) return reject("RS256 signature does not verify")
    val header = JsonMethods.parse(
      new String(java.util.Base64.getUrlDecoder.decode(parts(0)), "UTF-8"))
    if (!(header \ "alg").equals(JString("RS256")))
      return reject("header alg is not RS256")
    val claims = JsonMethods.parse(
      new String(java.util.Base64.getUrlDecoder.decode(parts(1)), "UTF-8"))
    if (!(claims \ "aud").equals(JString(tokenUri)))
      return reject(s"aud is not this token endpoint: ${claims \ "aud"}")
    claims \ "scope" match {
      case JString(s) if s.contains("devstorage") =>
      case other => return reject(s"scope lacks devstorage: $other")
    }
    val (iat, exp) = (claims \ "iat", claims \ "exp") match {
      case (JInt(i), JInt(e)) => (i.toLong, e.toLong)
      case (JLong(i), JLong(e)) => (i, e)
      case _ => return reject("iat/exp missing or non-numeric")
    }
    if (exp <= iat) return reject("exp <= iat")
    val tok = s"mock-gcs-token-${tokenSeq.incrementAndGet()}"
    issued.add(tok)
    val body = s"""{"access_token":${jstr(tok)},"expires_in":$expiresInSec,"token_type":"Bearer"}"""
    respond(ex, 200, body.getBytes("UTF-8"))
  }

  private def handleStorage(ex: HttpExchange, rawPath: String): Unit = {
    val params = queryParams(ex)
    (ex.getRequestMethod, rawPath) match {
      // JSON API list: /storage/v1/b/{bucket}/o?prefix=&pageToken=
      case ("GET", p) if p.startsWith("/storage/v1/b/") =>
        val segs = p.stripPrefix("/storage/v1/b/").split("/", -1)
        if (segs.length != 2 || segs(1) != "o") { respond(ex, 400); return }
        if (throttleSkip.get() > 0 && throttleSkip.decrementAndGet() >= 0) {
          // pass through: this request is before the injected fault window
        } else if (throttleLists.get() > 0 && throttleLists.decrementAndGet() >= 0) {
          throttled429.incrementAndGet()
          throttleRetryAfterSecs.foreach(s =>
            ex.getResponseHeaders.set("Retry-After", s.toString))
          respond(ex, 429,
            """{"error":{"code":429,"message":"rateLimitExceeded"}}""".getBytes("UTF-8"))
          return
        }
        val bucket = java.net.URLDecoder.decode(segs(0), "UTF-8")
        val prefix = params.getOrElse("prefix", "")
        val all = store.listPrefix(s"$bucket/$prefix")
        val after = params.get("pageToken")
          .map(t => all.dropWhile(m => rel(bucket, m.key) <= t))
          .getOrElse(all)
        val (page, rest) = after.splitAt(pageSize)
        val items = page.map { m =>
          s"""{"name":${jstr(rel(bucket, m.key))},"size":${jstr(m.size.toString)},""" +
            s""""updated":${jstr(Instant.ofEpochMilli(m.mtimeMs).toString)}}"""
        }
        // real GCS omits `items` entirely on an empty page
        val itemsField = if (items.isEmpty) "" else s""""items":[${items.mkString(",")}],"""
        val next = if (rest.nonEmpty)
          s""""nextPageToken":${jstr(rel(bucket, page.last.key))},""" else ""
        respond(ex, 200, s"""{$itemsField$next"kind":"storage#objects"}""".getBytes("UTF-8"))
      case ("PUT", p) =>
        val key = decodeSegs(p)
        val body = ex.getRequestBody.readAllBytes()
        val conditional = Option(
          ex.getRequestHeaders.getFirst("x-goog-if-generation-match")).contains("0")
        if (conditional && inject429.get() > 0 && inject429.decrementAndGet() >= 0) {
          respond(ex, 429,
            """{"error":{"code":429,"message":"rateLimitExceeded"}}""".getBytes("UTF-8"))
        } else if (conditional) {
          if (store.putIfAbsent(key, body)) respond(ex, 200)
          else respond(ex, 412,
            """{"error":{"code":412,"message":"conditionNotMet"}}""".getBytes("UTF-8"))
        } else {
          store.delete(key); store.putIfAbsent(key, body); respond(ex, 200)
        }
      case ("GET", p) =>
        store.get(decodeSegs(p)) match {
          case Some(b) => respond(ex, 200, b)
          case None => respond(ex, 404)
        }
      case ("DELETE", p) =>
        respond(ex, if (store.delete(decodeSegs(p))) 204 else 404)
      case _ => respond(ex, 405)
    }
  }

  /** Bucket-relative object name, as the JSON API returns them. */
  private def rel(bucket: String, key: String): String =
    key.stripPrefix(s"$bucket/")
}
