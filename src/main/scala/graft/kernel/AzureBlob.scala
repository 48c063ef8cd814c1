package graft.kernel

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter
import java.util.Locale

import org.apache.hadoop.conf.Configuration

/**
 * Azure Blob Storage Shared Key authorization (the reference's
 * `crates/azure` deployment shape) from the PUBLIC documented scheme —
 * "Authorize with Shared Key", version 2015-02-21 and later — with no SDK
 * jars: pure JDK HMAC over the documented string-to-sign.
 *
 * String-to-sign (Blob service):
 * {{{
 * VERB \n Content-Encoding \n Content-Language \n Content-Length \n
 * Content-MD5 \n Content-Type \n Date \n If-Modified-Since \n If-Match \n
 * If-None-Match \n If-Unmodified-Since \n Range \n
 * CanonicalizedHeaders + CanonicalizedResource
 * }}}
 * where Content-Length is the EMPTY string when zero (the 2015-02-21
 * change), Date is empty because `x-ms-date` is always sent (the JDK
 * HttpClient reserves the Date header anyway), CanonicalizedHeaders is
 * every `x-ms-*` header lowercased, value trimmed with inner whitespace
 * runs collapsed, sorted, as `name:value\n`, and CanonicalizedResource is
 * `/<account><encoded-uri-path>` followed by each query parameter as
 * `\n<lowercase-name>:<decoded-value>` in sorted order. The signature is
 * `Base64(HMAC-SHA256(utf8(stringToSign), Base64Decode(accountKey)))` and
 * the header is `Authorization: SharedKey <account>:<signature>`.
 *
 * The same form covers virtual-host style (`account.blob.core.windows.net`
 * → path `/container/blob`) and Azurite/emulator path-style
 * (`host:10000/account` → path `/account/container/blob`, producing the
 * emulator's documented doubled-account canonical resource).
 */
class AzureSharedKeySigner(
    val account: String,
    base64Key: String,
    clock: () => Instant = () => Instant.now(),
    apiVersion: String = AzureBlobClient.ApiVersion) {

  private val key: Array[Byte] = java.util.Base64.getDecoder.decode(base64Key)
  // NOT DateTimeFormatter.RFC_1123_DATE_TIME: that formatter emits a
  // single-digit day-of-month for days 1-9 (its documented quirk), which
  // real Azure rejects as an invalid x-ms-date — the header needs the
  // fixed-width 2-digit day. Locale pinned so day/month names never
  // localize.
  private val rfc1123 = DateTimeFormatter
    .ofPattern("EEE, dd MMM yyyy HH:mm:ss 'GMT'", Locale.US)
    .withZone(ZoneOffset.UTC)

  /** Headers to attach: `x-ms-date`, `x-ms-version`, `authorization`.
    * `extraHeaders` are the non-standard headers the caller will SEND
    * (x-ms-* ones are canonicalized; the standard conditional headers are
    * picked up by name); `contentLength` must equal the wire value the
    * HTTP client will emit (0 for bodyless verbs). */
  // query canonicalization decodes via PathCodec.pctDecode (strict RFC
  // 3986, '+' stays literal) — the shared codec home, so clients can't
  // drift apart on the signed form
  private def pctDecode(s: String): String = PathCodec.pctDecode(s)

  def sign(method: String, uri: URI, contentLength: Long,
           extraHeaders: Map[String, String] = Map.empty): Map[String, String] = {
    val xmsDate = rfc1123.format(clock())
    val lower = extraHeaders.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val xms = (lower.filter(_._1.startsWith("x-ms-")) ++
      Map("x-ms-date" -> xmsDate, "x-ms-version" -> apiVersion))
      .map { case (k, v) => k -> v.trim.replaceAll("\\s+", " ") }
    val canonicalHeaders = xms.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k:$v\n" }.mkString

    def std(name: String): String = lower.getOrElse(name, "")
    val lengthField = if (contentLength <= 0) "" else contentLength.toString

    val canonicalResource = {
      val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
      val query = Option(uri.getRawQuery).getOrElse("").split("&")
        .filter(_.nonEmpty).map { kv =>
          val i = kv.indexOf('=')
          val (k, v) = if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
          pctDecode(k).toLowerCase(java.util.Locale.ROOT) -> pctDecode(v)
        }.sortBy(_._1).map { case (k, v) => s"\n$k:$v" }.mkString
      s"/$account$path$query"
    }

    val stringToSign = Seq(
      method,
      std("content-encoding"), std("content-language"), lengthField,
      std("content-md5"), std("content-type"), /* Date: */ "",
      std("if-modified-since"), std("if-match"), std("if-none-match"),
      std("if-unmodified-since"), std("range"),
      canonicalHeaders + canonicalResource).mkString("\n")

    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
    val sig = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(stringToSign.getBytes("UTF-8")))
    Map("x-ms-date" -> xmsDate, "x-ms-version" -> apiVersion,
      "authorization" -> s"SharedKey $account:$sig")
  }
}

/**
 * [[ConditionalPutClient]] over the Azure Blob REST surface (Put Blob /
 * Get Blob / Delete Blob / List Blobs), completing the provider matrix the
 * ObjectStoreLogStore contract documents: put-if-absent is `Put Blob` with
 * `If-None-Match: *` (Azure answers 409 BlobAlreadyExists — and some
 * proxies 412 — when the blob exists; both mean "key exists" here, with no
 * S3-style retryable-409 ambiguity because Azure's conditional create is a
 * single-writer-wins race by contract); list is
 * `GET ?restype=container&comp=list&prefix=` XML with `NextMarker`
 * pagination (5000-blob pages on real Azure — a long `_delta_log` must
 * follow the marker or latestVersion goes stale = blessed data loss);
 * delete answers 202. Timeouts/5xx surface as IOException = the commit
 * loop's transient-retry classification, same matrix as [[HttpPutClient]].
 *
 * `endpoint` is the container root, e.g.
 * `http://127.0.0.1:10000/devstoreaccount1/mycontainer` (Azurite) or
 * `https://account.blob.core.windows.net/mycontainer`.
 */
object AzureBlobClient {
  /** One protocol version for signed AND anonymous requests. */
  val ApiVersion = "2021-08-06"
}

class AzureBlobClient(
    endpoint: String,
    requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30),
    signer: Option[AzureSharedKeySigner] = None) extends ConditionalPutClient {

  private val base = endpoint.stripSuffix("/")
  private val http = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10))
    .build()

  private def objectKey(key: String): String = key.stripPrefix("/")

  // shared strict RFC 3986 form (Azure canonicalizes the ENCODED path, so
  // emitted form = signed form) — one implementation across all clients
  private def rfc3986(s: String): String = PathCodec.rfc3986(s)
  private def encodeKey(key: String): String = PathCodec.rfc3986Key(key)

  private def uri(key: String): URI =
    URI.create(base + "/" + encodeKey(objectKey(key)))

  private def request(u: URI): HttpRequest.Builder =
    HttpRequest.newBuilder(u).timeout(requestTimeout)

  private def withAuth(b: HttpRequest.Builder, method: String, u: URI,
      contentLength: Long, extra: Map[String, String]): HttpRequest.Builder = {
    extra.foreach { case (k, v) => b.header(k, v) }
    signer match {
      case Some(s) => s.sign(method, u, contentLength, extra)
        .foreach { case (k, v) => b.header(k, v) }
      case None =>
        // even anonymous requests need the protocol version header
        b.header("x-ms-version", AzureBlobClient.ApiVersion)
    }
    b
  }

  private def send[T](req: HttpRequest,
      handler: HttpResponse.BodyHandler[T]): HttpResponse[T] =
    HttpWire.send(http, req, handler, "blob-store")

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val u = uri(key)
    val req = withAuth(request(u), "PUT", u, bytes.length.toLong,
      Map("x-ms-blob-type" -> "BlockBlob", "If-None-Match" -> "*"))
      .PUT(HttpRequest.BodyPublishers.ofByteArray(bytes))
      .build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 | 201 => true
      case 412 => false // precondition: key exists
      case 409 =>
        // 409 is AMBIGUOUS on Azure: BlobAlreadyExists = key exists, but
        // ContainerBeingDeleted / lease conflicts are infrastructure
        // conditions — mapping those to "exists" sent the commit loop into
        // the ghost check, which 404s and fails as CommitAmbiguous (a
        // misleading terminal error). Disambiguate by the error body like
        // HttpPutClient does for S3's ConditionalRequestConflict; an
        // UNRECOGNIZED body defaults to exists (the historical mapping).
        val body = new String(resp.body(), "UTF-8")
        if (body.contains("ContainerBeingDeleted") ||
            body.contains("ContainerBeingDisabled") ||
            body.contains("LeaseIdMissing") || body.contains("LeaseIdMismatch"))
          throw new java.io.IOException(
            s"conditional put of $key hit a non-existence 409: " +
              s"${body.take(200)}; retry")
        else false
      case s @ (429 | 503) =>
        // ServerBusy/IngressOverLimit: Azure documents Retry-After (and
        // x-ms-retry-after-ms) pacing on throttle responses — honored by
        // the commit loop from its own pacing budget
        HttpWire.throttled(s, resp, s"conditional put of $key (Azure)")
      case other => throw new java.io.IOException(
        s"conditional put of $key failed: HTTP $other")
    }
  }

  override def get(key: String): Option[Array[Byte]] = {
    val u = uri(key)
    val req = withAuth(request(u), "GET", u, 0L, Map.empty).GET().build()
    val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
    resp.statusCode() match {
      case 200 => Some(resp.body())
      case 404 => None
      case s @ (429 | 503) => HttpWire.throttled(s, resp, s"get of $key (Azure)")
      case other => throw new java.io.IOException(s"get of $key failed: HTTP $other")
    }
  }

  override def listPrefix(prefix: String): Seq[ObjectMeta] = {
    val q = rfc3986(objectKey(prefix))
    val out = Seq.newBuilder[ObjectMeta]
    var marker: Option[String] = None
    var more = true
    while (more) {
      val mk = marker.fold("")(m => "&marker=" + rfc3986(m))
      val listUri = URI.create(s"$base?restype=container&comp=list&prefix=$q$mk")
      val req = withAuth(request(listUri), "GET", listUri, 0L, Map.empty)
        .GET().build()
      val resp = send(req, HttpResponse.BodyHandlers.ofByteArray())
      resp.statusCode() match {
        case 200 => ()
        case s @ (429 | 503) =>
          HttpWire.throttled(s, resp, s"list of $prefix (Azure)")
        case other => throw new java.io.IOException(
          s"list of $prefix failed: HTTP $other")
      }
      val doc = HttpWire.secureXml(resp.body(), s"blob list ($prefix)")
      val blobs = doc.getElementsByTagName("Blob")
      (0 until blobs.getLength).foreach { i =>
        val el = blobs.item(i).asInstanceOf[org.w3c.dom.Element]
        def text(tag: String): Option[String] = HttpWire.elemText(el, tag)
        val name = text("Name").getOrElse(throw new java.io.IOException(
          s"list response blob without <Name> for prefix $prefix"))
        val size = text("Content-Length")
          .flatMap(s => scala.util.Try(s.trim.toLong).toOption).getOrElse(0L)
        // RFC 1123 per Azure; tolerate ISO dialects from emulators
        val mtime = text("Last-Modified").flatMap { ts =>
          scala.util.Try(java.time.ZonedDateTime.parse(ts,
            DateTimeFormatter.RFC_1123_DATE_TIME).toInstant.toEpochMilli).toOption
            .orElse(scala.util.Try(Instant.parse(ts).toEpochMilli).toOption)
        }.getOrElse(0L)
        out += ObjectMeta("/" + name.stripPrefix("/"), size, mtime)
      }
      val nm = doc.getElementsByTagName("NextMarker")
      marker = if (nm.getLength == 0) None
        else Option(nm.item(0).getTextContent).map(_.trim).filter(_.nonEmpty)
      more = marker.isDefined
    }
    out.result().sortBy(_.key)
  }

  override def delete(key: String): Boolean = {
    val u = uri(key)
    val req = withAuth(request(u), "DELETE", u, 0L, Map.empty)
      .DELETE().build()
    val resp = send(req, HttpResponse.BodyHandlers.discarding())
    resp.statusCode() match {
      case 200 | 202 | 204 => true
      case 404 => false
      // pace on throttle like the sibling verbs (see HttpPutClient.delete)
      case s @ (429 | 503) => HttpWire.throttled(s, resp, s"delete of $key")
      case other => throw new java.io.IOException(s"delete of $key failed: HTTP $other")
    }
  }
}

/**
 * Azure Blob commit plane registration — the `crates/azure` counterpart of
 * [[S3CompatibleStore]]: one registration per scheme, per-container routing
 * on the path authority, credentials entirely from the environment
 * (`AZURE_STORAGE_ACCOUNT` + `AZURE_STORAGE_KEY`; key unset = anonymous,
 * e.g. a public container or unauthenticated emulator).
 *
 * {{{
 * // once per JVM, before touching az:// tables:
 * AzureBlobStore.register("az", "http://127.0.0.1:10000/devstoreaccount1")
 * val t = DeltaTable.forPath(spark, "az://container/warehouse/events")
 * }}}
 *
 * Same scope split as the S3 registration: this is the COMMIT/log plane;
 * the parquet data plane rides the cluster's Hadoop FileSystem for the
 * scheme (hadoop-azure), which deployments already have.
 */
object AzureBlobStore {

  def register(scheme: String, endpoint: String,
               env: Map[String, String] = sys.env,
               conf: Configuration = new Configuration()): LogStore = {
    val store = routing(scheme, endpoint, env, conf)
    DeltaLog.registerLogStore(scheme, store)
    store
  }

  def routing(scheme: String, endpoint: String,
              env: Map[String, String] = sys.env,
              conf: Configuration = new Configuration()): LogStore =
    new S3CompatibleLogStore(conf, scheme, endpoint.stripSuffix("/"),
      container => clientFor(endpoint, container, env))

  /** One signed [[AzureBlobClient]] rooted at `<endpoint>/<container>`. */
  def clientFor(endpoint: String, container: String,
                env: Map[String, String] = sys.env): AzureBlobClient = {
    val signer = env.get("AZURE_STORAGE_KEY").map { key =>
      val account = env.getOrElse("AZURE_STORAGE_ACCOUNT", throw
        new IllegalArgumentException(
          "AZURE_STORAGE_KEY is set but AZURE_STORAGE_ACCOUNT is not"))
      new AzureSharedKeySigner(account, key)
    }
    new AzureBlobClient(s"${endpoint.stripSuffix("/")}/$container",
      signer = signer)
  }
}
