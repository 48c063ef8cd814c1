package graft.kernel

import java.net.URI
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/**
 * Minimal AWS Signature Version 4 request signer — the published algorithm
 * from the AWS General Reference ("Signing AWS API requests"), implemented
 * over the JDK's HMAC-SHA256 only, no SDK. This is what turns
 * [[HttpPutClient]]'s conditional-put wire protocol into a client a real
 * S3-compatible endpoint (AWS S3, MinIO, Ceph RGW, R2) will accept: every
 * request is signed with the full payload hash (no chunked
 * `STREAMING-AWS4-...` transfer — commit files are small).
 *
 * Reference backend being re-expressed: the reference's object-store
 * clients delegate auth to the provider SDKs
 * (`/root/reference/crates/aws/src/lib.rs:39`); here the signature is the
 * deployable boundary because no SDK jars ship.
 *
 * The official documented test vector (IAM ListUsers, 20150830) is pinned
 * in SigV4Spec — canonical-request hash AND final signature — so any
 * canonicalization drift fails loudly.
 *
 * @param clock injectable for the pinned-vector test
 */
class SigV4Signer(
    accessKey: String,
    secretKey: String,
    region: String,
    service: String = "s3",
    sessionToken: Option[String] = None,
    clock: () => java.time.Instant = () => java.time.Instant.now()) {

  private val amzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)
  private val dateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd").withZone(ZoneOffset.UTC)

  private def sha256Hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
    d.map("%02x".format(_)).mkString
  }

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes("UTF-8"))
  }

  /** Canonical query string: the RAW (already percent-encoded) pairs sorted
    * by encoded key then encoded value. The caller must emit query values
    * in unreserved-set percent form (%20, never '+') — [[HttpPutClient]]
    * does — because the server canonicalizes what's on the wire. */
  private def canonicalQuery(rawQuery: String): String =
    if (rawQuery == null || rawQuery.isEmpty) ""
    else rawQuery.split("&").filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      if (i < 0) (kv, "") else (kv.take(i), kv.drop(i + 1))
    }.sorted.map { case (k, v) => s"$k=$v" }.mkString("&")

  private def hostHeader(uri: URI): String = {
    val port = uri.getPort
    val defaultPort = uri.getScheme match {
      case "https" => 443
      case _ => 80
    }
    if (port == -1 || port == defaultPort) uri.getHost
    else s"${uri.getHost}:$port"
  }

  /**
   * Sign one request. Returns the headers to ADD: `authorization`,
   * `x-amz-date`, for S3 `x-amz-content-sha256`, and the session token when
   * present. `extraHeaders` are additional headers the caller will send AND
   * wants signed (e.g. `if-none-match`, `content-type`); the JDK HttpClient
   * sets Host itself from the URI, identical to what is signed here.
   */
  def sign(method: String, uri: URI, payload: Array[Byte],
           extraHeaders: Map[String, String] = Map.empty): Map[String, String] = {
    val now = clock()
    val amzDate = amzDateFmt.format(now)
    val dateStamp = dateFmt.format(now)
    val payloadHash = sha256Hex(payload)

    val toSign: Map[String, String] =
      // SigV4 canonicalization: trim AND collapse sequential internal
      // whitespace — a strict verifier (AWS, MinIO) reconstructs the
      // collapsed form, so signing the uncollapsed one yields
      // SignatureDoesNotMatch
      extraHeaders.map { case (k, v) =>
        k.toLowerCase(java.util.Locale.ROOT) -> v.trim.replaceAll("\\s+", " ") } ++
        Map("host" -> hostHeader(uri), "x-amz-date" -> amzDate) ++
        (if (service == "s3") Map("x-amz-content-sha256" -> payloadHash) else Map.empty) ++
        sessionToken.map("x-amz-security-token" -> _)

    val sortedHeaders = toSign.toSeq.sortBy(_._1)
    val canonicalHeaders = sortedHeaders.map { case (k, v) => s"$k:$v\n" }.mkString
    val signedHeaders = sortedHeaders.map(_._1).mkString(";")

    val path = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
    val canonicalRequest = Seq(
      method, path, canonicalQuery(uri.getRawQuery),
      canonicalHeaders, signedHeaders, payloadHash).mkString("\n")

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign = Seq("AWS4-HMAC-SHA256", amzDate, scope,
      sha256Hex(canonicalRequest.getBytes("UTF-8"))).mkString("\n")

    val kDate = hmac(s"AWS4$secretKey".getBytes("UTF-8"), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hmac(kSigning, stringToSign).map("%02x".format(_)).mkString

    val auth = s"AWS4-HMAC-SHA256 Credential=$accessKey/$scope, " +
      s"SignedHeaders=$signedHeaders, Signature=$signature"

    Map("authorization" -> auth, "x-amz-date" -> amzDate) ++
      (if (service == "s3") Map("x-amz-content-sha256" -> payloadHash) else Map.empty) ++
      sessionToken.map("x-amz-security-token" -> _)
  }
}
