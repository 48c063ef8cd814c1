package graft.catalog

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.kernel.SigV4Signer

/**
 * Name→location data catalogs — the reference's `DataCatalog` trait
 * (`/root/reference/crates/core/src/data_catalog/mod.rs:50`,
 * `get_table_storage_location`) re-expressed over the JDK HTTP client so
 * the network clients are deployable without SDK jars, exactly like the
 * [[graft.kernel.S3CompatibleStore]] storage boundary:
 *
 *  - [[UnityCatalogClient]] speaks the published Unity Catalog REST API
 *    (`GET /api/2.1/unity-catalog/tables/{cat}.{schema}.{tbl}` with a
 *    bearer token — `crates/catalog-unity/src/lib.rs:692,1064`);
 *  - [[GlueCatalogClient]] speaks AWS Glue's JSON-1.1 protocol
 *    (`X-Amz-Target: AWSGlue.GetTable`, SigV4 service "glue" — the same
 *    resolution `crates/catalog-glue/src/lib.rs:66-110` performs through
 *    the Rust SDK), including its quirks: `s3a://` → `s3://` rewrite and
 *    the Spark `-__PLACEHOLDER__` location suffix strip.
 *
 * Both return a table URI for [[graft.table.DeltaTable.forPath]]; pair
 * with an [[graft.kernel.S3CompatibleStore]] registration for the commit
 * plane when the location is an object store.
 */
trait DataCatalog {
  /** Storage location (a `DeltaTable.forPath`-able URI) of `database.table`. */
  def resolveTableUri(database: String, table: String): String
}

class DataCatalogException(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

private[catalog] object CatalogHttp {
  val client: HttpClient = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofSeconds(10)).build()

  def send(req: HttpRequest): HttpResponse[String] =
    try client.send(req, HttpResponse.BodyHandlers.ofString())
    catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new DataCatalogException("interrupted during catalog call", e)
      case e: java.io.IOException =>
        throw new DataCatalogException(s"catalog request failed: ${e.getMessage}", e)
    }

  /** Percent-encode one URL path segment (RFC 3986 unreserved set). */
  def encSeg(s: String): String =
    s.getBytes("UTF-8").map { b =>
      val c = (b & 0xff).toChar
      if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9') || c == '-' || c == '_' || c == '.' || c == '~')
        c.toString
      else f"%%${b & 0xff}%02X"
    }.mkString

  /** JSON string-literal escape for builder-side request bodies —
    * delegated to json4s (already the file's JSON library) rather than a
    * hand-rolled escaper that must stay correct by itself. */
  def jstr(s: String): String = JsonMethods.compact(JsonMethods.render(JString(s)))

  def strField(json: JValue, name: String, ctx: String): String =
    json \ name match {
      case JString(s) if s.nonEmpty => s
      case _ => throw new DataCatalogException(s"$ctx: missing '$name' in response")
    }
}

/**
 * Unity Catalog REST client. `catalogName` is the UC catalog the
 * `database` (schema) names resolve under; `token` is a bearer token
 * (PAT / OAuth — empty string = unauthenticated local server).
 */
class UnityCatalogClient(
    workspaceUrl: String,
    catalogName: String,
    token: String,
    requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends DataCatalog {

  private val base = s"${workspaceUrl.stripSuffix("/")}/api/2.1/unity-catalog"

  private def get(pathAndQuery: String): JValue = {
    val b = HttpRequest.newBuilder(URI.create(s"$base/$pathAndQuery"))
      .timeout(requestTimeout).GET()
    if (token.nonEmpty) b.header("Authorization", s"Bearer $token")
    val resp = CatalogHttp.send(b.build())
    resp.statusCode() match {
      case 200 =>
        try JsonMethods.parse(resp.body())
        catch { case e: Exception => throw new DataCatalogException(
          s"Unity Catalog: unparseable 200 response for $pathAndQuery", e) }
      case 404 => throw new DataCatalogException(
        s"Unity Catalog: not found: $pathAndQuery")
      case 401 | 403 => throw new DataCatalogException(
        s"Unity Catalog: authentication failed (HTTP ${resp.statusCode()})")
      case other => throw new DataCatalogException(
        s"Unity Catalog: HTTP $other for $pathAndQuery: ${resp.body().take(200)}")
    }
  }

  override def resolveTableUri(database: String, table: String): String = {
    val full = s"$catalogName.$database.$table"
    // the three-part name is ONE path segment in the UC API; encode it so
    // names with spaces/reserved chars neither break URI.create nor
    // address a different resource
    val json = get(s"tables/${CatalogHttp.encSeg(full)}")
    val fmt = json \ "data_source_format" match {
      case JString(s) => s
      case _ => "DELTA" // servers may omit for external tables
    }
    if (!fmt.equalsIgnoreCase("DELTA"))
      throw new DataCatalogException(
        s"Unity Catalog: table $full has data_source_format=$fmt, not DELTA")
    CatalogHttp.strField(json, "storage_location", s"table $full")
  }

  /** Table names under `database`, following `next_page_token` pagination. */
  def listTables(database: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var token0: Option[String] = None
    var more = true
    while (more) {
      val page = token0.fold("")(t => s"&page_token=${java.net.URLEncoder.encode(t, "UTF-8")}")
      val json = get(s"tables?catalog_name=${CatalogHttp.encSeg(catalogName)}" +
        s"&schema_name=${CatalogHttp.encSeg(database)}$page")
      json \ "tables" match {
        case JArray(ts) => ts.foreach(t => out += CatalogHttp.strField(t, "name", "tables list"))
        case _ =>
      }
      json \ "next_page_token" match {
        case JString(t) if t.nonEmpty => token0 = Some(t)
        case _ => more = false
      }
    }
    out.result()
  }
}

/**
 * AWS Glue Data Catalog client over the public JSON-1.1 wire protocol
 * (`POST / ` + `X-Amz-Target: AWSGlue.GetTable`), signed with
 * [[SigV4Signer]] (service "glue"). Credentials/region come from the
 * standard AWS env vars; `endpoint` defaults to the regional Glue
 * endpoint and is overridable for gateways/mocks.
 */
class GlueCatalogClient(
    env: Map[String, String] = sys.env,
    endpointOverride: Option[String] = None,
    catalogId: Option[String] = None,
    requestTimeout: java.time.Duration = java.time.Duration.ofSeconds(30))
    extends DataCatalog {

  // AWS_REGION, then AWS_DEFAULT_REGION (the SDK/CLI resolution order) —
  // honoring only the former signed for the wrong region in common
  // CLI-configured environments. Missing region fails as loudly as the
  // missing-credential cases below: a silent us-east-1 default resolves
  // tables against the wrong region's catalog and surfaces as a
  // misdiagnosable "entity not found" (this client reads neither IMDS
  // nor ~/.aws/config, so there is no quieter correct fallback).
  private val region = env.get("AWS_REGION")
    .orElse(env.get("AWS_DEFAULT_REGION")).getOrElse(throw
      new DataCatalogException(
        "Glue catalog: AWS_REGION (or AWS_DEFAULT_REGION) not set"))
  private val endpoint =
    endpointOverride.getOrElse(s"https://glue.$region.amazonaws.com")
  private val signer = new SigV4Signer(
    accessKey = env.getOrElse("AWS_ACCESS_KEY_ID", throw
      new DataCatalogException("Glue catalog: AWS_ACCESS_KEY_ID not set")),
    secretKey = env.getOrElse("AWS_SECRET_ACCESS_KEY", throw
      new DataCatalogException("Glue catalog: AWS_SECRET_ACCESS_KEY not set")),
    region = region, service = "glue",
    sessionToken = env.get("AWS_SESSION_TOKEN"))

  // reference lib.rs:59 — Spark writes Glue locations with this suffix
  private val PlaceholderSuffix = "-__PLACEHOLDER__"

  private def call(target: String, body: String): JValue = {
    val uri = URI.create(endpoint + "/")
    val payload = body.getBytes("UTF-8")
    val extra = Map(
      "Content-Type" -> "application/x-amz-json-1.1",
      "X-Amz-Target" -> target)
    val b = HttpRequest.newBuilder(uri).timeout(requestTimeout)
      .POST(HttpRequest.BodyPublishers.ofByteArray(payload))
    extra.foreach { case (k, v) => b.header(k, v) }
    signer.sign("POST", uri, payload, extra)
      .foreach { case (k, v) => b.header(k, v) }
    val resp = CatalogHttp.send(b.build())
    if (resp.statusCode() != 200) {
      // surface the JSON-1.1 error code: a 400 EntityNotFoundException
      // (missing table/database) must be distinguishable from
      // AccessDenied/Validation errors, like the Unity client's 404/403
      // mapping
      val errType = scala.util.Try(JsonMethods.parse(resp.body()) \ "__type")
        .toOption.collect { case org.json4s.JString(t) => t.split('#').last }
      throw new DataCatalogException(errType match {
        case Some("EntityNotFoundException") =>
          s"Glue $target: entity not found (${resp.body().take(200)})"
        case Some(t) =>
          s"Glue $target: $t (HTTP ${resp.statusCode()}): ${resp.body().take(200)}"
        case None =>
          s"Glue $target: HTTP ${resp.statusCode()}: ${resp.body().take(200)}"
      })
    }
    try JsonMethods.parse(resp.body())
    catch { case e: Exception =>
      throw new DataCatalogException(s"Glue $target: unparseable 200 response", e) }
  }

  override def resolveTableUri(database: String, table: String): String = {
    import CatalogHttp.jstr
    // names are JSON-escaped: a quote/backslash in a table name must not
    // produce malformed JSON or address a different entity
    val idPart = catalogId.fold("")(id => s""""CatalogId":${jstr(id)},""")
    val json = call("AWSGlue.GetTable",
      s"""{$idPart"DatabaseName":${jstr(database)},"Name":${jstr(table)}}""")
    val loc = CatalogHttp.strField(
      json \ "Table" \ "StorageDescriptor", "Location",
      s"Glue table $database.$table")
    // the reference rewrites s3a→s3 for Rust object_store (lib.rs:101-110);
    // this stack reads through Hadoop, where only s3a has a connector — so
    // the USABLE direction here is the inverse (s3→s3a), keeping the
    // forPath-able-URI contract. The Spark placeholder strip is shared.
    // prefix-anchored, not a global replace: a key whose TEXT embeds
    // "s3://" (e.g. "backup-of-s3://old") must not be rewritten mid-string
    val s3 =
      if (loc.startsWith("s3://")) "s3a://" + loc.stripPrefix("s3://") else loc
    if (s3.endsWith(PlaceholderSuffix)) s3.dropRight(PlaceholderSuffix.length)
    else s3
  }
}
