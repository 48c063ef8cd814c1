package graft

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{DataCatalogException, GlueCatalogClient, UnityCatalogClient}
import graft.table.DeltaTable

/** Unity / Glue catalog network clients against wire-accurate mocks:
  * Unity's REST surface with bearer-token enforcement and paginated
  * listing; Glue's JSON-1.1 GetTable with INDEPENDENT server-side SigV4
  * verification (same verifier that guards the object-store mock) plus the
  * reference's documented location quirks (s3a rewrite, placeholder
  * suffix). Ends name→location→open on a real local Delta table. */
class DataCatalogSpec extends AnyFunSuite {

  private val servers = scala.collection.mutable.ListBuffer[HttpServer]()
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { servers.foreach(_.stop(0)); servers.clear() }

  private def serve(handler: HttpExchange => Unit): String = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", (ex: HttpExchange) => handler(ex))
    server.start()
    servers += server
    s"http://127.0.0.1:${server.getAddress.getPort}"
  }

  private def respond(ex: HttpExchange, code: Int, body: String = ""): Unit = {
    val b = body.getBytes("UTF-8")
    ex.sendResponseHeaders(code, if (b.isEmpty) -1 else b.length.toLong)
    if (b.nonEmpty) ex.getResponseBody.write(b)
    ex.close()
  }

  // ---- Unity ----

  private def unityMock(location: String): String = serve { ex =>
    val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
    if (!auth.contains("Bearer tok-123")) respond(ex, 401, """{"error":"nope"}""")
    else ex.getRequestURI.getPath match {
      case "/api/2.1/unity-catalog/tables/main.sales.events" =>
        respond(ex, 200,
          s"""{"name":"events","catalog_name":"main","schema_name":"sales",
             |"table_type":"EXTERNAL","data_source_format":"DELTA",
             |"storage_location":"$location"}""".stripMargin)
      case "/api/2.1/unity-catalog/tables/main.sales.csvtab" =>
        respond(ex, 200,
          """{"name":"csvtab","data_source_format":"CSV","storage_location":"/x"}""")
      case "/api/2.1/unity-catalog/tables" =>
        val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
        assert(q.contains("catalog_name=main") && q.contains("schema_name=sales"))
        if (q.contains("page_token=p2"))
          respond(ex, 200, """{"tables":[{"name":"t3"}]}""")
        else
          respond(ex, 200,
            """{"tables":[{"name":"t1"},{"name":"t2"}],"next_page_token":"p2"}""")
      case _ => respond(ex, 404, """{"error":"not found"}""")
    }
  }

  test("unity: resolve, auth enforcement, format refusal, 404, paginated list") {
    val endpoint = unityMock("/warehouse/sales/events")
    val uc = new UnityCatalogClient(endpoint, "main", "tok-123")
    assert(uc.resolveTableUri("sales", "events") == "/warehouse/sales/events")
    assert(uc.listTables("sales") == Seq("t1", "t2", "t3"))

    val eFmt = intercept[DataCatalogException](uc.resolveTableUri("sales", "csvtab"))
    assert(eFmt.getMessage.contains("not DELTA"))
    val e404 = intercept[DataCatalogException](uc.resolveTableUri("sales", "ghost"))
    assert(e404.getMessage.contains("not found"))

    val badTok = new UnityCatalogClient(endpoint, "main", "WRONG")
    val eAuth = intercept[DataCatalogException](badTok.resolveTableUri("sales", "events"))
    assert(eAuth.getMessage.contains("authentication"))
  }

  test("unity: name -> location -> open a real Delta table end-to-end") {
    val spark = DataCatalogSpec.spark
    val dir = java.nio.file.Files.createTempDirectory("graft_uc_").toString + "/t"
    DeltaTable.write(spark, spark.range(42).toDF("id"), dir)
    val uc = new UnityCatalogClient(unityMock(dir), "main", "tok-123")
    val t = DeltaTable.forName(spark, uc, "sales", "events")
    assert(t.toDF.count() == 42L)
  }

  // ---- Glue ----

  private def glueMock(location: String, access: String, secret: String): String =
    serve { ex =>
      val body = ex.getRequestBody.readAllBytes()
      SigV4Verify.check(ex, body, access, secret) match {
        case Some(reason) =>
          respond(ex, 403, s"""{"__type":"AccessDeniedException","Message":"$reason"}""")
        case None =>
          val target = Option(ex.getRequestHeaders.getFirst("X-Amz-Target"))
          val bodyStr = new String(body, "UTF-8")
          if (!target.contains("AWSGlue.GetTable"))
            respond(ex, 400, """{"__type":"UnknownOperationException"}""")
          else if (!bodyStr.contains(""""DatabaseName":"db"""") ||
                   !bodyStr.contains(""""Name":"events""""))
            respond(ex, 400, """{"__type":"EntityNotFoundException"}""")
          else respond(ex, 200,
            s"""{"Table":{"Name":"events","DatabaseName":"db",
               |"StorageDescriptor":{"Location":"$location"},
               |"Parameters":{"spark.sql.sources.provider":"delta"}}}""".stripMargin)
      }
    }

  test("glue: SigV4-signed GetTable with s3->s3a rewrite and placeholder strip") {
    val env = Map(
      "AWS_ACCESS_KEY_ID" -> "AKGLUE", "AWS_SECRET_ACCESS_KEY" -> "sekrit",
      "AWS_REGION" -> "eu-central-1")
    // Glue records s3:// (or the reference's post-rewrite form); this stack
    // reads through Hadoop where only s3a has a connector — the client must
    // rewrite TOWARD s3a (the reference's s3a->s3 direction serves Rust
    // object_store and would break forPath here); placeholder strip shared
    val ep = glueMock("s3://bucket/wh/events-__PLACEHOLDER__", "AKGLUE", "sekrit")
    val glue = new GlueCatalogClient(env, endpointOverride = Some(ep))
    assert(glue.resolveTableUri("db", "events") == "s3a://bucket/wh/events")

    val badSecret = new GlueCatalogClient(
      env.updated("AWS_SECRET_ACCESS_KEY", "WRONG"), Some(ep))
    val e = intercept[DataCatalogException](badSecret.resolveTableUri("db", "events"))
    assert(e.getMessage.contains("AccessDenied") || e.getMessage.contains("403"))

    // the JSON-1.1 __type surfaces: missing entities are distinguishable
    // from any other 400
    val e404 = intercept[DataCatalogException](glue.resolveTableUri("db", "ghost"))
    assert(e404.getMessage.contains("entity not found"), e404.getMessage)
  }

  test("glue: refuses to construct without region or credentials") {
    // region resolves first and fails as loudly as the credential cases —
    // a silent us-east-1 default would sign for the wrong region's catalog
    // and surface as a misdiagnosable "entity not found"
    val eRegion = intercept[DataCatalogException](
      new GlueCatalogClient(Map.empty, Some("http://x")))
    assert(eRegion.getMessage.contains("AWS_REGION"))
    val eKey = intercept[DataCatalogException](
      new GlueCatalogClient(Map("AWS_REGION" -> "eu-west-1"), Some("http://x")))
    assert(eKey.getMessage.contains("AWS_ACCESS_KEY_ID"))
  }
}

object DataCatalogSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test-catalogs")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
