package graft

import java.net.URI
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/** Azure Blob Shared Key commit plane: the signer against an independent
  * straight-line reconstruction of the documented string-to-sign, and the
  * full [[AzureBlobClient]] protocol end-to-end against the mock blob
  * store with INDEPENDENT server-side signature verification — the
  * Azurite/real-Azure deployment shape with no SDK jars. Account and key
  * are the PUBLIC documented Azurite development defaults. */
class AzureBlobSpec extends AnyFunSuite {

  private val account = "devstoreaccount1"
  private val devKey =
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="
  private val env = Map(
    "AZURE_STORAGE_ACCOUNT" -> account, "AZURE_STORAGE_KEY" -> devKey)

  private val servers = scala.collection.mutable.ListBuffer[MockAzureBlobServer]()
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { servers.foreach(_.stop()); servers.clear() }

  test("signer produces the documented string-to-sign (independent reconstruction)") {
    val signer = new AzureSharedKeySigner(account, devKey,
      clock = () => Instant.parse("2026-01-02T03:04:05Z"))
    val payload = "body".getBytes("UTF-8")
    val h = signer.sign("PUT",
      URI.create(s"http://127.0.0.1:10000/$account/c/t/_delta_log/0.json"),
      payload.length.toLong,
      Map("x-ms-blob-type" -> "BlockBlob", "If-None-Match" -> "*"))
    // fixed-width 2-digit day: Java's RFC_1123_DATE_TIME would emit
    // "Fri, 2 Jan" which real Azure rejects — the pad is load-bearing
    assert(h("x-ms-date") == "Fri, 02 Jan 2026 03:04:05 GMT")
    // straight-line reconstruction of the published rule — no signer reuse
    val canonicalHeaders =
      s"x-ms-blob-type:BlockBlob\nx-ms-date:${h("x-ms-date")}\nx-ms-version:2021-08-06\n"
    val canonicalResource = s"/$account/$account/c/t/_delta_log/0.json"
    val sts = Seq("PUT", "", "", "4", "", "", "", "", "", "*", "", "",
      canonicalHeaders + canonicalResource).mkString("\n")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(
      java.util.Base64.getDecoder.decode(devKey), "HmacSHA256"))
    val expected = java.util.Base64.getEncoder.encodeToString(
      mac.doFinal(sts.getBytes("UTF-8")))
    assert(h("authorization") == s"SharedKey $account:$expected",
      s"got ${h("authorization")}")
  }

  test("signed client passes independent server-side verification end-to-end") {
    val server = new MockAzureBlobServer(pageSize = 3,
      requireSharedKey = Some((account, devKey)))
    servers += server
    val client = AzureBlobStore.clientFor(
      s"${server.endpoint}/$account", "container", env)

    assert(client.putIfAbsent("/t/_delta_log/00000000000000000000.json", "a".getBytes))
    assert(!client.putIfAbsent("/t/_delta_log/00000000000000000000.json", "b".getBytes))
    assert(new String(client.get("/t/_delta_log/00000000000000000000.json").get) == "a")
    (1 to 7).foreach(i => assert(client.putIfAbsent(
      f"/t/_delta_log/$i%020d.json", s"v$i".getBytes)))
    val listed = client.listPrefix("/t/_delta_log/")
    assert(listed.size == 8) // crossed 3 NextMarker pages, all pages signed
    assert(listed.map(_.key) == listed.map(_.key).sorted)
    assert(listed.forall(_.mtimeMs > 0),
      "Last-Modified must round-trip (commit mtimes drive time travel)")
    assert(client.delete("/t/_delta_log/00000000000000000007.json"))
    assert(client.get("/t/_delta_log/00000000000000000007.json").isEmpty)
  }

  test("throttled LIST paces via x-ms-retry-after-ms (and Retry-After)") {
    val server = new MockAzureBlobServer()
    servers += server
    val client = new AzureBlobClient(s"${server.endpoint}/$account/c")
    client.putIfAbsent("/t/_delta_log/00000000000000000000.json", "a".getBytes)

    // wire level: the Azure-native ms header drives the pace
    server.throttleMsHeader = Some(700L)
    server.throttleLists = 1
    val e = intercept[RetryPacedException](client.listPrefix("/t/_delta_log/"))
    assert(e.retryAfterMs == 700L)
    // standard Retry-After delta-seconds also honored on the list path
    server.throttleMsHeader = None
    server.throttleRetryAfterSecs = Some(1)
    server.throttleLists = 1
    val e2 = intercept[RetryPacedException](client.listPrefix("/t/_delta_log/"))
    assert(e2.retryAfterMs == 1000L)

    // through the log store: a throttled listing paces and then succeeds
    val store = new ObjectStoreLogStore(
      new org.apache.hadoop.conf.Configuration(false), client)
    server.throttleMsHeader = Some(300L)
    server.throttleRetryAfterSecs = None
    server.throttleLists = 2
    val t0 = System.nanoTime()
    val listed = store.list(new org.apache.hadoop.fs.Path("az://c/t/_delta_log"))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(listed.map(_.getPath.getName) == Seq("00000000000000000000.json"))
    assert(ms >= 550, s"listing must sleep the server-directed pace, took ${ms}ms")
  }

  test("adversarial keys round-trip signed") {
    val server = new MockAzureBlobServer(
      requireSharedKey = Some((account, devKey)))
    servers += server
    val client = AzureBlobStore.clientFor(
      s"${server.endpoint}/$account", "c", env)
    val keys = Seq(
      "/t/a b/x.json", "/t/tilde~star*/p+q.json", "/t/percent%25/f.json",
      "/t/uni-é😀/g.json", "/t/hash#q?.json")
    keys.foreach(k => assert(client.putIfAbsent(k, k.getBytes("UTF-8")), k))
    keys.foreach(k =>
      assert(new String(client.get(k).get, "UTF-8") == k, s"round-trip $k"))
    assert(client.listPrefix("/t/").map(_.key).sorted == keys.sorted)
    keys.foreach(k => assert(client.delete(k), s"delete $k"))
  }

  test("a wrong key is rejected by the server (proves verification bites)") {
    val server = new MockAzureBlobServer(
      requireSharedKey = Some((account, devKey)))
    servers += server
    val wrongKey = java.util.Base64.getEncoder.encodeToString(
      "not-the-key".getBytes("UTF-8"))
    val bad = AzureBlobStore.clientFor(s"${server.endpoint}/$account", "c",
      Map("AZURE_STORAGE_ACCOUNT" -> account, "AZURE_STORAGE_KEY" -> wrongKey))
    val e = intercept[java.io.IOException](bad.putIfAbsent("/t/x", "a".getBytes))
    assert(e.getMessage.contains("403"))
    val anon = new AzureBlobClient(s"${server.endpoint}/$account/c")
    val e2 = intercept[java.io.IOException](anon.get("/t/x"))
    assert(e2.getMessage.contains("403"))
  }

  test("whole commit protocol through the registered azure store") {
    val server = new MockAzureBlobServer(
      requireSharedKey = Some((account, devKey)))
    servers += server
    val store = AzureBlobStore.routing("azmock",
      s"${server.endpoint}/$account", env)
    DeltaLog.registerLogStore("azmock", store)
    try {
      val logPath = new org.apache.hadoop.fs.Path("azmock://container/wh/t/_delta_log")
      store.writeAtomic(new org.apache.hadoop.fs.Path(logPath, "00000000000000000000.json"),
        Iterator("""{"commitInfo":{"operation":"TEST"}}"""))
      intercept[VersionAlreadyExistsException] {
        store.writeAtomic(new org.apache.hadoop.fs.Path(logPath, "00000000000000000000.json"),
          Iterator("dup"))
      }
      store.writeAtomic(new org.apache.hadoop.fs.Path(logPath, "00000000000000000001.json"),
        Iterator("""{"commitInfo":{"operation":"TEST2"}}"""))
      val listed = store.list(logPath)
      assert(listed.map(_.getPath.getName) ==
        Seq("00000000000000000000.json", "00000000000000000001.json"))
      assert(listed.forall(_.getPath.toString.startsWith("azmock://container/")))
      assert(store.read(listed.head.getPath).head.contains("TEST"))
      // a second container routes to its own signed client
      store.writeAtomic(
        new org.apache.hadoop.fs.Path("azmock://other/t/_delta_log/00000000000000000000.json"),
        Iterator("x"))
      assert(store.exists(
        new org.apache.hadoop.fs.Path("azmock://other/t/_delta_log/00000000000000000000.json")))
    } finally DeltaLog.unregisterLogStore("azmock")
  }
}
