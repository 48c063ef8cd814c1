package graft

import java.net.URI
import java.time.Instant

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/** SigV4 + S3-compatible store: the signer against the OFFICIAL documented
  * AWS test vector (canonical-request hash AND final signature pinned), and
  * the full commit protocol end-to-end against the mock object store with
  * INDEPENDENT server-side signature verification enabled — the MinIO
  * deployment shape with no SDK jars. */
class SigV4Spec extends AnyFunSuite {

  private val servers = scala.collection.mutable.ListBuffer[MockObjectStoreServer]()
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { servers.foreach(_.stop()); servers.clear() }

  // The AWS General Reference complete example (IAM ListUsers, 20150830):
  // access AKIDEXAMPLE / secret wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY,
  // us-east-1/iam. Both published intermediates pinned so canonicalization
  // drift localizes: canonical-request sha256
  // f536975d06c0309214f805bb90ccff089219ecd68b2577efef23edd43b7e1a59 and
  // signature 5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7.
  test("official AWS documented test vector (IAM ListUsers 20150830)") {
    val signer = new SigV4Signer(
      accessKey = "AKIDEXAMPLE",
      secretKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      region = "us-east-1", service = "iam",
      clock = () => Instant.parse("2015-08-30T12:36:00Z"))
    val headers = signer.sign("GET",
      URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      Array.empty,
      Map("Content-Type" -> "application/x-www-form-urlencoded; charset=utf-8"))
    assert(headers("x-amz-date") == "20150830T123600Z")
    assert(headers("authorization") ==
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
    // iam (non-s3) requests carry no payload-hash header
    assert(!headers.contains("x-amz-content-sha256"))
  }

  test("s3 service signs payload hash and session token") {
    val signer = new SigV4Signer("AK", "SK", "eu-west-1",
      sessionToken = Some("tok"),
      clock = () => Instant.parse("2026-01-02T03:04:05Z"))
    val payload = "hello".getBytes("UTF-8")
    val h = signer.sign("PUT", URI.create("http://host:9000/b/k"), payload)
    val expectedHash = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload).map("%02x".format(_)).mkString
    assert(h("x-amz-content-sha256") == expectedHash)
    assert(h("x-amz-security-token") == "tok")
    assert(h("authorization").contains(
      "SignedHeaders=host;x-amz-content-sha256;x-amz-date;x-amz-security-token"))
    assert(h("authorization").contains("/eu-west-1/s3/aws4_request"))
  }

  test("signed client passes independent server-side verification end-to-end") {
    val server = new MockObjectStoreServer(pageSize = 3,
      requireSigV4 = Some(("minioadmin", "miniosecret")))
    servers += server
    val env = Map(
      "AWS_ACCESS_KEY_ID" -> "minioadmin",
      "AWS_SECRET_ACCESS_KEY" -> "miniosecret",
      "AWS_REGION" -> "us-east-1")
    val client = S3CompatibleStore.clientFor(server.endpoint, "bucket", env)

    // conditional-put exclusivity, read-back, pagination, delete — every
    // verb signed, every request independently verified by the server
    assert(client.putIfAbsent("/t/_delta_log/00000000000000000000.json", "a".getBytes))
    assert(!client.putIfAbsent("/t/_delta_log/00000000000000000000.json", "b".getBytes))
    assert(new String(client.get("/t/_delta_log/00000000000000000000.json").get) == "a")
    (1 to 7).foreach(i => assert(client.putIfAbsent(
      f"/t/_delta_log/$i%020d.json", s"v$i".getBytes)))
    val listed = client.listPrefix("/t/_delta_log/")
    assert(listed.size == 8) // crossed 3 pagination pages, all pages signed
    assert(client.delete("/t/_delta_log/00000000000000000007.json"))
    assert(client.get("/t/_delta_log/00000000000000000007.json").isEmpty)
  }

  test("adversarial keys round-trip signed (encoding = what the server verifies)") {
    val server = new MockObjectStoreServer(
      requireSigV4 = Some(("ak", "sk")))
    servers += server
    val client = S3CompatibleStore.clientFor(server.endpoint, "b", Map(
      "AWS_ACCESS_KEY_ID" -> "ak", "AWS_SECRET_ACCESS_KEY" -> "sk"))
    // every character class that has burned a signer: space, tilde and
    // star (URLEncoder's two unreserved-set deviations), plus, literal
    // percent, multi-byte unicode, hash and question mark (URI-reserved)
    val keys = Seq(
      "/t/a b/x.json", "/t/tilde~star*/p+q.json", "/t/percent%25/f.json",
      "/t/uni-é😀/g.json", "/t/hash#q?.json")
    keys.foreach(k => assert(client.putIfAbsent(k, k.getBytes("UTF-8")), k))
    keys.foreach(k =>
      assert(new String(client.get(k).get, "UTF-8") == k, s"round-trip $k"))
    assert(client.listPrefix("/t/").map(_.key).sorted == keys.sorted)
    keys.foreach(k => assert(client.delete(k), s"delete $k"))
  }

  test("a wrong secret is rejected by the server (proves verification bites)") {
    val server = new MockObjectStoreServer(
      requireSigV4 = Some(("minioadmin", "miniosecret")))
    servers += server
    val bad = S3CompatibleStore.clientFor(server.endpoint, "bucket", Map(
      "AWS_ACCESS_KEY_ID" -> "minioadmin",
      "AWS_SECRET_ACCESS_KEY" -> "WRONG"))
    val e = intercept[java.io.IOException](bad.putIfAbsent("/t/x", "a".getBytes))
    assert(e.getMessage.contains("403"))
    val anon = new HttpPutClient(s"${server.endpoint}/bucket")
    val e2 = intercept[java.io.IOException](anon.get("/t/x"))
    assert(e2.getMessage.contains("403"))
  }

  test("whole commit protocol through the registered s3-compatible store") {
    val server = new MockObjectStoreServer(
      requireSigV4 = Some(("ak", "sk")))
    servers += server
    val env = Map("AWS_ACCESS_KEY_ID" -> "ak", "AWS_SECRET_ACCESS_KEY" -> "sk")
    val store = S3CompatibleStore.routing("s3mock", server.endpoint, env)
    DeltaLog.registerLogStore("s3mock", store)
    try {
      val spark = SigV4Spec.spark
      val logPath = new org.apache.hadoop.fs.Path("s3mock://bucket/wh/t/_delta_log")
      // drive the LogStore surface the commit protocol uses directly
      // (the parquet DATA plane for a custom scheme needs a Hadoop FS,
      // which is exactly the documented split)
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
      // listed paths re-qualify with scheme+bucket so they route back
      assert(listed.forall(_.getPath.toString.startsWith("s3mock://bucket/")))
      assert(store.read(listed.head.getPath).head.contains("TEST"))
      // second bucket routes to its own client, same registration
      store.writeAtomic(
        new org.apache.hadoop.fs.Path("s3mock://other/t/_delta_log/00000000000000000000.json"),
        Iterator("x"))
      assert(store.exists(
        new org.apache.hadoop.fs.Path("s3mock://other/t/_delta_log/00000000000000000000.json")))
      assert(spark != null) // session warm for suites sharing the JVM
    } finally DeltaLog.unregisterLogStore("s3mock")
  }
}

object SigV4Spec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test-sigv4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
