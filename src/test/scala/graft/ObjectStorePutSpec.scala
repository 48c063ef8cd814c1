package graft

import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/**
 * ConditionalPutClient conformance + crash-fault suite.
 *
 * Conformance: the put-if-absent contract (exclusivity under racing
 * writers, list/get/delete semantics) proven for BOTH bundled clients —
 * the in-memory CAS client and the filesystem client whose atomicity
 * comes from `link(2)`. Any future cloud client (S3 `If-None-Match`, GCS
 * `ifGenerationMatch=0`, Azure `If-None-Match` — reference
 * crates/{aws,gcp,azure}) must pass this same suite.
 *
 * Faults: the object-store failure modes the commit protocol must survive —
 * a put that times out AFTER landing server-side (ghost commit: must not
 * double-commit), a transient put outage (must retry the same version), an
 * eventually-consistent listing that lags the latest commit (must not skip
 * or duplicate versions), and a crash between data-blob write and commit
 * (log must be untouched, next committer unaffected).
 */
class ObjectStorePutSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-objectstore")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val servers = scala.collection.mutable.ListBuffer[MockObjectStoreServer]()
  private def newHttpClient(pageSize: Int = 1000): HttpPutClient = {
    val s = new MockObjectStoreServer(pageSize)
    servers.synchronized { servers += s }
    new HttpPutClient(s.endpoint)
  }
  override def afterAll(): Unit = {
    servers.foreach(_.stop())
    super.afterAll()
  }

  private def freshClients(): Seq[(String, ConditionalPutClient)] = Seq(
    "in-memory" -> new InMemoryPutClient,
    "filesystem" -> new FsPutClient(Files.createTempDirectory("graft_fsput_")),
    // S3-shaped wire protocol (PUT + If-None-Match: * → 412) against an
    // in-process HTTP server — the integration-readiness proof that the
    // ConditionalPutClient boundary suffices for a real cloud backend
    "http-mock" -> newHttpClient())

  // ---- conformance ---------------------------------------------------------

  test("conformance: putIfAbsent exclusive; get/delete round-trip") {
    freshClients().foreach { case (name, c) =>
      assert(c.get("/a/k1").isEmpty, name)
      assert(c.putIfAbsent("/a/k1", "one".getBytes), name)
      assert(!c.putIfAbsent("/a/k1", "two".getBytes), s"$name: second put must lose")
      assert(new String(c.get("/a/k1").get) == "one", s"$name: loser must not overwrite")
      assert(c.delete("/a/k1"), name)
      assert(!c.delete("/a/k1"), s"$name: double delete reports absence")
      assert(c.putIfAbsent("/a/k1", "three".getBytes), s"$name: key reusable after delete")
    }
  }

  test("conformance: racing putIfAbsent has exactly one winner") {
    freshClients().foreach { case (name, c) =>
      val n = 16
      val start = new CountDownLatch(1)
      val wins = new AtomicInteger(0)
      val pool = Executors.newFixedThreadPool(n)
      val winnerBytes = new java.util.concurrent.ConcurrentLinkedQueue[String]()
      (0 until n).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            if (c.putIfAbsent("/race/key", s"writer$i".getBytes)) {
              wins.incrementAndGet(); winnerBytes.add(s"writer$i")
            }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(60, TimeUnit.SECONDS))
      assert(wins.get() == 1, s"$name: expected exactly 1 winner, got ${wins.get()}")
      assert(new String(c.get("/race/key").get) == winnerBytes.peek(),
        s"$name: stored bytes must be the winner's")
    }
  }

  test("conformance: listPrefix filters, sorts, and carries mtimes") {
    freshClients().foreach { case (name, c) =>
      c.putIfAbsent("/t/_delta_log/000.json", "a".getBytes)
      c.putIfAbsent("/t/_delta_log/001.json", "b".getBytes)
      c.putIfAbsent("/t/_delta_log/_sidecars/s1.parquet", "c".getBytes)
      c.putIfAbsent("/t/data.parquet", "d".getBytes)
      c.putIfAbsent("/other/x", "e".getBytes)
      val listed = c.listPrefix("/t/_delta_log/")
      assert(listed.map(_.key) == listed.map(_.key).sorted, s"$name: list must sort")
      assert(listed.map(_.key).toSet == Set("/t/_delta_log/000.json",
        "/t/_delta_log/001.json", "/t/_delta_log/_sidecars/s1.parquet"), name)
      assert(listed.forall(_.mtimeMs > 0), s"$name: mtimes must be real")
      assert(listed.forall(_.size > 0), name)
      // the LogStore adapter exposes only direct children
      val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), c)
      val direct = store.list(new Path("/t/_delta_log")).map(_.getPath.getName)
      assert(direct == Seq("000.json", "001.json"), s"$name: got $direct")
    }
  }

  // ---- fault injection -----------------------------------------------------

  /** Wraps a client with arm-able faults. */
  private class FaultyPutClient(inner: ConditionalPutClient) extends ConditionalPutClient {
    @volatile var failAfterPuts = 0 // IOException AFTER the put lands
    @volatile var failBeforePuts = 0 // IOException BEFORE the put (outage)
    @volatile var crashBeforePut = false // hard crash before the put, once
    @volatile private var lagCalls = 0
    @volatile private var lagKeys: Set[String] = Set.empty

    /** Next `calls` listPrefix calls see only `visible` keys. */
    def armListLag(visible: Set[String], calls: Int): Unit = {
      lagKeys = visible; lagCalls = calls
    }

    override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
      if (crashBeforePut) {
        crashBeforePut = false
        throw new RuntimeException("simulated crash before commit put")
      }
      if (failBeforePuts > 0) {
        failBeforePuts -= 1
        throw new java.io.IOException("simulated store outage (put not attempted)")
      }
      val r = inner.putIfAbsent(key, bytes)
      if (failAfterPuts > 0) {
        failAfterPuts -= 1
        throw new java.io.IOException("simulated timeout (put landed server-side)")
      }
      r
    }
    override def get(key: String): Option[Array[Byte]] = inner.get(key)
    override def listPrefix(prefix: String): Seq[ObjectMeta] = {
      val full = inner.listPrefix(prefix)
      if (lagCalls > 0) { lagCalls -= 1; full.filter(m => lagKeys.contains(m.key)) }
      else full
    }
    override def delete(key: String): Boolean = inner.delete(key)
  }

  private val tableSchema = StructType(Seq(StructField("id", LongType)))

  private def createTable(log: DeltaLog): Unit = {
    val txn = new OptimisticTransaction(log, None)
    txn.commit(Seq(Protocol(), Metadata(schemaString = tableSchema.json)),
      Operation("CREATE TABLE"))
  }

  private def withScheme[T](scheme: String, store: LogStore)(f: DeltaLog => T): T = {
    DeltaLog.registerLogStore(scheme, store)
    try f(new DeltaLog(spark, new Path(s"$scheme://bucket/tbl")))
    finally DeltaLog.unregisterLogStore(scheme)
  }

  private def blindAppend(log: DeltaLog, path: String): Long = {
    val txn = new OptimisticTransaction(log, Some(log.snapshot()))
    txn.commit(Seq(AddFile(path = path, size = 1)), Operation("WRITE"))
  }

  test("fault: timeout-after-put resolves as OUR commit — exactly once") {
    val faulty = new FaultyPutClient(new FsPutClient(Files.createTempDirectory("graft_ghost_")))
    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), faulty)
    withScheme("graftghost", store) { log =>
      createTable(log)
      faulty.failAfterPuts = 1
      val v = blindAppend(log, "f1.parquet")
      assert(v == 1L, s"ghost commit must resolve to the landed version, got $v")
      assert(log.latestVersion() == 1L, "a duplicate commit landed at version 2")
      assert(log.snapshot().allFiles.map(_.path) == Seq("f1.parquet"))
    }
  }

  test("fault: transient put outage retries the same version") {
    val faulty = new FaultyPutClient(new FsPutClient(Files.createTempDirectory("graft_outage_")))
    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), faulty)
    withScheme("graftoutage", store) { log =>
      createTable(log)
      faulty.failBeforePuts = 3
      val v = blindAppend(log, "f1.parquet")
      assert(v == 1L, s"outage retry must land at the original version, got $v")
      assert(log.latestVersion() == 1L)
    }
  }

  test("fault: lagging listing neither skips nor duplicates versions") {
    val base = new FsPutClient(Files.createTempDirectory("graft_lag_"))
    val cleanStore = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), base)
    val faulty = new FaultyPutClient(base)
    val lagStore = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), faulty)
    DeltaLog.registerLogStore("graftlag", lagStore)
    try {
      val logA = new DeltaLog(spark, new Path("graftlag://bucket/tbl"))
      createTable(logA)
      // B pins its snapshot at v0, then A wins version 1
      val txnB = new OptimisticTransaction(logA, Some(logA.snapshot()))
      val preCommitKeys = base.listPrefix("/").map(_.key).toSet
      blindAppend(logA, "a.parquet") // A's commit (clean listing via same store)
      // B's listings now lag: they do not see A's commit for 2 calls
      faulty.armListLag(preCommitKeys, 2)
      val vB = txnB.commit(Seq(AddFile(path = "b.parquet", size = 1)), Operation("WRITE"))
      assert(vB == 2L, s"B must land after A despite the lag, got $vB")
      // the collision handler now trusts the READ commit over the lagging
      // listing (attempt advances past the known-occupied version in one
      // round), so the commit may consume fewer lagging list calls than
      // armed — drop any leftover lag before asserting the final state
      faulty.armListLag(Set.empty, 0)
      assert(logA.latestVersion() == 2L)
      val files = logA.snapshot().allFiles.map(_.path).sorted
      assert(files == Seq("a.parquet", "b.parquet"), s"lost commit: $files")
    } finally DeltaLog.unregisterLogStore("graftlag")
  }

  test("fault: crash between blob write and commit leaves the log untouched") {
    val faulty = new FaultyPutClient(new FsPutClient(Files.createTempDirectory("graft_crash_")))
    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), faulty)
    withScheme("graftcrash", store) { log =>
      createTable(log)
      faulty.crashBeforePut = true
      val crashed = intercept[RuntimeException](blindAppend(log, "doomed.parquet"))
      assert(crashed.getMessage.contains("simulated crash"))
      assert(log.latestVersion() == 0L, "a crashed writer must not advance the log")
      // the next writer is unaffected and takes the same version
      assert(blindAppend(log, "ok.parquet") == 1L)
      assert(log.snapshot().allFiles.map(_.path) == Seq("ok.parquet"))
    }
  }

  test("fault: sustained 429+Retry-After throttle paces the loop, own budget") {
    val s = new MockObjectStoreServer()
    servers.synchronized { servers += s }
    val client = new HttpPutClient(s.endpoint)

    // wire level: the throttle surfaces as a paced exception carrying the
    // server-directed wait (delta-seconds form)
    s.throttlePuts = 1
    s.throttleRetryAfterSecs = Some(1)
    val e = intercept[graft.kernel.RetryPacedException] {
      client.putIfAbsent("/probe", "x".getBytes)
    }
    assert(e.retryAfterMs == 1000L)
    assert(client.putIfAbsent("/probe", "x".getBytes)) // window over

    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), client)
    withScheme("graftthrottle", store) { log =>
      createTable(log)
      // (a) pacing honored: 2 throttled puts at Retry-After: 1 → ≥ ~2s wall
      s.throttlePuts = 2
      val t0 = System.nanoTime()
      assert(blindAppend(log, "a.parquet") == 1L)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms >= 1900, s"commit must sleep the server-directed pace, took ${ms}ms")
      // (b) separate budget: 25 consecutive throttles exceed the 15-retry
      // generic allowance — success proves paced retries draw from their
      // own (cumulative-wait) cap, not the conflict retry budget
      s.throttleRetryAfterSecs = Some(0)
      s.throttlePuts = 25
      assert(blindAppend(log, "b.parquet") == 2L)
      assert(s.throttledCount == 28, s"expected 28 throttled puts, got ${s.throttledCount}")
      // (c) a 429 WITHOUT Retry-After stays on the generic transient path
      s.throttleRetryAfterSecs = None
      s.throttlePuts = 3
      assert(blindAppend(log, "c.parquet") == 3L)
    }
  }

  test("fault: throttled LIST/GET pace the read side (Retry-After honored)") {
    val s = new MockObjectStoreServer()
    servers.synchronized { servers += s }
    val client = new HttpPutClient(s.endpoint)

    // wire level: list and get surface the paced exception with the wait
    s.throttleRetryAfterSecs = Some(1)
    s.throttleLists = 1
    val le = intercept[RetryPacedException](client.listPrefix("/tbl/_delta_log/"))
    assert(le.retryAfterMs == 1000L)
    s.throttleGets = 1
    val ge = intercept[RetryPacedException](client.get("/nope"))
    assert(ge.retryAfterMs == 1000L)

    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), client)
    withScheme("graftlistthrottle", store) { log =>
      createTable(log)
      assert(blindAppend(log, "a.parquet") == 1L)
      // a throttled LIST during log listing paces, then succeeds — before
      // this round it threw "list ... failed: HTTP 429" at the first 429
      s.throttleLists = 2
      val t0 = System.nanoTime()
      assert(log.latestVersion() == 1L)
      val ms = (System.nanoTime() - t0) / 1e6
      assert(ms >= 1900, s"listing must sleep the server-directed pace, took ${ms}ms")
      // Retry-After: 0 spam on GET floors at 100ms accounting, still lands
      s.throttleRetryAfterSecs = Some(0)
      s.throttleGets = 3
      assert(log.readCommit(1L).nonEmpty)
      // a 429 WITHOUT Retry-After keeps the generic IOException contract
      s.throttleRetryAfterSecs = None
      s.throttleLists = 1
      val io = intercept[java.io.IOException](log.latestVersion())
      assert(!io.isInstanceOf[RetryPacedException])
      assert(io.getMessage.contains("throttled"))
    }
  }

  test("end-to-end: 8 racing blind appends through FsPutClient all land") {
    racingAppends("graftrace",
      new FsPutClient(Files.createTempDirectory("graft_race_")))
  }

  test("end-to-end: 8 racing blind appends through the HTTP mock all land") {
    racingAppends("grafthttp", newHttpClient())
  }

  test("conformance: HTTP list follows pagination across truncated pages") {
    val c = newHttpClient(pageSize = 7)
    val keys = (0 until 23).map(i => f"/t/_delta_log/$i%020d.json")
    keys.foreach(k => assert(c.putIfAbsent(k, "x".getBytes)))
    c.putIfAbsent("/u/other", "y".getBytes)
    val listed = c.listPrefix("/t/_delta_log/")
    assert(listed.map(_.key) == keys,
      s"paginated list must return every key in order, got ${listed.size} of ${keys.size}")
  }

  private def racingAppends(scheme: String, client: ConditionalPutClient): Unit = {
    val store = new ObjectStoreLogStore(spark.sessionState.newHadoopConf(), client)
    withScheme(scheme, store) { log =>
      createTable(log)
      val start = new CountDownLatch(1)
      val pool = Executors.newFixedThreadPool(8)
      val versions = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      (0 until 8).foreach { i =>
        pool.submit(new Runnable {
          def run(): Unit = {
            start.await()
            try versions.add(blindAppend(log, s"f$i.parquet"))
            catch { case t: Throwable => failures.add(t) }
          }
        })
      }
      start.countDown()
      pool.shutdown()
      assert(pool.awaitTermination(120, TimeUnit.SECONDS))
      import scala.jdk.CollectionConverters._
      assert(failures.isEmpty,
        s"appends failed: ${failures.asScala.map(_.toString).mkString("; ")}")
      assert(versions.asScala.toSeq.sorted == (1L to 8L), "each commit a distinct version")
      assert(log.snapshot().allFiles.map(_.path).sorted ==
        (0 until 8).map(i => s"f$i.parquet"), "every append visible exactly once")
    }
  }
}
