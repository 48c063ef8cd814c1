package graft

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._

/** lakeFS branch-transactional commit plane: client conformance against
  * the mock API (copy-on-write branches, three-way merge conflicts,
  * paginated listing, basic-auth enforcement) and the full LogStore
  * surface — including the two-writers-one-version race, which must lose
  * via the MERGE 409, not by luck of the fast pre-check. */
class LakeFsSpec extends AnyFunSuite {

  private val servers = scala.collection.mutable.ListBuffer[MockLakeFsServer]()
  override def withFixture(test: NoArgTest) =
    try super.withFixture(test)
    finally { servers.foreach(_.stop()); servers.clear() }

  private def newServer(): MockLakeFsServer = {
    val s = new MockLakeFsServer("AKIA", "SECRET", pageSize = 3)
    s.addRepo("repo")
    servers += s
    s
  }
  private val env = Map(
    "LAKEFS_ACCESS_KEY_ID" -> "AKIA", "LAKEFS_SECRET_ACCESS_KEY" -> "SECRET")

  test("client: branch lifecycle, objects, paginated listing, auth bites") {
    val server = newServer()
    val c = new LakeFsClient(server.endpoint, "AKIA", "SECRET")
    c.createBranch("repo", "tx1", "main")
    c.putObject("repo", "tx1", "t/_delta_log/a.json", "A".getBytes)
    assert(new String(c.getObject("repo", "tx1", "t/_delta_log/a.json").get) == "A")
    assert(c.getObject("repo", "main", "t/_delta_log/a.json").isEmpty,
      "branch writes must not leak to main before merge")
    c.commit("repo", "tx1", "c1", allowEmpty = false)
    assert(c.merge("repo", "main", "tx1", "m1"))
    assert(new String(c.getObject("repo", "main", "t/_delta_log/a.json").get) == "A")
    c.deleteBranch("repo", "tx1")
    // pagination across the 3-entry page size
    (0 until 8).foreach(i =>
      c.putObject("repo", "main", f"t/_delta_log/$i%020d.json", s"v$i".getBytes))
    val listed = c.listObjects("repo", "main", "t/_delta_log/")
    assert(listed.size == 9 && listed.map(_.key) == listed.map(_.key).sorted)
    assert(listed.forall(_.mtimeMs > 0))
    // wrong credentials are rejected
    val bad = new LakeFsClient(server.endpoint, "AKIA", "WRONG")
    val e = intercept[java.io.IOException](bad.getObject("repo", "main", "x"))
    assert(e.getMessage.contains("401"))
  }

  test("log store: atomic commits, duplicate refusal, list/read round-trip") {
    val server = newServer()
    val store = new LakeFsLogStore(
      new org.apache.hadoop.conf.Configuration(),
      new LakeFsClient(server.endpoint, "AKIA", "SECRET"))
    val log = new Path("lakefsmock://repo/main/wh/t/_delta_log")
    store.writeAtomic(new Path(log, "00000000000000000000.json"),
      Iterator("""{"commitInfo":{"operation":"TEST"}}"""))
    intercept[VersionAlreadyExistsException] {
      store.writeAtomic(new Path(log, "00000000000000000000.json"), Iterator("dup"))
    }
    store.writeAtomic(new Path(log, "00000000000000000001.json"), Iterator("two"))
    val listed = store.list(log)
    assert(listed.map(_.getPath.getName) ==
      Seq("00000000000000000000.json", "00000000000000000001.json"))
    assert(listed.forall(_.getPath.toString.startsWith("lakefsmock://repo/main/")))
    assert(store.read(listed.head.getPath).head.contains("TEST"))
    assert(store.exists(new Path(log, "00000000000000000001.json")))
    assert(!store.exists(new Path(log, "00000000000000000002.json")))
    // no transaction branches leaked
    val c = new LakeFsClient(server.endpoint, "AKIA", "SECRET")
    intercept[java.io.IOException](c.commit("repo", "graft-tx-leak", "x", true))
  }

  test("adversarial object paths round-trip through the query-param encoding") {
    val server = newServer()
    val c = new LakeFsClient(server.endpoint, "AKIA", "SECRET")
    val keys = Seq("t/a b/x.json", "t/tilde~star*/p+q.json",
      "t/percent%25/f.json", "t/uni-é😀/g.json", "t/hash#q?.json")
    keys.foreach(k => c.putObject("repo", "main", k, k.getBytes("UTF-8")))
    keys.foreach { k =>
      assert(c.statObject("repo", "main", k), s"stat $k")
      assert(new String(c.getObject("repo", "main", k).get, "UTF-8") == k,
        s"round-trip $k")
    }
    assert(c.listObjects("repo", "main", "t/").map(_.key.stripPrefix("/")).sorted
      == keys.sorted)
    keys.foreach(k => assert(c.deleteObject("repo", "main", k), s"delete $k"))
    assert(c.listObjects("repo", "main", "t/").isEmpty)
  }

  test("store delete removes the committed object from the table branch") {
    val server = newServer()
    val store = new LakeFsLogStore(
      new org.apache.hadoop.conf.Configuration(),
      new LakeFsClient(server.endpoint, "AKIA", "SECRET"))
    val p = new Path("lakefsmock://repo/main/wh/t/_delta_log/00000000000000000000.json")
    store.writeAtomic(p, Iterator("x"))
    assert(store.exists(p))
    assert(store.delete(p))
    assert(!store.exists(p))
    assert(!store.delete(p), "second delete must report absence")
  }

  test("two writers racing one version: the loser fails via MERGE conflict") {
    val server = newServer()
    // a client whose branch creation is immediately followed by a competing
    // commit of the SAME version landing on main — the branch snapshot
    // predates it, so only the three-way merge can catch the race
    val racing = new LakeFsClient(server.endpoint, "AKIA", "SECRET") {
      override def createBranch(repo: String, name: String, source: String): Unit = {
        super.createBranch(repo, name, source)
        super.putObject(repo, source, "wh/t/_delta_log/00000000000000000005.json",
          "competitor won".getBytes)
        super.commit(repo, source, "competing commit", allowEmpty = false)
      }
    }
    val store = new LakeFsLogStore(
      new org.apache.hadoop.conf.Configuration(), racing)
    val p = new Path("lakefsmock://repo/main/wh/t/_delta_log/00000000000000000005.json")
    intercept[VersionAlreadyExistsException](store.writeAtomic(p, Iterator("loser")))
    // the competitor's commit survived untouched
    val c = new LakeFsClient(server.endpoint, "AKIA", "SECRET")
    assert(new String(c.getObject("repo", "main",
      "wh/t/_delta_log/00000000000000000005.json").get) == "competitor won")
  }

  test("fault: throttled LIST paces the read side, mid-pagination restart") {
    val server = newServer() // pageSize = 3
    val c = new LakeFsClient(server.endpoint, "AKIA", "SECRET")
    (0 until 8).foreach(i =>
      c.putObject("repo", "main", f"t/_delta_log/$i%020d.json", s"v$i".getBytes))

    // wire level: a throttled ls surfaces the paced exception + wait
    server.throttleRetryAfterSecs = Some(1)
    server.throttleLists.set(1)
    val we = intercept[graft.kernel.RetryPacedException](
      c.listObjects("repo", "main", "t/_delta_log/"))
    assert(we.retryAfterMs == 1000L)

    // store level: the 429 lands on the SECOND pagination page (after one
    // clean page) — the paced retry must restart the listing cleanly and
    // return the complete, ordered result
    val store = new LakeFsLogStore(
      new org.apache.hadoop.conf.Configuration(), c)
    server.throttleSkip.set(1)
    server.throttleLists.set(1)
    val t0 = System.nanoTime()
    val listed = store.list(new Path("lakefsmock://repo/main/t/_delta_log"))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(listed.map(_.getPath.getName) == (0 until 8).map(i => f"$i%020d.json"),
      "mid-pagination throttle must not drop or duplicate entries")
    assert(ms >= 900, s"listing must sleep the server-directed pace, took ${ms}ms")
    assert(server.throttledCount >= 2, "both injected 429s must have fired")
    // read + stat pace too
    server.throttleLists.set(0)
    assert(store.read(
      new Path("lakefsmock://repo/main/t/_delta_log/00000000000000000000.json"))
      .head == "v0")
  }

  test("whole commit protocol through the registered lakefs store") {
    val server = newServer()
    val store = LakeFsStore.register("lakefsmock", server.endpoint, env)
    try {
      val log = new Path("lakefsmock://repo/main/wh/t2/_delta_log")
      store.writeAtomic(new Path(log, "00000000000000000000.json"), Iterator("a"))
      store.writeAtomic(new Path(log, "00000000000000000001.json"), Iterator("b"))
      intercept[VersionAlreadyExistsException] {
        store.writeAtomic(new Path(log, "00000000000000000001.json"), Iterator("dup"))
      }
      assert(store.list(log).size == 2)
    } finally DeltaLog.unregisterLogStore("lakefsmock")
  }
}
