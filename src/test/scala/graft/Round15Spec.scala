package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** Round-15 coverage for the r14 verdict queue: run-level idempotent
  * replay for DELETE/UPDATE (appTxn threading through DeleteOp/UpdateOp —
  * the r14 skip wired only MERGE, sink, and blind append). */
class Round15Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r15")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r15_").toString + "/t"

  // ------------------------------------------------- UPDATE/DELETE appTxn

  test("UpdateOp skips an already-applied (appId, version) with zeroed " +
      "marked metrics; higher versions still apply") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    def upd(ver: Long, suffix: String): Map[String, String] =
      t.update(Map("v" -> concat(col("v"), lit(suffix))),
        appTxn = Some(("r15u", ver)))

    val first = upd(3L, "_1")
    assert(first.get("replay_skipped").isEmpty)
    assert(first("num_updated_rows") == "2")

    val replay = upd(3L, "_1")
    assert(replay.get("replay_skipped").contains("true"))
    assert(replay("num_updated_rows") == "0")
    assert(replay("num_added_files") == "0")

    val lower = upd(1L, "_0") // at-or-below the recorded version: skip
    assert(lower.get("replay_skipped").contains("true"))

    val next = upd(4L, "_2")
    assert(next.get("replay_skipped").isEmpty)
    assert(t.txnVersion("r15u").contains(4L))
    assert(t.toDF.orderBy("id").as[(String, String)]
      .collect().map(_._2).toSeq == Seq("a_1_2", "b_1_2"))
  }

  test("DeleteOp skips an already-applied (appId, version); a no-match " +
      "UPDATE still advances the position") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (1L to 10L).map(i => (i, "v")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)

    val first = t.delete(Some("id > 5"), appTxn = Some(("r15d", 1L)))
    assert(first.get("replay_skipped").isEmpty)
    assert(first("num_deleted_rows") == "5")

    val replay = t.delete(Some("id > 5"), appTxn = Some(("r15d", 1L)))
    assert(replay.get("replay_skipped").contains("true"))
    assert(replay("num_deleted_rows") == "0")
    assert(t.toDF.count() == 5)

    // a pruned-to-nothing UPDATE at the next version must still record the
    // position (emptyCommit carries the txn action): the replayed batch of
    // a no-match update must not re-run forever
    val noMatch = t.update(Map("v" -> lit("x")), Some("id > 100"),
      appTxn = Some(("r15d", 2L)))
    assert(noMatch.get("replay_skipped").isEmpty)
    assert(t.txnVersion("r15d").contains(2L))
    val noMatchReplay = t.update(Map("v" -> lit("x")), Some("id > 100"),
      appTxn = Some(("r15d", 2L)))
    assert(noMatchReplay.get("replay_skipped").contains("true"))

    // full-table DELETE path (predicate None) carries the marker too
    val full = t.delete(None, appTxn = Some(("r15d", 3L)))
    assert(full.get("replay_skipped").isEmpty)
    val fullReplay = t.delete(None, appTxn = Some(("r15d", 3L)))
    assert(fullReplay.get("replay_skipped").contains("true"))
    assert(t.txnVersion("r15d").contains(3L))
    assert(t.toDF.count() == 0)
  }

  test("two racing UPDATE replays of one (appId, version) apply exactly once") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (1L to 50L).map(i => (i, "v")).toDF("id", "v"), dir)

    def replay(): Map[String, String] = {
      val t = DeltaTable.forPath(spark, dir) // independent handle per racer
      t.update(Map("v" -> concat(col("v"), lit("+"))),
        appTxn = Some(("r15race", 9L)))
    }
    val results = Await.result(
      Future.sequence(Seq(Future(replay()), Future(replay()))), Duration.Inf)

    // whichever interleaving happened (pre-check skip, commit-loop skip, or
    // serial), the table must reflect EXACTLY ONE application
    val vs = DeltaTable.forPath(spark, dir).toDF
      .select("v").distinct().as[String].collect().toSeq
    assert(vs == Seq("v+"), s"expected single application, got values $vs")
    assert(DeltaTable.forPath(spark, dir).txnVersion("r15race").contains(9L))
    val applied = results.count(_.get("replay_skipped").isEmpty)
    assert(applied == 1, s"exactly one racer must report having applied: $results")
  }

  test("two racing DELETE replays resolve to one application and one skip") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (1L to 50L).map(i => (i, "v")).toDF("id", "v"), dir)

    def replay(): Map[String, String] =
      DeltaTable.forPath(spark, dir)
        .delete(Some("id <= 10"), appTxn = Some(("r15dr", 4L)))
    val results = Await.result(
      Future.sequence(Seq(Future(replay()), Future(replay()))), Duration.Inf)

    assert(DeltaTable.forPath(spark, dir).toDF.count() == 40)
    assert(DeltaTable.forPath(spark, dir).txnVersion("r15dr").contains(4L))
    val applied = results.count(_.get("replay_skipped").isEmpty)
    assert(applied == 1, s"exactly one racer must report having applied: $results")
  }

  test("a winner landing between planning refresh and the transaction is " +
      "conflict-checked: shared-handle replay cannot double-apply") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    try {
      graft.ops.UpdateOp.testHookBeforeTxn = () => {
        graft.ops.UpdateOp.testHookBeforeTxn = () => () // fire once
        // a racing replay wins via its own handle, then the SHARED handle's
        // cache advances (what a concurrent commitAndRefresh does) — before
        // the pinning fix, startTransaction() folded the winner into the
        // base and the update applied a second time
        val t2 = DeltaTable.forPath(spark, dir)
        val txn2 = t2.startTransaction()
        txn2.commit(Seq(graft.kernel.SetTransaction("r15toctou", 7L, None)),
          graft.kernel.Operation("UPDATE", Map.empty))
        t.refresh()
      }
      val res = t.update(Map("v" -> concat(col("v"), lit("+"))),
        appTxn = Some(("r15toctou", 7L)))
      assert(res.get("replay_skipped").contains("true"),
        s"the update must skip, not double-apply: $res")
      assert(t.toDF.select("v").as[String].collect().toSeq == Seq("a"))
      assert(t.txnVersion("r15toctou").contains(7L))
    } finally {
      graft.ops.UpdateOp.testHookBeforeTxn = () => ()
    }
  }

  test("DML without appTxn records no transaction position") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.update(Map("v" -> lit("b")))
    t.delete(Some("id = 999"))
    assert(t.snapshot.txns.isEmpty)
  }
}
