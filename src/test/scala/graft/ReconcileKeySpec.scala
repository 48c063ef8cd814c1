package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Checkpoints
import graft.table.DeltaTable

/**
 * Write-side regression coverage for (path, dvUniqueId)-keyed log replay
 * (PROTOCOL.md Action Reconciliation; read-side proven against the
 * delta-rs-written `table_with_deletion_logs` fixture in GoldenTableSpec).
 *
 * Two successive DV writes against the same data file leave, at HEAD: one
 * live add (path, dv2) and a tombstone (path, dv1). Path-keyed replay had
 * two corruptions here: (a) encountering the tombstone after the add (any
 * checkpoint row order) dropped the live file entirely; (b) the same-path
 * re-add cleared the dv1 tombstone from state, leaving the superseded DV
 * blob unprotected from VACUUM inside the retention window.
 */
class ReconcileKeySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-reconcile")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dvTable(): (DeltaTable, String) = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_reconcile_").toString + "/t"
    DeltaTable.write(spark,
      (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dir, configuration = Map("delta.enableDeletionVectors" -> "true"))
    (DeltaTable.forPath(spark, dir), dir)
  }

  test("two DV states of one path: live add survives, old tombstone retained") {
    val (t0, dir) = dvTable()
    t0.delete(Some("id < 3"))   // dv1 on the single data file
    t0.delete(Some("id >= 97")) // dv2 replaces dv1 (same path, remove+add)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 94)
    assert(t.snapshot.numFiles == 1)
    val live = t.snapshot.allFiles.head
    assert(live.deletionVector.exists(_.cardinality == 6))
    // the dv1 state's tombstone must survive the same-path re-add
    val sameTombs = t.snapshot.tombstones.filter(_.path == live.path)
    assert(sameTombs.nonEmpty, "same-path tombstone dropped by re-add")
    assert(sameTombs.exists(_.deletionVector.exists(_.cardinality == 3)),
      s"dv1 tombstone lost: ${t.snapshot.tombstones.map(_.deletionVector)}")
  }

  test("checkpoint with same-path tombstones round-trips through our writer") {
    val (t0, dir) = dvTable()
    t0.delete(Some("id < 3"))
    t0.delete(Some("id >= 97"))
    val t1 = DeltaTable.forPath(spark, dir)
    Checkpoints.write(spark, t1.deltaLog.logPath, t1.snapshot, t1.deltaLog.store)
    // append once more so replay = checkpoint + tail
    import spark.implicits._
    DeltaTable.write(spark, Seq((1000L, "x")).toDF("id", "v"), dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 95,
      "checkpoint same-path tombstone cancelled the live DV add on replay")
    assert(t.snapshot.numFiles == 2)
    assert(t.snapshot.tombstones.exists(r =>
      r.deletionVector.exists(_.cardinality == 3)), "dv1 tombstone lost in checkpoint")
  }

  test("log compaction preserves both DV states of one path") {
    val (t0, dir) = dvTable()
    t0.delete(Some("id < 3"))   // v1: dv1 on the file
    t0.delete(Some("id >= 97")) // v2: remove(P, dv1) + add(P, dv2)
    val t1 = DeltaTable.forPath(spark, dir)
    t1.compactLogs(1, 2)
    // replay must survive on the compaction file alone: path-keyed
    // compaction erased the dv1 tombstone, so a checkpoint-substituted
    // replay could keep BOTH DV states live (deleted rows resurface)
    val log = t1.deltaLog
    (1L to 2L).foreach(v => log.store.delete(
      new org.apache.hadoop.fs.Path(log.logPath, graft.kernel.LogStore.commitFileName(v))))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.snapshot.numFiles == 1,
      s"compaction kept ${t.snapshot.numFiles} file states for one path")
    assert(t.toDF.count() == 94)
    assert(t.snapshot.tombstones.exists(_.deletionVector.exists(_.cardinality == 3)),
      "dv1 tombstone lost through compaction")
  }

  test("parquet stats omitted for oversized values cannot mis-prune") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bigstats_").toString + "/t"
    val big = "Z" * 5000 + "_tail" // beyond parquet-mr's 4KB stats cap
    DeltaTable.write(spark,
      Seq((1L, "short"), (2L, big)).toDF("id", "v").coalesce(1), dir)
    val t = DeltaTable.forPath(spark, dir)
    // whether the writer truncated or omitted the min/max, an equality
    // lookup for the oversized value must return its row — bounds derived
    // only from the covered values would prune it away
    assert(t.scanWhere(s"id = 2").count() == 1)
    val hit = t.toDF.filter($"v" === big).count()
    assert(hit == 1, "oversized-value row lost (stats-based mis-prune)")
  }

  test("VACUUM inside retention keeps the superseded DV blob decodable") {
    val (t0, dir) = dvTable()
    t0.delete(Some("id < 3"))
    val v1 = DeltaTable.forPath(spark, dir).version
    t0.delete(Some("id >= 97"))
    val t = DeltaTable.forPath(spark, dir)
    // dry-run with retention honored: nothing inside the window may be listed
    val wouldDelete = t.vacuum(retentionHours = 24 * 7, dryRun = true,
      enforceRetention = false)
    assert(wouldDelete.isEmpty,
      s"VACUUM would delete inside retention: $wouldDelete")
    // time travel to the dv1 version still decodes the old mask
    assert(t.asOfVersion(v1).count() == 97)
  }
}
