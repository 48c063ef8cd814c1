package graft

import java.nio.file.Files

import scala.util.Random

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/**
 * Randomized DML torture: a seeded random sequence of table operations is
 * applied both to a Delta table and to a trivial in-memory model
 * (Map[id -> value]); after every step the table contents must equal the
 * model exactly, and maintenance ops (optimize / checkpoint / compactLogs /
 * fsck / vacuum-dry-run) must never change visible contents. Runs in both
 * rewrite mode and DV mode. This is the generative complement to the
 * per-operator suites — it exercises op INTERLEAVINGS (delete-after-merge,
 * restore-then-append, optimize-mid-sequence) no hand-written test covers.
 */
class DmlTortureSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-torture")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(seed: Long, dvMode: Boolean, steps: Int): Unit = {
    import spark.implicits._
    val rnd = new Random(seed)
    val dir = Files.createTempDirectory(s"graft_torture_$seed").toString + "/t"
    val conf = if (dvMode) Map("delta.enableDeletionVectors" -> "true")
               else Map.empty[String, String]

    var model = (0L until 50L).map(i => i -> s"v$i").toMap
    DeltaTable.write(spark,
      model.toSeq.map { case (k, v) => (k, v) }.toDF("id", "v"),
      dir, configuration = conf)
    var nextId = 1000L
    // snapshots of the model at each committed version, for RESTORE
    val history = scala.collection.mutable.ArrayBuffer[Map[Long, String]](model)

    def table = DeltaTable.forPath(spark, dir)

    def checkStep(step: Int, op: String): Unit = {
      val got = table.toDF.as[(Long, String)].collect().toMap
      assert(got == model,
        s"seed=$seed dv=$dvMode step=$step op=$op: table ${got.size} rows != model ${model.size}; " +
          s"missing=${(model.keySet -- got.keySet).take(5)} extra=${(got.keySet -- model.keySet).take(5)}")
    }

    (1 to steps).foreach { step =>
      val t = table
      val op = rnd.nextInt(10)
      val opName = op match {
        case 0 | 1 => // append a small batch
          val ids = (0 until 1 + rnd.nextInt(8)).map(_ => { nextId += 1; nextId })
          DeltaTable.write(spark, ids.map(i => (i, s"n$i")).toDF("id", "v"),
            dir, mode = "append")
          model ++= ids.map(i => i -> s"n$i")
          history += model
          "append"
        case 2 => // delete by predicate
          val m = 2 + rnd.nextInt(5)
          t.delete(Some(s"id % $m = 0"))
          model = model.filter { case (k, _) => k % m != 0 }
          history += model
          "delete"
        case 3 => // update by predicate
          val m = 2 + rnd.nextInt(5)
          t.update(Map("v" -> concat(col("v"), lit("u"))), Some(s"id % $m = 1"))
          model = model.map { case (k, v) => k -> (if (k % m == 1) v + "u" else v) }
          history += model
          "update"
        case 4 => // merge upsert: touch a sample of existing + some new
          val existing = rnd.shuffle(model.keys.toSeq).take(math.min(5, model.size))
          val fresh = (0 until 3).map(_ => { nextId += 1; nextId })
          val src = (existing ++ fresh).map(i => (i, s"m$i")).toDF("id", "v")
          t.merge(src, "target.id = source.id")
            .whenMatchedUpdateAll()
            .whenNotMatchedInsertAll()
            .execute()
          model ++= (existing ++ fresh).map(i => i -> s"m$i")
          history += model
          "merge"
        case 5 => // delete everything matching nothing / something rare
          t.delete(Some(s"id > ${nextId + 100}")) // no-op delete
          history += model
          "noop-delete"
        case 6 => // restore to a random earlier version
          val v = rnd.nextInt(history.size)
          t.restore(v.toLong)
          model = history(v)
          history += model
          "restore"
        case 7 =>
          // alternate whole-commit and incremental-chunk compaction: the
          // chunked path commits several dataChange=false versions per op
          // (the history-alignment loops pad with the unchanged model) and
          // exercises assumeOwnCommits inside a randomized op sequence
          if (rnd.nextBoolean()) t.optimizeCompact(minCommitInterval = Some(0L))
          else t.optimizeCompact()
          history += model
          "optimize"
        case 8 =>
          if (rnd.nextBoolean()) {
            val snap = t.snapshot
            graft.kernel.Checkpoints.write(spark, t.deltaLog.logPath, snap, t.deltaLog.store)
          } else t.compactLogs(math.max(0, t.version - 3), t.version)
          history += history.last // no commit for checkpoint; compactLogs adds no version
          "checkpoint/compactLogs"
        case 9 =>
          t.vacuum(retentionHours = 0, dryRun = true, enforceRetention = false)
          t.fsck(dryRun = true)
          history += history.last
          "vacuum-dry/fsck-dry"
      }
      // history bookkeeping: ops that commit a version must keep
      // history(version) aligned — non-committing ops appended a duplicate,
      // drop it back to match the actual version count
      while (history.size > table.version + 1) history.remove(history.size - 1)
      while (history.size < table.version + 1) history += model
      checkStep(step, opName)
    }
  }

  test("randomized DML sequence matches the model (rewrite mode, seed 42)") {
    run(seed = 42L, dvMode = false, steps = 18)
  }

  test("randomized DML sequence matches the model (DV mode, seed 7)") {
    run(seed = 7L, dvMode = true, steps = 18)
  }

  test("randomized DML sequence matches the model (rewrite mode, seed 2026)") {
    run(seed = 2026L, dvMode = false, steps = 18)
  }
}
