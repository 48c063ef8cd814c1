package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{GraftDeltaSource, GraftSourceOffset}
import graft.table.DeltaTable

/** Round-16 streaming-review regressions: backlog schema evolution,
  * CDF restart after disable, AvailableNow head-guard deferral, and
  * admission-option drift across restarts. */
class Round16StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r16stream")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r16s_").toString

  /** Materialize a source batch outside a streaming query (the
    * GraftSourceSpec escape hatch; Spark's own source tests use it). */
  private def materialized[T](body: => T): T = {
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try body
    finally spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }

  test("an intermediate ADDITIVE schema-change commit in the backlog is " +
      "served (older files read null for later columns) — only unknown " +
      "fields stay fatal") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), dir, mode = "append")
    // additive evolution #1 (Metadata commit in the backlog)
    DeltaTable.write(spark, Seq((3L, "c", 30L)).toDF("id", "v", "c1"), dir,
      mode = "append", mergeSchema = true)
    // additive evolution #2 — strict equality would wedge on #1 FOREVER
    // (restart re-reads the same old Metadata against the same newer schema)
    DeltaTable.write(spark, Seq((4L, "d", 40L, "x")).toDF("id", "v", "c1", "c2"),
      dir, mode = "append", mergeSchema = true)
    val src = new GraftDeltaSource(spark, dir, Map("startingVersion" -> "0"))
    val start = GraftSourceOffset(0, 0, isInitialSnapshot = false)
    val end = GraftSourceOffset.from(
      src.latestOffset(src.deserializeOffset(start.json), ReadLimit.allAvailable()))
    materialized {
      val rows = src.getBatch(Some(start), end)
      assert(rows.count() == 4)
      assert(rows.filter("id = 1").select("c1", "c2").collect()(0).isNullAt(0))
      assert(rows.filter("id = 4").select("c2").collect()(0).getString(0) == "x")
    }
  }

  test("a checkpointed CDF stream restarts to drain RECORDED changes " +
      "after delta.enableChangeDataFeed is unset; fresh streams still " +
      "refuse a disabled table") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    DeltaTable.write(spark, (1L to 4L).map(i => (i, "v")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.update(Map("v" -> org.apache.spark.sql.functions.lit("u")), Some("id <= 2")) // v1: recorded CDC
    t.setProperties(Map("delta.enableChangeDataFeed" -> "false")) // v2: disabled

    // restart shape: <ckpt>/sources/0 with a non-empty <ckpt>/offsets WAL
    val ckpt = tmpDir()
    val offsets = java.nio.file.Paths.get(ckpt, "offsets")
    Files.createDirectories(offsets)
    Files.write(offsets.resolve("0"), "{}".getBytes("UTF-8"))
    val restarted = new GraftDeltaSource(spark, dir,
      Map("readChangeFeed" -> "true", "startingVersion" -> "1"),
      metadataPath = Some(ckpt + "/sources/0"))
    val start = GraftSourceOffset(1, 0, isInitialSnapshot = false)
    val end = GraftSourceOffset.from(restarted.latestOffset(
      restarted.deserializeOffset(start.json), ReadLimit.allAvailable()))
    materialized {
      val changes = restarted.getBatch(Some(start), end)
      // the recorded v1 update feed drains: pre/post images for 2 rows
      assert(changes.filter("_change_type like '%update%'").count() == 4)
    }

    // a FRESH stream (empty WAL) still fails loudly on the disabled table
    val ckptFresh = tmpDir()
    val e = intercept[IllegalArgumentException] {
      new GraftDeltaSource(spark, dir, Map("readChangeFeed" -> "true"),
        metadataPath = Some(ckptFresh + "/sources/0"))
    }
    assert(e.getMessage.contains("enableChangeDataFeed"))
  }

  test("Trigger.AvailableNow with an un-admitted change commit at the log " +
      "head serves the clean backlog durably before failing loudly") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), dir, mode = "append")
    DeltaTable.write(spark, Seq((3L, "c")).toDF("id", "v"), dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    t.update(Map("v" -> org.apache.spark.sql.functions.lit("u")), Some("id = 1")) // change commit at head
    val view = "r16s_availnow"
    // startingVersion=0 tails the COMMIT WALK (a fresh initial-snapshot
    // stream would swallow the change commit into the snapshot): v0-v2 are
    // clean appends, v3 is the un-admitted change commit at the head
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "0").load(dir)
      .writeStream.format("memory").queryName(view)
      .option("checkpointLocation", tmpDir())
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[StreamingQueryException] { q.awaitTermination() }
    assert(e.getMessage.contains("data-changing removes") ||
      Option(e.getCause).exists(_.getMessage.contains("data-changing removes")))
    // the clean backlog (initial snapshot v0-v2) committed BEFORE the
    // failure — previously capAll failed the run at zero progress
    assert(spark.table(view).count() == 3,
      "the clean backlog must be durably served before the loud failure")
  }

  test("changing skipChangeCommits across a restart fails loudly instead " +
      "of silently dropping WAL-admitted rows") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    DeltaTable.write(spark, (1L to 4L).map(i => (i, "v")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.update(Map("v" -> org.apache.spark.sql.functions.lit("u")), Some("id <= 2")) // v1: change commit

    val srcA = new GraftDeltaSource(spark, dir,
      Map("ignoreChanges" -> "true", "startingVersion" -> "1"))
    val start = GraftSourceOffset(1, 0, isInitialSnapshot = false)
    val end = GraftSourceOffset.from(srcA.latestOffset(
      srcA.deserializeOffset(start.json), ReadLimit.allAvailable()))
    assert(end.index > 0, "ignoreChanges must admit the rewritten files")

    val srcB = new GraftDeltaSource(spark, dir,
      Map("skipChangeCommits" -> "true", "startingVersion" -> "1"))
    val e = intercept[IllegalStateException] {
      materialized(srcB.getBatch(Some(start), end).count())
    }
    assert(e.getMessage.contains("changed across a restart"), e.getMessage)
  }
}
