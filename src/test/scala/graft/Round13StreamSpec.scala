package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.LogStore
import graft.streaming.{GraftDeltaSource, GraftSourceOffset}
import graft.table.DeltaTable

/** Round-13 streaming-source review regressions: the AvailableNow walk must
  * not parse past its own cap, an exactly-exhausted file budget must not
  * step into (and guard) the next commit, and a checkpoint restart across a
  * layout change must refuse to serve pre-change commits through the new
  * layout (silent-null partition values) while still allowing the designed
  * additive-evolution recovery. */
class Round13StreamSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-round13-stream")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def tmpDir(): String = Files.createTempDirectory("graft_r13s_").toString

  private def ints(dir: String, values: Int*): Unit = {
    import spark.implicits._
    DeltaTable.write(spark, values.map(i => (i, i % 3)).toDF("n", "p"),
      dir, partitionBy = Seq("p"))
  }

  private def appendInts(dir: String, values: Int*): Unit = {
    import spark.implicits._
    DeltaTable.write(spark, values.map(i => (i, i % 3)).toDF("n", "p"),
      dir, mode = "append")
  }

  /** Source metadata dir inside a checkpoint layout (sources/0 + offsets). */
  private def metaDir(restart: Boolean): String = {
    val ckpt = java.nio.file.Paths.get(tmpDir())
    val meta = ckpt.resolve("sources").resolve("0")
    Files.createDirectories(meta)
    Files.createDirectories(ckpt.resolve("offsets"))
    if (restart)
      Files.write(ckpt.resolve("offsets").resolve("0"), "v1".getBytes)
    meta.toString
  }

  test("AvailableNow: a post-cap change commit must not fail the capped run") {
    val dir = tmpDir()
    ints(dir, 1, 2, 3) // v0 — the source's initial snapshot
    val src = new GraftDeltaSource(spark, dir, Map.empty,
      metadataPath = Some(metaDir(restart = false)))
    src.prepareForTriggerAvailableNow()
    // cap pins at "everything available at query start" = the v0 snapshot
    val o1 = GraftSourceOffset.from(
      src.latestOffset(null, ReadLimit.allAvailable()))
    assert(o1.version == 0L && o1.isInitialSnapshot, o1)
    // a concurrent UPDATE lands AFTER the cap (data-changing removes at v1)
    DeltaTable.forPath(spark, dir)
      .update(Map("n" -> org.apache.spark.sql.functions.expr("n + 100")),
        Some("n = 1"))
    // the capped run's remaining triggers must stay inside the cap: walking
    // into v1 would throw the change-commit error for data this run never
    // serves (the NEXT run is the one that should fail)
    val o2 = GraftSourceOffset.from(
      src.latestOffset(src.deserializeOffset(o1.json), ReadLimit.allAvailable()))
    assert(o2 == o1, s"capped run walked past its cap: $o2 vs $o1")
  }

  test("file budget exhausted exactly at a version boundary must not parse " +
      "the next (change) commit before the budgeted batch runs") {
    val dir = tmpDir()
    ints(dir, 1, 2, 3, 4, 5, 6) // v0: 6 rows
    val nFiles = DeltaTable.forPath(spark, dir).snapshot.numFiles.toInt
    val src = new GraftDeltaSource(spark, dir, Map.empty,
      metadataPath = Some(metaDir(restart = false)))
    DeltaTable.forPath(spark, dir)
      .update(Map("n" -> org.apache.spark.sql.functions.expr("n + 100")),
        Some("n = 1")) // v1: change commit (rewrites), after source pinned
    // budget == exactly the initial snapshot's file count: the offset must
    // stop at the boundary instead of stepping into v1 and throwing the
    // change-commit error before this batch's data was ever served
    val o = GraftSourceOffset.from(
      src.latestOffset(null, ReadLimit.maxFiles(nFiles)))
    assert(o == GraftSourceOffset(0, nFiles.toLong, isInitialSnapshot = true), o)
    // count the batch outside a streaming query (Spark's own source tests
    // use the same escape hatch)
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try assert(src.getBatch(None, o).count() == 6)
    finally spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
    // the change commit still fails the stream at the NEXT trigger
    val e = intercept[IllegalStateException] {
      src.latestOffset(src.deserializeOffset(o.json), ReadLimit.maxFiles(3))
    }
    assert(e.getMessage.contains("data-changing removes"), e.getMessage)

    // same boundary rule for the BYTE budget: a budget equal to the
    // initial snapshot's total bytes must stop at the boundary instead of
    // stepping into (and guarding) the change commit that lands after
    val totalBytes = DeltaTable.forPath(spark, dir) // post-update v1 files
      .snapshot.allFiles.map(_.size).sum
    val src2 = new GraftDeltaSource(spark, dir, Map.empty,
      metadataPath = Some(metaDir(restart = false))) // init = v1 snapshot
    DeltaTable.forPath(spark, dir)
      .update(Map("n" -> org.apache.spark.sql.functions.expr("n + 1000")),
        Some("n = 2")) // v2: change commit, after src2 pinned
    val o2 = GraftSourceOffset.from(
      src2.latestOffset(null, ReadLimit.maxBytes(totalBytes)))
    assert(o2.isInitialSnapshot && o2.version == 1L, o2)
  }

  test("restart across a re-partitioning refuses pre-change commits " +
      "(silent-null partition values) — additive evolution still serves") {
    import spark.implicits._
    // incompatible: a FOREIGN writer re-partitions the table at v2 (this
    // engine's own writer refuses partitioning changes, so synthesize the
    // metadata-only commit the way delta-spark's overwrite would write it)
    val dir = tmpDir()
    ints(dir, 1, 2, 3)        // v0 partitioned by p
    appendInts(dir, 4, 5, 6)  // v1: old-layout files, NO Metadata action
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    val v0txt = new String(
      Files.readAllBytes(logDir.resolve(LogStore.commitFileName(0))), "UTF-8")
    val metaLine = v0txt.linesIterator.find(_.contains("\"metaData\""))
      .getOrElse(fail("no metaData line in v0"))
    val repartitioned =
      metaLine.replace("\"partitionColumns\":[\"p\"]", "\"partitionColumns\":[]")
    assert(repartitioned != metaLine, s"unexpected metaData shape: $metaLine")
    Files.write(logDir.resolve(LogStore.commitFileName(2)),
      ("{\"commitInfo\":{\"operation\":\"WRITE\",\"timestamp\":1700000000000}}\n" +
        repartitioned).getBytes("UTF-8"))
    val src = new GraftDeltaSource(spark, dir,
      Map("startingVersion" -> "1"),
      metadataPath = Some(metaDir(restart = true)))
    // commit v1 carries no Metadata, so the per-commit guard is blind to
    // it and v2's Metadata EQUALS the restarted initSnapshot — only the
    // layout-at-offset check can catch the old files
    val e = intercept[IllegalStateException] {
      src.getBatch(None, GraftSourceOffset(1, 99, isInitialSnapshot = false))
    }
    assert(e.getMessage.contains("incompatible layout"), e.getMessage)

    // additive: a mergeSchema append at v2 is the DESIGNED restart
    // recovery — old commits serve under the wider schema, new column null
    val dir2 = tmpDir()
    ints(dir2, 1, 2, 3)       // v0
    appendInts(dir2, 4, 5, 6) // v1
    DeltaTable.write(spark, Seq((7, 1, "q7")).toDF("n", "p", "q"), dir2,
      mode = "append", partitionBy = Seq("p"), mergeSchema = true) // v2
    val src2 = new GraftDeltaSource(spark, dir2,
      Map("startingVersion" -> "1"),
      metadataPath = Some(metaDir(restart = true)))
    // exact unit count (v2 = one add): an over-large sentinel index now
    // trips the r16 option-drift guard by design
    val served = src2.getBatch(None,
      GraftSourceOffset(2, 1, isInitialSnapshot = false))
    assert(served.columns.toSeq == Seq("n", "p", "q"), served.columns.toSeq)
    spark.conf.set("spark.sql.streaming.unsupportedOperationCheck", "false")
    try {
      // v1's 3 rows (q null) + v2's 1 row
      assert(served.count() == 4)
      assert(served.filter("q is null").count() == 3)
    } finally spark.conf.unset("spark.sql.streaming.unsupportedOperationCheck")
  }
}
