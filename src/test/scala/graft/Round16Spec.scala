package graft

import java.nio.file.Files

import scala.concurrent.{Await, Future}
import scala.concurrent.duration.Duration
import scala.concurrent.ExecutionContext.Implicits.global

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** Round-16 coverage for the r15 verdict queue: run-level idempotent
  * replay threaded through the WRITE path (append/overwrite/replaceWhere/
  * create and the format("graft-delta") writer surface — r15 wired
  * DELETE/UPDATE, r14 MERGE/sink/blind-append; the reference applies
  * CommitProperties app_transactions to every operation,
  * kernel/transaction/mod.rs:1-117). */
class Round16Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r16")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r16_").toString + "/t"

  // ------------------------------------------------------ WRITE appTxn

  test("append with an already-applied (appId, version) no-ops; higher " +
      "versions apply; at-or-below skips") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (1L to 10L).map(i => (i, "v")).toDF("id", "v"), dir)
    def append(ver: Long, ids: Range): DeltaTable =
      DeltaTable.write(spark,
        ids.map(i => (i.toLong, "a")).toDF("id", "v"), dir,
        mode = "append", appTxn = Some(("r16a", ver)))

    append(1L, 11 to 15)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 15)
    append(1L, 16 to 20) // replay (different payload: double-apply visible)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 15,
      "replayed append must not write")
    append(2L, 16 to 20)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 20)
    append(1L, 21 to 30) // below the recorded position
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 20)
    assert(DeltaTable.forPath(spark, dir).txnVersion("r16a").contains(2L))
  }

  test("overwrite and replaceWhere honor the marker") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1L to 10L).map(i => (i, i % 2)).toDF("id", "k"), dir)
    DeltaTable.write(spark, Seq((100L, 0L)).toDF("id", "k"), dir,
      mode = "overwrite", appTxn = Some(("r16o", 1L)))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
    // replayed overwrite with a larger payload: must not replace again
    DeltaTable.write(spark,
      (200L to 205L).map(i => (i, 0L)).toDF("id", "k"), dir,
      mode = "overwrite", appTxn = Some(("r16o", 1L)))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)

    DeltaTable.write(spark, Seq((300L, 0L)).toDF("id", "k"), dir,
      mode = "overwrite", replaceWhere = Some("k = 0"),
      appTxn = Some(("r16o", 2L)))
    val afterRw = DeltaTable.forPath(spark, dir).toDF
    assert(afterRw.count() == 1 &&
      afterRw.select("id").as[Long].collect().toSeq == Seq(300L))
    DeltaTable.write(spark, Seq((400L, 0L)).toDF("id", "k"), dir,
      mode = "overwrite", replaceWhere = Some("k = 0"),
      appTxn = Some(("r16o", 2L))) // replay
    assert(DeltaTable.forPath(spark, dir).toDF
      .select("id").as[Long].collect().toSeq == Seq(300L))
    assert(DeltaTable.forPath(spark, dir).txnVersion("r16o").contains(2L))
  }

  test("replayed create under mode=error skips as already-applied instead " +
      "of failing on its own first run's table") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "x")).toDF("id", "v"), dir,
      mode = "error", appTxn = Some(("r16c", 1L)))
    // same marker, mode=error, table now exists: must return, not throw
    val t = DeltaTable.write(spark, Seq((2L, "y")).toDF("id", "v"), dir,
      mode = "error", appTxn = Some(("r16c", 1L)))
    assert(t.toDF.count() == 1)
    // WITHOUT a marker the mode=error contract is unchanged
    intercept[IllegalArgumentException] {
      DeltaTable.write(spark, Seq((3L, "z")).toDF("id", "v"), dir, mode = "error")
    }
  }

  test("two racing append replays of one (appId, version) apply exactly once") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (1L to 50L).map(i => (i, "v")).toDF("id", "v"), dir)

    def replay(): DeltaTable =
      DeltaTable.write(spark,
        (51L to 60L).map(i => (i, "r")).toDF("id", "v"), dir,
        mode = "append", appTxn = Some(("r16race", 7L)))
    Await.result(
      Future.sequence(Seq(Future(replay()), Future(replay()))), Duration.Inf)

    // whichever interleaving happened (pre-check skip, commit-loop skip,
    // or serial), the table must reflect EXACTLY ONE application
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 60,
      "exactly one racing append may land")
    assert(DeltaTable.forPath(spark, dir).txnVersion("r16race").contains(7L))
  }

  test("two racing creates with one marker resolve to a single version-0 " +
      "commit") {
    import spark.implicits._
    val dir = tmpDir()
    def replay(): DeltaTable =
      DeltaTable.write(spark, (1L to 5L).map(i => (i, "c")).toDF("id", "v"),
        dir, mode = "error", appTxn = Some(("r16cc", 1L)))
    Await.result(
      Future.sequence(Seq(Future(replay()), Future(replay()))), Duration.Inf)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 0L, "the losing create must not commit a second version")
    assert(t.toDF.count() == 5)
    assert(t.txnVersion("r16cc").contains(1L))
  }

  // ------------------------------------------- review-pass regressions

  test("a data column named _metadata does not shadow file identity: " +
      "partitioned reads and DV-masked DML still bind the file-source " +
      "metadata struct") {
    import spark.implicits._
    val dir = tmpDir()
    // protocol-legal foreign shape: top-level data column literally named
    // _metadata — Spark hides the file-source struct behind it for plain
    // col() references
    DeltaTable.write(spark,
      (1L to 20L).map(i => (i, s"m$i", (i % 2).toString)).toDF("id", "_metadata", "k"),
      dir, partitionBy = Seq("k"))
    val t = DeltaTable.forPath(spark, dir)
    // partition reconstruction routes through _metadata.file_path
    assert(t.toDF.filter(col("k") === "1").count() == 10)
    // the USER column still reads as data
    assert(t.toDF.filter(col("_metadata") === "m3").count() == 1)
    // identity scan (DV delete) routes __file/__pos through the same struct
    val m = t.delete(Some("id <= 5"))
    assert(m("num_deleted_rows").toLong == 5)
    assert(t.toDF.count() == 15)
    assert(t.toDF.select(max(col("_metadata"))).as[String].head() == "m9")
  }

  test("targetFileSize resplit re-reads its staged file glob-escaped " +
      "(table path containing glob metacharacters)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_r16_glob_")
    val dir = base.toString + "/run[1]/t"
    // incompressible pad (per-row pseudo-random): a constant pad
    // dictionary-encodes below the resplit threshold and never exercises
    // the re-read under test
    val wide = (1L to 20000L).map(i => (i,
      java.util.UUID.nameUUIDFromBytes(BigInt(i).toByteArray).toString))
      .toDF("id", "pad")
    DeltaTable.write(spark, wide.coalesce(1), dir,
      configuration = Map("delta.targetFileSize" -> "65536"))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 20000)
    assert(t.snapshot.allFiles.size > 1,
      s"expected the oversized staged file to resplit, got " +
        s"${t.snapshot.allFiles.size} file(s)")
  }

  test("writer-surface txnAppId/txnVersion options replay-skip; one " +
      "without the other is rejected") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "v")).toDF("id", "v"), dir)
    def viaWriter(ver: String, n: Int): Unit =
      (100L until 100L + n).map(i => (i, "w")).toDF("id", "v").write
        .format("graft-delta").mode("append")
        .option("txnAppId", "r16opt").option("txnVersion", ver).save(dir)
    viaWriter("5", 3)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)
    viaWriter("5", 10) // replay
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 4)

    val e = intercept[Exception] {
      Seq((9L, "x")).toDF("id", "v").write.format("graft-delta")
        .mode("append").option("txnAppId", "lonely").save(dir)
    }
    assert(e.getMessage.contains("txnAppId and txnVersion"))
    val e2 = intercept[Exception] {
      Seq((9L, "x")).toDF("id", "v").write.format("graft-delta")
        .mode("append").option("txnVersion", "notanumber")
        .option("txnAppId", "a").save(dir)
    }
    assert(e2.getMessage.contains("txnVersion"))
  }

  // r16 optimization regression: the merge's dedicated join-materialization
  // count() was dropped (the first consumer materializes the persist), so
  // the two shapes where that first consumer CANNOT surface the metric
  // observations must still produce correct metrics:
  //  - candidates pruned to ZERO (early filter; the bookkeeping query
  //    collapses to an empty relation, eliding CollectMetrics),
  //  - insert-only merges (first action is a DataFrameWriter command,
  //    whose QueryExecution does not surface cached-fragment metrics).
  test("merge metrics survive empty-candidate pruning and insert-only shapes") {
    import spark.implicits._
    val dir = Files.createTempDirectory("r16_obs").toString + "/t"
    DeltaTable.write(spark, (1L to 100L).toDF("id").withColumn("v", col("id") * 2), dir)

    // every source key outside the target range: stats prune ALL files
    val offRange = (1001L to 1010L).toDF("id").withColumn("v", col("id"))
    val m1 = DeltaTable.forPath(spark, dir)
      .merge(offRange, "target.id = source.id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(graft.ops.MergeOp.lastCandidateFiles == 0,
      s"precondition: early filter should prune every file, got ${graft.ops.MergeOp.lastCandidateFiles}")
    assert(m1("num_source_rows") == "10" && m1("num_target_rows_inserted") == "10" &&
      m1("num_target_rows_updated") == "0", s"bad metrics: $m1")

    // insert-only merge with matches present: dedup-append pattern
    val m2 = DeltaTable.forPath(spark, dir)
      .merge((95L to 120L).toDF("id").withColumn("v", col("id")),
        "target.id = source.id")
      .whenNotMatchedInsertAll().execute()
    assert(m2("num_source_rows") == "26" && m2("num_target_rows_inserted") == "20",
      s"bad metrics: $m2")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 130)
  }
}
