package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.DeltaStreaming
import graft.table.{BlindDeltaTable, DeltaTable}

class StreamingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-stream")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_st_").toString

  test("blind append skips snapshot materialization and is idempotent") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir)
    val blind = BlindDeltaTable.forPath(spark, dir)
    assert(blind.append(Seq((2, "b")).toDF("id", "v"), Some("app"), Some(1L)).isDefined)
    // replayed batch: skipped
    assert(blind.append(Seq((2, "b")).toDF("id", "v"), Some("app"), Some(1L)).isEmpty)
    assert(blind.append(Seq((3, "c")).toDF("id", "v"), Some("app"), Some(2L)).isDefined)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.select("id").as[Int].collect().toSet == Set(1, 2, 3))
    assert(t.txnVersion("app").contains(2L))
  }

  test("structured streaming sink writes each microbatch exactly once") {
    import spark.implicits._
    val dir = tmpDir()
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Int]
    val q = input.toDF().toDF("n").writeStream
      .foreachBatch(DeltaStreaming.sinkCreating(dir, "stream-app"))
      .start()
    try {
      input.addData(1, 2, 3)
      q.processAllAvailable()
      input.addData(4, 5)
      q.processAllAvailable()
    } finally q.stop()
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.select("n").as[Int].collect().toSet == Set(1, 2, 3, 4, 5))
    // exactly-once despite a manual replay of batch 0
    DeltaStreaming.sink(dir, "stream-app")(Seq(1, 2, 3).toDF("n"), 0L)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 5)
  }

  test("changesSince yields only new CDF rows") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    assert(DeltaStreaming.changesSince(spark, dir, afterVersion = 0).isEmpty)
    DeltaTable.write(spark, Seq((2, "b")).toDF("id", "v"), dir, mode = "append")
    val Some((changes, v)) = DeltaStreaming.changesSince(spark, dir, afterVersion = 0)
    assert(v == 1)
    assert(changes.select("id").as[Int].collect().toSeq == Seq(2))
  }
}
