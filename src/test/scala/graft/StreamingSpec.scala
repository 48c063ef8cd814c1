package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
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

  test("watermarked windowed aggregation streaming into a Delta sink") {
    import spark.implicits._
    val dir = tmpDir()
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(java.sql.Timestamp, String, Double)]
    val agg = input.toDF().toDF("ts", "kind", "value")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "5 minutes"), col("kind"))
      .agg(count(lit(1)).as("n"), sum("value").as("total"))
      .select(col("window.start").as("win_start"), col("kind"), col("n"), col("total"))
    val q = agg.writeStream
      .outputMode("update")
      .foreachBatch(graft.streaming.DeltaStreaming.sinkCreating(dir, "win-app"))
      .start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      input.addData((ts(1), "a", 1.0), (ts(2), "a", 2.0), (ts(7), "b", 5.0))
      q.processAllAvailable()
    } finally q.stop()
    val out = DeltaTable.forPath(spark, dir).toDF
    val a = out.filter("kind = 'a'").select("n", "total").as[(Long, Double)].collect()
    assert(a.toSeq == Seq((2L, 3.0)))
    assert(out.filter("kind = 'b'").count() == 1)
  }

  test("stateful stream (flatMapGroupsWithState) into a Delta sink") {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val dir = tmpDir()
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, Int)]
    // running per-key max, emitted on every update
    val stateful = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Int, (String, Int)](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, rows: Iterator[(String, Int)], state: GroupState[Int]) =>
          val prev = state.getOption.getOrElse(Int.MinValue)
          val mx = math.max(prev, rows.map(_._2).max)
          state.update(mx)
          Iterator((key, mx))
      }.toDF("k", "running_max")
    val q = stateful.writeStream
      .outputMode("update")
      .foreachBatch(graft.streaming.DeltaStreaming.sinkCreating(dir, "state-app"))
      .start()
    try {
      input.addData(("x", 3), ("x", 9), ("y", 1))
      q.processAllAvailable()
      input.addData(("x", 5), ("y", 7))
      q.processAllAvailable()
    } finally q.stop()
    val out = DeltaTable.forPath(spark, dir).toDF
      .groupBy("k").agg(max("running_max").as("m"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 9L, "y" -> 7L))
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

  test("mergeSink: replayed batches are skipped (exactly-once upserts)") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a"), (2, "b")).toDF("id", "v"), dir)
    val sink = DeltaStreaming.mergeSink(dir, "cdc-app") { (t, batch) =>
      t.merge(batch, "target.id = source.id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll()
    }
    sink(Seq((2, "b2"), (3, "c")).toDF("id", "v"), 0L)
    val afterFirst = DeltaTable.forPath(spark, dir).toDF
      .as[(Int, String)].collect().toMap
    assert(afterFirst == Map(1 -> "a", 2 -> "b2", 3 -> "c"))
    // replay of batch 0 with DIFFERENT content must be ignored
    sink(Seq((3, "WRONG")).toDF("id", "v"), 0L)
    assert(DeltaTable.forPath(spark, dir).toDF.as[(Int, String)].collect().toMap ==
      Map(1 -> "a", 2 -> "b2", 3 -> "c"))
    // next batch applies
    sink(Seq((3, "c2")).toDF("id", "v"), 1L)
    assert(DeltaTable.forPath(spark, dir).toDF.as[(Int, String)].collect().toMap ==
      Map(1 -> "a", 2 -> "b2", 3 -> "c2"))
  }

  test("changesSince rate limit bounds backlog catch-up") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((0, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    (1 to 5).foreach(i =>
      DeltaTable.write(spark, Seq((i, "b")).toDF("id", "v"), dir, mode = "append"))
    // 5-version backlog drains in capped batches of 2
    var cursor = 0L
    var batches = 0
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    var more = true
    while (more) DeltaStreaming.changesSince(spark, dir, cursor,
        maxVersionsPerBatch = Some(2)) match {
      case Some((df, end)) =>
        assert(end - cursor <= 2, s"batch spanned ${end - cursor} versions")
        seen ++= df.select("id").as[Int].collect()
        cursor = end; batches += 1
      case None => more = false
    }
    assert(batches == 3) // 2 + 2 + 1
    assert(seen.sorted.toSeq == (1 to 5))
  }

  test("foreachBatch CDC apply: one-file batches reach the same final state") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base (seq 0) then two change commits (seq 1, 2) touching the same key:
    // with maxFilesPerTrigger=1 every commit lands in its own microbatch, so
    // the merge applies them sequentially; latest-per-key (max_by on seq)
    // must make the final state identical to applying them all at once.
    // startingVersion=0 tails commits in LOG order — the initial-snapshot
    // path serves files in path order (random part UUIDs), which would
    // apply the seq=2 change before seq=1 on ~half the runs
    val src = tmpDir() + "/src"
    val tgt = tmpDir() + "/tgt"
    val base = Seq((1L, 10.0, 0L), (2L, 20.0, 0L), (3L, 30.0, 0L))
      .toDF("k", "v", "seq")
    DeltaTable.write(spark, base.repartition(1), src)
    DeltaTable.write(spark, Seq((2L, 21.0, 1L), (4L, 40.0, 1L))
      .toDF("k", "v", "seq").repartition(1), src, mode = "append")
    DeltaTable.write(spark, Seq((2L, 22.0, 2L)).toDF("k", "v", "seq")
      .repartition(1), src, mode = "append")
    DeltaTable.write(spark, base, tgt)
    val q = spark.readStream.format("graft-delta")
      .option("startingVersion", "0")
      .option("maxFilesPerTrigger", "1").load(src)
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val cols = batch.columns.toSeq
          val latest = batch.groupBy("k")
            .agg(max_by(struct(cols.map(col): _*), col("seq")).as("__r"))
            .select(cols.map(c => col("__r")(c).as(c)): _*)
          DeltaTable.forPath(spark, tgt).merge(latest, "target.k = source.k")
            .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
          ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    val fin = DeltaTable.forPath(spark, tgt).toDF
      .select("k", "v").as[(Long, Double)].collect().toMap
    assert(fin == Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0, 4L -> 40.0), fin)
  }

  test("merge withStreaming scans the source exactly once") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1 to 100).map(i => (i.toLong, i)).toDF("k", "v"), dir)

    def mkSource(acc: org.apache.spark.util.LongAccumulator) =
      spark.range(1, 51).repartition(1)
        .mapPartitions { it => acc.add(1); it }
        .toDF("k").withColumn("v", lit(-1))

    // normal mode: the early filter pre-scans the source (agg) → 2 passes
    val accNormal = spark.sparkContext.longAccumulator("src_scans_normal")
    DeltaTable.forPath(spark, dir)
      .merge(mkSource(accNormal), "target.k = source.k")
      .whenMatchedUpdateAll().execute()
    assert(accNormal.value >= 2, s"expected pre-scan + join, saw ${accNormal.value}")

    // streaming mode: single pass (with_streaming, merge/mod.rs:465)
    val accStream = spark.sparkContext.longAccumulator("src_scans_stream")
    val m = DeltaTable.forPath(spark, dir)
      .merge(mkSource(accStream), "target.k = source.k")
      .whenMatchedUpdateAll().withStreaming().execute()
    assert(accStream.value == 1, s"expected exactly one source scan, saw ${accStream.value}")
    assert(m("num_target_rows_updated") == "50")
    assert(DeltaTable.forPath(spark, dir).toDF.where("v = -1").count() == 50)
  }

  test("transformWithState milestones: exactly one emission per crossing across batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Long]
      val view = s"tws_spec_${System.nanoTime()}"
      val q = input.toDS().groupByKey(identity)
        .transformWithState(new graft.streaming.MilestoneProcessor(3L),
          org.apache.spark.sql.streaming.TimeMode.None(),
          org.apache.spark.sql.streaming.OutputMode.Append())
        .toDF("key", "milestone")
        .writeStream.format("memory").outputMode("append").queryName(view).start()
      try {
        // key 7: 2 events, then 2 more (crosses 3), then 5 (crosses 6, hits 9)
        input.addData(7L, 7L); q.processAllAvailable()
        input.addData(7L, 7L); q.processAllAvailable()
        input.addData(7L, 7L, 7L, 7L, 7L); q.processAllAvailable()
        // key 8: exactly 3 in one batch → one milestone
        input.addData(8L, 8L, 8L); q.processAllAvailable()
      } finally q.stop()
      val rows = spark.table(view).as[(Long, Long)].collect().toSeq.sorted
      assert(rows == Seq((7L, 3L), (7L, 6L), (7L, 9L), (8L, 3L)), rows.toString)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
