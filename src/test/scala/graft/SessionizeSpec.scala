package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.Sessionize
import graft.table.DeltaTable

/** Gap sessionization: batch window semantics (boundaries, ties, ids) and
  * the streaming flatMapGroupsWithState path (mid-batch closure, event-time
  * timeout closure, cross-batch session continuation). */
class SessionizeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-sessionize")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def events(rows: (Long, String)*) = {
    import spark.implicits._
    rows.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
  }

  test("batch sessions: gap boundary is strict, ids number in time order") {
    val df = events(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:30:00"), // exactly 30 min later: SAME session
      (1L, "2024-01-01 11:00:01"), // 30 min + 1s: new session
      (2L, "2024-01-01 09:00:00"))
    val out = Sessionize.sessions(df, "user_id", "ts", Seq("event_id"), 30)
      .orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1(0).getLong(1) == 1L && u1(0).getLong(4) == 2L) // 2-event session
    assert(u1(0).getTimestamp(2) == ts("2024-01-01 10:00:00"))
    assert(u1(0).getTimestamp(3) == ts("2024-01-01 10:30:00"))
    assert(u1(1).getLong(1) == 2L && u1(1).getLong(4) == 1L)
    val u2 = out.filter(_.getLong(0) == 2L)
    assert(u2.length == 1 && u2(0).getLong(4) == 1L)
  }

  test("batch sessions: timestamp ties land in one session") {
    val df = events(
      (7L, "2024-01-01 10:00:00"),
      (7L, "2024-01-01 10:00:00"),
      (7L, "2024-01-01 10:00:00"))
    val out = Sessionize.sessions(df, "user_id", "ts", Seq("event_id"), 30).collect()
    assert(out.length == 1 && out(0).getLong(4) == 3L)
  }

  test("streaming sessions: mid-batch closure + timeout closure + continuation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_sess").toString + "/t"
    // batch 1: user 1 has two sessions IN the same batch (gap overshoot
    // closes the first mid-batch); user 2 has one open session
    DeltaTable.write(spark, events(
      (1L, "2024-01-01 10:00:00"),
      (1L, "2024-01-01 10:10:00"),
      (1L, "2024-01-01 12:00:00"), // > 30 min after 10:10 → closes session 1
      (2L, "2024-01-01 11:50:00")), dir)
    val view = s"sess_spec_${System.nanoTime()}"
    val q = Sessionize.sessionsStream(
        spark.readStream.format("graft-delta").load(dir), "user_id", "ts", 30)
      .toDF()
      .writeStream.format("memory").outputMode("append").queryName(view).start()
    try {
      q.processAllAvailable()
      val mid = spark.table(view).collect()
      // only the mid-batch closure emitted so far (timeouts need watermark)
      assert(mid.length == 1)
      assert(mid(0).getLong(0) == 1L && mid(0).getLong(3) == 2L)

      // batch 2: user 2's session CONTINUES (12:05 is within 30 min of
      // 11:50) — a correct implementation merges it into the open state
      DeltaTable.write(spark, events((2L, "2024-01-01 12:05:00")), dir,
        mode = "append")
      q.processAllAvailable()

      // sentinel batches advance the watermark → timeout-close everything
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
        DeltaTable.write(spark, events((-1L, t)), dir, mode = "append")
        q.processAllAvailable()
      }
      val fin = spark.table(view).filter("user_id >= 0")
        .orderBy("user_id", "session_start").collect()
      assert(fin.length == 3, fin.mkString(";"))
      val u1 = fin.filter(_.getLong(0) == 1L)
      assert(u1.map(_.getLong(3)).toSeq == Seq(2L, 1L))
      val u2 = fin.filter(_.getLong(0) == 2L)
      assert(u2.length == 1 && u2(0).getLong(3) == 2L) // merged across batches
      assert(u2(0).getTimestamp(1) == ts("2024-01-01 11:50:00"))
      assert(u2(0).getTimestamp(2) == ts("2024-01-01 12:05:00"))
    } finally q.stop()
  }

  test("streaming: late cross-batch events extend start down or form earlier sessions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_sess3").toString + "/t"
    DeltaTable.write(spark, events((1L, "2024-01-01 10:00:00")), dir)
    val view = s"sess_spec3_${System.nanoTime()}"
    // 1h out-of-orderness tolerance: late rows above the watermark are fed
    // to the state function and must behave like batch single-linkage
    val q = Sessionize.sessionsStream(
        spark.readStream.format("graft-delta").load(dir), "user_id", "ts", 30,
        watermarkDelay = "1 hour")
      .toDF()
      .writeStream.format("memory").outputMode("append").queryName(view).start()
    try {
      q.processAllAvailable() // watermark now 09:00
      // within gap of the open session's START: extends it downward
      DeltaTable.write(spark, events((1L, "2024-01-01 09:45:00")), dir,
        mode = "append")
      q.processAllAvailable()
      // more than a gap before the (extended) start: its own session
      DeltaTable.write(spark, events((1L, "2024-01-01 09:05:00")), dir,
        mode = "append")
      q.processAllAvailable()
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
        DeltaTable.write(spark, events((-1L, t)), dir, mode = "append")
        q.processAllAvailable()
      }
      val fin = spark.table(view).filter("user_id >= 0")
        .orderBy("session_start").collect()
      assert(fin.length == 2, fin.mkString(";"))
      assert(fin(0).getTimestamp(1) == ts("2024-01-01 09:05:00") &&
        fin(0).getLong(3) == 1L)
      assert(fin(1).getTimestamp(1) == ts("2024-01-01 09:45:00") &&
        fin(1).getTimestamp(2) == ts("2024-01-01 10:00:00") &&
        fin(1).getLong(3) == 2L)
    } finally q.stop()
  }

  test("streaming: fully-late rows are dropped by Spark, never kill the query") {
    // With watermarkDelay=0, batch 1's 12:00 event pushes the watermark to
    // 12:00. Batch 2 then delivers a different user at 10:00 — below the
    // watermark. Spark 4's FlatMapGroupsWithStateExec with EventTimeTimeout
    // FILTERS sub-watermark rows before the state function (verified here:
    // user 2 produces no session at all), so the state function only ever
    // sees events >= watermark and the open session's end can't fall more
    // than a gap behind it. The sub-watermark-timeout clamp in
    // sessionsStream is therefore defense-in-depth (a Spark semantics
    // change would otherwise turn into IllegalArgumentException from
    // setTimeoutTimestamp); this test pins today's drop semantics and
    // that the query keeps running either way.
    val dir = java.nio.file.Files.createTempDirectory("graft_sess4").toString + "/t"
    DeltaTable.write(spark, events((1L, "2024-01-01 12:00:00")), dir)
    val view = s"sess_spec4_${System.nanoTime()}"
    val q = Sessionize.sessionsStream(
        spark.readStream.format("graft-delta").load(dir), "user_id", "ts", 30)
      .toDF()
      .writeStream.format("memory").outputMode("append").queryName(view).start()
    try {
      q.processAllAvailable() // watermark now 12:00
      DeltaTable.write(spark, events((2L, "2024-01-01 10:00:00")), dir,
        mode = "append")
      q.processAllAvailable() // must not throw
      assert(spark.table(view).filter("user_id = 2").count() == 0)
      // user 1's session is still open (12:00 + gap is ahead of the
      // watermark); close it via sentinels and check it was kept intact
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
        DeltaTable.write(spark, events((-1L, t)), dir, mode = "append")
        q.processAllAvailable()
      }
      val fin = spark.table(view).filter("user_id >= 0").collect()
      assert(fin.length == 1 && fin(0).getLong(0) == 1L &&
        fin(0).getLong(3) == 1L, fin.mkString(";"))
    } finally q.stop()
  }

  test("streaming equals batch on a shuffled multi-user corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 400).map { i =>
      val u = (i % 7).toLong
      val t = new Timestamp(ts("2024-01-01 00:00:00").getTime +
        rnd.nextInt(6 * 3600) * 1000L)
      (u, t)
    }
    val df = rows.toDF("user_id", "ts")
      .withColumn("event_id", monotonically_increasing_id())
    val dir = java.nio.file.Files.createTempDirectory("graft_sess2").toString + "/t"
    DeltaTable.write(spark, df.repartition(3), dir)
    val view = s"sess_spec2_${System.nanoTime()}"
    val q = Sessionize.sessionsStream(
        spark.readStream.format("graft-delta").load(dir), "user_id", "ts", 10)
      .toDF()
      .writeStream.format("memory").outputMode("append").queryName(view).start()
    try {
      q.processAllAvailable()
      Seq("2031-01-01 00:00:00", "2031-01-02 00:00:00").foreach { t =>
        DeltaTable.write(spark, events((-1L, t)), dir, mode = "append")
        q.processAllAvailable()
      }
      val streamed = spark.table(view).filter("user_id >= 0")
        .select("user_id", "session_start", "session_end", "n_events")
      val batch = Sessionize.sessions(df, "user_id", "ts", Seq("event_id"), 10)
        .select("user_id", "session_start", "session_end", "n_events")
      assert(streamed.except(batch).count() == 0)
      assert(batch.except(streamed).count() == 0)
    } finally q.stop()
  }
}
