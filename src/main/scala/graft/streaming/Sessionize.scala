package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event for streaming sessionization (micros-precision timestamp). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)

/** Open-session state kept per user between microbatches (epoch micros). */
case class OpenSession(start: Long, end: Long, n: Long)

/** One assembled session. */
case class SessionOut(
    user_id: Long,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long)

/**
 * Gap-based sessionization — the standard event-pipeline operator the
 * reference engine has no counterpart for, in both batch and Structured
 * Streaming form.
 *
 * Batch ([[Sessionize.sessions]]): lag + running-sum windows partitioned by
 * the user key — ONE hash shuffle on the user; the session aggregation that
 * follows groups by (user, session) and reuses the same partitioning (a
 * hash distribution on a PREFIX of the grouping keys satisfies the
 * clustered distribution), so no second exchange at any scale.
 *
 * Streaming ([[Sessionize.sessionsStream]]): `flatMapGroupsWithState` with
 * an event-time timeout (§2.10 custom state) — sessions close either when a
 * later event for the same user arrives past the gap, or when the watermark
 * passes `session_end + gap` with no successor (timeout path). State per
 * user is ONE open session (three longs), so executor state size is bounded
 * by the number of live users, not by event volume.
 */
object Sessionize {

  /** Batch gap sessionization. Returns one row per session:
    * (userCol, session_id, session_start, session_end, n_events), where
    * session_id numbers a user's sessions from 1 in time order. `orderCols`
    * break timestamp ties deterministically (same-ts events always land in
    * the same session regardless, since their gap is zero). */
  def sessions(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      orderCols: Seq[String],
      gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, "sessions: gapMinutes must be positive")
    val gapMicros = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col(userCol))
      .orderBy((col(tsCol) +: orderCols.map(col)): _*)
    val prev = lag(col(tsCol), 1).over(w)
    // first event of a user: lag is NULL, comparison is NULL → not a new
    // session marker; the running sum then starts at 0 → +1 below
    val newSess =
      when(unix_micros(col(tsCol)) - unix_micros(prev) > gapMicros, 1L)
        .otherwise(0L)
    events
      .withColumn("__sess", sum(newSess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("__sess"))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(userCol), (col("__sess") + 1L).as("session_id"),
        col("session_start"), col("session_end"), col("n_events"))
  }

  /** Streaming gap sessionization over a streaming DataFrame carrying
    * (userCol: long-castable, tsCol: timestamp). Emits each closed session
    * exactly once (append semantics): mid-batch when a successor event
    * overshoots the gap, or via event-time timeout once the watermark
    * passes the open session's end + gap. `watermarkDelay` is the
    * out-of-orderness tolerated across batches. */
  def sessionsStream(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      gapMinutes: Int,
      watermarkDelay: String = "0 seconds"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    require(gapMinutes > 0, "sessionsStream: gapMinutes must be positive")
    val gapMicros = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60L * 1000L

    def toTs(micros: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(micros, 1000L))
      t.setNanos((Math.floorMod(micros, 1000000L) * 1000L).toInt)
      t
    }
    def micros(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

    // project/cast BEFORE withWatermark: a cast builds a fresh attribute
    // without the event-time tag, silently discarding a watermark declared
    // upstream of it. The null filter runs AFTER the casts: a lossy cast
    // (non-numeric user string, unparseable timestamp) produces NULL, and
    // filtering the original columns would let those rows through to kill
    // the query at the non-nullable encoder / micros() instead. try_cast,
    // not cast: under Spark 4's default ANSI mode a plain cast THROWS on
    // unparseable input before the filter ever runs. NULL keys
    // are dropped; batch sessions() keeps the NULL group — callers that
    // care must pre-map NULL to a sentinel key.
    val typed = events
      .select(col(userCol).try_cast("long").as("user_id"),
        col(tsCol).try_cast("timestamp").as("ts"))
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]

    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, evs: Iterator[SessionEvent], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed end + gap with no successor: close and emit
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, toTs(s.start), toTs(s.end), s.n))
          } else {
            // batch events may arrive unordered within the group; sessions
            // are order-sensitive, so sort (bounded by per-user-per-batch
            // volume, not total state)
            // single-linkage fold over the time-ordered intervals: the open
            // session from state is one composite interval, each event a
            // point interval. Late cross-batch events (watermarkDelay > 0)
            // may precede the open session — they extend it downward or form
            // their own earlier sessions, merging among themselves; they
            // never inherit the open session's old start. Sessions closed
            // before the final interval are sealed and emitted (a yet-later
            // arrival near one would start a fresh session — the price of
            // bounded per-user state; the watermark bounds how late that
            // can happen).
            val items: Seq[OpenSession] =
              (state.getOption.toSeq ++
                evs.map(e => { val t = micros(e.ts); OpenSession(t, t, 1) }))
                .sortBy(s => (s.start, s.end))
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var open: Option[OpenSession] = None
            items.foreach { it =>
              open match {
                case Some(s) if it.start <= s.end + gapMicros =>
                  open = Some(OpenSession(s.start,
                    math.max(s.end, it.end), s.n + it.n))
                case Some(s) =>
                  closed += SessionOut(user, toTs(s.start), toTs(s.end), s.n)
                  open = Some(it)
                case None =>
                  open = Some(it)
              }
            }
            open.foreach { s =>
              // fires once the event-time watermark exceeds this instant;
              // CEILING ms division — flooring would fire up to 1ms before
              // end + gap, closing a session a mergeable successor at
              // exactly end + gap should have extended
              val timeoutMs = Math.floorDiv(s.end + 999L, 1000L) + gapMs
              if (timeoutMs <= state.getCurrentWatermarkMs()) {
                // defense-in-depth: Spark 4 filters sub-watermark rows
                // before this function runs (pinned by SessionizeSpec), so
                // end + gap currently can't trail the watermark — but
                // setTimeoutTimestamp REJECTS sub-watermark instants, so if
                // Spark's late-row handling ever changes, close and emit
                // rather than kill the query with its IllegalArgumentException
                state.remove() // unconditionally safe on absent state
                closed += SessionOut(user, toTs(s.start), toTs(s.end), s.n)
              } else {
                state.update(s)
                state.setTimeoutTimestamp(timeoutMs)
              }
            }
            closed.iterator
          }
      }
  }
}
