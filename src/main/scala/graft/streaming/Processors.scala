package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/**
 * Spark 4 `transformWithState` StatefulProcessors — the arbitrary-state
 * streaming API (RocksDB-backed, per-key typed state handles) that
 * supersedes flatMapGroupsWithState.
 *
 * [[MilestoneProcessor]]: per-key running event count that emits
 * `(key, m)` each time the count crosses a multiple of `step`. The output
 * across a run is BATCH-SPLIT-INVARIANT: each crossing is emitted exactly
 * once whichever microbatch it happens in, so the union of all emitted
 * rows equals the milestones of the final per-key totals — an external
 * oracle can replay it without knowing the batch boundaries. (A
 * "cumulative count per batch" output, by contrast, depends on admission
 * chunking and cannot be oracle-checked.)
 */
class MilestoneProcessor(step: Long) extends StatefulProcessor[Long, Long, (Long, Long)] {
  require(step >= 1, s"MilestoneProcessor: step=$step")
  @transient private var cnt: ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong, TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (cnt.exists()) cnt.get() else 0L
    val cur = prev + rows.size
    cnt.update(cur)
    val first = (prev / step + 1) * step
    (first to cur by step).iterator.map(m => (key, m))
  }
}
