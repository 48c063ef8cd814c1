package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.table.{BlindDeltaTable, DeltaTable}

/**
 * Structured Streaming integration (SURVEY §2.10). The reference has no
 * continuous runtime; its streaming-adjacent surface is (a) `txn`
 * idempotency for exactly-once sinks (actions.rs:1042-1072) and (b) CDF
 * incremental reads as a microbatch source. Both map onto Spark Structured
 * Streaming idioms:
 *
 *  - sink: `df.writeStream.foreachBatch(DeltaStreaming.sink(path, appId))`
 *    — each microbatch commits as a blind append carrying
 *    `SetTransaction(appId, batchId)`; on restart, replayed batch ids are
 *    skipped, giving exactly-once table contents from at-least-once batch
 *    delivery (the delta-spark `txnAppId`/`txnVersion` recipe);
 *  - source: [[changesSince]] assembles the CDF rows after a version, the
 *    `getBatch(start, end)` half of a microbatch source; poll it from any
 *    scheduler (or wire into foreachBatch of a rate stream).
 */
object DeltaStreaming {

  /** foreachBatch function with exactly-once semantics per (appId, batchId). */
  def sink(path: String, appId: String): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val t = BlindDeltaTable.forPath(batch.sparkSession, path)
      t.append(batch, Some(appId), Some(batchId))
      ()
    }
  }

  /** Create-if-absent variant for first-batch convenience. */
  def sinkCreating(path: String, appId: String,
                   partitionBy: Seq[String] = Nil): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      // create-on-miss, not probe-then-create: an isDeltaTable probe here
      // re-LISTed the log on EVERY batch forever (the sink's own fix,
      // GraftDeltaSink.scala — one billable round-trip per batch saved)
      val t =
        try BlindDeltaTable.forPath(spark, path)
        catch {
          case _: graft.kernel.DeltaTableNotFoundException =>
            DeltaTable.write(spark, batch.limit(0), path, partitionBy = partitionBy)
            BlindDeltaTable.forPath(spark, path)
        }
      t.append(batch, Some(appId), Some(batchId))
      ()
    }
  }

  /** Exactly-once streaming MERGE (CDC apply): each microbatch upserts into
    * the target through `buildMerge`, and the merge commit carries
    * `txn(appId, batchId)` — a replayed batch is detected from the table's
    * transaction versions and skipped, so at-least-once batch delivery
    * yields exactly-once table contents. The streaming analogue of the
    * reference's merge `with_streaming` + CommitProperties app txns
    * (merge/mod.rs:465, actions.rs:1042).
    *
    * {{{
    * df.writeStream.foreachBatch(DeltaStreaming.mergeSink(path, "cdc-app") {
    *   (t, batch) => t.merge(batch, "target.id = source.id")
    *     .whenMatchedUpdateAll().whenNotMatchedInsertAll()
    * })
    * }}}
    */
  def mergeSink(path: String, appId: String)(
      buildMerge: (DeltaTable, DataFrame) => graft.ops.MergeBuilder): (DataFrame, Long) => Unit = {
    (batch: DataFrame, batchId: Long) => {
      val t = DeltaTable.forPath(batch.sparkSession, path)
      if (!t.txnVersion(appId).exists(_ >= batchId)) {
        buildMerge(t, batch).withAppTransaction(appId, batchId).execute()
      }
      ()
    }
  }

  /** Incremental change feed: rows committed in (afterVersion, end],
    * with the CDF columns; returns None when there is nothing new.
    * Microbatch-source semantics (update_incremental + load_cdf).
    * `maxVersionsPerBatch` caps how much of the backlog one batch admits
    * (delta-spark's maxFilesPerTrigger spirit): a source that fell far
    * behind catches up in bounded batches instead of one giant one. */
  def changesSince(spark: SparkSession, path: String,
                   afterVersion: Long,
                   maxVersionsPerBatch: Option[Int] = None): Option[(DataFrame, Long)] = {
    val t = DeltaTable.forPath(spark, path)
    val latest = t.deltaLog.latestVersion()
    if (latest <= afterVersion) None
    else {
      maxVersionsPerBatch.foreach(m => require(m > 0,
        s"maxVersionsPerBatch must be positive, got $m (a 0 budget idles " +
          "the poll loop forever)"))
      val end = maxVersionsPerBatch
        .map(m => math.min(latest, afterVersion + m.toLong))
        .getOrElse(latest)
      Some((t.loadCdf(afterVersion + 1, Some(end)), end))
    }
  }
}
