package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.execution.streaming.runtime.StreamExecution
import org.apache.spark.sql.streaming.OutputMode

import graft.kernel.{Operation, OptimisticTransaction, SetTransaction}
import graft.ops.{Validation, WriteIntoDelta}
import graft.table.{DeltaTable, DeltaWriter}

/**
 * `df.writeStream.format("graft-delta").start(path)` — exactly-once Delta
 * sink. Every micro-batch commits with a `txn(appId, batchId)` action
 * (`SetTransaction`, actions.rs:1042-1072); a replayed batch id is detected
 * from the table's transaction versions and skipped, so at-least-once batch
 * delivery yields exactly-once table contents — the delta-spark
 * `txnAppId`/`txnVersion` recipe with the streaming query id as the default
 * appId.
 *
 * Append mode appends; Complete mode replaces the table contents and the
 * `txn` rides the same commit, keeping replacement + idempotency marker
 * atomic. The batch plan is pinned to its physical RDD before writing so the
 * write re-plans (partitioning, file sizing) without re-reading the
 * streaming source.
 */
class GraftDeltaSink(
    sqlContext: SQLContext,
    path: String,
    partitionColumns: Seq[String],
    outputMode: OutputMode,
    options: Map[String, String]) extends Sink {

  require(outputMode == OutputMode.Append() || outputMode == OutputMode.Complete(),
    s"graft-delta sink supports Append and Complete output modes, got $outputMode")

  private def opt(key: String): Option[String] =
    graft.sources.GraftDeltaRelation.opt(options, key)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val appId = opt("txnAppId")
      .orElse(Option(spark.sparkContext.getLocalProperty(StreamExecution.QUERY_ID_KEY)))
      .getOrElse(throw new IllegalArgumentException(
        "graft-delta sink: no streaming query id on this thread and no " +
        "'txnAppId' option — a path-derived fallback id would be SHARED by " +
        "every writer to this table, so one pipeline's batch ids would " +
        "suppress another's as replays; pass .option(\"txnAppId\", ...). " +
        "MIGRATION: checkpoints created before this fail-fast recorded " +
        "their SetTransaction lineage under the old path-derived id " +
        "('graft-delta-sink:' + table path) — pass THAT string as txnAppId " +
        "to preserve replay suppression for an existing checkpoint"))
    val batch = GraftSqlBridge.pinnedBatchDataFrame(data)

    // one log handle / one listing per micro-batch: forPath + create-on-miss
    // (isDeltaTable + forPath + snapshot each re-listed the log dir — three
    // billable round-trips per batch on an object store)
    val table =
      try DeltaTable.forPath(spark, path)
      catch {
        case _: graft.kernel.DeltaTableNotFoundException =>
          DeltaTable.create(spark, path, batch.schema, partitionColumns)
          DeltaTable.forPath(spark, path)
      }
    // Append mode needs only metadata/protocol/txns — materializing the
    // FULL file index per micro-batch made sink latency and driver memory
    // scale with TABLE size instead of batch size (a million-file table
    // replayed its whole Add index every batch); only Complete mode's
    // whole-table removes need allFiles. Same fast path as BlindDeltaTable.
    val snap =
      if (outputMode == OutputMode.Complete()) table.snapshot
      else table.deltaLog.metadataSnapshot()
    if (snap.txns.get(appId).exists(_ >= batchId)) return // replayed batch
    val m = snap.metadata
    // an existing table's partitioning wins over .partitionBy(...) — but a
    // MISMATCH must fail fast (delta-spark parity), not silently write the
    // table's layout against the user's declaration
    // name comparisons follow the session's resolver: under the default
    // spark.sql.caseSensitive=false, partitionBy("Date") against partition
    // column "date" (and stream column "Value" vs table "value") must
    // resolve like the by-name select below will, not kill the stream
    val resolver = spark.sessionState.conf.resolver
    if (partitionColumns.nonEmpty &&
        !(partitionColumns.length == m.partitionColumns.length &&
          partitionColumns.zip(m.partitionColumns).forall((resolver.apply _).tupled)))
      throw new IllegalArgumentException(
        s"graft-delta sink: partitionBy(${partitionColumns.mkString(",")}) does " +
        s"not match the existing table's partitioning " +
        s"(${m.partitionColumns.mkString(",")}) at $path")
    // fail fast on columns the table doesn't know: normalize() below
    // selects by name, so an unknown stream column would otherwise vanish
    // from every batch — silent data loss, not an error (shared guard:
    // Locale.ROOT case-insensitive, the SAME rule as the normalize()
    // projection this fronts)
    Validation.requireKnownColumns(batch, m.schema,
      s"graft-delta sink does not evolve schemas; table at $path")
    val normalized = Validation.prepareForWrite(spark,
      DeltaWriter.normalize(graft.ops.Generated.fill(batch, m.schema), m.schema), m)
    val adds = DeltaWriter.writeFiles(spark, table.tablePath, normalized,
      m.partitionColumns, WriteIntoDelta.numIndexedCols(m), meta = Some(m))
    // plain if, same form as the readWholeTable gate below (a match binder
    // named `m` shadowed the Metadata val above)
    val removes =
      if (outputMode == OutputMode.Complete()) {
        val ts = System.currentTimeMillis()
        snap.allFiles.map(_.remove(ts, dataChange = true))
      } else Nil
    val txnAction = SetTransaction(appId, batchId, Some(System.currentTimeMillis()))
    val txn = new OptimisticTransaction(table.deltaLog, Some(snap))
    // the batchId is an idempotency marker: a racing replay of the same
    // batch that wins the commit after the pre-check above must resolve to
    // a silent skip, not a failed stream (run-level analogue of the
    // txnVersion pre-check; closes its check-then-commit TOCTOU)
    txn.idempotentTxn = Some((appId, batchId))
    // Complete mode replaces the WHOLE table — declare the full read set so
    // a concurrent writer's interleaved files conflict instead of silently
    // surviving the replacement (same discipline as batch overwrite,
    // WriteIntoDelta's readWholeTable before whole-table removes)
    if (outputMode == OutputMode.Complete()) txn.readWholeTable()
    try txn.commit(adds ++ removes :+ txnAction,
      Operation("STREAMING UPDATE", Map(
        "outputMode" -> outputMode.toString,
        "queryId" -> appId,
        "epochId" -> batchId.toString),
        Map("numFiles" -> adds.size.toString,
          "numRemovedFiles" -> removes.size.toString)))
    catch {
      case _: graft.kernel.TransactionAlreadyAppliedException =>
        // replayed batch won the race: this loser's data files were already
        // renamed into the table dir but will never be referenced —
        // best-effort delete them now rather than leaving a full batch of
        // orphans (a whole table's worth in Complete mode) that only
        // VACUUM can reclaim after the retention window (the
        // BlindDeltaTable.append cleanup discipline)
        val fs = table.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
        adds.foreach(a => scala.util.Try(fs.delete(
          new org.apache.hadoop.fs.Path(table.tablePath,
            graft.kernel.PathCodec.decode(a.path)), false)))
    }
    ()
  }

  override def toString: String = s"GraftDeltaSink[$path]"
}
