package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.kernel._
import graft.ops.{Generated, Validation, WriteIntoDelta}

/**
 * Append-only table handle that never materializes the file index — the
 * BlindDeltaTable fast path (`crates/core/src/table/blind.rs:1`). Loading
 * reads only the control-plane columns of the checkpoint plus the JSON
 * tail, so opening a million-file table for ingest costs KBs of metadata.
 * Blind appends interleave with concurrent readers/writers under
 * WriteSerializable without conflict (no read set).
 */
class BlindDeltaTable private (val spark: SparkSession, val tablePath: Path) {

  val deltaLog = new DeltaLog(spark, tablePath)

  /** Metadata-only state (no Add index). */
  @volatile private var meta: Snapshot = deltaLog.metadataSnapshot()

  def schema = meta.schema
  def partitionColumns: Seq[String] = meta.partitionColumns
  def version: Long = meta.version

  def refresh(): Unit = { meta = deltaLog.metadataSnapshot() }

  /** Last recorded version for an idempotent-writer appId. */
  def txnVersion(appId: String): Option[Long] = meta.txns.get(appId)

  /** Blind append; returns the committed version, or None when an
    * (appId, appVersion) pair was already recorded (idempotent replay). */
  def append(df: DataFrame, appId: Option[String] = None,
             appVersion: Option[Long] = None): Option[Long] = {
    // one-sided idempotency options would SILENTLY disable replay
    // protection — a retried batch would append twice (delta-spark errors
    // for a lone txnAppId/txnVersion the same way)
    require(appId.isDefined == appVersion.isDefined,
      "blind append: appId and appVersion must be set together (or neither)")
    refresh()
    // ONE read of the volatile handle state for the whole append: the
    // class supports concurrent use, and re-reading `meta` for the txn
    // base after a concurrent refresh() swapped it would anchor conflict
    // detection PAST a metadata change the data was never validated
    // against (MetadataChanged silently skipped)
    val snap = meta
    (appId, appVersion) match {
      case (Some(a), Some(v)) if snap.txns.get(a).exists(_ >= v) => return None
      case _ =>
    }
    val m = snap.metadata
    Validation.requireKnownColumns(df, m.schema,
      "blind append does not evolve schemas; use DeltaTable.write with mergeSchema")
    val normalized = Validation.prepareForWrite(spark,
      DeltaWriter.normalize(Generated.fill(df, m.schema), m.schema), m)
    val adds = DeltaWriter.writeFiles(spark, tablePath, normalized,
      m.partitionColumns, WriteIntoDelta.numIndexedCols(m), meta = Some(m))
    val txnActions: Seq[Action] = (appId, appVersion) match {
      case (Some(a), Some(v)) => Seq(SetTransaction(a, v, Some(System.currentTimeMillis())))
      case _ => Nil
    }
    val txn = new OptimisticTransaction(deltaLog, Some(snap))
    // close the pre-check's check-then-commit TOCTOU: a racing replay of
    // the same (appId, appVersion) that wins the commit resolves to the
    // same None as the pre-check, not a failed append
    txn.idempotentTxn = (appId, appVersion) match {
      case (Some(a), Some(v)) => Some((a, v)); case _ => None
    }
    val committed =
      try txn.commit(adds ++ txnActions,
        Operation("WRITE", Map("mode" -> "Append", "blind" -> "true"),
          Map("numFiles" -> adds.size.toString,
            "numOutputRows" -> adds.flatMap(_.numRecords).sum.toString)))
      catch {
        case _: TransactionAlreadyAppliedException =>
          // the loser's data files were already renamed into the table dir
          // but will never be referenced — best-effort delete them now
          // rather than leaving orphans only VACUUM can reclaim after the
          // retention window
          val fs = tablePath.getFileSystem(spark.sessionState.newHadoopConf())
          adds.foreach(a => scala.util.Try(
            fs.delete(new Path(tablePath, graft.kernel.PathCodec.decode(a.path)), false)))
          refresh(); return None
      }
    refresh()
    Some(committed)
  }
}

object BlindDeltaTable {
  def forPath(spark: SparkSession, path: String): BlindDeltaTable =
    new BlindDeltaTable(spark, new Path(path))
}
