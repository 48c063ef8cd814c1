package graft.streaming

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.connector.read.streaming.{Offset => OffsetV2, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Source}
import org.apache.spark.sql.types.StructType
import org.json4s._
import org.json4s.jackson.JsonMethods

import graft.kernel.{Action, AddFile, DeltaLog, Metadata, Protocol, ProtocolGate, RemoveFile, Snapshot}
import graft.table.Scan

/**
 * Streaming-source offset: everything strictly before `(version, index)` has
 * been admitted. `index` counts files consumed within `version` (0 = none);
 * `isInitialSnapshot` marks whether `version` is being served from the
 * stream-start snapshot (all live files) rather than a single commit's adds.
 *
 * The reference has no continuous runtime — its incremental surface is
 * polling `load_cdf`/`update_incremental` (crates/core/src/operations/
 * load_cdf.rs, table/state.rs). Re-expressed Spark-first, that polling loop
 * IS Structured Streaming's microbatch contract, so we implement the real
 * thing: the delta-spark source semantics (initial snapshot, then per-commit
 * appends) on our own log replay.
 */
case class GraftSourceOffset(version: Long, index: Long, isInitialSnapshot: Boolean)
    extends OffsetV1 {
  override def json: String =
    s"""{"version":$version,"index":$index,"isInitialSnapshot":$isInitialSnapshot}"""
}

object GraftSourceOffset {
  implicit val ordering: Ordering[GraftSourceOffset] =
    Ordering.by(o => (o.version, o.index))

  def fromJson(s: String): GraftSourceOffset = {
    val j = JsonMethods.parse(s)
    def num(field: String): Long = j \ field match {
      case JInt(n) => n.toLong
      case JLong(n) => n
      case other => throw new IllegalArgumentException(
        s"bad graft-delta offset json ($field=$other): $s")
    }
    val init = j \ "isInitialSnapshot" match {
      case JBool(b) => b
      case _ => false
    }
    GraftSourceOffset(num("version"), num("index"), init)
  }

  /** Accepts our typed offset or any serialized form (SerializedOffset after
    * a checkpoint restart) via its json. */
  def from(o: OffsetV2): GraftSourceOffset = o match {
    case g: GraftSourceOffset => g
    case other => fromJson(other.json)
  }
}

/**
 * `spark.readStream.format("graft-delta").load(path)` — a v1 Source with
 * admission control over the Delta log.
 *
 * Semantics (mirrors delta-spark's DeltaSource options, built on our
 * kernel):
 *  - default: the table's full snapshot at stream start is batch material
 *    (served in `maxFilesPerTrigger`-sized slices), then each later commit's
 *    AddFiles in version order;
 *  - `startingVersion` (number | "latest"): skip the initial snapshot and
 *    tail commits from the given version (inclusive) / from the next commit;
 *  - `maxFilesPerTrigger` (default 1000): per-batch file admission cap;
 *  - change commits (containing dataChange removes): error by default;
 *    `ignoreDeletes` allows delete-only commits (skipped), `skipChangeCommits`
 *    skips them entirely, `ignoreChanges` replays their adds (at-least-once);
 *  - schema is pinned at stream start; a Metadata action with a different
 *    schema fails the stream (restart picks up the new schema).
 *
 * Scale: per-batch work is bounded by the admission cap; commit adds are
 * parsed once per version and cached until `commit()` GCs them. Only file
 * *metadata* crosses the driver — rows flow through `Scan.readFiles`' pruned
 * parquet scan with DV masks applied, same as batch reads.
 */
class GraftDeltaSource(
    spark: SparkSession,
    tablePath: String,
    options: Map[String, String])
  extends Source with SupportsAdmissionControl with SupportsTriggerAvailableNow {

  private val log = new DeltaLog(spark, new Path(tablePath))

  /** Snapshot pinned at source construction: schema authority + the initial
    * file set. */
  private val initSnapshot: Snapshot = log.snapshot()

  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }
  private def boolOpt(key: String): Boolean =
    opt(key).exists(_.trim.equalsIgnoreCase("true"))

  private val maxFilesPerTrigger: Int =
    opt("maxFilesPerTrigger").map(_.trim.toInt).getOrElse(1000)
  private val ignoreDeletes = boolOpt("ignoreDeletes")
  private val ignoreChanges = boolOpt("ignoreChanges")
  private val skipChangeCommits = boolOpt("skipChangeCommits")

  /** None = serve the initial snapshot first; Some(v) = tail from commit v. */
  private val startingVersion: Option[Long] = opt("startingVersion").map {
    case s if s.trim.equalsIgnoreCase("latest") => initSnapshot.version + 1
    case s => s.trim.toLong
  }

  override val schema: StructType = initSnapshot.schema

  /** Base offset: nothing admitted yet. */
  private def baseOffset: GraftSourceOffset = startingVersion match {
    case Some(v) => GraftSourceOffset(v, 0, isInitialSnapshot = false)
    case None => GraftSourceOffset(initSnapshot.version, 0, isInitialSnapshot = true)
  }

  // ---- per-version file listings ------------------------------------------

  private val versionFiles = mutable.Map.empty[(Long, Boolean), IndexedSeq[AddFile]]

  /** Files served at (version, isInitial), in a deterministic (path) order so
    * offsets stay meaningful across restarts. `latest` bounds which commit
    * files exist; a version beyond it is empty (and not cached — the commit
    * may land later). */
  private def filesAt(version: Long, isInitial: Boolean, latest: Long): IndexedSeq[AddFile] =
    versionFiles.get((version, isInitial)) match {
      case Some(f) => f
      case None if !isInitial && version > latest => IndexedSeq.empty
      case None =>
        val f =
          if (isInitial) {
            // The initial-snapshot file set must be reproducible from the
            // OFFSET's version, not from whenever this source instance was
            // constructed — after a checkpoint restart the table may have
            // moved on, and re-deriving "the first N files" from a newer
            // snapshot would duplicate and drop rows.
            val snap = if (version == initSnapshot.version) initSnapshot
                       else log.snapshotAt(version)
            snap.allFiles.sortBy(_.path).toIndexedSeq
          } else commitAdds(version)
        versionFiles.update((version, isInitial), f)
        f
    }

  private def commitAdds(version: Long): IndexedSeq[AddFile] = {
    val actions: Seq[Action] = log.readCommit(version)
    actions.collectFirst { case p: Protocol => p }
      .foreach(p => ProtocolGate.checkRead(p, initSnapshot.metadata))
    actions.collectFirst {
      case m: Metadata if m.schema != initSnapshot.schema => m
    }.foreach { m =>
      throw new IllegalStateException(
        s"graft-delta source: table schema changed at version $version " +
        s"(${initSnapshot.schema.simpleString} -> ${m.schema.simpleString}); " +
        "restart the stream to pick up the new schema")
    }
    val adds = actions.collect { case a: AddFile if a.dataChange => a }
    val removes = actions.collect { case r: RemoveFile if r.dataChange => r }
    val result: Seq[AddFile] =
      if (removes.isEmpty) adds
      else if (skipChangeCommits) Nil
      else if (ignoreChanges) adds
      else if (ignoreDeletes && adds.isEmpty) Nil
      else throw new IllegalStateException(
        s"graft-delta source: version $version contains data-changing removes " +
        "(UPDATE/DELETE/MERGE/OVERWRITE). Set skipChangeCommits=true to skip " +
        "such commits, ignoreChanges=true to replay their rewritten files " +
        "(at-least-once), or ignoreDeletes=true if this table only ever " +
        "deletes whole partitions.")
    result.sortBy(_.path).toIndexedSeq
  }

  // ---- admission -----------------------------------------------------------

  /** Consumed-up-to marker; recovered from checkpoints via latestOffset's
    * start argument or getBatch's end. */
  private var current: GraftSourceOffset = _
  private var availableNowCap: Option[GraftSourceOffset] = None

  private def maxFiles(limit: ReadLimit): Int = limit match {
    case m: ReadMaxFiles => m.maxFiles()
    case _: ReadAllAvailable => Int.MaxValue
    case composite: org.apache.spark.sql.connector.read.streaming.CompositeReadLimit =>
      composite.getReadLimits.collectFirst { case m: ReadMaxFiles => m.maxFiles() }
        .getOrElse(Int.MaxValue)
    case _ => Int.MaxValue
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxFiles(maxFilesPerTrigger)

  override def prepareForTriggerAvailableNow(): Unit = synchronized {
    availableNowCap = Some(advance(Option(current).getOrElse(baseOffset), Int.MaxValue))
  }

  /** Walk forward from `from`, admitting at most `budget` files; empty and
    * skipped commits are passed over for free. */
  private def advance(from: GraftSourceOffset, budget0: Int): GraftSourceOffset = {
    val latest = math.max(log.latestVersion(), initSnapshot.version)
    var v = from.version
    var idx = from.index
    var init = from.isInitialSnapshot
    var budget = budget0
    var done = false
    while (!done) {
      val size = filesAt(v, init, latest).size
      val avail = size - idx
      if (avail > 0 && budget > 0) {
        val take = math.min(avail, budget.toLong).toInt
        idx += take
        budget -= take
      }
      val exhausted = size - idx <= 0
      if (budget == 0 && !exhausted) done = true
      else if (exhausted && v < latest) { v += 1; idx = 0; init = false }
      else done = true
    }
    GraftSourceOffset(v, idx, init)
  }

  override def latestOffset(startOffset: OffsetV2, limit: ReadLimit): OffsetV2 = synchronized {
    val start = Option(startOffset).map(GraftSourceOffset.from)
    if (current == null) current = start.getOrElse(baseOffset)
    else start.filter(s => GraftSourceOffset.ordering.gt(s, current))
      .foreach(current = _)
    var next = advance(current, maxFiles(limit))
    availableNowCap.filter(c => GraftSourceOffset.ordering.gt(next, c))
      .foreach(next = _)
    current = next
    next
  }

  override def getOffset: Option[OffsetV1] =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def initialOffset(): OffsetV2 = baseOffset

  override def deserializeOffset(json: String): OffsetV2 = GraftSourceOffset.fromJson(json)

  // ---- batch materialization ----------------------------------------------

  /** Files admitted in (start, end] across the version timeline. */
  private def filesBetween(start: GraftSourceOffset,
                           end: GraftSourceOffset): Seq[AddFile] = {
    val latest = math.max(log.latestVersion(), initSnapshot.version)
    val out = Seq.newBuilder[AddFile]
    var v = start.version
    var init = start.isInitialSnapshot
    while (v <= end.version) {
      val files = filesAt(v, init, latest)
      val lo = if (v == start.version && init == start.isInitialSnapshot) start.index else 0L
      val hi = if (v == end.version) math.min(end.index, files.size.toLong) else files.size.toLong
      if (lo < hi) out ++= files.slice(lo.toInt, hi.toInt)
      if (init && v == end.version && end.isInitialSnapshot) return out.result()
      if (init) init = false
      v += 1
    }
    out.result()
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val endOff = GraftSourceOffset.from(end)
    val startOff = start.map(o => GraftSourceOffset.from(o)).getOrElse(baseOffset)
    synchronized {
      if (current == null || GraftSourceOffset.ordering.lt(current, endOff))
        current = endOff
    }
    val files = filesBetween(startOff, endOff)
    GraftSqlBridge.streamingDataFrame(Scan.readFiles(spark, initSnapshot, files))
  }

  override def commit(end: OffsetV1): Unit = synchronized {
    val e = GraftSourceOffset.from(end)
    versionFiles.keys.filter(_._1 < e.version).toSeq.foreach(versionFiles.remove)
  }

  override def stop(): Unit = ()

  override def toString: String = s"GraftDeltaSource[$tablePath]"
}
