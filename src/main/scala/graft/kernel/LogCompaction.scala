package graft.kernel

import scala.collection.mutable

import org.apache.hadoop.fs.Path

/**
 * Delta log compaction (`crates/core/src/protocol/log_compaction.rs:92`
 * `compact_logs`; surfaced as python `DeltaTable.compact_logs`): write a
 * single `%020d.%020d.compacted.json` whose contents are the RECONCILED
 * actions of the commit range [start, end], so replay can substitute one
 * file read for (end - start + 1) commit reads between checkpoints.
 *
 * Range reconciliation is the same last-writer-wins rule as snapshot
 * replay, with one difference: tombstones must be PRESERVED, not resolved
 * away — a `remove` in the range masks an `add` from before the range, and
 * a removed domain-metadata must keep its removal marker. CommitInfo and
 * AddCDCFile rows are excluded: compaction files feed table-state replay
 * only (CDF and history always read the original commits).
 *
 * At 100 TB scale this is a driver-side metadata rewrite of a bounded
 * commit window (≤ checkpointInterval commits of JSON), not a data job.
 */
object LogCompaction {

  private val CompactedRe = raw"(\d{20})\.(\d{20})\.compacted\.json".r

  def fileName(start: Long, end: Long): String =
    // LogStore.zeroPad, not %020d: the f-interpolator formats digits in
    // the JVM default locale (see LogStore.zeroPad)
    s"${LogStore.zeroPad(start, 20)}.${LogStore.zeroPad(end, 20)}.compacted.json"

  /** (startVersion, endVersion) if `name` is a compaction file. */
  def info(name: String): Option[(Long, Long)] = name match {
    case CompactedRe(s, e) => Some((s.toLong, e.toLong))
    case _ => None
  }

  /** Write the compaction file for [start, end]; all commits in the range
    * must exist. Returns the written path. */
  def write(log: DeltaLog, start: Long, end: Long): Path = {
    require(start >= 0 && start <= end, s"bad compaction range [$start, $end]")
    val adds = mutable.LinkedHashMap[String, AddFile]()
    val removes = mutable.LinkedHashMap[String, RemoveFile]()
    val txns = mutable.LinkedHashMap[String, SetTransaction]()
    val domains = mutable.LinkedHashMap[String, DomainMetadata]()
    var protocol: Option[Protocol] = None
    var metadata: Option[Metadata] = None
    (start to end).foreach { v =>
      log.readCommit(v).foreach {
        // file-action identity is (path, dvUniqueId) — a DV rewrite commits
        // remove(P, dvOld) + add(P, dvNew); path-keyed reconciliation here
        // would erase the dvOld tombstone, and a later checkpoint-substituted
        // replay would keep BOTH DV states of P live (rows resurface)
        case f: AddFile => adds(f.reconcileKey) = f; removes.remove(f.reconcileKey)
        case r: RemoveFile => adds.remove(r.reconcileKey); removes(r.reconcileKey) = r
        case m: Metadata => metadata = Some(m)
        case p: Protocol => protocol = Some(p)
        case t: SetTransaction => txns(t.appId) = t
        case d: DomainMetadata => domains(d.domain) = d // keep removal markers
        case _: CommitInfo | _: AddCDCFile => // not table state
        case _: CheckpointMetadata | _: Sidecar => // checkpoint plumbing
      }
    }
    val out: Seq[Action] =
      protocol.toSeq ++ metadata.toSeq ++ txns.values.toSeq ++
        domains.values.toSeq ++ removes.values.toSeq ++ adds.values.toSeq
    val p = new Path(log.logPath, fileName(start, end))
    log.store.writeAtomic(p, out.iterator.map(ActionCodec.toJson))
    p
  }

  /** Replay plan for versions (startAfter, target]: greedily substitute the
    * widest usable compaction file at each cursor position, falling back to
    * the plain commit. Right = compaction file path, Left = commit version.
    * Fails (like the raw replay) if neither covers the next version. */
  def plan(
      commitVersions: Set[Long],
      compacted: Seq[(Long, Long, Path)],
      startAfter: Long,
      target: Long): Seq[Either[Long, Path]] = {
    val out = mutable.Buffer[Either[Long, Path]]()
    var cursor = startAfter + 1
    while (cursor <= target) {
      val best = compacted.filter(c => c._1 == cursor && c._2 <= target)
        .sortBy(-_._2).headOption
      best match {
        case Some((_, e, p)) => out += Right(p); cursor = e + 1
        case None =>
          require(commitVersions.contains(cursor),
            s"Log is not contiguous: version $cursor is missing " +
              s"(replaying ${startAfter + 1}..$target)")
          out += Left(cursor)
          cursor += 1
      }
    }
    out.toSeq
  }
}
