package graft.kernel

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/**
 * Storage abstraction for the transaction log, mirroring delta-rs's
 * `LogStore` trait (`crates/core/src/logstore/mod.rs:369-401`:
 * read_commit_entry :379, write_commit_entry :385, abort_commit_entry :393,
 * get_latest_version :401).
 *
 * The one hard requirement is **mutual exclusion on commit**: writing
 * version N must fail if N already exists. On local filesystems we get this
 * from `CREATE_NEW`; on HDFS from `create(path, overwrite=false)`; object
 * stores would plug in conditional-put (delta-rs uses a DynamoDB lock for
 * S3, `crates/aws/src/lib.rs:39`) — the trait boundary is where that goes.
 */
trait LogStore {
  def conf: Configuration

  /** List files directly under `dir`, sorted by name. Empty if dir missing. */
  def list(dir: Path): Seq[FileStatus]

  def read(path: Path): Seq[String]

  /** Atomically create `path` with `lines`; throw VersionAlreadyExists if present. */
  def writeAtomic(path: Path, lines: Iterator[String]): Unit

  def exists(path: Path): Boolean
  def delete(path: Path): Boolean
}

class VersionAlreadyExistsException(val path: String)
    extends RuntimeException(s"Commit file already exists: $path")

/** Hadoop-FileSystem-backed log store (local/HDFS; S3A etc. work for reads,
  * commit atomicity there needs a coordination layer as noted above). */
class HadoopLogStore(val conf: Configuration) extends LogStore {

  private def fs(p: Path): FileSystem = p.getFileSystem(conf)

  override def list(dir: Path): Seq[FileStatus] = {
    val f = fs(dir)
    if (!f.exists(dir)) Nil
    else f.listStatus(dir).toSeq.sortBy(_.getPath.getName)
  }

  override def read(path: Path): Seq[String] = {
    val in = fs(path).open(path)
    try {
      val r = new BufferedReader(new InputStreamReader(in, StandardCharsets.UTF_8))
      val buf = new ArrayBuffer[String]()
      var line = r.readLine()
      while (line != null) { buf += line; line = r.readLine() }
      buf.toSeq
    } finally in.close()
  }

  override def writeAtomic(path: Path, lines: Iterator[String]): Unit = {
    val scheme = Option(path.toUri.getScheme).getOrElse("file")
    // Blob stores are NOT atomic here: S3A/GCS/Azure implement create() as
    // exists-then-put, so two racing writers can both "win" version N and
    // silently corrupt the log. Refuse loudly before touching the FS —
    // those schemes must route through a conditional-put LogStore
    // (ObjectStoreLogStore) or an external lock, like the reference's
    // S3+DynamoDB backend (crates/aws/src/lib.rs:39).
    if (HadoopLogStore.NonAtomicSchemes.contains(scheme.toLowerCase(java.util.Locale.ROOT)))
      throw new UnsupportedOperationException(
        s"HadoopLogStore cannot commit atomically on '$scheme://' - " +
          "exists-then-create is not atomic on object stores. Use a " +
          "conditional-put LogStore (ObjectStoreLogStore) or an external " +
          "commit coordinator for this scheme.")
    // a mount scheme reaching this store means the MountLogStore
    // registration is gone (e.g. Mount.register was never called on this
    // session) while fs.<scheme>.impl survived: the HDFS branch below
    // assumes rename refuses an existing destination, which POSIX rename
    // under a mount does NOT — two racing writers would silently clobber
    // a committed version. Refuse loudly; commits on mounts must go
    // through MountLogStore's explicit single-writer opt-in.
    if (fs(path).isInstanceOf[MountFileSystem])
      throw new UnsupportedOperationException(
        s"HadoopLogStore cannot commit safely on mounted scheme " +
          s"'$scheme://' - register the mount's log store first " +
          "(Mount.register(spark, scheme, mountRoot, allowUnsafeRename))")
    // All-or-nothing publish: the commit content is fully written to a temp
    // file first, then published atomically (link(2) locally, rename on
    // HDFS — both fail if the target exists). A direct create-then-write
    // could persist a PARTIAL commit on mid-write failure (ENOSPC, network),
    // and the transaction retry loop's ghost-commit check (Transaction.scala)
    // would then bless a truncated commit as our own successful one.
    val f = fs(path)
    if (scheme == "file") {
      val local = Paths.get(path.toUri.getPath)
      Files.createDirectories(local.getParent)
      val tmp = Files.createTempFile(local.getParent, ".tmp_commit_", ".json")
      LogStore.umaskDefaultPerms(tmp)
      try {
        val sb = new StringBuilder
        lines.foreach { l => sb.append(l); sb.append('\n') }
        Files.write(tmp, sb.toString.getBytes(StandardCharsets.UTF_8))
        try Files.createLink(local, tmp)
        catch {
          case _: java.nio.file.FileAlreadyExistsException =>
            throw new VersionAlreadyExistsException(path.toString)
        }
      } finally Files.deleteIfExists(tmp)
    } else {
      // HDFS rename is atomic and refuses an existing destination
      if (f.exists(path)) throw new VersionAlreadyExistsException(path.toString)
      val tmp = new Path(path.getParent,
        s".tmp_commit_${java.util.UUID.randomUUID.toString.take(12)}.json")
      val out = f.create(tmp, false)
      try {
        lines.foreach { l =>
          out.write(l.getBytes(StandardCharsets.UTF_8)); out.write('\n')
        }
      } finally out.close()
      if (!f.rename(tmp, path)) {
        f.delete(tmp, false)
        if (f.exists(path)) throw new VersionAlreadyExistsException(path.toString)
        throw new java.io.IOException(s"atomic publish failed for $path")
      }
    }
  }

  override def exists(path: Path): Boolean = fs(path).exists(path)
  override def delete(path: Path): Boolean = fs(path).delete(path, false)
}

object HadoopLogStore {
  /** Schemes whose Hadoop FileSystem create() lacks atomic create-exclusive. */
  val NonAtomicSchemes: Set[String] =
    Set("s3", "s3a", "s3n", "gs", "wasb", "wasbs", "abfs", "abfss", "oss", "cos")
}

object LogStore {
  val LOG_DIR = "_delta_log" // kernel/transaction/mod.rs:119 DELTA_LOG_FOLDER
  val LAST_CHECKPOINT = "_last_checkpoint"

  /** createTempFile makes 0600 files; publishing that inode via link(2)
    * would leave commit files owner-only readable — a regression from
    * CREATE_NEW for multi-user local tables. The target permissions come
    * from the PROCESS UMASK, probed once by creating a plain file (which,
    * unlike createTempFile, honors the umask): a 077-umask user keeps 0600
    * commits, a 022 user gets rw-r--r--. Any failure leaves the temp's
    * perms alone — permissions must never abort a commit. */
  private lazy val probedDefaultPerms: Option[java.util.Set[java.nio.file.attribute.PosixFilePermission]] =
    try {
      val probe = java.nio.file.Paths.get(
        System.getProperty("java.io.tmpdir"),
        s".graft_perm_probe_${java.util.UUID.randomUUID.toString.take(12)}")
      java.nio.file.Files.createFile(probe)
      try Some(java.nio.file.Files.getPosixFilePermissions(probe))
      finally java.nio.file.Files.deleteIfExists(probe)
    } catch { case scala.util.control.NonFatal(_) => None }

  def umaskDefaultPerms(p: java.nio.file.Path): Unit =
    probedDefaultPerms.foreach { perms =>
      try java.nio.file.Files.setPosixFilePermissions(p, perms)
      catch { case scala.util.control.NonFatal(_) => () }
    }

  /** Zero-padded ASCII decimal. The f-interpolator's %0Nd formats in the
    * JVM DEFAULT locale (ar/fa/bn JVMs emit Arabic-Indic/Bengali digits,
    * which Java's ASCII-only `\d` never matches) — a log file named in
    * non-ASCII digits is unreadable by this engine and every other one.
    * Long.toString is locale-independent by spec. Same hazard class as
    * bare toLowerCase (Round13Spec tr_TR). */
  def zeroPad(n: Long, width: Int): String = {
    val s = java.lang.Long.toString(n)
    if (s.length >= width) s else ("0" * (width - s.length)) + s
  }

  def commitFileName(version: Long): String = zeroPad(version, 20) + ".json"
  def checkpointFileName(version: Long): String =
    zeroPad(version, 20) + ".checkpoint.parquet"
  def multiPartCheckpointFileName(version: Long, part: Int, total: Int): String =
    zeroPad(version, 20) + ".checkpoint." + zeroPad(part.toLong, 10) +
      "." + zeroPad(total.toLong, 10) + ".parquet"

  def isCommitFile(name: String): Boolean = name.matches("\\d{20}\\.json")
  /** Any file whose presence makes a log dir a LOADABLE table: commit,
    * checkpoint, or log-compaction file — ONE definition shared by
    * DeltaLog.tableExists and the catalog's loadTable probe (they carried
    * byte-identical inline copies; a new log-file kind taught to one and
    * not the other silently diverges "exists" between the two doors). */
  def isLogEntry(name: String): Boolean =
    isCommitFile(name) || isCheckpointFile(name) ||
      LogCompaction.info(name).isDefined
  /** Classic single-file, classic multi-part, and V2 uuid-named manifests
    * (json lines or parquet — PROTOCOL.md allows both). */
  def isCheckpointFile(name: String): Boolean =
    name.matches("\\d{20}\\.checkpoint(\\.\\d+\\.\\d+)?\\.parquet") ||
      name.matches("\\d{20}\\.checkpoint\\.[0-9a-fA-F-]{32,36}\\.(json|parquet)")
  def fileVersion(name: String): Long = name.takeWhile(_.isDigit).toLong

  private val MultiPartRe = "\\d{20}\\.checkpoint\\.(\\d+)\\.(\\d+)\\.parquet".r
  /** (partNumber, numParts) for classic multi-part checkpoint names. */
  def multiPartInfo(name: String): Option[(Int, Int)] = name match {
    case MultiPartRe(part, total) => Some((part.toInt, total.toInt))
    case _ => None
  }
}
