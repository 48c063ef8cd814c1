package graft.kernel

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, FSDataOutputStream, FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/**
 * Mounted-filesystem passthrough — the Spark-native port of the reference's
 * `crates/mount` backend (`crates/mount/src/lib.rs:46-75`,
 * `crates/mount/src/file.rs:137-146`). A FUSE/NFS mount (Databricks
 * `/dbfs`, blobfuse, NFS shares) presents a POSIX-ish surface whose
 * `O_EXCL` and atomic-exclusive rename guarantees are unreliable, so this
 * backend has two halves:
 *
 * - [[MountFileSystem]]: a Hadoop `FileSystem` that maps `dbfs:/x` →
 *   `<mountRoot>/x` on the local filesystem (the reference's
 *   `file:///dbfs{path}` rewrite, lib.rs:60) and maps every returned path
 *   BACK into the mount scheme, so Spark scans, writes, and log listings
 *   all work on `dbfs:/...` table paths unchanged.
 * - [[MountLogStore]]: commits through an "unsafe rename" — full temp-file
 *   write, then a last-writer-wins rename with NO exclusivity — and only
 *   when the caller explicitly opts in to the single-writer contract
 *   (`allowUnsafeRename = true`). Without the opt-in every commit is
 *   refused loudly, mirroring the reference's
 *   `AllowUnsafeRenameNotSpecified` error (lib.rs:56-58). Reads, listings
 *   and deletes are always allowed.
 *
 * Wiring (both halves are per-scheme registrations):
 * {{{
 *   Mount.register(spark, scheme = "dbfs", mountRoot = "/dbfs",
 *     allowUnsafeRename = true)
 *   DeltaTable.forPath(spark, "dbfs:/warehouse/events")
 * }}}
 * For a mounted path that is ALREADY local (e.g. an NFS dir under
 * `file:/`), skip the FileSystem half and register only the log store:
 * `DeltaLog.registerLogStore("file", new MountLogStore(conf, true))`
 * replaces exclusive-create commits with unsafe renames on local paths —
 * the reference's `file` + `allow_unsafe_rename` branch (lib.rs:64-71).
 */
object Mount {

  /** Hadoop conf key carrying the local mount root for a scheme (set by
    * [[register]]; default "/&lt;scheme&gt;" matches the reference's dbfs
    * rewrite). */
  def rootKey(scheme: String): String = s"fs.graft.mount.$scheme.root"

  /** One-call wiring: route `scheme:/...` paths through [[MountFileSystem]]
    * at `mountRoot` and commits through a [[MountLogStore]]. */
  def register(spark: org.apache.spark.sql.SparkSession, scheme: String = "dbfs",
      mountRoot: String = "", allowUnsafeRename: Boolean = false): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set(s"fs.$scheme.impl", classOf[MountFileSystem].getName)
    // one FS instance per (scheme, ugi) from Hadoop's cache would pin a
    // STALE root if re-registered with a different one — disable caching
    // for mount schemes (cheap: the FS object holds no connections)
    conf.set(s"fs.$scheme.impl.disable.cache", "true")
    if (mountRoot.nonEmpty) conf.set(rootKey(scheme), mountRoot)
    DeltaLog.registerLogStore(scheme, new MountLogStore(conf, allowUnsafeRename))
  }

  /** Remove BOTH halves of a [[register]]: log store AND the fs.impl
    * wiring. Leaving `fs.<scheme>.impl` set while dropping the log store
    * would let later writes fall through to [[HadoopLogStore]], whose
    * local-rename publish on a mount is last-writer-wins with NO opt-in
    * gate — exactly the lost-update the gate exists to prevent
    * (HadoopLogStore also refuses [[MountFileSystem]]-backed paths as
    * defense-in-depth, so the failure is loud either way). */
  def unregister(spark: org.apache.spark.sql.SparkSession, scheme: String): Unit = {
    DeltaLog.unregisterLogStore(scheme)
    val conf = spark.sparkContext.hadoopConfiguration
    conf.unset(s"fs.$scheme.impl")
    conf.unset(s"fs.$scheme.impl.disable.cache")
    conf.unset(rootKey(scheme))
  }
}

/**
 * Hadoop FileSystem adapter for a local mount point: `scheme:/a/b` resolves
 * to `<mountRoot>/a/b` through [[RawLocalFileSystem]] (raw, not the
 * checksummed [[org.apache.hadoop.fs.LocalFileSystem]] — `.crc` siblings in
 * `_delta_log` would be listing noise), and every `FileStatus` path is
 * mapped back to the mount scheme so directory listings compose with log
 * replay and file-index code that re-qualifies paths.
 */
class MountFileSystem extends FileSystem {

  private var mountUri: URI = _
  private var root: String = _
  private val local = new RawLocalFileSystem()

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    mountUri = URI.create(name.getScheme + ":/")
    root = conf.get(Mount.rootKey(name.getScheme), "/" + name.getScheme)
      .stripSuffix("/")
    local.initialize(URI.create("file:///"), conf)
  }

  override def getScheme: String = mountUri.getScheme
  override def getUri: URI = mountUri

  /** `scheme:/a/b` (or scheme-relative `/a/b`) → `file:<root>/a/b`. */
  private def toLocal(p: Path): Path = {
    val u = p.toUri
    require(u.getScheme == null || u.getScheme == mountUri.getScheme,
      s"MountFileSystem(${mountUri.getScheme}) got foreign path $p")
    new Path("file:" + root + u.getPath)
  }

  /** `file:<root>/a/b` → `scheme:/a/b` (for returned statuses). */
  private[graft] def toMount(p: Path): Path = {
    val lp = p.toUri.getPath
    // true descendants only: bare startsWith(root) lets a SIBLING whose
    // name extends the root ("/mnt/ab" under root "/mnt/a") pass and remap
    // to a bogus mount path instead of failing the escape check
    require(lp == root || lp.startsWith(root + "/"),
      s"local path $lp escaped mount root $root")
    val rel = lp.stripPrefix(root)
    new Path(mountUri.getScheme + ":" + (if (rel.isEmpty) "/" else rel))
  }

  private def remap(s: FileStatus): FileStatus = {
    s.setPath(toMount(s.getPath))
    s
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    local.create(toLocal(f), permission, overwrite, bufferSize, replication,
      blockSize, progress)

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean =
    local.rename(toLocal(src), toLocal(dst))

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(remap)

  override def setWorkingDirectory(dir: Path): Unit =
    local.setWorkingDirectory(toLocal(dir))

  override def getWorkingDirectory: Path = new Path(mountUri.getScheme + ":/")

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    remap(local.getFileStatus(toLocal(f)))

  override def setTimes(f: Path, mtime: Long, atime: Long): Unit =
    local.setTimes(toLocal(f), mtime, atime)
}

/**
 * LogStore for mounted filesystems: the reference's single-writer
 * "unsafe rename" commit, gated on an explicit opt-in.
 *
 * The commit content is still fully staged to a temp file first (a partial
 * commit blessed by the retry loop's ghost-commit check would be silent
 * truncation — same all-or-nothing rule as [[HadoopLogStore]]); what is
 * UNSAFE is the publish: plain rename, last-writer-wins, no
 * exclusive-create — because FUSE mounts translate `O_EXCL`/link(2)
 * unreliably, pretending to be atomic would be worse than refusing
 * (`crates/mount/src/file.rs:137-146` forces `PutMode::Overwrite` for the
 * same reason). Two concurrent writers CAN both think they committed
 * version N; that is the documented contract the opt-in accepts.
 */
class MountLogStore(val conf: Configuration, allowUnsafeRename: Boolean)
    extends LogStore {

  private val inner = new HadoopLogStore(conf)

  override def list(dir: Path): Seq[FileStatus] = inner.list(dir)
  override def read(path: Path): Seq[String] = inner.read(path)
  override def exists(path: Path): Boolean = inner.exists(path)
  override def delete(path: Path): Boolean = inner.delete(path)

  override def writeAtomic(path: Path, lines: Iterator[String]): Unit = {
    if (!allowUnsafeRename)
      throw new UnsupportedOperationException(
        "Mounted filesystems do not guarantee atomic exclusive commits; " +
          "writing to this table requires opting in to the single-writer " +
          "contract with allowUnsafeRename = true " +
          "(Mount.register(..., allowUnsafeRename = true))")
    val fs = path.getFileSystem(conf)
    // commit races are the caller's contract, but OVERWRITING history is
    // never acceptable: a version that already exists means replay/retry
    // confusion, not a lost race we should paper over
    if (fs.exists(path)) throw new VersionAlreadyExistsException(path.toString)
    val tmp = new Path(path.getParent,
      s".tmp_commit_${java.util.UUID.randomUUID.toString.take(12)}.json")
    val out = fs.create(tmp, false)
    try lines.foreach { l =>
      out.write(l.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      out.write('\n')
    } finally out.close()
    if (!fs.rename(tmp, path)) {
      fs.delete(tmp, false)
      if (fs.exists(path)) throw new VersionAlreadyExistsException(path.toString)
      throw new java.io.IOException(s"mount publish failed for $path")
    }
  }
}
