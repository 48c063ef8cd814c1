package graft.kernel

import java.nio.charset.StandardCharsets
import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/**
 * Object-store commit semantics: eventually-listed blob stores have no
 * atomic `create-if-absent` file primitive, so commit mutual exclusion
 * comes from a **conditional put** (S3 `If-None-Match: *`, GCS
 * `ifGenerationMatch=0`, Azure `If-None-Match`) or an external lock
 * (delta-rs pairs S3 with a DynamoDB lock table, `crates/aws/src/lib.rs:39`).
 *
 * [[ConditionalPutClient]] is that minimal contract; [[ObjectStoreLogStore]]
 * adapts it to the [[LogStore]] trait so the commit protocol above is
 * unchanged — `OptimisticTransaction` retries on
 * [[VersionAlreadyExistsException]] exactly as with the file backend.
 * [[InMemoryPutClient]] provides CAS semantics for tests and in-process use.
 */
/* Wiring a REAL store (no cloud SDKs ship in this environment, so the
 * in-memory CAS client is the only bundled implementation; the mapping for
 * each provider, mirroring the reference's backends in
 * /root/reference/crates/{aws,gcp,azure}):
 *
 *  - S3: `PutObject` with `If-None-Match: *` (supported since 2024-08) —
 *    putIfAbsent returns false on HTTP 412. Pre-conditional-put S3 needs an
 *    external lock instead: the reference pairs S3 with a DynamoDB lock
 *    table (crates/aws/src/lib.rs:39, conditional `PutItem` on the commit
 *    version as the mutex, commit file written after the lock wins).
 *  - GCS: `insert` with `ifGenerationMatch=0` — 412 = exists.
 *  - Azure Blob: `Put Blob` with `If-None-Match: *` — 409/412 = exists.
 *  - listPrefix maps to the provider's list API; populate ObjectMeta.mtimeMs
 *    from the object's creation/last-modified time (commit mtimes drive
 *    time travel, history and CDF timestamp ranges).
 */

/** One listed object: key, size, and creation/last-modified time (object
  * stores report a real per-object timestamp; surfacing it matters because
  * commit-file mtimes drive time travel by timestamp, `history()`,
  * CDF timestamp ranges and tombstone retention). */
case class ObjectMeta(key: String, size: Long, mtimeMs: Long)

trait ConditionalPutClient {
  /** Atomic put-if-absent. False when the key already exists. */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean
  def get(key: String): Option[Array[Byte]]
  def listPrefix(prefix: String): Seq[ObjectMeta]
  def delete(key: String): Boolean
}

class InMemoryPutClient extends ConditionalPutClient {
  private case class Blob(bytes: Array[Byte], createdMs: Long)
  private val blobs = new ConcurrentHashMap[String, Blob]()
  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean =
    blobs.putIfAbsent(key, Blob(bytes, System.currentTimeMillis())) == null
  override def get(key: String): Option[Array[Byte]] = Option(blobs.get(key)).map(_.bytes)
  override def listPrefix(prefix: String): Seq[ObjectMeta] = {
    import scala.jdk.CollectionConverters._
    blobs.asScala.filter(_._1.startsWith(prefix))
      .map { case (k, b) => ObjectMeta(k, b.bytes.length.toLong, b.createdMs) }
      .toSeq.sortBy(_.key)
  }
  override def delete(key: String): Boolean = blobs.remove(key) != null
}

class ObjectStoreLogStore(val conf: Configuration, client: ConditionalPutClient)
    extends LogStore {

  private def key(p: Path): String = p.toUri.getPath

  override def list(dir: Path): Seq[FileStatus] = {
    val prefix = key(dir).stripSuffix("/") + "/"
    client.listPrefix(prefix).collect {
      // only direct children (no '/' after the prefix)
      case ObjectMeta(k, size, mtime) if !k.stripPrefix(prefix).contains('/') =>
        new FileStatus(size, false, 1, size, mtime, new Path(k))
    }.sortBy(_.getPath.getName)
  }

  override def read(path: Path): Seq[String] =
    client.get(key(path)) match {
      case Some(bytes) =>
        new String(bytes, StandardCharsets.UTF_8).split("\n", -1).toSeq
          .filter(_.nonEmpty)
      case None => throw new java.io.FileNotFoundException(path.toString)
    }

  override def writeAtomic(path: Path, lines: Iterator[String]): Unit = {
    val sb = new StringBuilder
    lines.foreach { l => sb.append(l); sb.append('\n') }
    if (!client.putIfAbsent(key(path), sb.toString.getBytes(StandardCharsets.UTF_8)))
      throw new VersionAlreadyExistsException(path.toString)
  }

  override def exists(path: Path): Boolean = client.get(key(path)).isDefined

  override def delete(path: Path): Boolean = client.delete(key(path))
}
