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
/* Wiring a REAL store (no cloud SDKs ship in this environment; the bundled
 * DEPLOYABLE clients are pure-JDK wire implementations: [[HttpPutClient]] +
 * [[SigV4Signer]] for S3-compatible stores incl. GCS S3-interop — see
 * [[S3CompatibleStore]]; [[AzureBlobClient]] + [[AzureSharedKeySigner]] for
 * Azure Blob — see [[AzureBlobStore]]; [[GcsClient]] +
 * [[ServiceAccountTokenProvider]] for native GCS OAuth — see [[GcsStore]];
 * and the branch-transactional [[LakeFsLogStore]] — see [[LakeFsStore]].
 * The mapping for each provider, mirroring the reference's backends in
 * /root/reference/crates/{aws,gcp,azure,lakefs}):
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

/** Shared wire helpers for the pure-JDK store clients — ONE implementation
  * of the interrupt→IOException mapping (the commit loop's transient-retry
  * classification) and the ISO object-timestamp parse, so the clients
  * cannot drift apart on these details (the PathCodec lesson: per-client
  * copies of shared wire rules are how encoding bugs happened). */
private[kernel] object HttpWire {

  def send[T](http: java.net.http.HttpClient, req: java.net.http.HttpRequest,
      handler: java.net.http.HttpResponse.BodyHandler[T],
      what: String): java.net.http.HttpResponse[T] =
    try http.send(req, handler)
    catch {
      case e: InterruptedException =>
        Thread.currentThread().interrupt()
        throw new java.io.IOException(s"interrupted during $what call", e)
    }

  /** ISO instant ("...Z") per S3/GCS; tolerate offset dialects some
    * gateways emit; absent/odd timestamps degrade to 0 (only
    * history/time-travel precision suffers, not correctness). */
  def isoMtimeMs(ts: String): Long =
    scala.util.Try(java.time.Instant.parse(ts).toEpochMilli).toOption
      .orElse(scala.util.Try(
        java.time.OffsetDateTime.parse(ts).toInstant.toEpochMilli).toOption)
      .getOrElse(0L)

  /** Max single server-directed wait honored from a Retry-After header —
    * a misconfigured/hostile store must not park the writer for an hour. */
  val MaxRetryAfterMs: Long = 30000L

  /** Parse a Retry-After header value (RFC 9110: delta-seconds or
    * HTTP-date) to a clamped milliseconds wait. Unparseable → None (the
    * caller falls back to its own backoff). */
  def retryAfterMs(value: String): Option[Long] = {
    val v = value.trim
    // clamp the seconds BEFORE multiplying: a huge delta-seconds value
    // overflows the Long to negative → max(_, 0) → a ZERO pace, the exact
    // hammering the clamp exists to stop
    scala.util.Try(math.min(v.toLong, MaxRetryAfterMs / 1000L) * 1000L).toOption
      .orElse(scala.util.Try {
        val at = java.time.ZonedDateTime.parse(
          v, java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
        at.toInstant.toEpochMilli - System.currentTimeMillis()
      }.toOption)
      .map(ms => math.min(math.max(ms, 0L), MaxRetryAfterMs))
  }

  /** XXE-hardened XML parse of a wire response body — the ONE hardening
    * site (was copy-pasted per client; a hardening fix applied to one copy
    * silently missed the other). Parse failures surface as IOException =
    * the commit loop's transient-retry classification. */
  def secureXml(bytes: Array[Byte], what: String): org.w3c.dom.Document = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setExpandEntityReferences(false)
    try f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    catch {
      case e: org.xml.sax.SAXException =>
        throw new java.io.IOException(s"unparseable $what response", e)
    }
  }

  /** First child element text by tag, shared by the XML list parsers. */
  def elemText(el: org.w3c.dom.Element, tag: String): Option[String] = {
    val ns = el.getElementsByTagName(tag)
    if (ns.getLength == 0) None else Some(ns.item(0).getTextContent)
  }

  /** Throw the right transient error for a throttle response (429/503):
    * paced (RetryPacedException) when the server sent a usable pace
    * header, plain IOException otherwise. The commit loop honors the pace
    * from a SEPARATE budget so a sustained-but-bounded throttle window
    * cannot burn the conflict retry allowance (README "sustained
    * throttling" deployment caveat). The ONE place that knows the header
    * dialects (`Retry-After` everywhere; Azure services also emit
    * `x-ms-retry-after-ms`), so call sites cannot drift apart. */
  def throttled(status: Int, resp: java.net.http.HttpResponse[_], what: String): Nothing = {
    def hdr(name: String): Option[String] =
      Option(resp.headers().firstValue(name).orElse(null))
    val pace = hdr("Retry-After").flatMap(retryAfterMs)
      .orElse(hdr("x-ms-retry-after-ms")
        .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
        .map(ms => math.min(math.max(ms, 0L), MaxRetryAfterMs)))
    pace match {
      case Some(ms) => throw new RetryPacedException(
        s"$what throttled (HTTP $status, server-directed wait ${ms}ms)", ms)
      case None => throw new java.io.IOException(
        s"$what throttled (HTTP $status, no usable Retry-After); retry")
    }
  }

  /** Honor server-directed pacing around a READ-side wire call (list/get):
    * sleep the pace and retry, from a bounded budget, same floor/clamp
    * discipline as the commit loop's paced leg (Transaction.scala) — a
    * `Retry-After: 0` spam must not become back-to-back zero-backoff
    * calls, and a permanently throttling store must still fail loudly.
    * WRITE paths are NOT routed here: writeAtomic's pace belongs to the
    * commit loop, whose ghost-commit disambiguation must run between
    * attempts. */
  def pacedRetry[T](what: String, maxPacedWaitMs: Long = 120000L)(op: => T): T = {
    var pacedWaitMs = 0L
    while (true) {
      try return op
      catch {
        case e: RetryPacedException =>
          val wait = math.max(e.retryAfterMs, 100L)
          pacedWaitMs += wait
          if (pacedWaitMs > maxPacedWaitMs)
            throw new java.io.IOException(
              s"gave up after ${pacedWaitMs}ms of server-directed throttle " +
                s"pacing during $what (last: ${e.getMessage})", e)
          try Thread.sleep(wait)
          catch {
            case _: InterruptedException =>
              Thread.currentThread().interrupt()
              throw new java.io.IOException(
                s"interrupted during server-directed pacing of $what", e)
          }
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** A store told us to slow down AND by how much (429/503 + Retry-After).
  * An IOException so every existing transient-retry classification still
  * applies; carries the server-directed pace for callers that honor it. */
class RetryPacedException(msg: String, val retryAfterMs: Long)
  extends java.io.IOException(msg)

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

/**
 * Filesystem-backed [[ConditionalPutClient]]: keys map to files under
 * `root`; put-if-absent is write-to-temp + hard-link (`link(2)` fails with
 * EEXIST when the target exists — atomic on POSIX), so exclusivity holds
 * across threads AND processes, unlike a naive exists-then-write. Serves as
 * the durable local conditional-put backend and as the conformance target
 * that de-risks a future cloud client (the reference's S3/GCS/Azure
 * backends, crates/{aws,gcp,azure}, implement this same contract over
 * HTTP preconditions).
 */
class FsPutClient(root: java.nio.file.Path) extends ConditionalPutClient {
  import java.nio.file.{FileAlreadyExistsException, Files}

  private def fileFor(key: String): java.nio.file.Path =
    root.resolve(key.stripPrefix("/"))

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    val target = fileFor(key)
    Files.createDirectories(target.getParent)
    reapStaleTemps(target.getParent)
    val tmp = Files.createTempFile(target.getParent, ".put", ".tmp")
    LogStore.umaskDefaultPerms(tmp) // link(2) publishes this inode's perms
    try {
      Files.write(tmp, bytes)
      try { Files.createLink(target, tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp)
  }

  /** Best-effort reap of .put*.tmp orphans (a crash between createTempFile
    * and the finally-delete leaves one): they are filtered OUT of
    * listPrefix, so no external cleanup (LogCleanup's debris pass included)
    * can ever see them — the writer that visits the directory anyway is the
    * only code positioned to delete them. Age-gated generously: a LIVE temp
    * belongs to a concurrent put that is seconds old at most. */
  private def reapStaleTemps(dir: java.nio.file.Path): Unit =
    try {
      val cutoff = System.currentTimeMillis() - 60 * 60 * 1000L
      val ds = Files.newDirectoryStream(dir, ".put*.tmp")
      try ds.forEach { p =>
        try {
          if (Files.getLastModifiedTime(p).toMillis < cutoff)
            Files.deleteIfExists(p)
        } catch { case _: Exception => }
      } finally ds.close()
    } catch { case _: Exception => }

  override def get(key: String): Option[Array[Byte]] = {
    val f = fileFor(key)
    if (Files.isRegularFile(f)) Some(Files.readAllBytes(f)) else None
  }

  override def listPrefix(prefix: String): Seq[ObjectMeta] = {
    import java.nio.file.{FileVisitResult, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    if (!Files.isDirectory(root)) return Nil
    val out = Seq.newBuilder[ObjectMeta]
    // walkFileTree with a tolerant visitor: concurrent writers create and
    // delete .put temp files mid-listing — a vanished entry must not abort
    // the walk (Files.walk throws UncheckedIOException there)
    Files.walkFileTree(root, new SimpleFileVisitor[java.nio.file.Path] {
      override def visitFile(p: java.nio.file.Path,
          attrs: BasicFileAttributes): FileVisitResult = {
        if (attrs.isRegularFile && !p.getFileName.toString.startsWith(".put")) {
          val key = "/" + root.relativize(p).toString
          if (key.startsWith(prefix))
            out += ObjectMeta(key, attrs.size, attrs.lastModifiedTime.toMillis)
        }
        FileVisitResult.CONTINUE
      }
      override def visitFileFailed(p: java.nio.file.Path,
          e: java.io.IOException): FileVisitResult = FileVisitResult.CONTINUE
    })
    out.result().sortBy(_.key)
  }

  override def delete(key: String): Boolean = Files.deleteIfExists(fileFor(key))
}

class ObjectStoreLogStore(val conf: Configuration, client: ConditionalPutClient)
    extends LogStore {

  private def key(p: Path): String = p.toUri.getPath

  // read-side calls honor server-directed throttle pacing here (the ONE
  // seam every client's list/get funnels through); the write side paces
  // in the commit loop instead, where ghost-commit disambiguation lives
  override def list(dir: Path): Seq[FileStatus] = {
    val prefix = key(dir).stripSuffix("/") + "/"
    HttpWire.pacedRetry(s"list of $dir")(client.listPrefix(prefix)).collect {
      // only direct children (no '/' after the prefix)
      case ObjectMeta(k, size, mtime) if !k.stripPrefix(prefix).contains('/') =>
        new FileStatus(size, false, 1, size, mtime, new Path(k))
    }.sortBy(_.getPath.getName)
  }

  override def read(path: Path): Seq[String] =
    HttpWire.pacedRetry(s"read of $path")(client.get(key(path))) match {
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

  override def exists(path: Path): Boolean = {
    // metadata-only probe: a GET would download the whole object body
    // (checkpoint-sized) just to answer a boolean — the exact-key prefix
    // listing transfers one metadata entry instead (the LakeFsClient
    // statObject rationale, applied to the HTTP-backed stores)
    val k = key(path)
    HttpWire.pacedRetry(s"head of $path")(
      client.listPrefix(k)).exists(_.key == k)
  }

  override def delete(path: Path): Boolean = client.delete(key(path))
}
