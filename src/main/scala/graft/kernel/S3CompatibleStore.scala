package graft.kernel

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}

/**
 * Deployable commit path for S3-compatible object stores (AWS S3 with
 * conditional writes, MinIO, Ceph RGW, R2) — no SDK jars required: the
 * wire protocol is [[HttpPutClient]] (PUT + `If-None-Match: *`,
 * ListObjectsV2 XML) and auth is [[SigV4Signer]], both pure JDK.
 *
 * Addressing is path-style: `<endpoint>/<bucket>/<key>`, the form every
 * S3-compatible gateway serves without DNS wildcards. One registration
 * handles every bucket under the scheme — the store routes on the path's
 * authority and keeps one signed client per bucket.
 *
 * Configuration comes entirely from the environment (MinIO convention):
 * `AWS_ACCESS_KEY_ID` / `AWS_SECRET_ACCESS_KEY` (both unset = anonymous,
 * e.g. a public bucket or an unauthenticated test endpoint),
 * `AWS_SESSION_TOKEN` (optional), `AWS_REGION` (default `us-east-1`).
 *
 * {{{
 * // once per JVM, before touching s3a:// tables:
 * S3CompatibleStore.register("s3a", "http://minio:9000")
 * val t = DeltaTable.forPath(spark, "s3a://bucket/warehouse/events")
 * }}}
 *
 * Scope note (mirrors the reference's split, crates/aws/src/lib.rs:39):
 * this registration is the COMMIT/log plane. The data plane (parquet
 * reads/writes) still goes through whatever Hadoop FileSystem serves the
 * scheme on the cluster (hadoop-aws etc.) — the piece Spark deployments
 * already have; what they lack without delta-spark is exactly the atomic
 * commit protocol this store provides.
 */
object S3CompatibleStore {

  /** Build the per-bucket routing store and register it for `scheme`.
    * Returns the store (also useful unregistered, for tests). */
  def register(scheme: String, endpoint: String,
               env: Map[String, String] = sys.env,
               conf: Configuration = new Configuration()): LogStore = {
    val store = routing(scheme, endpoint, env, conf)
    DeltaLog.registerLogStore(scheme, store)
    store
  }

  /** The routing store without registration. */
  def routing(scheme: String, endpoint: String,
              env: Map[String, String] = sys.env,
              conf: Configuration = new Configuration()): LogStore =
    new S3CompatibleLogStore(conf, scheme, endpoint.stripSuffix("/"),
      bucket => clientFor(endpoint, bucket, env))

  /** One signed [[HttpPutClient]] rooted at `<endpoint>/<bucket>`. */
  def clientFor(endpoint: String, bucket: String,
                env: Map[String, String] = sys.env): HttpPutClient = {
    // HALF a credential pair is always a misconfiguration — either missing
    // half must fail here, not surface later as an anonymous (unsigned)
    // client 403ing its first commit with no hint the other half was set
    require(env.contains("AWS_ACCESS_KEY_ID") ||
        !env.contains("AWS_SECRET_ACCESS_KEY"),
      "AWS_SECRET_ACCESS_KEY is set but AWS_ACCESS_KEY_ID is not")
    val signer = env.get("AWS_ACCESS_KEY_ID").map { access =>
      val secret = env.getOrElse("AWS_SECRET_ACCESS_KEY", throw
        new IllegalArgumentException(
          "AWS_ACCESS_KEY_ID is set but AWS_SECRET_ACCESS_KEY is not"))
      new SigV4Signer(access, secret,
        region = env.getOrElse("AWS_REGION", "us-east-1"),
        service = "s3",
        sessionToken = env.get("AWS_SESSION_TOKEN"))
    }
    new HttpPutClient(s"${endpoint.stripSuffix("/")}/$bucket", signer = signer)
  }
}

/** Routes each table path to a per-bucket [[ObjectStoreLogStore]] keyed on
  * the URI authority, re-qualifying listed paths with scheme+bucket so a
  * listing result round-trips back through the router. */
class S3CompatibleLogStore(
    val conf: Configuration,
    scheme: String,
    endpoint: String,
    mkClient: String => ConditionalPutClient) extends LogStore {

  private val delegates = TrieMap[String, ObjectStoreLogStore]()

  private def bucketOf(p: Path): String =
    Option(p.toUri.getAuthority).filter(_.nonEmpty).getOrElse(
      throw new IllegalArgumentException(
        s"S3-compatible store: path $p carries no bucket " +
          s"(expected $scheme://bucket/...)"))

  private def delegate(p: Path): ObjectStoreLogStore =
    delegates.getOrElseUpdate(bucketOf(p),
      new ObjectStoreLogStore(conf, mkClient(bucketOf(p))))

  private def qualify(bucket: String, p: Path): Path =
    new Path(s"$scheme://$bucket${p.toUri.getPath}")

  override def list(dir: Path): Seq[FileStatus] = {
    val bucket = bucketOf(dir)
    delegate(dir).list(dir).map { st =>
      new FileStatus(st.getLen, st.isDirectory, st.getReplication,
        st.getBlockSize, st.getModificationTime, qualify(bucket, st.getPath))
    }
  }

  override def read(path: Path): Seq[String] = delegate(path).read(path)

  override def writeAtomic(path: Path, lines: Iterator[String]): Unit =
    delegate(path).writeAtomic(path, lines)

  override def exists(path: Path): Boolean = delegate(path).exists(path)

  override def delete(path: Path): Boolean = delegate(path).delete(path)
}
