package graft.kernel

import org.apache.spark.sql.types.{DataType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/**
 * The Delta Lake transaction-log action model.
 *
 * Field names and shapes follow the Delta protocol as exercised by the
 * reference implementation (delta-rs `crates/core/src/kernel/models/actions.rs`:
 * Add at :918, Remove at :967, AddCDCFile at :1018, Txn at :1042,
 * CommitInfo at :1079, DomainMetadata at :1128, DeletionVectorDescriptor
 * at :883-913). Every commit file `_delta_log/%020d.json` is a sequence of
 * single-line JSON objects, each wrapping exactly one of these actions under
 * its wrapper key (`add`, `remove`, `metaData`, `protocol`, `txn`, `cdc`,
 * `commitInfo`, `domainMetadata`).
 */
sealed trait Action {
  /** Wrapper key used in the commit-file JSON line. */
  def wrapperKey: String
}

case class Format(provider: String = "parquet", options: Map[String, String] = Map.empty)

case class Metadata(
    id: String = java.util.UUID.randomUUID.toString,
    name: Option[String] = None,
    description: Option[String] = None,
    format: Format = Format(),
    schemaString: String = "",
    partitionColumns: Seq[String] = Nil,
    configuration: Map[String, String] = Map.empty,
    createdTime: Option[Long] = None
) extends Action {
  override def wrapperKey: String = "metaData"
  /** Delta `schemaString` uses the same JSON encoding as Spark's DataType. */
  lazy val schema: StructType = DataType.fromJson(schemaString).asInstanceOf[StructType]
  /** Data (non-partition) columns, in schema order. */
  def dataSchema: StructType =
    StructType(schema.filterNot(f => partitionColumns.contains(f.name)))
}

case class Protocol(
    minReaderVersion: Int = 1,
    minWriterVersion: Int = 2,
    readerFeatures: Option[Seq[String]] = None,
    writerFeatures: Option[Seq[String]] = None
) extends Action {
  override def wrapperKey: String = "protocol"
}

/** Roaring-bitmap deletion vector descriptor (actions.rs:883-913). */
case class DeletionVectorDescriptor(
    storageType: String, // "u" relative path, "i" inline, "p" absolute path
    pathOrInlineDv: String,
    offset: Option[Int],
    sizeInBytes: Int,
    cardinality: Long
) {
  /** PROTOCOL.md's deletion-vector uniqueId: the DV part of a file action's
    * reconciliation identity. */
  def uniqueId: String =
    storageType + pathOrInlineDv + offset.map(o => s"@$o").getOrElse("")
}

case class AddFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    modificationTime: Long = 0L,
    dataChange: Boolean = true,
    stats: Option[String] = None,
    tags: Option[Map[String, String]] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None,
    baseRowId: Option[Long] = None,
    defaultRowCommitVersion: Option[Long] = None,
    clusteringProvider: Option[String] = None
) extends Action {
  override def wrapperKey: String = "add"
  /** Log-replay identity (PROTOCOL.md Action Reconciliation): a file action
    * is keyed by (path, deletionVector.uniqueId), NOT path alone — a
    * DV-rewritten file leaves a remove tombstone under the same path as the
    * live add, and path-keyed replay would drop the live file (delta-rs
    * writes exactly that shape into checkpoints: fixture
    * table_with_deletion_logs, checkpoint v20). */
  def reconcileKey: String =
    path + "\u0000" + deletionVector.map(_.uniqueId).getOrElse("")
  def remove(deletionTimestamp: Long, dataChange: Boolean): RemoveFile =
    RemoveFile(path, Some(deletionTimestamp), dataChange,
      extendedFileMetadata = Some(true), partitionValues = Some(partitionValues),
      size = Some(size), deletionVector = deletionVector)
  /** numRecords from the stats JSON, if present. Stats are an ADVISORY
    * free-form field a third-party writer may have malformed (empty
    * string, truncated JSON) — parse failures degrade to None, never
    * crash the consuming operation (same rule as StatsPruning.parseStats). */
  def numRecords: Option[Long] = stats.flatMap { s =>
    scala.util.Try(JsonMethods.parse(s) \ "numRecords").toOption.flatMap {
      case JInt(n) => Some(n.toLong)
      case JLong(n) => Some(n)
      case _ => None
    }
  }
}

case class RemoveFile(
    path: String,
    deletionTimestamp: Option[Long],
    dataChange: Boolean = true,
    extendedFileMetadata: Option[Boolean] = None,
    partitionValues: Option[Map[String, String]] = None,
    size: Option[Long] = None,
    deletionVector: Option[DeletionVectorDescriptor] = None
) extends Action {
  override def wrapperKey: String = "remove"
  /** See [[AddFile.reconcileKey]] — removes cancel only the matching
    * (path, dvId) add. */
  def reconcileKey: String =
    path + "\u0000" + deletionVector.map(_.uniqueId).getOrElse("")
}

/** Change-data file under `_change_data/` (actions.rs:1018). */
case class AddCDCFile(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    size: Long = 0L,
    dataChange: Boolean = false
) extends Action {
  override def wrapperKey: String = "cdc"
}

/** Per-appId monotonic version for idempotent writers (actions.rs:1042). */
case class SetTransaction(appId: String, version: Long, lastUpdated: Option[Long])
    extends Action {
  override def wrapperKey: String = "txn"
}

case class CommitInfo(
    timestamp: Option[Long] = None,
    operation: String = "UNKNOWN",
    operationParameters: Map[String, String] = Map.empty,
    readVersion: Option[Long] = None,
    isolationLevel: Option[String] = None,
    isBlindAppend: Option[Boolean] = None,
    operationMetrics: Map[String, String] = Map.empty,
    engineInfo: Option[String] = Some("graft-spark/0.1.0"),
    txnId: Option[String] = None,
    /** User-supplied provenance string (the protocol's `userMetadata`
      * commitInfo field — reference `kernel/models/actions.rs:1121`,
      * CommitProperties custom metadata). */
    userMetadata: Option[String] = None,
    /** Additional flattened commitInfo keys (reference CommitInfo.info,
      * serde-flattened — actions.rs:1118). String-valued entries only:
      * foreign commits' non-string extras are ignored on read, and writes
      * refuse reserved keys upstream (Transaction filters them). */
    info: Map[String, String] = Map.empty,
    /** The authoritative commit timestamp on tables with the
      * `inCommitTimestamp` writer feature (delta protocol; the reference
      * enumerates the feature in `kernel/models/actions.rs:794` but, like
      * this engine, implements no write path). READ-side parity: when
      * present, this value — not the commit file's mtime, which a log
      * rewrite/copy can change — drives time-travel-by-timestamp, CDF
      * `_commit_timestamp`, and history. This engine never writes it
      * (ProtocolGate refuses ICT tables on the write side: the feature is
      * absent from supportedWriterFeatures, and a non-ICT commit appended
      * to an ICT table would break the spec's monotonicity guarantee). */
    inCommitTimestamp: Option[Long] = None
) extends Action {
  override def wrapperKey: String = "commitInfo"
}

object CommitInfo {
  /** commitInfo keys owned by typed fields — custom metadata must not
    * shadow them (reference normalize_reserved_commit_metadata). */
  val reservedKeys: Set[String] = Set(
    "timestamp", "operation", "operationParameters", "readVersion",
    "isolationLevel", "isBlindAppend", "operationMetrics", "engineInfo",
    "txnId", "userMetadata", "inCommitTimestamp")
}

case class DomainMetadata(domain: String, configuration: String, removed: Boolean = false)
    extends Action {
  override def wrapperKey: String = "domainMetadata"
}

/** V2 checkpoint manifest descriptor (actions.rs:1141). */
case class CheckpointMetadata(version: Long, tags: Option[Map[String, String]] = None)
    extends Action {
  override def wrapperKey: String = "checkpointMetadata"
}

/** V2 checkpoint sidecar reference — add/remove state lives in
  * `_delta_log/_sidecars/<path>` parquet files (actions.rs:1154). */
case class Sidecar(path: String, sizeInBytes: Option[Long] = None,
    modificationTime: Option[Long] = None, tags: Option[Map[String, String]] = None)
    extends Action {
  override def wrapperKey: String = "sidecar"
}

/** Isolation levels, conflict-check semantics per delta-rs
  * `kernel/transaction/conflict_checker.rs` + actions.rs:1178. */
sealed abstract class IsolationLevel(val name: String)
object IsolationLevel {
  case object Serializable extends IsolationLevel("Serializable")
  case object WriteSerializable extends IsolationLevel("WriteSerializable")
  case object SnapshotIsolation extends IsolationLevel("SnapshotIsolation")
  val default: IsolationLevel = WriteSerializable
}

/** JSON (de)serialization for actions — hand-rolled over json4s so that
  * field presence/absence and null partition values match the protocol
  * exactly (delta-rs relies on serde skip_serializing_if semantics).
  */
object ActionCodec {
  private def jstr(s: String): JValue = if (s == null) JNull else JString(s)

  private def jmap(m: Map[String, String]): JValue =
    JObject(m.toList.map { case (k, v) => k -> jstr(v) })

  private def opt(name: String, v: Option[JValue]): List[(String, JValue)] =
    v.map(name -> _).toList

  private def dvToJson(d: DeletionVectorDescriptor): JValue = JObject(
    List(
      "storageType" -> JString(d.storageType),
      "pathOrInlineDv" -> JString(d.pathOrInlineDv)
    ) ++ opt("offset", d.offset.map(JInt(_))) ++ List(
      "sizeInBytes" -> JInt(d.sizeInBytes),
      "cardinality" -> JLong(d.cardinality)
    )
  )

  def toJValue(a: Action): JValue = {
    val body: JValue = a match {
      case m: Metadata => JObject(
        List("id" -> JString(m.id)) ++
        opt("name", m.name.map(JString(_))) ++
        opt("description", m.description.map(JString(_))) ++
        List(
          "format" -> JObject("provider" -> JString(m.format.provider),
                              "options" -> jmap(m.format.options)),
          "schemaString" -> JString(m.schemaString),
          "partitionColumns" -> JArray(m.partitionColumns.toList.map(JString(_))),
          "configuration" -> jmap(m.configuration)
        ) ++ opt("createdTime", m.createdTime.map(JLong(_))))
      case p: Protocol => JObject(
        List("minReaderVersion" -> JInt(p.minReaderVersion),
             "minWriterVersion" -> JInt(p.minWriterVersion)) ++
        opt("readerFeatures", p.readerFeatures.map(f => JArray(f.toList.map(JString(_))))) ++
        opt("writerFeatures", p.writerFeatures.map(f => JArray(f.toList.map(JString(_))))))
      case f: AddFile => JObject(
        List(
          "path" -> JString(f.path),
          "partitionValues" -> jmap(f.partitionValues),
          "size" -> JLong(f.size),
          "modificationTime" -> JLong(f.modificationTime),
          "dataChange" -> JBool(f.dataChange)
        ) ++ opt("stats", f.stats.map(JString(_))) ++
          opt("tags", f.tags.map(jmap)) ++
          opt("deletionVector", f.deletionVector.map(dvToJson)) ++
          opt("baseRowId", f.baseRowId.map(JLong(_))) ++
          opt("defaultRowCommitVersion", f.defaultRowCommitVersion.map(JLong(_))) ++
          opt("clusteringProvider", f.clusteringProvider.map(JString(_))))
      case r: RemoveFile => JObject(
        List("path" -> JString(r.path)) ++
        opt("deletionTimestamp", r.deletionTimestamp.map(JLong(_))) ++
        List("dataChange" -> JBool(r.dataChange)) ++
        opt("extendedFileMetadata", r.extendedFileMetadata.map(JBool(_))) ++
        opt("partitionValues", r.partitionValues.map(jmap)) ++
        opt("size", r.size.map(JLong(_))) ++
        opt("deletionVector", r.deletionVector.map(dvToJson)))
      case c: AddCDCFile => JObject(
        "path" -> JString(c.path),
        "partitionValues" -> jmap(c.partitionValues),
        "size" -> JLong(c.size),
        "dataChange" -> JBool(c.dataChange))
      case t: SetTransaction => JObject(
        List("appId" -> JString(t.appId), "version" -> JLong(t.version)) ++
        opt("lastUpdated", t.lastUpdated.map(JLong(_))))
      case ci: CommitInfo => JObject(
        opt("timestamp", ci.timestamp.map(JLong(_))) ++
        List("operation" -> JString(ci.operation),
             "operationParameters" -> jmap(ci.operationParameters)) ++
        opt("readVersion", ci.readVersion.map(JLong(_))) ++
        opt("isolationLevel", ci.isolationLevel.map(JString(_))) ++
        opt("isBlindAppend", ci.isBlindAppend.map(JBool(_))) ++
        List("operationMetrics" -> jmap(ci.operationMetrics)) ++
        opt("engineInfo", ci.engineInfo.map(JString(_))) ++
        opt("txnId", ci.txnId.map(JString(_))) ++
        opt("userMetadata", ci.userMetadata.map(JString(_))) ++
        opt("inCommitTimestamp", ci.inCommitTimestamp.map(JLong(_))) ++
        // flattened extras, reserved keys defensively excluded; sorted so
        // the serialized form is deterministic
        ci.info.view.filterKeys(!CommitInfo.reservedKeys.contains(_))
          .toList.sortBy(_._1).map { case (k, v) => k -> JString(v) })
      case d: DomainMetadata => JObject(
        "domain" -> JString(d.domain),
        "configuration" -> JString(d.configuration),
        "removed" -> JBool(d.removed))
      case c: CheckpointMetadata => JObject(
        List("version" -> JLong(c.version)) ++ opt("tags", c.tags.map(jmap)))
      case s: Sidecar => JObject(
        List("path" -> JString(s.path)) ++
        opt("sizeInBytes", s.sizeInBytes.map(JLong(_))) ++
        opt("modificationTime", s.modificationTime.map(JLong(_))) ++
        opt("tags", s.tags.map(jmap)))
    }
    JObject(a.wrapperKey -> body)
  }

  def toJson(a: Action): String = JsonMethods.compact(JsonMethods.render(toJValue(a)))

  // ---- parsing ----

  private def str(j: JValue): String = j match {
    case JString(s) => s
    case JNull | JNothing => null
    case other => JsonMethods.compact(JsonMethods.render(other))
  }
  private def strOpt(j: JValue): Option[String] = j match {
    case JString(s) => Some(s); case _ => None
  }
  private def longOpt(j: JValue): Option[Long] = j match {
    case JInt(n) => Some(n.toLong); case JLong(n) => Some(n)
    case JDouble(d) => Some(d.toLong); case JDecimal(d) => Some(d.toLong)
    case _ => None
  }
  private def intOpt(j: JValue): Option[Int] = longOpt(j).map(_.toInt)
  private def boolOpt(j: JValue): Option[Boolean] = j match {
    case JBool(b) => Some(b); case _ => None
  }
  private def smap(j: JValue): Map[String, String] = j match {
    case JObject(fields) => fields.map { case (k, v) => k -> str(v) }.toMap
    case _ => Map.empty
  }
  private def smapOpt(j: JValue): Option[Map[String, String]] = j match {
    case JObject(fields) => Some(fields.map { case (k, v) => k -> str(v) }.toMap)
    case _ => None
  }
  private def strSeq(j: JValue): Seq[String] = j match {
    case JArray(xs) => xs.flatMap(strOpt)
    case _ => Nil
  }

  private def dvFromJson(j: JValue): Option[DeletionVectorDescriptor] = j match {
    case o: JObject => Some(DeletionVectorDescriptor(
      storageType = str(o \ "storageType"),
      pathOrInlineDv = str(o \ "pathOrInlineDv"),
      offset = intOpt(o \ "offset"),
      sizeInBytes = intOpt(o \ "sizeInBytes").getOrElse(0),
      cardinality = longOpt(o \ "cardinality").getOrElse(0L)))
    case _ => None
  }

  /** Parse one commit-file line; unknown wrapper keys yield None. */
  def fromJson(line: String): Option[Action] = {
    if (line == null || line.trim.isEmpty) return None
    val j = JsonMethods.parse(line)
    (j \ "add") match {
      case o: JObject => return Some(AddFile(
        path = str(o \ "path"),
        partitionValues = smap(o \ "partitionValues"),
        size = longOpt(o \ "size").getOrElse(0L),
        modificationTime = longOpt(o \ "modificationTime").getOrElse(0L),
        dataChange = boolOpt(o \ "dataChange").getOrElse(true),
        stats = strOpt(o \ "stats"),
        tags = smapOpt(o \ "tags"),
        deletionVector = dvFromJson(o \ "deletionVector"),
        baseRowId = longOpt(o \ "baseRowId"),
        defaultRowCommitVersion = longOpt(o \ "defaultRowCommitVersion"),
        clusteringProvider = strOpt(o \ "clusteringProvider")))
      case _ =>
    }
    (j \ "remove") match {
      case o: JObject => return Some(RemoveFile(
        path = str(o \ "path"),
        deletionTimestamp = longOpt(o \ "deletionTimestamp"),
        dataChange = boolOpt(o \ "dataChange").getOrElse(true),
        extendedFileMetadata = boolOpt(o \ "extendedFileMetadata"),
        partitionValues = smapOpt(o \ "partitionValues"),
        size = longOpt(o \ "size"),
        deletionVector = dvFromJson(o \ "deletionVector")))
      case _ =>
    }
    (j \ "metaData") match {
      case o: JObject => return Some(Metadata(
        id = str(o \ "id"),
        name = strOpt(o \ "name"),
        description = strOpt(o \ "description"),
        format = Format(
          provider = strOpt(o \ "format" \ "provider").getOrElse("parquet"),
          options = smap(o \ "format" \ "options")),
        schemaString = str(o \ "schemaString"),
        partitionColumns = strSeq(o \ "partitionColumns"),
        configuration = smap(o \ "configuration"),
        createdTime = longOpt(o \ "createdTime")))
      case _ =>
    }
    (j \ "protocol") match {
      case o: JObject => return Some(Protocol(
        minReaderVersion = intOpt(o \ "minReaderVersion").getOrElse(1),
        minWriterVersion = intOpt(o \ "minWriterVersion").getOrElse(2),
        readerFeatures = (o \ "readerFeatures") match {
          case JArray(xs) => Some(xs.flatMap(strOpt)); case _ => None },
        writerFeatures = (o \ "writerFeatures") match {
          case JArray(xs) => Some(xs.flatMap(strOpt)); case _ => None }))
      case _ =>
    }
    (j \ "txn") match {
      case o: JObject => return Some(SetTransaction(
        appId = str(o \ "appId"),
        version = longOpt(o \ "version").getOrElse(0L),
        lastUpdated = longOpt(o \ "lastUpdated")))
      case _ =>
    }
    (j \ "cdc") match {
      case o: JObject => return Some(AddCDCFile(
        path = str(o \ "path"),
        partitionValues = smap(o \ "partitionValues"),
        size = longOpt(o \ "size").getOrElse(0L),
        dataChange = boolOpt(o \ "dataChange").getOrElse(false)))
      case _ =>
    }
    (j \ "commitInfo") match {
      case o: JObject => return Some(CommitInfo(
        timestamp = longOpt(o \ "timestamp"),
        operation = Option(str(o \ "operation")).getOrElse("UNKNOWN"),
        operationParameters = smap(o \ "operationParameters"),
        readVersion = longOpt(o \ "readVersion"),
        isolationLevel = strOpt(o \ "isolationLevel"),
        isBlindAppend = boolOpt(o \ "isBlindAppend"),
        operationMetrics = smap(o \ "operationMetrics"),
        engineInfo = strOpt(o \ "engineInfo"),
        txnId = strOpt(o \ "txnId"),
        userMetadata = strOpt(o \ "userMetadata"),
        inCommitTimestamp = longOpt(o \ "inCommitTimestamp"),
        // flattened provenance extras: leftover STRING-valued keys (other
        // engines may write arbitrary JSON there; non-strings are dropped)
        info = o.obj.collect {
          case (k, JString(v)) if !CommitInfo.reservedKeys.contains(k) => k -> v
        }.toMap))
      case _ =>
    }
    (j \ "domainMetadata") match {
      case o: JObject => return Some(DomainMetadata(
        domain = str(o \ "domain"),
        configuration = str(o \ "configuration"),
        removed = boolOpt(o \ "removed").getOrElse(false)))
      case _ =>
    }
    (j \ "checkpointMetadata") match {
      case o: JObject => return Some(CheckpointMetadata(
        version = longOpt(o \ "version").getOrElse(0L),
        tags = smapOpt(o \ "tags")))
      case _ =>
    }
    (j \ "sidecar") match {
      case o: JObject => return Some(Sidecar(
        path = str(o \ "path"),
        sizeInBytes = longOpt(o \ "sizeInBytes"),
        modificationTime = longOpt(o \ "modificationTime"),
        tags = smapOpt(o \ "tags")))
      case _ =>
    }
    None
  }
}
