package graft.kernel

class DeltaProtocolException(msg: String) extends RuntimeException(msg)

/**
 * Reader/writer protocol gate — the Spark-side port of delta-rs
 * `ProtocolChecker` (`crates/core/src/kernel/transaction/protocol.rs`,
 * `can_read_from` :187). Without this gate a table written by another engine
 * with deletion vectors or column mapping would *silently return wrong
 * rows*; refusing loudly is a correctness feature, not a limitation.
 *
 * Support matrix (what this engine actually implements):
 *  - reader v1: plain tables — full support;
 *  - reader v2: column mapping (name/id) handled by physical-name
 *    translation at the scan/write boundary ([[ColumnMapping]]);
 *  - reader v3: allowed iff every `readerFeatures` entry is in
 *    [[supportedReaderFeatures]]; deletionVectors are decoded and applied
 *    as row-index masks at scan time ([[graft.kernel.DeletionVectors]]);
 *  - writer v≤4: invariants / CHECK constraints / CDF / generated columns
 *    are all enforced by our write path;
 *  - writer v5/6 (column mapping, identity columns): column mapping
 *    supported; identity-column metadata is tolerated (not generated);
 *  - writer v7: allowed iff every `writerFeatures` entry is in
 *    [[supportedWriterFeatures]].
 */
object ProtocolGate {

  // variant: Spark 4's native VariantType IS the engine the feature was
  // designed around — schemaString "variant" parses via DataType.fromJson
  // and the vectorized parquet reader decodes both the unshredded
  // (value/metadata) and shredded (typed_value) physical layouts, so the
  // scan path needs no graft-side work beyond not refusing the feature.
  // Stats pruning fails open on variant columns (no min/max collected).
  val supportedReaderFeatures: Set[String] =
    Set("timestampNtz", "deletionVectors", "vacuumProtocolCheck",
      "columnMapping", "v2Checkpoint",
      "variantType", "variantType-preview", "variantShredding-preview")

  // v2Checkpoint on the writer side too: with delta.checkpointPolicy=v2 the
  // checkpoint writer emits the uuid-manifest + _sidecars layout
  // (Checkpoints.writeV2Checkpoint), satisfying the spec requirement that
  // writers on such tables produce v2 checkpoints.
  // identityColumns is deliberately NOT here: this engine never generates
  // identity values or maintains delta.identity.highWaterMark, and a write
  // that ignores the watermark hands the next compliant writer duplicate
  // identity values. The reference takes the same position
  // (kernel/transaction/protocol.rs:325 — IdentityColumns commented out of
  // the supported writer set). Writer v6 (which *implies* the feature) is
  // refused in checkWrite for the same reason.
  // inCommitTimestamp is deliberately NOT here either: this engine never
  // stamps CommitInfo.inCommitTimestamp, and appending a non-ICT commit to
  // an ICT table breaks the spec's monotonic-timestamp guarantee for every
  // compliant reader resolving by timestamp. The reference enumerates the
  // feature (kernel/models/actions.rs:794) but implements no ICT write
  // path either — parity-by-refusal. READS honor recorded ICT values:
  // time travel, CDF _commit_timestamp, and history resolve
  // CommitInfo.inCommitTimestamp first (DeltaLog.resolvedCommitTimestamps).
  val supportedWriterFeatures: Set[String] =
    Set("appendOnly", "invariants", "checkConstraints", "changeDataFeed",
      "generatedColumns", "timestampNtz", "domainMetadata",
      "vacuumProtocolCheck", "deletionVectors", "columnMapping",
      "v2Checkpoint", "variantType", "variantType-preview")

  private def columnMappingMode(m: Metadata): String =
    m.configuration.getOrElse("delta.columnMapping.mode", "none").trim.toLowerCase(java.util.Locale.ROOT)

  /** Gate every snapshot materialization (read side). */
  def checkRead(protocol: Protocol, metadata: Metadata): Unit = {
    if (protocol.minReaderVersion > 3)
      throw new DeltaProtocolException(
        s"Unsupported minReaderVersion ${protocol.minReaderVersion} (max supported: 3)")
    if (protocol.minReaderVersion == 3) {
      val missing = protocol.readerFeatures.getOrElse(Nil).toSet -- supportedReaderFeatures
      if (missing.nonEmpty)
        throw new DeltaProtocolException(
          s"Unsupported reader features: ${missing.mkString(", ")} " +
          s"(supported: ${supportedReaderFeatures.mkString(", ")})")
    }
    columnMappingMode(metadata) match {
      case "none" | "name" | "id" => // name/id: physical-name translation at scan/write
      case other => throw new DeltaProtocolException(
        s"Unknown column mapping mode '$other' — reading would misinterpret every column")
    }
  }

  /** Gate every commit (write side). */
  def checkWrite(protocol: Protocol, metadata: Metadata): Unit = {
    checkRead(protocol, metadata)
    if (protocol.minWriterVersion > 7)
      throw new DeltaProtocolException(
        s"Unsupported minWriterVersion ${protocol.minWriterVersion} (max supported: 7)")
    if (protocol.minWriterVersion == 6)
      throw new DeltaProtocolException(
        "minWriterVersion 6 implies identityColumns, which this engine cannot " +
        "honor (no identity generation / high-water-mark maintenance) — " +
        "writing would corrupt identity sequences for other writers")
    if (protocol.minWriterVersion == 7) {
      val missing = protocol.writerFeatures.getOrElse(Nil).toSet -- supportedWriterFeatures
      if (missing.nonEmpty)
        throw new DeltaProtocolException(
          s"Unsupported writer features: ${missing.mkString(", ")} " +
          s"(supported: ${supportedWriterFeatures.mkString(", ")})")
    }
  }

  /** Protocol action required before the first deletion-vector write, if
    * the current protocol doesn't already carry the feature. Upgrading a
    * legacy protocol to v7 enumerates the implied legacy writer features. */
  def upgradeForDv(p: Protocol): Option[Protocol] = {
    val okReader = p.minReaderVersion >= 3 &&
      p.readerFeatures.exists(_.contains("deletionVectors"))
    val okWriter = p.minWriterVersion >= 7 &&
      p.writerFeatures.exists(_.contains("deletionVectors"))
    if (okReader && okWriter) None
    else Some(Protocol(3, 7,
      readerFeatures = Some(
        (impliedReaderFeatures(p) :+ "deletionVectors").distinct),
      writerFeatures = Some(
        (impliedWriterFeatures(p) :+ "deletionVectors").distinct)))
  }

  /** Protocol carrying the columnMapping capability, for the none -> name
    * upgrade (ALTER TABLE SET TBLPROPERTIES). Legacy protocols bump to the
    * spec minimum (2,5); feature-based protocols enumerate the feature on
    * both sides (plus every implied legacy feature — an upgrade that fails
    * to enumerate strips capability signals, see impliedWriterFeatures). */
  def upgradeForColumnMapping(p: Protocol): Option[Protocol] = {
    val readerOk =
      if (p.minReaderVersion >= 3) p.readerFeatures.exists(_.contains("columnMapping"))
      else p.minReaderVersion >= 2
    val writerOk =
      if (p.minWriterVersion >= 7) p.writerFeatures.exists(_.contains("columnMapping"))
      else p.minWriterVersion >= 5
    if (readerOk && writerOk) None
    else if (p.minReaderVersion < 3 && p.minWriterVersion < 7)
      Some(Protocol(math.max(2, p.minReaderVersion), math.max(5, p.minWriterVersion)))
    else Some(Protocol(3, 7,
      readerFeatures = Some((impliedReaderFeatures(p) :+ "columnMapping").distinct),
      writerFeatures = Some((impliedWriterFeatures(p) :+ "columnMapping").distinct)))
  }

  /** Reader features a pre-v3 protocol implies — reader v2 IS column
    * mapping, and an upgrade to v3 that fails to enumerate it strips the
    * capability signal from a table whose metadata still carries
    * delta.columnMapping.mode. */
  def impliedReaderFeatures(p: Protocol): Seq[String] =
    if (p.minReaderVersion >= 3) p.readerFeatures.getOrElse(Nil)
    else if (p.minReaderVersion == 2) Seq("columnMapping")
    else Nil

  /** Writer features a pre-v7 protocol version implies — upgrading to v7
    * MUST enumerate them (spec: feature lists replace version implication,
    * so an unenumerated upgrade silently drops capabilities for readers). */
  def impliedWriterFeatures(p: Protocol): Seq[String] = p.minWriterVersion match {
    case v if v >= 7 => p.writerFeatures.getOrElse(Nil)
    case v =>
      (if (v >= 2) Seq("appendOnly", "invariants") else Nil) ++
        (if (v >= 3) Seq("checkConstraints") else Nil) ++
        (if (v >= 4) Seq("changeDataFeed", "generatedColumns") else Nil) ++
        (if (v >= 5) Seq("columnMapping") else Nil) ++
        (if (v >= 6) Seq("identityColumns") else Nil)
  }

  private def containsType(dt: org.apache.spark.sql.types.DataType)(
      pred: org.apache.spark.sql.types.DataType => Boolean): Boolean = {
    import org.apache.spark.sql.types._
    def rec(d: DataType): Boolean = d match {
      case d if pred(d) => true
      case s: StructType => s.fields.exists(f => rec(f.dataType))
      case a: ArrayType => rec(a.elementType)
      case m: MapType => rec(m.keyType) || rec(m.valueType)
      case _ => false
    }
    rec(dt)
  }

  /** Does a schema contain VARIANT anywhere (top level or nested)? */
  def containsVariant(dt: org.apache.spark.sql.types.DataType): Boolean =
    containsType(dt)(_.isInstanceOf[org.apache.spark.sql.types.VariantType])

  /** Protocol features a schema's TYPES demand (spec: both are
    * reader+writer features requiring 3/7): variant and timestampNtz. */
  def requiredSchemaFeatures(dt: org.apache.spark.sql.types.DataType): Seq[String] = {
    (if (containsVariant(dt)) Seq("variantType") else Nil) ++
      (if (containsType(dt)(_ == org.apache.spark.sql.types.TimestampNTZType))
        Seq("timestampNtz") else Nil)
  }

  /** Protocol action required before committing `schema`, if its types
    * demand features the protocol doesn't carry. The preview variant name
    * satisfies the variantType requirement. Every path that can change a
    * table's schema (CREATE, write mergeSchema/overwriteSchema, MERGE
    * evolution, ADD COLUMNS) must consult this. */
  def upgradeForSchema(
      schema: org.apache.spark.sql.types.StructType,
      p: Protocol): Option[Protocol] = {
    val needed = requiredSchemaFeatures(schema)
    if (needed.isEmpty) return None
    def has(fs: Option[Seq[String]], f: String) = fs.exists(_.exists(x =>
      x == f || (f == "variantType" && x == "variantType-preview")))
    val ok = needed.forall(f =>
      p.minReaderVersion >= 3 && has(p.readerFeatures, f) &&
        p.minWriterVersion >= 7 && has(p.writerFeatures, f))
    if (ok) None
    else Some(Protocol(3, 7,
      readerFeatures = Some((impliedReaderFeatures(p) ++ needed).distinct),
      writerFeatures = Some((impliedWriterFeatures(p) ++ needed).distinct)))
  }

  /** delta.appendOnly enforcement (writer feature / table property). */
  def checkAppendOnly(snapshot: Snapshot, op: String): Unit =
    if (snapshot.confBool("delta.appendOnly"))
      throw new DeltaProtocolException(
        s"Table is append-only (delta.appendOnly=true): $op is not allowed")
}
