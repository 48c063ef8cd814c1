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
  // identityColumns: tolerated, not generated — the same posture as writer
  // v6 tables (which this gate already admits without feature checks) and
  // as the reference (schema.rs:270-273 tolerates identity metadata). A
  // v6→v7 upgrade MUST enumerate it (impliedWriterFeatures), so it must be
  // accepted here or our own upgraded tables would refuse further writes.
  val supportedWriterFeatures: Set[String] =
    Set("appendOnly", "invariants", "checkConstraints", "changeDataFeed",
      "generatedColumns", "timestampNtz", "domainMetadata",
      "vacuumProtocolCheck", "deletionVectors", "columnMapping",
      "v2Checkpoint", "variantType", "variantType-preview",
      "identityColumns")

  private def columnMappingMode(m: Metadata): String =
    m.configuration.getOrElse("delta.columnMapping.mode", "none").trim.toLowerCase

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

  /** Does a schema contain VARIANT anywhere (top level or nested)? */
  def containsVariant(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: VariantType => true
      case s: StructType => s.fields.exists(f => containsVariant(f.dataType))
      case a: ArrayType => containsVariant(a.elementType)
      case m: MapType => containsVariant(m.keyType) || containsVariant(m.valueType)
      case _ => false
    }
  }

  /** Protocol action required before committing a schema that contains
    * VARIANT (spec: variantType is reader+writer feature on 3/7), if not
    * already present. Accepts the preview feature name as satisfying. */
  def upgradeForVariant(p: Protocol): Option[Protocol] = {
    def has(fs: Option[Seq[String]]) =
      fs.exists(_.exists(f => f == "variantType" || f == "variantType-preview"))
    val ok = p.minReaderVersion >= 3 && has(p.readerFeatures) &&
      p.minWriterVersion >= 7 && has(p.writerFeatures)
    if (ok) None
    else Some(Protocol(3, 7,
      readerFeatures = Some(
        (impliedReaderFeatures(p) :+ "variantType").distinct),
      writerFeatures = Some(
        (impliedWriterFeatures(p) :+ "variantType").distinct)))
  }

  /** delta.appendOnly enforcement (writer feature / table property). */
  def checkAppendOnly(snapshot: Snapshot, op: String): Unit =
    if (snapshot.confBool("delta.appendOnly"))
      throw new DeltaProtocolException(
        s"Table is append-only (delta.appendOnly=true): $op is not allowed")
}
