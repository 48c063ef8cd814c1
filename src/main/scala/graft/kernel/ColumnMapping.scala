package graft.kernel

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/**
 * Column mapping (`delta.columnMapping.mode` = name|id) — logical column
 * names in the table schema map to stable physical names
 * (`delta.columnMapping.physicalName`, `delta.columnMapping.id` field
 * metadata) used in data files, partition paths, log partitionValues and
 * stats keys. Port of the reference's `ColumnMappingExec` surface
 * (`crates/core/src/delta_datafusion/column_mapping.rs:1-685`) re-expressed
 * as schema translation at the scan/write boundary: Spark reads files under
 * physical names and projects back to logical; writes rename logical →
 * physical just before the parquet sink.
 */
object ColumnMapping {

  val MODE_KEY = "delta.columnMapping.mode"
  val MAX_ID_KEY = "delta.columnMapping.maxColumnId"
  val PHYS_KEY = "delta.columnMapping.physicalName"
  val ID_KEY = "delta.columnMapping.id"

  // NB: `Metadata` unqualified would resolve to spark.sql.types.Metadata
  // (wildcard-imported above) — the table metadata must be fully qualified
  def mode(meta: graft.kernel.Metadata): String =
    meta.configuration.getOrElse(MODE_KEY, "none").trim.toLowerCase(java.util.Locale.ROOT)

  def enabled(meta: graft.kernel.Metadata): Boolean = mode(meta) != "none"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PHYS_KEY)) f.metadata.getString(PHYS_KEY) else f.name

  /** Top-level logical → physical name map. */
  def nameMap(schema: StructType): Map[String, String] =
    schema.fields.map(f => f.name -> physicalName(f)).toMap

  /** Schema with all (nested) field names replaced by physical names. */
  def physicalSchema(schema: StructType): StructType =
    StructType(schema.fields.map(f =>
      f.copy(name = physicalName(f), dataType = physicalType(f.dataType))))

  private def physicalType(dt: DataType): DataType = dt match {
    case s: StructType => physicalSchema(s)
    case ArrayType(e, n) => ArrayType(physicalType(e), n)
    case MapType(k, v, n) => MapType(physicalType(k), physicalType(v), n)
    case other => other
  }

  /** Rename a logical-schema DataFrame to physical names (for writes).
    * Nested renames ride on struct casts (same shape, new field names).
    * Columns not in `schema` (e.g. `_change_type`) pass through unchanged. */
  def toPhysical(df: DataFrame, schema: StructType): DataFrame = {
    val byName = schema.fields.map(f => f.name -> f).toMap
    // df(name), never functions.col(name): col() PARSES its argument, so a
    // logical name containing '.' or '`' (special-char names are the main
    // use of column mapping) resolves as a nested-field path and every
    // write fails or binds the wrong column — the same trap
    // toPhysicalPredicate's Seq-constructor comment pins
    val cols: Seq[Column] = df.schema.fieldNames.toSeq.map { n =>
      byName.get(n) match {
        case Some(f) =>
          val pt = physicalType(f.dataType)
          val c = if (pt == f.dataType) df(s"`${f.name.replace("`", "``")}`")
                  else df(s"`${f.name.replace("`", "``")}`").cast(pt)
          c.as(physicalName(f))
        case None => df(s"`${n.replace("`", "``")}`")
      }
    }
    df.select(cols: _*)
  }

  /** Rewrite attribute references in a predicate to physical names. */
  def toPhysicalPredicate(pred: Expression, map: Map[String, String]): Expression =
    pred.transform {
      case a: UnresolvedAttribute if a.nameParts.length == 1 =>
        // Seq ctor, NOT the String overload — physical names contain '-'
        // which the identifier parser rejects
        UnresolvedAttribute(Seq(map.getOrElse(a.nameParts.head, a.nameParts.head)))
      case a: AttributeReference =>
        a.withName(map.getOrElse(a.name, a.name))
    }

  /** Assign physical names + ids to every field of a fresh schema (CREATE
    * with mapping enabled). Returns the annotated schema and the max id.
    * `preserveNames = true` is the upgrade path (none -> name on an
    * EXISTING table): physical name := logical name, because the parquet
    * files already on disk carry logical column names in their footers —
    * a fresh UUID physical name would orphan every existing column. New
    * columns added after the upgrade get UUID names as usual. */
  def assignMetadata(schema: StructType, startId: Int = 0,
      preserveNames: Boolean = false): (StructType, Int) = {
    var id = startId
    def annotate(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(annotateField))
      case ArrayType(e, n) => ArrayType(annotate(e), n)
      case MapType(k, v, n) => MapType(annotate(k), annotate(v), n)
      case other => other
    }
    def annotateField(f: StructField): StructField = {
      val b = new MetadataBuilder().withMetadata(f.metadata)
      if (!f.metadata.contains(PHYS_KEY))
        b.putString(PHYS_KEY,
          if (preserveNames) f.name else s"col-${java.util.UUID.randomUUID()}")
      // already-annotated fields keep their id (schema evolution re-runs
      // this over a merged schema); fresh fields get ids above every
      // existing one so uniqueness holds
      if (!f.metadata.contains(ID_KEY)) { id += 1; b.putLong(ID_KEY, id.toLong) }
      else id = math.max(id, f.metadata.getLong(ID_KEY).toInt)
      f.copy(metadata = b.build(), dataType = annotate(f.dataType))
    }
    (StructType(schema.fields.map(annotateField)), id)
  }
}
