package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.{Scan => V2Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns, V1Scan}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsOverwrite, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.sources.{AlwaysFalse, AlwaysTrue, BaseRelation, Filter, InsertableRelation, TableScan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.kernel.Snapshot
import graft.sources.GraftDeltaRelation
import graft.table.DeltaTable

/**
 * DataSourceV2 `Table` over a graft Delta table, used by [[GraftCatalog]]
 * so the full SQL surface (`SELECT`/`INSERT INTO`/`INSERT OVERWRITE`/
 * `DELETE FROM`/`TRUNCATE`/CTAS/time travel) works through `spark.sql`
 * with no library API calls.
 *
 * Reads and writes bridge to the v1 relation code path via the public
 * `V1Scan`/`V1Write` connector interfaces (the same bridge Spark's own
 * JDBC v2 source uses): pruning, stats skipping, DV masks and the commit
 * protocol all run through the exact code the `format("graft-delta")`
 * path already exercises — one implementation, two front doors.
 */
class GraftTable(
    spark: SparkSession,
    identName: String,
    val path: Path,
    pinned: Option[Snapshot] = None,
    preloaded: Option[DeltaTable] = None)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete {

  // `preloaded`: the catalog's snapshot cache hands back the DeltaTable it
  // already validated against the current log listing — re-resolving here
  // would pay the full log replay the cache exists to skip.
  private[catalog] lazy val delta: DeltaTable =
    preloaded.getOrElse(DeltaTable.forPath(spark, path.toString))

  private def snapshot: Snapshot = pinned.getOrElse(delta.snapshot)

  override def name(): String = identName

  override def schema(): StructType = snapshot.schema

  override def partitioning(): Array[Transform] =
    snapshot.partitionColumns.map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] = {
    val m = snapshot.metadata
    (m.configuration ++
      m.description.map(TableCatalog.PROP_COMMENT -> _) +
      (TableCatalog.PROP_PROVIDER -> "graft-delta") +
      ("location" -> path.toString)).asJava
  }

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE,
      TableCapability.OVERWRITE_BY_FILTER)

  // ---- read: DSv2 pushdown → v1 pruned scan ----

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(snapshot)

  private class GraftScanBuilder(snap: Snapshot) extends ScanBuilder
      with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
    private var required: StructType = snap.schema
    private var pushed: Array[Filter] = Array.empty

    /** All filters are kept as post-scan residuals (we prune with them but
      * never claim exact handling — same contract as GraftDeltaRelation). */
    override def pushFilters(filters: Array[Filter]): Array[Filter] = {
      pushed = filters
      filters
    }
    override def pushedFilters(): Array[Filter] = pushed

    override def pruneColumns(requiredSchema: StructType): Unit = {
      // the V1 bridge reads whole TOP-LEVEL columns: keep the requested
      // top-level set but restore each column's full table type — Spark's
      // nested schema pruning may request s:struct<y> only, and declaring
      // that schema over a scan that produces the full struct fails row
      // encoding (EXPRESSION_ENCODING_FAILED) on every struct-field query
      required = StructType(
        requiredSchema.fieldNames.flatMap(n => snap.schema.find(_.name == n)))
    }

    override def build(): V2Scan = new V1Scan {
      override def readSchema(): StructType = required
      override def toV1TableScan[T <: BaseRelation with TableScan](
          context: SQLContext): T =
        new PrunedRelation(context, snap, required, pushed).asInstanceOf[T]
    }
  }

  private class PrunedRelation(
      ctx: SQLContext,
      snap: Snapshot,
      required: StructType,
      filters: Array[Filter]) extends BaseRelation with TableScan {
    private val inner = new GraftDeltaRelation(ctx, snap)
    override def sqlContext: SQLContext = ctx
    override val schema: StructType = required
    override def buildScan(): RDD[Row] =
      inner.buildScan(required.fieldNames, filters)
  }

  // ---- write: INSERT INTO (append) / INSERT OVERWRITE (replaceWhere) ----

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GraftWriteBuilder

  private class GraftWriteBuilder extends WriteBuilder with SupportsOverwrite {
    private var mode: String = "append"
    private var replaceWhere: Option[String] = None

    override def overwrite(filters: Array[Filter]): WriteBuilder = {
      mode = "overwrite"
      replaceWhere = filters match {
        case Array() | Array(AlwaysTrue()) => None
        case fs => Some(GraftTable.filtersToSql(fs).getOrElse(
          throw new UnsupportedOperationException(
            s"Cannot translate overwrite filters ${fs.mkString(", ")}")))
      }
      this
    }

    override def truncate(): WriteBuilder = {
      mode = "overwrite"
      replaceWhere = None
      this
    }

    override def build(): Write = new V1Write {
      override def toInsertableRelation: InsertableRelation =
        (data: DataFrame, _: Boolean) => {
          DeltaTable.write(spark, data, path.toString, mode = mode,
            replaceWhere = replaceWhere)
          ()
        }
    }
  }

  // ---- DELETE FROM / TRUNCATE TABLE ----

  override def canDeleteWhere(filters: Array[Filter]): Boolean =
    GraftTable.filtersToSql(filters).isDefined || filters.isEmpty

  override def deleteWhere(filters: Array[Filter]): Unit = {
    val pred = filters match {
      case Array() | Array(AlwaysTrue()) => None
      case Array(AlwaysFalse()) => return
      case fs => Some(GraftTable.filtersToSql(fs).getOrElse(
        throw new UnsupportedOperationException(
          s"Cannot translate delete filters ${fs.mkString(", ")}")))
    }
    delta.delete(pred)
  }
}

object GraftTable {

  /** v1 `Filter` conjunction → SQL predicate text, via the shared leaf
    * translation (Expression.sql renders standard literals: quoted
    * strings, DATE '...', TIMESTAMP '...'). STRICT, unlike the pruning
    * translator: `GraftDeltaRelation.toCatalyst` may drop an
    * untranslatable half of an And (safe when only skipping files, but
    * predicate-widening — and therefore data-destroying — for DELETE /
    * replaceWhere), so connectives are handled here and any
    * untranslatable node fails the whole conversion. */
  def filtersToSql(filters: Array[Filter]): Option[String] = {
    import org.apache.spark.sql.sources.{And => FAnd, Not => FNot, Or => FOr}
    def strict(f: Filter): Option[String] = f match {
      case AlwaysTrue() => Some("true")
      case AlwaysFalse() => Some("false")
      case FAnd(l, r) => for { a <- strict(l); b <- strict(r) } yield s"($a AND $b)"
      case FOr(l, r) => for { a <- strict(l); b <- strict(r) } yield s"($a OR $b)"
      case FNot(c) => strict(c).map(p => s"(NOT $p)")
      case leaf => GraftDeltaRelation.toCatalyst(leaf).map(_.sql)
    }
    val parts = filters.toSeq.map(strict)
    if (parts.exists(_.isEmpty) || parts.isEmpty) None
    else Some(parts.flatten.map(p => s"($p)").mkString(" AND "))
  }
}
