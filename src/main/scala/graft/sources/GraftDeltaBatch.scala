package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{And => CAnd, EqualNullSafe => CEqualNullSafe, EqualTo => CEqualTo, Expression, GreaterThan => CGreaterThan, GreaterThanOrEqual => CGreaterThanOrEqual, In => CIn, IsNotNull => CIsNotNull, IsNull => CIsNull, LessThan => CLessThan, LessThanOrEqual => CLessThanOrEqual, Literal, Not => CNot, Or => COr}
import org.apache.spark.sql.execution.datasources.DataSourceUtils
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

import graft.kernel.{DeltaLog, Snapshot}
import graft.table.{DeltaTable, Scan}

/**
 * Batch half of `format("graft-delta")`: a v1 `BaseRelation` so plain
 * `spark.read.format("graft-delta").load(path)` and
 * `df.write.format("graft-delta").mode(...).partitionBy(...).save(path)`
 * work without touching the library API (python/src/lib.rs exposes the same
 * convenience around open_table/write_deltalake).
 *
 * Reads translate the pushed `sources.Filter`s to Catalyst predicates and
 * run them through the SAME stats/partition file skipping as the library
 * scan (`StatsPruning`), then re-apply them on the pruned parquet read so
 * row-group pushdown still happens; Spark evaluates the originals once more
 * on top (all filters are declared unhandled), which keeps correctness
 * independent of our translation coverage.
 */
class GraftDeltaRelation(
    override val sqlContext: SQLContext,
    snapshot: Snapshot) extends BaseRelation with PrunedFilteredScan {

  private def spark: SparkSession = sqlContext.sparkSession

  override def schema: StructType = snapshot.schema

  // real table size from the log's per-file sizes: BaseRelation's default
  // is spark.sql.defaultSizeInBytes (≈ Long.MaxValue), which makes every
  // graft-delta side of a join "too big to broadcast" — a 2 MB dimension
  // table would shuffle-join instead of broadcast (delta-spark overrides
  // this the same way)
  // cached: on lazy-index snapshots Snapshot.sizeInBytes runs a
  // distributed stats summary, and the planner asks for relation stats
  // repeatedly per query (per plan-node copy) — one job, not one per ask.
  // A truly empty table floors to 1 byte (0 would fall back to the
  // un-broadcastable default — the exact regression this override fixes);
  // per-file sizes are required by the protocol, so 0 means empty, not
  // unknown. Snapshot.sizeInBytes is lazy-index-aware (no driver
  // materialization at planning time).
  override lazy val sizeInBytes: Long = math.max(snapshot.sizeInBytes, 1L)

  // we prune with the filters but never claim them handled
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val preds = filters.flatMap(GraftDeltaRelation.toCatalyst)
    val files = Scan.prunedFiles(snapshot, preds.toSeq, Some(spark))
    val df0 = Scan.readFiles(spark, snapshot, files)
    val df1 = preds.foldLeft(df0)((d, p) => d.filter(GraftSqlBridge.column(p)))
    // single-part attribute resolution: df.col(name) dot-parses, which
    // breaks top-level columns whose (column-mapped) logical names contain
    // dots — same construction the filter path uses
    df1.select(requiredColumns.toSeq.map(c =>
      GraftSqlBridge.column(UnresolvedAttribute(Seq(c)))): _*).rdd
  }
}

object GraftDeltaRelation {

  /** sources.Filter → Catalyst, for the stats pruner. Unsupported shapes
    * return None (they are still evaluated by Spark above the scan). */
  def toCatalyst(f: Filter): Option[Expression] = translate(f, partialAnd = true)

  /** `partialAnd`: whether a half-translated And may prune alone. TRUE only
    * outside any Not — Not(And(l, r)) over just one translated conjunct
    * widens the negation and prunes files the original predicate keeps
    * (Spark's own translateFilter has the same canPartialPushDownConjuncts
    * guard). */
  private def translate(f: Filter, partialAnd: Boolean): Option[Expression] = {
    // DSv2 filter attribute strings are MULTI-PART when nested pushdown is
    // on: `s.x = 1` on a struct arrives as the name "s.x" and a top-level
    // column literally named a.b arrives backtick-quoted as "`a.b`".
    // parseAttributeName handles both ("s.x" -> Seq(s, x); "`a.b`" ->
    // Seq(a.b)); a bare Seq(name) made every nested-field predicate an
    // unresolvable single-part identifier (AnalysisException on SELECT,
    // broken DELETE WHERE)
    def attr(name: String): Expression =
      UnresolvedAttribute(UnresolvedAttribute.parseAttributeName(name))
    f match {
      case EqualTo(a, v) => Some(CEqualTo(attr(a), Literal(v)))
      case EqualNullSafe(a, v) => Some(CEqualNullSafe(attr(a), Literal(v)))
      case GreaterThan(a, v) => Some(CGreaterThan(attr(a), Literal(v)))
      case GreaterThanOrEqual(a, v) => Some(CGreaterThanOrEqual(attr(a), Literal(v)))
      case LessThan(a, v) => Some(CLessThan(attr(a), Literal(v)))
      case LessThanOrEqual(a, v) => Some(CLessThanOrEqual(attr(a), Literal(v)))
      case In(a, vs) => Some(CIn(attr(a), vs.toSeq.map(Literal(_))))
      case IsNull(a) => Some(CIsNull(attr(a)))
      case IsNotNull(a) => Some(CIsNotNull(attr(a)))
      case And(l, r) =>
        (translate(l, partialAnd), translate(r, partialAnd)) match {
          case (Some(cl), Some(cr)) => Some(CAnd(cl, cr))
          case (one, other) if partialAnd => one.orElse(other) // halves prune alone
          case _ => None
        }
      case Or(l, r) =>
        // a partial And inside Or only WIDENS the predicate — safe for
        // pruning — so the flag passes through (it is already false when
        // this Or sits under a Not)
        for { cl <- translate(l, partialAnd); cr <- translate(r, partialAnd) }
          yield COr(cl, cr)
      case Not(c) => translate(c, partialAnd = false).map(CNot) // 3VL-safe negation
      case _ => None
    }
  }

  /** Case-insensitive option lookup — ONE implementation for the read,
    * write, and streaming paths (local copies had already diverged in name
    * only; the streaming sink/source/datasource carried three more). */
  private[graft] def opt(parameters: Map[String, String], key: String): Option[String] =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  /** Resolve the snapshot for read options (versionAsOf / timestampAsOf). */
  def snapshotFor(spark: SparkSession, path: String,
                  parameters: Map[String, String]): Snapshot = {
    def opt(key: String): Option[String] =
      GraftDeltaRelation.opt(parameters, key)
    val log = new DeltaLog(spark, new Path(path))
    (opt("versionAsOf"), opt("timestampAsOf")) match {
      case (Some(v), None) => log.snapshotAt(v.trim.toLong)
      case (None, Some(ts)) => log.snapshotForTimestamp(parseTsMillis(spark, ts))
      case (None, None) => log.snapshot()
      case _ => throw new IllegalArgumentException(
        "specify at most one of versionAsOf / timestampAsOf")
    }
  }

  /** timestampAsOf parsing: interpreted in the SPARK SESSION timezone (not
    * the JVM default, which java.sql.Timestamp.valueOf would use — a
    * session/JVM mismatch silently time-travels to the wrong version), and
    * date-only strings are accepted like delta-spark. */
  private[graft] def parseTsMillis(spark: SparkSession, ts: String): Long = {
    val t = ts.trim
    // explicit zone/offset wins over the session zone ('...Z', '...+02:00'
    // — forms delta-spark accepts via session-timestamp casting; rejecting
    // them breaks existing job configs on migration)
    try return java.time.OffsetDateTime.parse(t.replace(' ', 'T'))
      .toInstant.toEpochMilli
    catch { case _: java.time.format.DateTimeParseException => }
    val local =
      try java.time.LocalDateTime.parse(t.replace(' ', 'T'))
      catch {
        case _: java.time.format.DateTimeParseException =>
          try java.time.LocalDate.parse(t).atStartOfDay()
          catch {
            case _: java.time.format.DateTimeParseException =>
              throw new IllegalArgumentException(
                s"timestampAsOf '$ts' is not 'yyyy-MM-dd[ HH:mm:ss[.S]][+zone]'")
          }
      }
    val zone = java.time.ZoneId.of(spark.sessionState.conf.sessionLocalTimeZone)
    local.atZone(zone).toInstant.toEpochMilli
  }

  def writeAndReturnRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame,
      path: String): BaseRelation = {
    def opt(key: String): Option[String] =
      GraftDeltaRelation.opt(parameters, key)
    val partitionBy = parameters.get(DataSourceUtils.PARTITIONING_COLUMNS_KEY)
      .map(DataSourceUtils.decodePartitioningColumns)
      .getOrElse(Nil)
    val modeStr = mode match {
      case SaveMode.Append => "append"
      case SaveMode.Overwrite => "overwrite"
      case SaveMode.ErrorIfExists => "error"
      case SaveMode.Ignore => "ignore"
    }
    // txnAppId/txnVersion (delta-spark option names): run-level idempotent
    // replay for the writer surface — both or neither, version a Long
    val appTxn: Option[(String, Long)] = (opt("txnAppId"), opt("txnVersion")) match {
      case (Some(app), Some(ver)) =>
        val v = scala.util.Try(ver.trim.toLong).getOrElse(throw
          new IllegalArgumentException(s"txnVersion must be a long, got '$ver'"))
        Some((app, v))
      case (None, None) => None
      case _ => throw new IllegalArgumentException(
        "txnAppId and txnVersion must be set together — one without the " +
          "other cannot identify a replayable transaction")
    }
    val t = DeltaTable.write(sqlContext.sparkSession, data, path,
      mode = modeStr,
      partitionBy = partitionBy,
      replaceWhere = opt("replaceWhere"),
      mergeSchema = opt("mergeSchema").exists(_.equalsIgnoreCase("true")),
      overwriteSchema = opt("overwriteSchema").exists(_.equalsIgnoreCase("true")),
      appTxn = appTxn)
    new GraftDeltaRelation(sqlContext, t.snapshot)
  }
}
