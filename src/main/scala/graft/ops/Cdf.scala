package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.kernel._
import graft.table.{DeltaTable, Scan}

/**
 * Change Data Feed read — assemble the change stream between versions as a
 * union of three legs (delta-rs `operations/load_cdf.rs:47`; CDF schema
 * columns `delta_datafusion/cdf/mod.rs:16-42`):
 *
 *  - `cdc` files written by DML under `_change_data/` are read as-is
 *    (they already carry `_change_type`);
 *  - commits without cdc actions synthesize: `add(dataChange=true)` →
 *    `_change_type='insert'`, `remove(dataChange=true)` →
 *    `_change_type='delete'` (reading the still-present removed file);
 *  - every leg gains `_commit_version` / `_commit_timestamp`.
 */
object CdfRead {

  def load(table: DeltaTable, startingVersion: Long, endingVersion: Option[Long]): DataFrame = {
    val spark = table.spark
    val log = table.deltaLog
    val end = endingVersion.getOrElse(log.latestVersion())
    val snapshot = table.snapshot
    // Change data is only well-defined while `delta.enableChangeDataFeed`
    // is set: without it DML rewrites carry no CDC files and synthesizing
    // legs from add/remove actions would misreport rescued rows as changes
    // (delta-rs load_cdf errors outside enabled ranges).
    if (!Dml.cdcEnabled(snapshot))
      throw new IllegalStateException(
        "Change Data Feed is not enabled on this table " +
        "(set delta.enableChangeDataFeed=true before the requested range)")
    val schema = snapshot.schema
    val partCols = snapshot.partitionColumns

    val legs = (startingVersion to end).flatMap { v =>
      val actions = log.readCommit(v)
      val ts = actions.collectFirst { case ci: CommitInfo if ci.timestamp.isDefined =>
        ci.timestamp.get }.getOrElse(0L)
      val cdcFiles = actions.collect { case c: AddCDCFile => c }
      val leg: Option[DataFrame] =
        if (cdcFiles.nonEmpty) {
          Some(readCdcFiles(spark, table, schema, partCols, cdcFiles))
        } else {
          val adds = actions.collect { case a: AddFile if a.dataChange => a }
          val removes = actions.collect { case r: RemoveFile if r.dataChange => r }
          val insertLeg =
            if (adds.isEmpty) None
            else Some(Scan.readFiles(spark, snapshot, adds)
              .withColumn(Dml.CDC_COL, lit("insert")))
          val deleteLeg =
            if (removes.isEmpty) None
            else Some(readRemovedFiles(spark, table, schema, partCols, removes)
              .withColumn(Dml.CDC_COL, lit("delete")))
          (insertLeg, deleteLeg) match {
            case (Some(i), Some(d)) => Some(i.unionByName(d))
            case (i, d) => i.orElse(d)
          }
        }
      leg.map(_.withColumn("_commit_version", lit(v))
        .withColumn("_commit_timestamp", (lit(ts) / 1000).cast("timestamp")))
    }

    if (legs.isEmpty) {
      val outSchema = StructType(schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(Dml.CDC_COL, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("_commit_version", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("_commit_timestamp", org.apache.spark.sql.types.TimestampType)))
      Scan.emptyDf(spark, outSchema)
    } else legs.reduce(_.unionByName(_))
  }

  private def readCdcFiles(
      spark: SparkSession,
      table: DeltaTable,
      schema: StructType,
      partCols: Seq[String],
      files: Seq[AddCDCFile]): DataFrame = {
    val base = new org.apache.hadoop.fs.Path(table.tablePath, Dml.CDC_DIR)
    val paths = files.map(f => new org.apache.hadoop.fs.Path(table.tablePath, f.path).toString)
    val dataSchema = StructType(
      schema.filterNot(f => partCols.contains(f.name)) :+
        org.apache.spark.sql.types.StructField(Dml.CDC_COL, org.apache.spark.sql.types.StringType))
    val raw =
      if (partCols.isEmpty) spark.read.schema(dataSchema).parquet(paths: _*)
      else spark.read.option("basePath", base.toString).schema(dataSchema).parquet(paths: _*)
    val cols = schema.map { f =>
      if (partCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name) else col(f.name)
    } :+ col(Dml.CDC_COL)
    raw.select(cols: _*)
  }

  private def readRemovedFiles(
      spark: SparkSession,
      table: DeltaTable,
      schema: StructType,
      partCols: Seq[String],
      removes: Seq[RemoveFile]): DataFrame = {
    val paths = removes.map(r => new org.apache.hadoop.fs.Path(table.tablePath, r.path).toString)
    val dataSchema = StructType(schema.filterNot(f => partCols.contains(f.name)))
    val raw =
      if (partCols.isEmpty) spark.read.schema(dataSchema).parquet(paths: _*)
      else spark.read.option("basePath", table.tablePath.toString)
        .schema(dataSchema).parquet(paths: _*)
    val cols = schema.map { f =>
      if (partCols.contains(f.name)) col(f.name).cast(f.dataType).as(f.name) else col(f.name)
    }
    raw.select(cols: _*)
  }
}
