package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{ConstraintViolationException, MergeDuplicateMatchException}
import graft.table.DeltaTable

/** Regressions for the high-effort ops review pass. */
class OpsFixesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-opsfixes")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_of_").toString + "/t"

  test("UPDATE and MERGE enforce CHECK constraints on rewritten rows") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, 1.0), (2L, 2.0)).toDF("id", "value"), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.addConstraint("small", "value < 3")

    intercept[ConstraintViolationException] {
      t.update(Map("value" -> lit(10.0)), Some("id = 1"))
    }
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter("value >= 3").count() == 0, "violating UPDATE must not commit")

    intercept[ConstraintViolationException] {
      t.merge(Seq((9L, 99.0)).toDF("id", "value"), "target.id = source.id")
        .whenNotMatchedInsertAll().execute()
    }
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 2)
    // compliant DML still works
    t.update(Map("value" -> lit(2.5)), Some("id = 1"))
    assert(DeltaTable.forPath(spark, dir).toDF
      .filter("id = 1").head().getDouble(1) == 2.5)
  }

  test("MERGE early filter survives backslash keys (no literal round-trip)") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      Seq(("C:\\new", 1L), ("plain", 2L)).toDF("k", "v").repartition(2), dir)
    val t = DeltaTable.forPath(spark, dir)
    val m = t.merge(Seq(("C:\\new", 100L)).toDF("k", "v"), "target.k = source.k")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    // the backslash key must be MATCHED (updated), not duplicated
    assert(m("num_target_rows_updated") == "1", m.toString)
    assert(m("num_target_rows_inserted") == "0", m.toString)
    val rows = DeltaTable.forPath(spark, dir).toDF.as[(String, Long)].collect().toMap
    assert(rows("C:\\new") == 100L)
    assert(rows.size == 2)
  }

  test("insert-only MERGE tolerates duplicate matches; modifying MERGE does not") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    // two source rows match target id=1; insert-only → dedup-append pattern
    val src = Seq((1L, "x"), (1L, "y"), (3L, "c")).toDF("id", "v")
    val m = t.merge(src, "target.id = source.id")
      .whenNotMatchedInsertAll().execute()
    assert(m("num_target_rows_inserted") == "1")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3)
    // with a matched-modify clause the same duplicates are an error
    intercept[MergeDuplicateMatchException] {
      t.merge(Seq((1L, "x"), (1L, "y")).toDF("id", "v"), "target.id = source.id")
        .whenMatchedUpdateAll().execute()
    }
  }

  test("VACUUM protects DV blobs referenced by retained tombstones") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      spark.range(1000).select(col("id"), (col("id") % 5).as("m")).coalesce(1),
      dir, configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id % 5 = 0"))                 // DV mask + blob
    val blobRel = {
      val f = t.refresh().allFiles.find(_.deletionVector.isDefined).get
      val p = graft.kernel.DeletionVectors.dvPath(t.tablePath, f.deletionVector.get).get
      t.tablePath.toUri.relativize(p.toUri).getPath
    }
    t.delete(None)                               // full delete: tombstones carry the DV
    // age every file so the mtime cutoff would admit them as candidates
    val fs = t.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    def age(p: Path): Unit = fs.listStatus(p).foreach { st =>
      if (st.isDirectory) age(st.getPath)
      else if (!st.getPath.toString.contains("_delta_log")) fs.setTimes(st.getPath, old, -1)
    }
    age(t.tablePath)
    val candidates = t.vacuum(retentionHours = 24, dryRun = true, enforceRetention = false)
    // tombstones are FRESH (deleted just now) → both the data file and its
    // DV blob stay protected even though their mtimes are past the cutoff
    assert(!candidates.contains(blobRel),
      s"DV blob $blobRel of a retained tombstone must not be vacuumed")
  }

  test("RESTORE refuses vacuumed target files unless ignoreMissingFiles") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)          // v0
    DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), dir, "overwrite") // v1
    val t = DeltaTable.forPath(spark, dir)
    // physically delete v0's file (simulating vacuum past retention)
    val v0file = t.deltaLog.snapshotAt(0).allFiles.head
    val fs = t.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(t.snapshot.absolutePath(v0file.path), false))
    val e = intercept[IllegalStateException](t.restore(0))
    assert(e.getMessage.contains("no longer exist"))
    // escape hatch restores what remains
    t.restore(0, ignoreMissingFiles = true)
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 0)
  }

  test("full-table DELETE writes CDC; feed stays readable across DV masks") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      spark.range(100).select(col("id"), (col("id") % 5).as("m")).coalesce(1),
      dir, configuration = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id < 20"))    // v1: DV mask + cdc files
    t.delete(None)               // v2: full delete of a DV-masked file
    val cdf = t.loadCdf(0)
    // v2 must report exactly the 80 surviving rows as deletes
    assert(cdf.filter("_commit_version = 2 AND _change_type = 'delete'").count() == 80)
    assert(cdf.filter("_commit_version = 1 AND _change_type = 'delete'").count() == 20)
  }

  test("CDF read refuses ranges predating enablement") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)          // v0, no CDF
    val t = DeltaTable.forPath(spark, dir)
    t.update(Map("v" -> lit("b")), Some("id = 1"))                        // v1, no CDF
    t.setProperties(Map("delta.enableChangeDataFeed" -> "true"))          // v2
    DeltaTable.write(spark, Seq((2L, "c")).toDF("id", "v"), dir, "append") // v3
    val e = intercept[IllegalStateException](t.loadCdf(0).collect())
    assert(e.getMessage.contains("range"))
    // from the enablement version on, the feed works
    assert(DeltaTable.forPath(spark, dir).loadCdf(3)
      .filter("_change_type = 'insert'").count() == 1)
  }

  test("symlink manifest refused while deletion vectors are present") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, spark.range(100).toDF("id").coalesce(1),
      dir, configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id < 10"))
    val e = intercept[IllegalArgumentException](t.generateSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"))
  }

  // ---- round-5 ops review regressions ----

  test("mergeSchema under column mapping annotates the evolved field") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.columnMapping.mode" -> "name"))
    DeltaTable.write(spark, Seq((2L, "b", 9.5)).toDF("id", "v", "score"), dir,
      mode = "append", mergeSchema = true)
    val t = DeltaTable.forPath(spark, dir)
    val f = t.schema.fields.find(_.name == "score").get
    assert(f.metadata.contains("delta.columnMapping.physicalName"),
      "evolved field committed without a physical name — mapping-aware " +
        "readers reject the table and a later annotation orphans the data")
    assert(f.metadata.contains("delta.columnMapping.id"))
    assert(t.metadata.configuration("delta.columnMapping.maxColumnId").toInt >= 3)
    val rows = t.toDF.select("id", "score").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(rows == Map(1L -> None, 2L -> Some(9.5)),
      s"evolved column values lost under mapping: $rows")
  }

  test("addFeature v3 upgrade enumerates implied reader features") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.columnMapping.mode" -> "name")) // reader v2
    val t = DeltaTable.forPath(spark, dir)
    t.addFeature("deletionVectors")
    val p = DeltaTable.forPath(spark, dir).protocol
    assert(p.minReaderVersion == 3)
    val rf = p.readerFeatures.getOrElse(Nil)
    assert(rf.contains("deletionVectors"), rf.toString)
    assert(rf.contains("columnMapping"),
      s"v2-implied columnMapping dropped from the v3 feature list: $rf")
  }

  test("replaceWhere with a non-overwrite mode is refused") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val e = intercept[IllegalArgumentException] {
      DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), dir,
        mode = "append", replaceWhere = Some("v = 'a'"))
    }
    assert(e.getMessage.contains("replaceWhere requires mode=overwrite"))
  }

  test("an unknown save mode never takes the CREATE path") {
    import spark.implicits._
    val dir = tmpDir()
    intercept[IllegalArgumentException] {
      DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir, mode = "overwrit")
    }
    assert(!new java.io.File(dir, "_delta_log").exists(),
      "a typo'd mode silently created a table")
  }

  test("overwrite of a DV-masked table keeps the change feed readable") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dir, configuration = Map(
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    val t0 = DeltaTable.forPath(spark, dir)
    t0.delete(Some("id < 5")) // v1: DV on the file
    DeltaTable.write(spark, Seq((100L, "new")).toDF("id", "v"), dir,
      mode = "overwrite") // v2: removes the DV-masked file
    val t = DeltaTable.forPath(spark, dir)
    // the feed must span the overwrite commit (previously threw on the
    // DV-masked remove) and report the LIVE rows deleted, not the masked ones
    val feed = t.loadCdf(2, Some(2)).groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(feed == Map("delete" -> 15L, "insert" -> 1L), s"got $feed")
  }

  test("CDF range crossing a disable window is refused") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.setProperties(Map("delta.enableChangeDataFeed" -> "false")) // v1
    DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), dir, mode = "append") // v2
    t.setProperties(Map("delta.enableChangeDataFeed" -> "true")) // v3
    val e = intercept[IllegalStateException](
      DeltaTable.forPath(spark, dir).loadCdf(0, Some(3)).collect())
    assert(e.getMessage.contains("disabled"), e.getMessage)
  }

  test("symlink manifest groups by partition under column mapping") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      Seq((1L, "x", "p1"), (2L, "y", "p2"), (3L, "z", "p1")).toDF("id", "v", "part"),
      dir, partitionBy = Seq("part"),
      configuration = Map("delta.columnMapping.mode" -> "name"))
    val t = DeltaTable.forPath(spark, dir)
    t.generateSymlinkManifest()
    val root = new java.io.File(dir, "_symlink_format_manifest")
    val manifests = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(_.isDirectory)
    // physical partition keys must still group into per-partition manifest
    // dirs — a logical-name lookup collapsed everything onto one file
    assert(manifests.length == 2,
      s"expected 2 partition manifest dirs, got ${manifests.map(_.getName).toSeq}")
  }

  test("RESTORE refuses when a needed DV blob was deleted") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (0L until 50L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1),
      dir, configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t0 = DeltaTable.forPath(spark, dir)
    t0.delete(Some("id < 3"))  // v1: dv1
    val dv1 = DeltaTable.forPath(spark, dir).snapshot.allFiles.head.deletionVector.get
    t0.delete(Some("id >= 47")) // v2: dv2 replaces dv1
    // simulate a vacuumed superseded blob
    val blob = graft.kernel.DeletionVectors.dvPath(
      new Path(dir), dv1).get
    val fs = blob.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.delete(blob, false))
    val t = DeltaTable.forPath(spark, dir)
    val e = intercept[IllegalStateException](t.restore(1))
    assert(e.getMessage.contains("deletion-vector") || e.getMessage.contains("vacuumed"),
      e.getMessage)
    // the escape hatch restores without the un-decodable file
    t.restore(1, ignoreMissingFiles = true)
  }
}
