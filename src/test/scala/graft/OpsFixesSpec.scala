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
}
