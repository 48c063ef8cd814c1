package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{DeltaLog, Mount, MountLogStore, VersionAlreadyExistsException}
import graft.table.DeltaTable

/** The crates/mount passthrough: dbfs:/ paths resolve through a local
  * mount root for scans, writes, log replay and DML; commits require the
  * explicit allow-unsafe-rename opt-in (reference parity:
  * crates/mount/src/lib.rs:56-58). */
class MountSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-mount")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val mountRoot = Files.createTempDirectory("graft_dbfs").toString

  test("full lifecycle over dbfs:/ — write, scan, DML, time travel, listing remap") {
    Mount.register(spark, "dbfs", mountRoot, allowUnsafeRename = true)
    try {
      val df = spark.range(100).select(col("id"), (col("id") % 5).as("part"))
      DeltaTable.write(spark, df, "dbfs:/wh/t1", partitionBy = Seq("part"))
      // the bytes physically live under the mount root
      assert(Files.exists(java.nio.file.Paths.get(mountRoot, "wh/t1/_delta_log")))

      val t = DeltaTable.forPath(spark, "dbfs:/wh/t1")
      assert(t.toDF.count() == 100)
      assert(t.toDF.filter("part = 3").count() == 20)

      t.delete(Some("id < 10"))
      assert(t.toDF.count() == 90)
      t.merge(spark.range(5).select(col("id"), lit(99L).as("part")),
          "target.id = source.id")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
      assert(DeltaTable.forPath(spark, "dbfs:/wh/t1").toDF
        .filter("part = 99").count() == 5)
      // time travel still replays the remapped log listing
      assert(t.asOfVersion(0).toDF.count() == 100)
    } finally Mount.unregister(spark, "dbfs")
  }

  test("without allowUnsafeRename: reads work, commits are refused loudly") {
    Mount.register(spark, "dbfs", mountRoot, allowUnsafeRename = true)
    DeltaTable.write(spark, spark.range(10).toDF("id"), "dbfs:/wh/t2")
    Mount.register(spark, "dbfs", mountRoot, allowUnsafeRename = false)
    try {
      assert(DeltaTable.forPath(spark, "dbfs:/wh/t2").toDF.count() == 10)
      val e = intercept[Exception] {
        DeltaTable.write(spark, spark.range(5).toDF("id"), "dbfs:/wh/t2",
          mode = "append")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("allowUnsafeRename")), s"got: ${msgs(e)}")
      assert(DeltaTable.forPath(spark, "dbfs:/wh/t2").toDF.count() == 10,
        "refused commit must not change the table")
    } finally Mount.unregister(spark, "dbfs")
  }

  test("unsafe rename still refuses to OVERWRITE an existing version") {
    val dir = Files.createTempDirectory("graft_mnt_lv").toString + "/t/_delta_log"
    val store = new MountLogStore(spark.sparkContext.hadoopConfiguration,
      allowUnsafeRename = true)
    val p = new org.apache.hadoop.fs.Path(s"file:$dir/00000000000000000000.json")
    store.writeAtomic(p, Iterator("{}"))
    intercept[VersionAlreadyExistsException] {
      store.writeAtomic(p, Iterator("{\"x\":1}"))
    }
    assert(store.read(p) == Seq("{}"), "loser must not clobber the winner")
  }

  test("mount scheme without a MountLogStore registration is refused, not silently unsafe") {
    // fs.dbfs.impl wired but the log-store half missing (e.g. unregister
    // raced a writer, or a session set the conf by hand): the fallback
    // HadoopLogStore must refuse — its rename-publish assumes an
    // exclusive-rename filesystem, which a mount is not
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.dbfs.impl", classOf[graft.kernel.MountFileSystem].getName)
    conf.set("fs.dbfs.impl.disable.cache", "true")
    conf.set(Mount.rootKey("dbfs"), mountRoot)
    try {
      val e = intercept[Exception] {
        DeltaTable.write(spark, spark.range(3).toDF("id"), "dbfs:/wh/t3")
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("Mount.register")), s"got: ${msgs(e)}")
    } finally Mount.unregister(spark, "dbfs")
  }

  test("file-scheme mount: MountLogStore registered for file replaces exclusive-create commits") {
    // the reference's `file` + allow_unsafe_rename branch (NFS-style mounts)
    DeltaLog.registerLogStore("file",
      new MountLogStore(spark.sparkContext.hadoopConfiguration, true))
    try {
      val dir = Files.createTempDirectory("graft_mnt_file").toString + "/t"
      DeltaTable.write(spark, spark.range(20).toDF("id"), dir)
      DeltaTable.forPath(spark, dir).delete(Some("id >= 15"))
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 15)
    } finally DeltaLog.unregisterLogStore("file")
  }
}
