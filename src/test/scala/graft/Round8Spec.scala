package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.CommitInfo
import graft.table.DeltaTable

/** Round-8 scale proof: VACUUM over a debris population far beyond the
  * driver collect threshold never materializes the full candidate set on
  * the driver — the returned Seq is a capped sample, the exact totals live
  * in the VACUUM START/END commit metrics, and every debris file is
  * actually deleted by the foreachPartition fan-out. Complements
  * Round6Spec's 5M-Add snapshot bound and Round7Spec's 2M-row MERGE bound. */
class Round8Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[16]")
    .appName("graft-test-r8")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r8_").toString + "/t"

  test("VACUUM at 1M debris files: sample return, exact metrics, no driver materialization") {
    val dir = tmpDir()
    // PARTITIONED table: live files sit in subdirectories, exactly where a
    // mis-relativized listing rel (scheme-qualified seed URI vs raw table
    // URI) used to strip them of anti-join protection — the distributed
    // vacuum would have deleted live partition data
    DeltaTable.write(spark,
      spark.range(100).select(col("id"), (col("id") % 4).cast("string").as("p")),
      dir, partitionBy = Seq("p"))

    // 1M synthetic debris files across 64 walkable subdirs, created by a
    // 64-wide Spark job (driver-side serial creation would dominate the
    // test); mtimes are "now", which is < the vacuum-time cutoff because
    // retention 0h means cutoff = vacuum's own now, milliseconds later
    val nDebris = 1000000
    val nDirs = 64
    val perDir = nDebris / nDirs
    spark.sparkContext.parallelize(0 until nDirs, nDirs).foreach { d =>
      val sub = Paths.get(s"$dir/debris$d")
      Files.createDirectories(sub)
      var i = 0
      while (i < perDir) {
        Files.createFile(sub.resolve(s"junk_$i.parquet"))
        i += 1
      }
    }

    spark.conf.set("spark.graft.vacuum.distributedThreshold", "1")
    spark.conf.set("spark.graft.vacuum.collectThreshold", "1000")
    try {
      val t = DeltaTable.forPath(spark, dir)
      val t0 = System.nanoTime()
      val returned = t.vacuum(0, dryRun = false, enforceRetention = false)
      val sec = (System.nanoTime() - t0) / 1e9
      info(f"vacuum of $nDebris%d debris files took $sec%.1f s")

      // the driver got a capped sample, never the 1M-path array
      assert(returned.size == 1000, s"expected the 1000-row sample, got ${returned.size}")
      val nonDebris = returned.filterNot(_.startsWith("debris"))
      assert(nonDebris.isEmpty, s"non-debris candidates: ${nonDebris.take(5).mkString(", ")}")

      // exact totals are in the commit metrics
      val infos = t.history(Some(2)).flatMap(_._3)
      val end = infos.find(_.operation == "VACUUM END").get
      val start = infos.find(_.operation == "VACUUM START").get
      assert(start.operationMetrics.get("numFilesToDelete").contains(nDebris.toString))
      assert(end.operationMetrics.get("numDeletedFiles").contains(nDebris.toString))

      // the debris is actually gone; the live table survived
      (0 until nDirs).foreach { d =>
        val sub = new java.io.File(s"$dir/debris$d")
        assert(!sub.exists || sub.list().isEmpty, s"debris$d not emptied")
      }
      assert(DeltaTable.forPath(spark, dir).toDF.count() == 100L)
      assert(sec < 180, f"vacuum took $sec%.1f s — fan-out degraded")
    } finally {
      spark.conf.unset("spark.graft.vacuum.distributedThreshold")
      spark.conf.unset("spark.graft.vacuum.collectThreshold")
    }
  }
}
