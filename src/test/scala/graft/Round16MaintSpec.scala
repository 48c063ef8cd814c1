package graft

import java.io.{DataOutputStream, FileOutputStream}
import java.nio.file.Files
import java.util.zip.CRC32

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{DeletionVectorDescriptor, DeletionVectors, Operation}
import graft.table.DeltaTable

/** Round-16 maintenance-review regressions: DV blob identity and
  * protection under foreign descriptor shapes — 'p' (absolute,
  * scheme-qualified) storage and multiple DVs packed into one blob
  * distinguished only by offset (the delta-spark packing layout). */
class Round16MaintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r16maint")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r16m_").toString + "/t"

  test("relDvPath: scheme-qualified absolute DV paths relativize against " +
      "a scheme-less table; genuinely foreign trees drop out") {
    import DeletionVectors.relDvPath
    val tbl = new java.net.URI("/data/tbl")
    assert(relDvPath(tbl, new Path("file:/data/tbl/dv.bin")).contains("dv.bin"))
    assert(relDvPath(tbl, new Path("/data/tbl/sub/dv.bin")).contains("sub/dv.bin"))
    assert(relDvPath(tbl, new Path("file:/elsewhere/dv.bin")).isEmpty)
    assert(relDvPath(tbl, new Path("/data/other/dv.bin")).isEmpty)
    val s3 = new java.net.URI("s3a://bucket/tbl")
    assert(relDvPath(s3, new Path("s3a://bucket/tbl/dv.bin")).contains("dv.bin"))
    assert(relDvPath(s3, new Path("s3a://other-bucket/tbl/dv.bin")).isEmpty)
    // scheme-less absolute descriptor over a scheme-qualified table
    assert(relDvPath(s3, new Path("/tbl/dv.bin")).contains("dv.bin"))
  }

  test("RESTORE keys file identity by DV uniqueId (offset included): two " +
      "DVs packed in one blob are different masks; VACUUM protects the " +
      "live scheme-qualified 'p' blob") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1L to 10L).map(i => (i, s"v$i")).toDF("id", "v").coalesce(1), dir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    // a real DV delete first: upgrades the protocol to the DV feature and
    // proves the single data file's row order (ids ascending)
    val m1 = t.delete(Some("id = 999")) // no-op, protocol untouched
    assert(m1("num_deleted_rows") == "0")

    // one blob, TWO masks (delta-spark packs DVs by offset): A = {row 0},
    // B = {rows 0,1}; descriptors use 'p' storage with a file: scheme the
    // scheme-less table path must still relativize for VACUUM protection
    val dataA = DeletionVectors.encodeRoaringArray(Array(0L))
    val dataB = DeletionVectors.encodeRoaringArray(Array(0L, 1L))
    val blob = new java.io.File(dir, "packed_dv.bin")
    val out = new DataOutputStream(new FileOutputStream(blob))
    def writeOne(d: Array[Byte]): Unit = {
      out.writeInt(d.length)
      out.write(d)
      val crc = new CRC32; crc.update(d)
      out.writeInt(crc.getValue.toInt)
    }
    out.writeByte(1) // format version
    writeOne(dataA) // at offset 1
    val offB = 1 + 4 + dataA.length + 4
    writeOne(dataB)
    out.close()
    val blobUri = "file:" + blob.getAbsolutePath
    val descA = DeletionVectorDescriptor("p", blobUri, Some(1), dataA.length, 1L)
    val descB = DeletionVectorDescriptor("p", blobUri, Some(offB), dataB.length, 2L)

    def swapDv(desc: DeletionVectorDescriptor): Unit = {
      val snap = t.refresh()
      val f = snap.allFiles.head
      val txn = t.startTransaction(snap)
      val now = System.currentTimeMillis()
      t.commitAndRefresh(txn,
        Seq(f.remove(now, dataChange = true),
          f.copy(deletionVector = Some(desc), dataChange = true)),
        Operation("DELETE", Map("predicate" -> "packed-dv-test"), Map.empty))
    }
    swapDv(descA)
    val vA = t.version
    assert(t.toDF.count() == 9, "mask A hides exactly row 0")
    swapDv(descB)
    assert(t.toDF.count() == 8, "mask B hides rows 0 and 1")

    // identity by (path, uniqueId): same blob path, different offsets —
    // RESTORE must swap the descriptor back, not treat the files as equal
    t.restore(vA)
    assert(t.toDF.count() == 9,
      "RESTORE to the mask-A version must restore mask A (offset is part " +
        "of DV identity)")

    // the live 'p' blob relativizes into the protection set: a 0-retention
    // VACUUM must not delete it, and the mask must still decode after
    t.vacuum(retentionHours = 0.0, dryRun = false, enforceRetention = false)
    assert(blob.exists(),
      "VACUUM deleted a LIVE deletion-vector blob (scheme-qualified 'p' " +
        "descriptor over a scheme-less table path)")
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 9)
  }
}
