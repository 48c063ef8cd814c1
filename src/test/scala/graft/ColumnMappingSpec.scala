package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ColumnMapping
import graft.table.DeltaTable

/** Column mapping (delta.columnMapping.mode=name): physical-name files,
  * logical-name API, across write/scan/prune/DML/CDF. */
class ColumnMappingSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-cm")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_cm_").toString

  val conf = Map("delta.columnMapping.mode" -> "name",
    "delta.enableChangeDataFeed" -> "true")

  def freshTable(): (String, DeltaTable) = {
    import spark.implicits._
    val dir = tmpDir()
    val df = (0 until 100).map(i => (i.toLong, s"v$i", i % 5)).toDF("id", "v", "p")
    DeltaTable.write(spark, df, dir, partitionBy = Seq("p"), configuration = conf)
    (dir, DeltaTable.forPath(spark, dir))
  }

  test("create assigns physical names and parquet files use them") {
    val (dir, t) = freshTable()
    assert(t.snapshot.protocol.minReaderVersion == 2)
    assert(t.snapshot.protocol.minWriterVersion == 5)
    val phys = ColumnMapping.nameMap(t.schema)
    assert(phys.values.forall(_.startsWith("col-")))
    // partitionValues in the log are keyed by the physical name
    val pPhys = phys("p")
    assert(t.snapshot.allFiles.forall(_.partitionValues.contains(pPhys)))
    // raw parquet columns are physical
    val rawCols = spark.read.parquet(
      t.snapshot.absolutePath(t.snapshot.allFiles.head.path).toString).columns
    assert(rawCols.forall(_.startsWith("col-")))
    // logical read round-trips
    assert(t.toDF.columns.toSeq == Seq("id", "v", "p"))
    assert(t.toDF.count() == 100)
  }

  test("partition pruning + stats skipping work through the mapping") {
    import spark.implicits._
    val (_, t) = freshTable()
    val pruned = graft.table.Scan.prunedFiles(t.snapshot,
      Seq(graft.table.Scan.parsePredicate(spark, "p = 3")))
    assert(pruned.size < t.snapshot.numFiles)
    val got = t.scanWhere("p = 3 AND id < 20").select("id").as[Long].collect().toSet
    assert(got == (0L until 20L).filter(_ % 5 == 3).toSet)
  }

  test("DELETE / UPDATE / MERGE on a mapped table") {
    import spark.implicits._
    val (_, t) = freshTable()
    t.delete(Some("id >= 90"))
    assert(t.toDF.count() == 90)
    t.update(Map("v" -> expr("concat(v, '!')")), Some("id < 5"))
    assert(t.toDF.filter("v = 'v0!'").count() == 1)
    val src = Seq((0L, "merged", 0), (500L, "new", 1)).toDF("id", "v", "p")
    t.merge(src, "target.id = source.id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val out = t.toDF
    assert(out.filter("id = 0").select("v").as[String].head() == "merged")
    assert(out.filter("id = 500").count() == 1)
    assert(out.count() == 91)
  }

  test("CDF read on a mapped table returns logical columns") {
    import spark.implicits._
    val (_, t) = freshTable()
    t.delete(Some("id = 7"))
    val cdf = t.loadCdf(1) // just the delete commit
    val del = cdf.filter("_change_type = 'delete'")
      .select("id", "v", "p").as[(Long, String, Int)].collect().toSeq
    assert(del == Seq((7L, "v7", 2)))
  }
}
