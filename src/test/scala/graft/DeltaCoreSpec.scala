package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

class DeltaCoreSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sf = "/root/testdata/sf0.001"

  def tmpDir(): String =
    Files.createTempDirectory("graft_test_").toString

  def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  def orders = spark.read.parquet(s"$sf/orders.parquet")

  test("write + read roundtrip, version 0") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem, dir)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 0)
    assert(t.toDF.count() == lineitem.count())
    assert(t.toDF.schema.fieldNames.toSeq == lineitem.schema.fieldNames.toSeq)
    // stats present and approx count from stats only
    assert(t.approxCount.contains(lineitem.count()))
  }

  test("append + time travel") {
    val dir = tmpDir()
    val n = lineitem.count()
    DeltaTable.write(spark, lineitem, dir)
    DeltaTable.write(spark, lineitem, dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 1)
    assert(t.toDF.count() == 2 * n)
    assert(t.asOfVersion(0).count() == n)
    val hist = t.history()
    assert(hist.size == 2)
    assert(hist.head._3.get.operation == "WRITE")
  }

  test("overwrite replaces content") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem, dir)
    val small = lineitem.limit(10)
    DeltaTable.write(spark, small, dir, mode = "overwrite")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == 10)
  }

  test("partitioned write + pruned scan") {
    val dir = tmpDir()
    DeltaTable.write(spark, orders, dir, partitionBy = Seq("o_orderpriority"))
    val t = DeltaTable.forPath(spark, dir)
    val expected = orders.filter("o_orderpriority = '1-URGENT'").count()
    assert(t.scanWhere("o_orderpriority = '1-URGENT'").count() == expected)
    // pruning actually reduced the file set
    val pruned = graft.table.Scan.prunedFiles(t.snapshot,
      Seq(graft.table.Scan.parsePredicate(spark, "o_orderpriority = '1-URGENT'")))
    assert(pruned.size < t.snapshot.numFiles)
    assert(pruned.forall(_.partitionValues("o_orderpriority") == "1-URGENT"))
    assert(t.toDF.count() == orders.count())
  }

  test("stats-based file skipping on unpartitioned data") {
    val dir = tmpDir()
    // write ordered so files have disjoint ranges
    DeltaTable.write(spark, lineitem.repartitionByRange(8, col("l_orderkey")), dir)
    val t = DeltaTable.forPath(spark, dir)
    val pred = graft.table.Scan.parsePredicate(spark, "l_orderkey < 100")
    val pruned = graft.table.Scan.prunedFiles(t.snapshot, Seq(pred))
    assert(pruned.size < t.snapshot.numFiles)
    assert(t.scanWhere("l_orderkey < 100").count() ==
      lineitem.filter("l_orderkey < 100").count())
  }

  test("delete with predicate") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem, dir)
    val t = DeltaTable.forPath(spark, dir)
    val metrics = t.delete(Some("l_quantity < 10"))
    val expected = lineitem.filter("NOT (l_quantity < 10)").count()
    assert(t.toDF.count() == expected)
    assert(metrics("num_deleted_rows").toLong ==
      lineitem.filter("l_quantity < 10").count())
  }

  test("delete whole partition is metadata-only") {
    val dir = tmpDir()
    DeltaTable.write(spark, orders, dir, partitionBy = Seq("o_orderpriority"))
    val t = DeltaTable.forPath(spark, dir)
    val before = t.snapshot.numFiles
    val metrics = t.delete(Some("o_orderpriority = '1-URGENT'"))
    assert(metrics("num_added_files").toInt == 0) // no rewrite
    assert(t.toDF.filter("o_orderpriority = '1-URGENT'").count() == 0)
    assert(t.snapshot.numFiles < before)
  }

  test("data-predicate DML on partitioned table (duplicate part-file names)") {
    // one write task emits identically-named part files into every partition
    // dir — file identity must be full path, not file name
    val dir = tmpDir()
    DeltaTable.write(spark, orders, dir, partitionBy = Seq("o_orderpriority"))
    val t = DeltaTable.forPath(spark, dir)
    val n = orders.count()
    val metrics = t.delete(Some("o_orderkey % 10 = 0"))
    val expected = orders.filter("o_orderkey % 10 != 0").count()
    assert(t.toDF.count() == expected)
    assert(metrics("num_deleted_rows").toLong == n - expected)
    // update across all partitions
    t.update(Map("o_totalprice" -> lit(7.0)), Some("o_custkey % 3 = 0"))
    assert(t.toDF.filter("o_custkey % 3 = 0 AND o_totalprice != 7.0").count() == 0)
    assert(t.toDF.count() == expected)
    // merge touching several partitions
    val src = orders.filter("o_orderkey % 10 != 0").limit(200).withColumn("o_totalprice", lit(-5.0))
    t.merge(src, "target.o_orderkey = source.o_orderkey")
      .whenMatchedUpdateAll().execute()
    assert(t.toDF.filter("o_totalprice = -5.0").count() == 200)
    assert(t.toDF.count() == expected)
  }

  test("update") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem, dir)
    val t = DeltaTable.forPath(spark, dir)
    val metrics = t.update(Map("l_discount" -> lit(0.0)), Some("l_returnflag = 'A'"))
    assert(t.toDF.filter("l_returnflag = 'A' AND l_discount != 0").count() == 0)
    val untouched = t.toDF.filter("l_returnflag != 'A'")
      .agg(sum("l_discount")).collect()(0).getDouble(0)
    val orig = lineitem.filter("l_returnflag != 'A'")
      .agg(sum("l_discount")).collect()(0).getDouble(0)
    assert(math.abs(untouched - orig) < 1e-6)
    assert(metrics("num_updated_rows").toLong ==
      lineitem.filter("l_returnflag = 'A'").count())
  }

  test("merge upsert") {
    val dir = tmpDir()
    val target = orders.limit(1000)
    DeltaTable.write(spark, target, dir)
    val t = DeltaTable.forPath(spark, dir)
    // source: half overlapping (with bumped price), half new keys
    val overlap = orders.limit(500).withColumn("o_totalprice", lit(999.0))
    val fresh = orders.limit(1500).exceptAll(orders.limit(1000))
      .withColumn("o_totalprice", lit(111.0))
    val source = overlap.unionByName(fresh)
    val metrics = t.merge(source, "target.o_orderkey = source.o_orderkey")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .execute()
    assert(metrics("num_target_rows_updated").toLong == 500)
    assert(metrics("num_target_rows_inserted").toLong == 500)
    assert(t.toDF.count() == 1500)
    assert(t.toDF.filter("o_totalprice = 999.0").count() == 500)
    assert(t.toDF.filter("o_totalprice = 111.0").count() == 500)
  }

  test("merge delete clause + by-source") {
    val dir = tmpDir()
    DeltaTable.write(spark, orders.limit(100), dir)
    val t = DeltaTable.forPath(spark, dir)
    val source = orders.limit(50)
    t.merge(source, "target.o_orderkey = source.o_orderkey")
      .whenMatchedDelete()
      .execute()
    assert(t.toDF.count() == 50)
    // not matched by source: delete everything the source doesn't cover
    t.merge(orders.limit(80), "target.o_orderkey = source.o_orderkey")
      .whenNotMatchedBySourceDelete()
      .execute()
    // remaining rows all have keys in source's first 80
    assert(t.toDF.join(orders.limit(80), Seq("o_orderkey"), "left_anti").count() == 0)
  }

  test("optimize compact reduces file count") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.repartition(10), dir)
    val t = DeltaTable.forPath(spark, dir)
    val before = t.snapshot.numFiles
    assert(before >= 10)
    val n = t.toDF.count()
    t.optimizeCompact()
    assert(t.snapshot.numFiles < before)
    assert(t.toDF.count() == n)
    // optimize is dataChange=false
    val hist = t.history(Some(1)).head._3.get
    assert(hist.operation == "OPTIMIZE")
  }

  test("zorder keeps data, clusters ranges") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.repartition(8), dir)
    val t = DeltaTable.forPath(spark, dir)
    val n = t.toDF.count()
    t.optimizeZOrder(Seq("l_orderkey", "l_partkey"), targetSizeBytes = 64 * 1024)
    assert(t.toDF.count() == n)
  }

  test("constraints") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem, dir)
    val t = DeltaTable.forPath(spark, dir)
    t.addConstraint("qty_positive", "l_quantity >= 0")
    intercept[Exception] {
      DeltaTable.write(spark,
        lineitem.limit(5).withColumn("l_quantity", lit(-1.0)), dir, mode = "append")
    }
    // valid append still works
    DeltaTable.write(spark, lineitem.limit(5), dir, mode = "append")
    t.dropConstraint("qty_positive")
    intercept[Exception] { t.addConstraint("bad", "l_quantity < 0") }
  }

  test("schema evolution mergeSchema") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(100), dir)
    val withNew = lineitem.limit(50).withColumn("l_extra", lit("x"))
    intercept[Exception] {
      DeltaTable.write(spark, withNew, dir, mode = "append")
    }
    DeltaTable.write(spark, withNew, dir, mode = "append", mergeSchema = true)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.schema.fieldNames.contains("l_extra"))
    assert(t.toDF.filter("l_extra IS NULL").count() == 100)
  }

  test("cdf: delete + update + merge emit change rows") {
    val dir = tmpDir()
    DeltaTable.write(spark, orders.limit(200), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("o_orderkey <= 10"))
    t.update(Map("o_totalprice" -> lit(1.0)), Some("o_orderkey > 190 AND o_orderkey <= 200"))
    val cdf = t.loadCdf(0)
    val byType = cdf.groupBy("_change_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val deleted = orders.limit(200).filter("o_orderkey <= 10").count()
    val updated = orders.limit(200).filter("o_orderkey > 190 AND o_orderkey <= 200").count()
    assert(byType.getOrElse("insert", 0L) == 200) // initial write
    assert(byType.getOrElse("delete", 0L) == deleted)
    assert(byType.getOrElse("update_preimage", 0L) == updated)
    assert(byType.getOrElse("update_postimage", 0L) == updated)
  }

  test("checkpoint written and replayed") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(100), dir,
      configuration = Map("delta.checkpointInterval" -> "5"))
    (1 to 6).foreach { _ =>
      DeltaTable.write(spark, lineitem.limit(10), dir, mode = "append")
    }
    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 6)
    assert(t.toDF.count() == 160)
    val fs = new java.io.File(s"$dir/_delta_log")
    assert(fs.list().exists(_.endsWith(".checkpoint.parquet")))
    assert(fs.list().contains("_last_checkpoint"))
    // snapshot at a pre-checkpoint version still loads
    assert(t.asOfVersion(2).count() == 120)
  }

  test("restore") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(100), dir)
    DeltaTable.write(spark, lineitem.limit(50), dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("l_quantity > 0"))
    assert(t.toDF.count() == 0)
    t.restore(1)
    assert(t.toDF.count() == 150)
    t.restore(0)
    assert(t.toDF.count() == 100)
    // restore by timestamp resolves "last version committed at or before ts"
    val tsOfV1 = t.history().find(_._1 == 1L).get._2
    t.restoreToTimestamp(tsOfV1)
    assert(t.toDF.count() == 150)
  }

  test("vacuum removes orphans, keeps live data") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(1000), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("l_quantity < 25")) // rewrites → tombstones
    val n = t.toDF.count()
    val deleted = t.vacuum(retentionHours = 0, enforceRetention = false)
    assert(deleted.nonEmpty)
    assert(t.toDF.count() == n)
  }

  test("fsck removes vanished files") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(100).repartition(4), dir)
    val t = DeltaTable.forPath(spark, dir)
    val victim = t.snapshot.allFiles.head
    new java.io.File(s"$dir/${victim.path}").delete()
    val missing = t.fsck()
    assert(missing == Seq(victim.path))
    assert(t.snapshot.numFiles == 3)
    t.toDF.count() // still readable
  }

  test("convert to delta") {
    val dir = tmpDir()
    orders.write.partitionBy("o_orderpriority").parquet(s"$dir/plain")
    val t = DeltaTable.convertToDelta(spark, s"$dir/plain")
    assert(t.partitionColumns == Seq("o_orderpriority"))
    assert(t.toDF.count() == orders.count())
  }

  test("replaceWhere") {
    val dir = tmpDir()
    DeltaTable.write(spark, orders, dir, partitionBy = Seq("o_orderpriority"))
    val replacement = orders.filter("o_orderpriority = '1-URGENT'")
      .limit(5).withColumn("o_totalprice", lit(0.0))
    DeltaTable.write(spark, replacement, dir, mode = "overwrite",
      replaceWhere = Some("o_orderpriority = '1-URGENT'"))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.filter("o_orderpriority = '1-URGENT'").count() == 5)
    assert(t.toDF.filter("o_orderpriority != '1-URGENT'").count() ==
      orders.filter("o_orderpriority != '1-URGENT'").count())
    // violating replaceWhere rejected
    intercept[Exception] {
      DeltaTable.write(spark, orders.limit(3), dir, mode = "overwrite",
        replaceWhere = Some("o_orderpriority = 'NOPE'"))
    }
  }

  test("txn idempotency via SetTransaction") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(10), dir)
    val t = DeltaTable.forPath(spark, dir)
    assert(t.txnVersion("app1").isEmpty)
    val txn = t.startTransaction()
    txn.commit(Seq(graft.kernel.SetTransaction("app1", 7, Some(System.currentTimeMillis()))),
      graft.kernel.Operation("STREAMING UPDATE"))
    t.refresh()
    assert(t.txnVersion("app1").contains(7))
  }

  test("concurrent writers: conflict detection") {
    val dir = tmpDir()
    DeltaTable.write(spark, lineitem.limit(100), dir)
    val t1 = DeltaTable.forPath(spark, dir)
    val t2 = DeltaTable.forPath(spark, dir)
    // two blind appends interleave fine
    val s1 = t1.snapshot; val s2 = t2.snapshot
    DeltaTable.write(spark, lineitem.limit(5), dir, mode = "append")
    DeltaTable.write(spark, lineitem.limit(5), dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.version == 2)
    assert(t.toDF.count() == 110)
    // delete vs delete on same files conflicts
    val ta = DeltaTable.forPath(spark, dir)
    ta.delete(Some("l_quantity < 20"))
    val stale = new graft.kernel.OptimisticTransaction(t2.deltaLog, Some(s2))
    stale.readWholeTable()
    val victims = s2.allFiles.map(_.remove(System.currentTimeMillis(), true))
    intercept[Exception] { stale.commit(victims, graft.kernel.Operation("DELETE")) }
  }
}
