package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel._
import graft.table.{DeltaTable, DeltaWriter, Scan}

/** Regression tests for the round-1 VERDICT/ADVICE findings. */
class Round2FixesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r2")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r2_").toString

  // --- ADVICE high: NULL partition values under negated predicates ---

  test("DELETE with != predicate keeps NULL-partition rows (3VL)") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1, "a"), (2, "b"), (3, null.asInstanceOf[String]))
      .toDF("id", "p")
    DeltaTable.write(spark, df, dir, partitionBy = Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    // p != 'a' is NULL (not TRUE) for the null-partition row: must survive
    t.delete(Some("p != 'a'"))
    val left = t.toDF.select("id").as[Int].collect().toSet
    assert(left == Set(1, 3), "null-partition row must not be deleted")
  }

  test("replaceWhere negation does not classify NULL-partition files as full matches") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1, "a"), (2, "b"), (3, null.asInstanceOf[String])).toDF("id", "p")
    DeltaTable.write(spark, df, dir, partitionBy = Seq("p"))
    val repl = Seq((20, "b")).toDF("id", "p")
    DeltaTable.write(spark, repl, dir, mode = "overwrite", replaceWhere = Some("p != 'a'"))
    // rows where p != 'a' is TRUE (only id=2) are replaced; null row survives
    val left = DeltaTable.forPath(spark, dir).toDF.select("id").as[Int].collect().toSet
    assert(left == Set(1, 3, 20))
  }

  test("EqualNullSafe matches NULL partition values in scans") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1, "a"), (2, null.asInstanceOf[String])).toDF("id", "p")
    DeltaTable.write(spark, df, dir, partitionBy = Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    assert(t.scanWhere("p <=> NULL").select("id").as[Int].collect().toSet == Set(2))
    assert(t.scanWhere("p <=> 'a'").select("id").as[Int].collect().toSet == Set(1))
  }

  // --- VERDICT wrong #2: vacuum must not delete symlink manifests ---

  test("VACUUM spares _symlink_format_manifest files") {
    val dir = tmpDir()
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    DeltaTable.write(spark, df, dir)
    val t = DeltaTable.forPath(spark, dir)
    t.generateSymlinkManifest()
    val fs = t.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    val manifest = new org.apache.hadoop.fs.Path(dir, "_symlink_format_manifest/manifest")
    assert(fs.exists(manifest))
    val deleted = t.vacuum(retentionHours = 0, dryRun = false, enforceRetention = false)
    assert(fs.exists(manifest), "vacuum must not touch _ directories")
    assert(deleted.forall(!_.contains("_symlink_format_manifest")))
  }

  // --- VERDICT wrong #3: CDF gated on the table property ---

  test("CDF read refuses tables without delta.enableChangeDataFeed") {
    val dir = tmpDir()
    val df = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    DeltaTable.write(spark, df, dir)
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("r_regionkey = 0"))
    assertThrows[IllegalStateException](t.loadCdf(0))
  }

  // --- VERDICT wrong #4: num_source_rows counted pre-join ---

  test("MERGE num_source_rows is the source cardinality, not the join size") {
    import spark.implicits._
    val dir = tmpDir()
    val target = Seq((1, "x"), (1, "y"), (2, "z")).toDF("k", "v") // dup key 1
    DeltaTable.write(spark, target, dir)
    val src = Seq((1, "new")).toDF("k", "v") // matches TWO target rows
    val t = DeltaTable.forPath(spark, dir)
    val metrics = t.merge(src, "target.k = source.k")
      .whenMatchedUpdateAll()
      .execute()
    assert(metrics("num_source_rows") == "1")
    assert(metrics("num_target_rows_updated") == "2")
  }

  // --- VERDICT wrong #5: schema merge must not narrow silently ---

  test("mergeSchema widens safely and errors on narrowing") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, 10)).toDF("id", "v"), dir) // v: int
    // long data into int table: must error, not truncate
    assertThrows[IllegalArgumentException] {
      DeltaWriter.mergeSchemas(
        DeltaTable.forPath(spark, dir).schema,
        Seq((2L, "s")).toDF("id", "v").schema) // v: string — incompatible
    }
    // int → long is a widening: table schema adopts long
    val widened = DeltaWriter.mergeSchemas(
      DeltaTable.forPath(spark, dir).schema,
      Seq((2L, 20L)).toDF("id", "v").schema)
    assert(widened("v").dataType == org.apache.spark.sql.types.LongType)
  }

  // --- protocol gate + DV refusal ---

  test("snapshot refuses unsupported reader features / unknown mapping modes") {
    val m = Metadata(schemaString = new org.apache.spark.sql.types.StructType()
      .add("a", "int").json)
    assertThrows[DeltaProtocolException] {
      ProtocolGate.checkRead(Protocol(3, 7,
        readerFeatures = Some(Seq("mystery-feature")), writerFeatures = Some(Nil)), m)
    }
    assertThrows[DeltaProtocolException] {
      ProtocolGate.checkRead(Protocol(2, 5), m.copy(configuration =
        Map("delta.columnMapping.mode" -> "surprise")))
    }
    // supported modes pass the gate
    ProtocolGate.checkRead(Protocol(2, 5), m.copy(configuration =
      Map("delta.columnMapping.mode" -> "name")))
    ProtocolGate.checkRead(Protocol(1, 2), m) // plain table fine
  }

  test("roaring bitmap array + z85 round-trip") {
    val values = Array(0L, 1L, 5L, 65536L, 70000L, (1L << 32) + 7L) ++
      (100000L until 105000L).toArray // force a bitset container
    val encoded = DeletionVectors.encodeRoaringArray(values)
    assert(DeletionVectors.decodeRoaringArray(encoded).toSeq == values.sorted.toSeq)
    val bytes = Array.tabulate[Byte](16)(i => (i * 17).toByte)
    assert(DeletionVectors.z85ToBytes(DeletionVectors.bytesToZ85(bytes)).toSeq == bytes.toSeq)
  }

  test("scan applies deletion vectors as row-index masks") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, (0 until 100).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1), dir)
    val t = DeltaTable.forPath(spark, dir)
    val add = t.snapshot.allFiles.head
    // which ids sit at row indexes 3,7,9 in the single data file?
    val byPos = Scan.readFiles(spark, t.snapshot, Seq(add), withFileIdentity = true)
      .select("id", "__pos").as[(Long, Long)].collect().toMap.map(_.swap)
    val deadPos = Array(3L, 7L, 9L)
    val conf = spark.sessionState.newHadoopConf()
    val dv = DeletionVectors.writeDvFile(t.tablePath, deadPos, conf)
    // commit a DV'd version of the same file (remove + re-add with DV)
    val txn = t.startTransaction()
    t.commitAndRefresh(txn, Seq(
      add.remove(System.currentTimeMillis(), dataChange = true),
      add.copy(deletionVector = Some(dv))),
      Operation("DELETE", Map("predicate" -> "synthetic-dv")))
    val got = t.toDF.select("id").as[Long].collect().toSet
    val expectedDead = deadPos.map(byPos).toSet
    assert(got == (0L until 100L).toSet -- expectedDead)
    assert(t.approxCount.contains(97L))
    // file-identity path (merge uses it) also masks
    val withId = Scan.readFiles(spark, t.refresh(), t.snapshot.allFiles, withFileIdentity = true)
    assert(withId.count() == 97)
  }

  test("inline (z85) deletion vectors decode too") {
    val values = Array(2L, 4L, 6L)
    var data = DeletionVectors.encodeRoaringArray(values)
    // z85 needs length % 4 == 0; pad like writers do
    while (data.length % 4 != 0) data = data :+ 0.toByte
    val dv = DeletionVectorDescriptor("i", DeletionVectors.bytesToZ85(data), None,
      data.length, 3L)
    val got = DeletionVectors.read(new org.apache.hadoop.fs.Path("/nonexistent"), dv,
      new org.apache.hadoop.conf.Configuration())
    assert(got.toSeq == values.toSeq)
  }

  test("delta.appendOnly blocks DELETE") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.appendOnly" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    assertThrows[DeltaProtocolException](t.delete(Some("id = 1")))
    DeltaTable.write(spark, Seq((2, "b")).toDF("id", "v"), dir, mode = "append")
    assert(t.refresh().allFiles.size == 2)
  }

  // --- DAT-style log-format assertions: the written JSON must carry the
  // protocol's public field names so other engines can read our tables ---

  test("commit JSON uses canonical Delta action shapes") {
    import spark.implicits._
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "p"), dir,
      partitionBy = Seq("p"))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "_delta_log",
        "00000000000000000000.json")).toArray.map(_.toString)
    val objs = lines.map(l => JsonMethods.parse(l).asInstanceOf[JObject])
    val keys = objs.flatMap(_.obj.map(_._1)).toSet
    assert(keys.contains("commitInfo") && keys.contains("protocol") &&
      keys.contains("metaData") && keys.contains("add"))
    val proto = objs.flatMap(o => (o \ "protocol").toOption
      .filter(_ != JNothing)).head
    assert((proto \ "minReaderVersion") == JInt(1))
    assert((proto \ "minWriterVersion") == JInt(2))
    val meta = objs.map(o => o \ "metaData").find(_ != JNothing).get
    assert((meta \ "format" \ "provider") == JString("parquet"))
    assert((meta \ "partitionColumns") == JArray(List(JString("p"))))
    assert((meta \ "schemaString").isInstanceOf[JString])
    val add = objs.map(o => o \ "add").find(_ != JNothing).get
    assert((add \ "partitionValues") == JObject(List("p" -> JString("a"))))
    assert((add \ "dataChange") == JBool(true))
    val stats = JsonMethods.parse((add \ "stats").asInstanceOf[JString].s)
    assert((stats \ "numRecords") == JInt(1))
    assert((stats \ "minValues" \ "id") == JInt(1))
    assert((stats \ "nullCount" \ "id") == JInt(0))
  }

  // --- checkpoint completeness: domainMetadata survives replay ---

  test("domainMetadata survives checkpoint round-trip") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    val txn = t.startTransaction()
    txn.commit(Seq(DomainMetadata("graft.test", """{"k":"v"}""")),
      Operation("SET DOMAIN"))
    // force past a checkpoint boundary (interval 10)
    (0 until 11).foreach { i =>
      DeltaTable.write(spark, Seq((i, "x")).toDF("id", "v"), dir, mode = "append")
    }
    val fresh = DeltaTable.forPath(spark, dir)
    assert(fresh.version >= 10)
    assert(fresh.snapshot.domains.contains("graft.test"))
  }
}
