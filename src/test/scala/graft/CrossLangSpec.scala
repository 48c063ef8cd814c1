package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/**
 * Write-side spec compliance, checked from OUTSIDE the JVM: tables written
 * by this engine are replayed by `tools/compat_check.py` — a pure-python
 * reimplementation of log replay, URL path decoding and deletion-vector
 * (z85 + portable roaring) decoding from the public PROTOCOL.md — and the
 * counts a third-party reader would derive must match what Spark sees.
 */
class CrossLangSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-crosslang")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def pythonReplay(dir: String, sumCol: String = null): Map[String, Any] = {
    val args = Seq("python3", "tools/compat_check.py", dir) ++ Option(sumCol)
    val out = new StringBuilder
    val proc = new ProcessBuilder(args: _*)
      .redirectErrorStream(true).start()
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = r.readLine()
    while (line != null) { out.append(line).append('\n'); line = r.readLine() }
    assert(proc.waitFor() == 0, s"compat_check failed:\n$out")
    val json = out.toString.linesIterator.toSeq.last
    // minimal parse of the one-line JSON
    val fields = json.stripPrefix("{").stripSuffix("}").split(",(?=\\s*\")")
    fields.map { f =>
      val Array(k, v) = f.split(":", 2)
      k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim
    }.toMap
  }

  private def pythonJson(args: String*): org.json4s.JValue = {
    val out = new StringBuilder
    val proc = new ProcessBuilder(("python3" +: args): _*)
      .redirectErrorStream(true).start()
    val r = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream))
    var line = r.readLine()
    while (line != null) { out.append(line).append('\n'); line = r.readLine() }
    assert(proc.waitFor() == 0, s"${args.head} failed:\n$out")
    // stderr is merged for diagnostics, so a warning python emits AFTER the
    // result line (e.g. at interpreter shutdown) can trail it — take the
    // last line that parses as a JSON object, not the last line
    out.toString.linesIterator.toSeq.reverseIterator
      .filter(_.trim.startsWith("{"))
      .map(l => scala.util.Try(org.json4s.jackson.JsonMethods.parse(l)))
      .collectFirst { case scala.util.Success(j: org.json4s.JObject) => j }
      .getOrElse(fail(s"${args.head} emitted no JSON object line:\n$out"))
  }

  test("python reads evolved-column CDC of a column-mapped MERGE via the " +
      "COMMITTED metadata") {
    // The r11 fix point cross-engine: a withSchemaEvolution MERGE on a
    // column-mapped table writes its CDC files under the metadata being
    // COMMITTED (the pre-commit snapshot lacks physical names for evolved
    // columns, so a third-party CDF reader resolved them to NULL).
    // tools/cdc_check.py replays the log with pyarrow — no graft code —
    // and must see the evolved column's values.
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_cdc_xl_").toString + "/t"
    DeltaTable.write(spark, Seq((1, "a"), (2, "b")).toDF("k", "v"), dir,
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    val src = Seq((2, "b2", 99L), (3, "c", 100L)).toDF("k", "v", "extra")
    t.merge(src, "target.k = source.k")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .withSchemaEvolution()
      .execute()
    val mergeV = t.version
    val res = pythonJson("tools/cdc_check.py", dir, mergeV.toString, "extra")
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((res \ "mapping").extract[String] == "name", s"unexpected: $res")
    assert((res \ "physical").extract[String].startsWith("col-"),
      s"evolved column must carry a fresh physical name, got $res")
    // update_preimage (k=2 before the merge) legitimately has extra=NULL;
    // update_postimage and insert carry 99/100 — 2 non-null of 3 rows
    assert((res \ "rows").extract[Int] == 3, s"expected 3 change rows: $res")
    assert((res \ "nonnull").extract[Int] == 2,
      s"evolved column must round-trip non-NULL cross-engine: $res")
    assert((res \ "change_types").extract[Seq[String]].toSet ==
      Set("insert", "update_preimage", "update_postimage"), s"$res")
    // and our own CDF reader agrees with the independent one
    val own = t.loadCdf(mergeV, Some(mergeV))
      .filter("_change_type != 'update_preimage'")
      .select("extra").collect().map(_.getLong(0)).sorted.toSeq
    assert(own == Seq(99L, 100L))
  }

  test("python replays our DV-masked, special-partition, checkpointed table") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlang_").toString
    val df = (0 until 5000).map(i => (i.toLong, s"v$i", if (i % 2 == 0) "A/A" else "B B"))
      .toDF("id", "v", "p")
    DeltaTable.write(spark, df, dir, partitionBy = Seq("p"),
      configuration = Map(
        "delta.enableDeletionVectors" -> "true",
        "delta.checkpointInterval" -> "3"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id < 500")) // DV masks across both partitions
    (0 until 3).foreach { k => // push past the checkpoint interval
      DeltaTable.write(spark, Seq((100000L + k, "x", "A/A")).toDF("id", "v", "p"),
        dir, mode = "append")
    }
    val sparkRows = t.refresh().approxNumRecords.get
    assert(sparkRows == 4503)
    assert(t.toDF.count() == 4503)

    val res = pythonReplay(dir)
    assert(res("ok") == "true", res.toString)
    assert(res("rows") == "4503", s"python sees ${res("rows")} rows: $res")
    assert(res("dv_masked") == "500", res.toString)
    assert(res("minReaderVersion") == "3", res.toString)
  }

  test("python replays our v2 (manifest + sidecar) checkpoint") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlang_v2_").toString
    DeltaTable.write(spark,
      (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v"), dir,
      configuration = Map(
        "delta.checkpointPolicy" -> "v2",
        "delta.checkpointInterval" -> "2"))
    val t = DeltaTable.forPath(spark, dir)
    t.addFeature("v2Checkpoint") // v1
    t.delete(Some("id <= 100"))  // v2 → v2 checkpoint written here
    // drop the pre-checkpoint commits: replay must come from the manifest
    val logDir = new java.io.File(dir, "_delta_log")
    (0 to 2).foreach(v => new java.io.File(logDir, f"$v%020d.json").delete())
    DeltaTable.write(spark, Seq((2000L, "x")).toDF("id", "v"), dir, mode = "append")

    assert(DeltaTable.forPath(spark, dir).toDF.count() == 901)
    val res = pythonReplay(dir, sumCol = "id")
    assert(res("ok") == "true", res.toString)
    assert(res("rows") == "901", s"python sees ${res("rows")} rows: $res")
    // content check through the v2 manifest + sidecars, not just a count:
    // ids 101..1000 survive the delete, plus the appended id=2000 row
    assert(res("sum_id") == ((101L to 1000L).sum + 2000L).toString, res.toString)
  }

  test("python content-checksums our DV table (positions, not just counts)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_xlang_sum_").toString
    DeltaTable.write(spark,
      (0 until 4000).map(i => (i.toLong, s"v$i")).toDF("id", "v").repartition(3),
      dir, configuration = Map("delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id % 7 = 0")) // masks scattered across all 3 files
    t.update(Map("v" -> org.apache.spark.sql.functions.lit("u")), Some("id % 11 = 3"))
    t.refresh()
    val expect = t.toDF.agg(org.apache.spark.sql.functions.sum("id"))
      .collect()(0).getLong(0)

    val res = pythonReplay(dir, sumCol = "id")
    assert(res("ok") == "true", res.toString)
    // a DV blob with right cardinality but wrong POSITIONS would pass the
    // count check and fail this one
    assert(res("sum_id") == expect.toString,
      s"python live-row sum ${res("sum_id")} != spark $expect: $res")
    assert(res("readerFeatures").toString.contains("deletionVectors"), res.toString)
  }

  test("python validates our VARIANT table's physical layout and features") {
    val dir = Files.createTempDirectory("graft_xlang_var_").toString
    val df = spark.sql(
      """SELECT id, parse_json(concat('{"k":', id, ',"s":"x"}')) AS payload
        |FROM range(100)""".stripMargin)
    DeltaTable.write(spark, df, dir)
    val res = pythonReplay(dir, sumCol = "id")
    assert(res("ok") == "true", res.toString)
    assert(res("rows") == "100", res.toString)
    assert(res("variantCols") == "1", res.toString)
    // spec shape: variant columns stored as struct<metadata: binary, value: binary>
    assert(res("variantLayoutOk") == "true", res.toString)
    assert(res("readerFeatures").toString.contains("variantType"), res.toString)
    assert(res("sum_id") == (0L until 100L).sum.toString, res.toString)
  }
}
