package graft

import java.nio.file.Files
import java.util.Locale

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.ColumnMapping
import graft.table.DeltaTable

/** Round-13 regressions for the r12 verdict findings: locale-sensitive
  * case mapping on user-input strings (tr_TR maps "I" to dotless-i, so a
  * bare `toLowerCase` mangles "ID"/"Ignore" before they reach validation
  * or table metadata — every user-input site now pins Locale.ROOT). */
class Round13Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test-r13")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r13_").toString + "/t"

  private def withLocale[A](l: Locale)(body: => A): A = {
    val prev = Locale.getDefault
    Locale.setDefault(l)
    try body finally Locale.setDefault(prev)
  }

  test("tr_TR locale: save mode 'Ignore' and mapping mode 'ID' survive " +
      "case normalization (Locale.ROOT, not default)") {
    import spark.implicits._
    withLocale(new Locale("tr", "TR")) {
      // sanity: this locale actually exhibits the hazard
      assert("ID".toLowerCase != "id", "tr_TR must map I to dotless-i")

      // WriteIntoDelta save-mode parse: "Ignore" under a bare toLowerCase
      // becomes "ıgnore" -> "Unknown save mode"
      val d1 = tmpDir()
      DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "v"), d1)
      DeltaTable.write(spark, Seq((2L, "b")).toDF("id", "v"), d1,
        mode = "Ignore") // existing table: must no-op, not throw
      assert(DeltaTable.forPath(spark, d1).toDF.count() == 1)

      // create-path mapping mode "ID": must engage id mapping AND store
      // the normalized value (foreign case-sensitive readers reject "ID")
      val d2 = tmpDir()
      DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d2,
        configuration = Map(ColumnMapping.MODE_KEY -> "ID"))
      val snap = DeltaTable.forPath(spark, d2).snapshot
      assert(snap.metadata.configuration(ColumnMapping.MODE_KEY) == "id",
        "stored mode must be normalized")
      snap.schema.fields.foreach { f =>
        assert(f.metadata.contains(ColumnMapping.ID_KEY),
          s"id mapping must engage for ${f.name}")
      }
      assert(DeltaTable.forPath(spark, d2).toDF
        .orderBy("id").as[(Long, String)].collect().toSeq ==
        Seq((1L, "a"), (2L, "b")))

      // setProperties refusal path: mode "ID" on a none table must refuse
      // with the NORMALIZED value in the message, not a mangled "ıd"
      val ex = intercept[UnsupportedOperationException] {
        DeltaTable.forPath(spark, d1)
          .setProperties(Map(ColumnMapping.MODE_KEY -> "ID"))
      }
      assert(ex.getMessage.contains("none -> id"), ex.getMessage)
    }
  }

  test("ar locale: log file names stay ASCII digits (zeroPad, not %020d)") {
    import graft.kernel.{LogCompaction, LogStore}
    withLocale(new Locale("ar", "SA")) {
      // sanity: this locale actually exhibits the hazard in the JVM
      // (NumberFormat-based %d would emit Arabic-Indic digits)
      val formatted = String.format("%020d", Long.box(5L))
      if (formatted != "00000000000000000005")
        assert(!formatted.forall(c => c >= '0' && c <= '9'))
      assert(LogStore.commitFileName(5L) == "00000000000000000005.json")
      assert(LogStore.isCommitFile(LogStore.commitFileName(5L)))
      assert(LogStore.isCheckpointFile(LogStore.checkpointFileName(12L)))
      assert(LogStore.isCheckpointFile(
        LogStore.multiPartCheckpointFileName(12L, 1, 3)))
      assert(LogCompaction.info(LogCompaction.fileName(3L, 9L)).contains((3L, 9L)))
    }
  }

  test("MERGE updateAll/insertAll resolve source columns case-insensitively") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "old"), (2L, "keep")).toDF("id", "value"), dir)
    val t = DeltaTable.forPath(spark, dir)
    // source column VALUE (case-mismatched): Spark's default resolution is
    // case-insensitive, so updateAll must feed it — a case-sensitive guard
    // silently kept the old value and inserted NULL
    val src = Seq((1L, "new"), (3L, "ins")).toDF("ID", "VALUE")
    t.merge(src, "target.id = source.ID")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    val rows = t.toDF.orderBy("id").as[(Long, String)].collect().toSeq
    assert(rows == Seq((1L, "new"), (2L, "keep"), (3L, "ins")),
      s"case-mismatched source columns must update/insert, got $rows")
  }

  test("generated columns: wrong supplied value refuses; UPDATE recomputes") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    val dir = tmpDir()
    val genMeta = new MetadataBuilder()
      .putString("delta.generationExpression", "price * 2").build()
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("price", DoubleType),
      StructField("g", DoubleType, nullable = true, genMeta)))
    DeltaTable.create(spark, dir, schema)
    // absent g: computed on write
    DeltaTable.write(spark, Seq((1L, 10.0)).toDF("id", "price"), dir,
      mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.select("g").as[Double].head() == 20.0)
    // a writer-SUPPLIED wrong value must refuse (delta protocol: g <=> expr)
    val e = intercept[Exception] {
      DeltaTable.write(spark,
        Seq((2L, 5.0, 0.0)).toDF("id", "price", "g"), dir, mode = "append")
    }
    assert(e.getMessage != null)
    assert(t.refresh().version == 1L, "wrong generated value must not commit")
    // a correct supplied value commits
    DeltaTable.write(spark,
      Seq((2L, 5.0, 10.0)).toDF("id", "price", "g"), dir, mode = "append")
    // UPDATE of an input recomputes g for updated rows (stale g would now
    // refuse at prepareForWrite)
    t.update(Map("price" -> org.apache.spark.sql.functions.expr("price + 1")),
      Some("id = 1"))
    val after = t.toDF.orderBy("id").as[(Long, Double, Double)].collect().toSeq
    assert(after == Seq((1L, 11.0, 22.0), (2L, 5.0, 10.0)),
      s"UPDATE must recompute the generated column, got $after")
  }

  test("overwrite CDC on a column-mapped evolved table reads the evolved " +
      "column non-NULL") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir,
      configuration = Map(
        "delta.columnMapping.mode" -> "name",
        "delta.enableChangeDataFeed" -> "true",
        "delta.enableDeletionVectors" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("k = 2")) // DV-masked remove → overwrite CDC goes explicit
    require(t.snapshot.allFiles.exists(_.deletionVector.exists(_.cardinality > 0)))
    // overwrite with an EVOLVED schema: the CDC files must be written under
    // the COMMITTED metadata — under the pre-evolution meta the evolved
    // column keeps its logical name in the CDC parquet and CDF reads NULL
    DeltaTable.write(spark, Seq((9L, "z", 42L)).toDF("k", "v", "extra"), dir,
      mode = "overwrite", mergeSchema = true)
    val feed = t.loadCdf(2L, Some(2L))
      .filter("_change_type = 'insert'")
      .select("k", "extra").as[(Long, Option[Long])].collect().toSeq
    assert(feed == Seq((9L, Some(42L))),
      s"evolved column must round-trip through overwrite CDC, got $feed")
  }

  test("data files with glob metacharacters in their names read correctly") {
    import spark.implicits._
    // convert_to_delta registers whatever file names exist — rename a part
    // file to carry glob chars, like a foreign writer might produce
    val dir = tmpDir()
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1).write.parquet(dir)
    val d = new java.io.File(dir)
    val part = d.listFiles().find(_.getName.endsWith(".parquet")).get
    val weird = new java.io.File(d, "report [2020] {x}.parquet")
    assert(part.renameTo(weird))
    val t = DeltaTable.convertToDelta(spark, dir)
    assert(t.snapshot.allFiles.exists(_.path.contains("%5B2020%5D") ||
      t.snapshot.allFiles.exists(_.path.contains("[2020]"))),
      s"converted paths: ${t.snapshot.allFiles.map(_.path)}")
    // pre-fix: spark.read glob-expands '[2020]'/'{x}' and the read fails
    // (or silently matches other files)
    assert(t.toDF.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // DML across the weird name: rewrite + read-back still resolve it
    t.delete(Some("id = 2"))
    assert(t.toDF.as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("getAddActions(flatten): nested (struct-column) stats do not poison " +
      "the flat columns") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "x")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    // plant delta-spark-style NESTED stats (struct column `s`) into the
    // add action by rewriting the commit json — our writer emits flat
    // stats only, so synthesize the foreign shape
    val f = java.nio.file.Paths.get(dir, "_delta_log",
      graft.kernel.LogStore.commitFileName(0L))
    val nested = """{\"numRecords\":1,\"minValues\":{\"id\":\"1\",\"s\":{\"x\":\"a\"}},\"maxValues\":{\"id\":\"1\",\"s\":{\"x\":\"z\"}},\"nullCount\":{\"id\":0,\"s\":{\"x\":1}}}"""
    val txt = new String(Files.readAllBytes(f), "UTF-8")
      .replaceAll("\"stats\":\"\\{[^\"]*\\}\"", "\"stats\":\"" +
        java.util.regex.Matcher.quoteReplacement(nested) + "\"")
    Files.write(f, txt.getBytes("UTF-8"))
    val row = DeltaTable.forPath(spark, dir).getAddActions(flatten = true)
      .selectExpr("num_records", "element_at(min_values, 'id')",
        "element_at(null_counts, 'id')", "element_at(null_counts, 's')")
      .collect().head
    assert(row.getLong(0) == 1L, s"num_records must survive nested stats: $row")
    assert(row.getString(1) == "1")
    assert(row.getLong(2) == 0L,
      s"flat null_counts must survive a nested sibling: $row")
    assert(row.isNullAt(3), "nested entry surfaces as NULL, not a poison")
  }

  private def setMtime(dir: String, v: Long, ms: Long): Unit =
    Files.setLastModifiedTime(
      java.nio.file.Paths.get(dir, "_delta_log", f"$v%020d.json"),
      java.nio.file.attribute.FileTime.fromMillis(ms))

  test("non-ICT timestamp resolution: monotonicity clamp (ts = max(ts, prev+1)) " +
      "on shuffled mtimes, delta-spark parity") {
    import spark.implicits._
    val dir = tmpDir()
    (0 to 2).foreach { v =>
      DeltaTable.write(spark, Seq((v.toLong, s"v$v")).toDF("id", "txt"), dir,
        mode = "append")
    }
    // mtimes NON-monotonic: v2's mtime falls BETWEEN v0's and v1's (a log
    // copy can do this). Clamped sequence: v0=T, v1=T+10000, v2=T+10001.
    val base = 1700000000000L
    setMtime(dir, 0, base)
    setMtime(dir, 1, base + 10000)
    setMtime(dir, 2, base + 5000)
    val log = DeltaTable.forPath(spark, dir).deltaLog
    // a raw-mtime resolver at T+6000 returns v2 (max eligible version) —
    // i.e. a LATER version than T+10000 resolves to, which inverts time.
    // The clamp pins v0 here and v2 only above v1's timestamp.
    assert(log.snapshotForTimestamp(base + 6000).version == 0L)
    assert(log.snapshotForTimestamp(base + 10000).version == 1L)
    assert(log.snapshotForTimestamp(base + 10001).version == 2L)
    val e = intercept[IllegalArgumentException] {
      log.snapshotForTimestamp(base - 1)
    }
    assert(e.getMessage.contains("No commit at or before"))
  }

  test("mixed-window ICT table after a log copy: pre-enablement mtimes are " +
      "capped below the enablement boundary, not excluded") {
    import spark.implicits._
    val dir = tmpDir()
    (0 to 3).foreach { v =>
      DeltaTable.write(spark, Seq((v.toLong, s"v$v")).toDF("id", "txt"), dir,
        mode = "append")
    }
    val boundary = 1700000002000L // = v2's ICT (ICT enabled AT v2)
    val logDir = java.nio.file.Paths.get(dir, "_delta_log")
    // v0 carries the table's metaData/protocol: plant the feature + the
    // enablement property pair (the gate reads CURRENT metadata; the
    // window floor comes from the recorded enablement version)
    val f0 = logDir.resolve(f"${0}%020d.json")
    var t0 = new String(Files.readAllBytes(f0), "UTF-8")
    t0 = t0.replace("\"configuration\":{}",
      "\"configuration\":{\"delta.enableInCommitTimestamps\":\"true\"," +
        "\"delta.inCommitTimestampEnablementVersion\":\"2\"," +
        s""""delta.inCommitTimestampEnablementTimestamp":"$boundary"}""")
    t0 = t0.replaceAll("\\{\"protocol\":\\{[^}]*\\}\\}",
      "{\"protocol\":{\"minReaderVersion\":1,\"minWriterVersion\":7," +
        "\"writerFeatures\":[\"appendOnly\",\"invariants\",\"inCommitTimestamp\"]}}")
    Files.write(f0, t0.getBytes("UTF-8"))
    Seq(2, 3).foreach { v =>
      val f = logDir.resolve(f"$v%020d.json")
      val ict = boundary + (v - 2) * 1000L
      val t = new String(Files.readAllBytes(f), "UTF-8")
        .replace("{\"commitInfo\":{",
          "{\"commitInfo\":{\"inCommitTimestamp\":" + ict + ",")
      Files.write(f, t.getBytes("UTF-8"))
    }
    // the log copy: EVERY mtime fresh (way above the old recorded ICTs)
    val now = System.currentTimeMillis()
    (0 to 3).foreach(v => setMtime(dir, v, now + v))
    val log = DeltaTable.forPath(spark, dir).deltaLog

    // ICT window resolves by recorded values
    assert(log.snapshotForTimestamp(boundary).version == 2L)
    assert(log.snapshotForTimestamp(boundary + 1000).version == 3L)
    // a target just below the enablement boundary resolves to the LAST
    // pre-window version — uncapped fresh mtimes would throw here
    assert(log.snapshotForTimestamp(boundary - 1).version == 1L)
    assert(log.snapshotForTimestamp(boundary - 2).version == 0L)
    val e = intercept[IllegalArgumentException] {
      log.snapshotForTimestamp(boundary - 3)
    }
    assert(e.getMessage.contains("No commit at or before"))

    // history: window versions report recorded ICT, pre-window report mtime
    val h = DeltaTable.forPath(spark, dir).history().map(x => (x._1, x._2))
    assert(h.take(2) == Seq((3L, boundary + 1000), (2L, boundary)))
    assert(h.drop(2).forall(_._2 >= now), s"pre-window history must be mtime: $h")

    // equal pre-window mtimes BELOW the boundary: resolution must agree
    // with the non-ICT branch (forward clamp → the EARLIER version owns
    // the shared timestamp); an unconditional backward rewrite would hand
    // the shared timestamp to the LATER version instead
    val dir2 = tmpDir()
    (0 to 2).foreach { v =>
      DeltaTable.write(spark, Seq((v.toLong, s"v$v")).toDF("id", "txt"), dir2,
        mode = "append")
    }
    val logDir2 = java.nio.file.Paths.get(dir2, "_delta_log")
    val f0b = logDir2.resolve(f"${0}%020d.json")
    var t0b = new String(Files.readAllBytes(f0b), "UTF-8")
    t0b = t0b.replace("\"configuration\":{}",
      "\"configuration\":{\"delta.enableInCommitTimestamps\":\"true\"," +
        "\"delta.inCommitTimestampEnablementVersion\":\"2\"," +
        s""""delta.inCommitTimestampEnablementTimestamp":"$boundary"}""")
    t0b = t0b.replaceAll("\\{\"protocol\":\\{[^}]*\\}\\}",
      "{\"protocol\":{\"minReaderVersion\":1,\"minWriterVersion\":7," +
        "\"writerFeatures\":[\"appendOnly\",\"invariants\",\"inCommitTimestamp\"]}}")
    Files.write(f0b, t0b.getBytes("UTF-8"))
    val f2b = logDir2.resolve(f"${2}%020d.json")
    Files.write(f2b, new String(Files.readAllBytes(f2b), "UTF-8")
      .replace("{\"commitInfo\":{",
        "{\"commitInfo\":{\"inCommitTimestamp\":" + boundary + ",")
      .getBytes("UTF-8"))
    val sharedMtime = 1700000000000L // well below the boundary
    setMtime(dir2, 0, sharedMtime)
    setMtime(dir2, 1, sharedMtime)
    setMtime(dir2, 2, sharedMtime) // window mtime is irrelevant (ICT rules)
    val log2 = DeltaTable.forPath(spark, dir2).deltaLog
    assert(log2.snapshotForTimestamp(sharedMtime).version == 0L,
      "equal pre-window mtimes: the earlier version owns the shared " +
        "timestamp (forward-clamp parity with the non-ICT branch)")
    assert(log2.snapshotForTimestamp(sharedMtime + 1).version == 1L)
    assert(log2.snapshotForTimestamp(boundary).version == 2L)
  }

  test("present-but-unparseable retention intervals fail loudly, not " +
      "silently collapse to the default") {
    import spark.implicits._
    import graft.kernel.DeltaConfig
    // a configured window LONGER than the default silently became the
    // default — cleanup then destroys logs/tombstones the user asked to
    // keep. Month/year units are rejected like delta-spark.
    assert(DeltaConfig.durationMs("k", "interval 2 weeks") == 14L * 86400000)
    val e = intercept[IllegalArgumentException] {
      DeltaConfig.durationMs("delta.logRetentionDuration", "interval 2 months")
    }
    assert(e.getMessage.contains("month/year"), e.getMessage)
    // and the value can't be PLANTED by this engine: setProperties
    // validates retention keys at set time
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir)
    val t = DeltaTable.forPath(spark, dir)
    val e2 = intercept[IllegalArgumentException] {
      t.setProperties(Map("delta.deletedFileRetentionDuration" -> "interval 3 years"))
    }
    assert(e2.getMessage.contains("cannot parse interval"), e2.getMessage)
    t.setProperties(Map("delta.deletedFileRetentionDuration" -> "interval 14 days"))
    assert(t.refresh().metadata.configuration(
      "delta.deletedFileRetentionDuration") == "interval 14 days")
  }

  test("loadCdf validates endingVersion symmetrically with startingVersion") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1, "a")).toDF("id", "v"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val t = DeltaTable.forPath(spark, dir)
    val e = intercept[IllegalArgumentException] {
      graft.ops.CdfRead.load(t, 0, Some(99))
    }
    assert(e.getMessage.contains("endingVersion 99 is beyond the latest"),
      e.getMessage)
  }

  test("zorder preserves a user column named __zkey (temp key renames)") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1 to 50).map(i => (i.toLong, i * 2.0, s"z$i")).toDF("id", "price", "__zkey"),
      dir)
    val t = DeltaTable.forPath(spark, dir)
    t.optimizeZOrder(Seq("id", "price"))
    // the temp clustering key used to REPLACE then DROP the user column —
    // every later read returned NULL for all 50 rows
    val vals = t.toDF.select("__zkey").collect().map(_.getString(0)).toSet
    assert(vals == (1 to 50).map(i => s"z$i").toSet,
      s"__zkey column lost/overwritten by OPTIMIZE Z-ORDER: ${vals.take(3)}")
  }

  test("nested non-nullable struct fields are enforced on write") {
    import org.apache.spark.sql.types._
    import org.apache.spark.sql.{Row => SRow}
    val dir = tmpDir()
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("s", StructType(Seq(
        StructField("x", LongType, nullable = false),
        StructField("y", StringType))), nullable = true)))
    graft.table.DeltaTable.create(spark, dir, schema, Nil)
    val t = DeltaTable.forPath(spark, dir)
    // parent null: vacuous, must pass
    val okDf = spark.createDataFrame(
      java.util.Arrays.asList(SRow(1L, null), SRow(2L, SRow(5L, "a"))), schema)
    DeltaTable.write(spark, okDf, dir, mode = "append")
    assert(t.toDF.count() == 2)
    // nested null under a non-null parent: must REFUSE (was silently
    // committed — Spark schema nullability is advisory)
    val badDf = spark.createDataFrame(
      java.util.Arrays.asList(SRow(3L, SRow(null, "b"))), schema)
    val e = intercept[Throwable] {
      DeltaTable.write(spark, badDf, dir, mode = "append")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + msgs(x.getCause)
    assert(msgs(e).contains("NOT NULL constraint violated for column: s.x"),
      msgs(e).take(400))
  }

  test("a case-variant generated column is VALIDATED, not silently replaced") {
    import spark.implicits._
    val dir = tmpDir()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("g",
        org.apache.spark.sql.types.LongType,
        nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putString("delta.generationExpression", "id + 1").build())))
    graft.table.DeltaTable.create(spark, dir, schema, Nil)
    // user supplies WRONG values under the case-variant name "G": the
    // exact-case presence test used to let fill() compute g and silently
    // DISCARD the user's column (withColumn resolves case-insensitively)
    val e = intercept[Throwable] {
      DeltaTable.write(spark, Seq((1L, 99L)).toDF("id", "G"), dir, mode = "append")
    }
    def msgs(x: Throwable): String =
      if (x == null) "" else Option(x.getMessage).getOrElse("") + msgs(x.getCause)
    assert(msgs(e).contains("Generated column g"), msgs(e).take(400))
    // correct values under the variant name still write
    DeltaTable.write(spark, Seq((1L, 2L)).toDF("id", "G"), dir, mode = "append")
    assert(DeltaTable.forPath(spark, dir).toDF
      .selectExpr("g").collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("an unparseable delta.invariants shape refuses the write") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("v", LongType, nullable = true,
        new MetadataBuilder()
          .putString("delta.invariants", """{"expression":"v < 3"}""").build())))
    // flat shape (a third-party writer): the protocol requires writers to
    // ENFORCE invariants — silently skipping the check let violating rows
    // commit against metadata other engines trust
    val e = intercept[IllegalArgumentException] {
      graft.ops.Validation.invariants(schema)
    }
    assert(e.getMessage.contains("cannot parse delta.invariants"), e.getMessage)
  }

  test("MERGE round-13 guards: by-source dup rewrite, CI SET keys, " +
      "unknown keys, reserved bookkeeping names, struct join keys") {
    import spark.implicits._
    import graft.ops.MergeDuplicateMatchException

    // by-source-only merge whose changed file carries a target row matched
    // by TWO source rows: the copy rode the full-outer join twice and was
    // WRITTEN TWICE (silent duplicate-row corruption); must throw now
    val d1 = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), d1)
    val t1 = DeltaTable.forPath(spark, d1)
    val dupSrc = Seq((1L, "x"), (1L, "y")).toDF("id", "v")
    intercept[MergeDuplicateMatchException] {
      t1.merge(dupSrc, "target.id = source.id")
        .whenNotMatchedBySourceDelete().execute()
    }
    assert(t1.refresh().version == 0L, "failed merge must not commit")
    assert(t1.toDF.count() == 2)

    // case-insensitive SET/INSERT keys: "V" against target column v must
    // assign (was silently ignored — old value kept, NULL inserted)
    val d2 = tmpDir()
    DeltaTable.write(spark, Seq((1L, "old")).toDF("id", "v"), d2)
    val t2 = DeltaTable.forPath(spark, d2)
    t2.merge(Seq((1L, "new"), (3L, "ins")).toDF("id", "v"),
        "target.id = source.id")
      .whenMatchedUpdate(Map("V" -> "source.v"))
      .whenNotMatchedInsert(Map("ID" -> "source.id", "V" -> "source.v"))
      .execute()
    assert(t2.toDF.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "new"), (3L, "ins")))

    // a typo'd SET key must refuse loudly, not silently no-op
    val e = intercept[IllegalArgumentException] {
      t2.merge(Seq((1L, "z")).toDF("id", "v"), "target.id = source.id")
        .whenMatchedUpdate(Map("vv" -> "source.v")).execute()
    }
    assert(e.getMessage.contains("unknown target column 'vv'"), e.getMessage)

    // reserved bookkeeping names refuse up front (a data column named __op
    // was silently REPLACED and written back corrupted)
    val d3 = tmpDir()
    DeltaTable.write(spark, Seq((1L, 7)).toDF("id", "__op"), d3)
    val e3 = intercept[IllegalArgumentException] {
      DeltaTable.forPath(spark, d3)
        .merge(Seq((1L, 8)).toDF("id", "__op"), "target.id = source.id")
        .whenMatchedUpdateAll().execute()
    }
    assert(e3.getMessage.contains("reserved for MERGE bookkeeping"), e3.getMessage)

    // struct join key: the early-filter min/max literal cannot express a
    // struct — must fail OPEN (merge succeeds), not crash
    val d4 = tmpDir()
    // explicit nullable inner field — a NOT NULL struct field hits
    // Catalyst's separate outer-join cast rule, unrelated to this guard
    import org.apache.spark.sql.types.{StructType => ST, StructField => SF, LongType, StringType}
    val kSchema = ST(Seq(
      SF("k", ST(Seq(SF("n", LongType, nullable = true))), nullable = true),
      SF("v", StringType)))
    def structDf(rows: Seq[(Long, String)]) = spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (n, v) =>
        org.apache.spark.sql.Row(org.apache.spark.sql.Row(n), v) }: _*), kSchema)
    DeltaTable.write(spark, structDf(Seq((1L, "a"))), d4)
    val t4 = DeltaTable.forPath(spark, d4)
    t4.merge(structDf(Seq((1L, "upd"), (2L, "ins"))), "target.k = source.k")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().execute()
    assert(t4.toDF.select("v").as[String].collect().toSet == Set("upd", "ins"))
  }
}
