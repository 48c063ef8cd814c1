package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** Round-7 scale proof: MERGE over a multi-million-row target behaves like
  * the 100 TB design says it should — exact metrics, every phase recorded,
  * distributed output, wall time bounded. Complements Round6Spec's 5M-Add
  * snapshot bound (control plane) with a data-plane bound. */
class Round7Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test-r7")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r7_").toString + "/t"

  test("MERGE at 2M rows: exact metrics, all phases, bounded wall time") {
    val dir = tmpDir()
    val n = 2000000L
    val target = spark.range(n).select(
      col("id"),
      (col("id") % 1000).as("grp"),
      (col("id") * 7 % 10007).cast("double").as("v"),
      concat(lit("pad-"), col("id").cast("string")).as("pad"))
      .repartition(16)
    DeltaTable.write(spark, target, dir)

    // source: 10% updates (every 10th id) + 1% inserts (ids past the range)
    val updates = spark.range(n / 10).select(
      (col("id") * 10).as("id"),
      (col("id") % 1000).as("grp"),
      lit(-1.0).as("v"),
      lit("updated").as("pad"))
    val inserts = spark.range(n / 100).select(
      (col("id") + n).as("id"),
      (col("id") % 1000).as("grp"),
      lit(-2.0).as("v"),
      lit("inserted").as("pad"))
    val source = updates.unionByName(inserts)

    val t0 = System.nanoTime()
    val metrics = DeltaTable.forPath(spark, dir)
      .merge(source, "target.id = source.id")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll()
      .execute()
    val mergeSec = (System.nanoTime() - t0) / 1e9

    assert(metrics("num_target_rows_updated").toLong == n / 10)
    assert(metrics("num_target_rows_inserted").toLong == n / 100)
    assert(metrics("num_target_rows_deleted").toLong == 0L)

    // every phase of the one-pass design fired and was accounted for
    // (r16: the dedicated join_persist materialization pass was removed —
    // the first consumer, bookkeeping_pass, materializes the cache)
    val phases = graft.ops.MergeOp.lastPhases
    Seq("early_filter_agg", "bookkeeping_pass",
      "output_write", "commit").foreach(p =>
      assert(phases.contains(p), s"phase $p missing from ${phases.keySet}"))
    assert(!phases.contains("join_persist"),
      "the dedicated join-materialization pass is gone (r16): its " +
        "reappearance means the merge re-grew a throwaway full cache read")

    val t = DeltaTable.forPath(spark, dir)
    assert(t.toDF.count() == n + n / 100)
    assert(t.toDF.filter("v = -1.0").count() == n / 10)
    assert(t.toDF.filter("v = -2.0").count() == n / 100)
    // rewrite stayed distributed: more than one output file was written
    assert(metrics("num_target_files_added").toLong > 1)

    // generous ceiling (shared host): the same shape at sf0.1 (150k rows)
    // benches ~1.7s; 2M rows must stay within an order of magnitude, not
    // fall off a quadratic or driver-side cliff
    assert(mergeSec < 120.0, f"2M-row merge took $mergeSec%.1fs")
    System.err.println(f"[r7] 2M-row merge=$mergeSec%.1fs phases=" +
      phases.map { case (k, v) => f"$k=$v%.2f" }.mkString(","))
  }

  test("commit metadata: txn fields, conf fallback, reserved keys, foreign extras") {
    import graft.kernel.{ActionCodec, CommitInfo, Operation}
    val dir = tmpDir()
    spark.conf.set("spark.graft.commitInfo.userMetadata", "conf-level")
    try DeltaTable.write(spark,
      spark.range(5).select(col("id")), dir)
    finally spark.conf.unset("spark.graft.commitInfo.userMetadata")
    val t = DeltaTable.forPath(spark, dir)
    val ci0 = t.history().find(_._1 == 0L).get._3.get
    assert(ci0.userMetadata.contains("conf-level"))

    // explicit txn metadata wins over conf; extras roundtrip via the log
    val txn = t.startTransaction()
    txn.commitUserMetadata = Some("explicit")
    txn.commitAppMetadata = Map("runId" -> "abc")
    txn.readWholeTable()
    spark.conf.set("spark.graft.commitInfo.userMetadata", "conf-ignored")
    try txn.commit(Seq(t.snapshot.allFiles.head.copy(dataChange = false)),
      Operation("COMPUTE STATS", Map.empty, Map.empty))
    finally spark.conf.unset("spark.graft.commitInfo.userMetadata")
    val ci1 = DeltaTable.forPath(spark, dir).history().find(_._1 == 1L).get._3.get
    assert(ci1.userMetadata.contains("explicit") && ci1.info == Map("runId" -> "abc"))

    // reserved keys are refused, not silently shadowed
    val bad = DeltaTable.forPath(spark, dir).startTransaction()
    bad.commitAppMetadata = Map("operation" -> "FAKE")
    bad.readWholeTable()
    val e = intercept[IllegalArgumentException](
      bad.commit(Nil, Operation("NOOP", Map.empty, Map.empty)))
    assert(e.getMessage.contains("reserved"))

    // foreign commitInfo: string extras captured, non-string extras dropped
    val parsed = ActionCodec.fromJson(
      """{"commitInfo":{"operation":"WRITE","userId":"u1","userMetadata":"m",
        |"stats":{"n":1},"count":3}}""".stripMargin.replace("\n", "")).get
      .asInstanceOf[CommitInfo]
    assert(parsed.userMetadata.contains("m"))
    assert(parsed.info == Map("userId" -> "u1"))
  }

  test("createCheckpoint + cleanupMetadata: explicit maintenance surface") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark, Seq((1L, "a")).toDF("id", "s"), dir,
      configuration = Map("delta.logRetentionDuration" -> "interval 1 millisecond",
        // keep auto-checkpointing out of the way so the explicit calls act
        "delta.checkpointInterval" -> "1000"))
    for (i <- 2 to 5)
      DeltaTable.write(spark, Seq((i.toLong, s"v$i")).toDF("id", "s"), dir,
        mode = "append")

    val t = DeltaTable.forPath(spark, dir)
    // no checkpoint yet: cleanup must be a NO-OP (commits are still needed)
    t.cleanupMetadata()
    val logDir = new java.io.File(dir, "_delta_log")
    def logNames = logDir.listFiles().map(_.getName).toSet
    assert((0 to 4).forall(v => logNames.contains(f"$v%020d.json")),
      s"cleanup before any checkpoint must delete nothing: $logNames")

    // a multi-part checkpoint FRAGMENT (crashed mid-publication: part 1 of
    // 3 only) must NOT become the cleanup cutoff — with no usable
    // checkpoint at all, cleaning against it would destroy the only replay
    // source. Age everything first so retention can't mask the guard.
    val frag = new java.io.File(logDir,
      f"${3}%020d.checkpoint.${1}%010d.${3}%010d.parquet")
    java.nio.file.Files.write(frag.toPath, Array[Byte](1, 2, 3))
    val fsPre = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    logDir.listFiles().foreach(f => fsPre.setTimes(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), 1000L, 1000L))
    DeltaTable.forPath(spark, dir).cleanupMetadata()
    assert((0 to 4).forall(v => logNames.contains(f"$v%020d.json")),
      s"a checkpoint fragment must not move the cleanup cutoff: $logNames")

    t.createCheckpoint()
    assert(logNames.exists(_.matches("0{16}0004\\.checkpoint.*")),
      s"explicit checkpoint missing: $logNames")

    // age every log file past the 1ms retention, then clean
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    logDir.listFiles().foreach(f => fs.setTimes(
      new org.apache.hadoop.fs.Path(f.getAbsolutePath), 1000L, 1000L))
    DeltaTable.forPath(spark, dir).cleanupMetadata()
    assert((0 to 3).forall(v => !logNames.contains(f"$v%020d.json")),
      s"expired commits behind the checkpoint must be gone: $logNames")
    assert(logNames.contains(f"${4}%020d.json"),
      "the checkpoint-version commit itself survives")
    // table still fully readable from the checkpoint
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 5)
    // time travel behind the checkpoint is gone (loud, not wrong)
    intercept[Exception](DeltaTable.forPath(spark, dir).asOfVersion(0).count())
  }

  test("vacuum modes: lite only touches tombstoned files, keepVersions protects") {
    import spark.implicits._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.delete(Some("id <= 50"))                 // v1: tombstones + rewrites
    // untracked orphan in the table dir
    val fs = t.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    val dataFile = t.snapshot.allFiles.head.path
    org.apache.hadoop.fs.FileUtil.copy(fs,
      new org.apache.hadoop.fs.Path(dir, dataFile), fs,
      new org.apache.hadoop.fs.Path(dir, "part-orphan.snappy.parquet"),
      false, spark.sessionState.newHadoopConf())

    def names(l: Seq[String]) = l.map(_.split("/").last).toSet
    val lite = t.vacuum(0, dryRun = true, enforceRetention = false, mode = "lite")
    val full = t.vacuum(0, dryRun = true, enforceRetention = false)
    assert(lite.nonEmpty, "expired tombstoned files expected")
    assert(names(lite).subsetOf(names(full)))
    assert(!names(lite).contains("part-orphan.snappy.parquet"),
      s"lite must not touch untracked files: $lite")
    assert(names(full).contains("part-orphan.snappy.parquet"),
      s"full must reap stale orphans: $full")
    // protecting every referenced version leaves only the orphan
    val kept = t.vacuum(0, dryRun = true, enforceRetention = false,
      keepVersions = Seq(0L, 1L))
    assert(names(kept) == Set("part-orphan.snappy.parquet"), s"kept: $kept")
    // bad mode refused (enforceRetention=false so the retention guard's
    // IllegalArgumentException can't mask a missing mode check)
    val badMode = intercept[IllegalArgumentException](
      t.vacuum(0, enforceRetention = false, mode = "both"))
    assert(badMode.getMessage.contains("unknown mode"))
    // real lite delete: orphan and live data survive, table still reads
    t.vacuum(0, dryRun = false, enforceRetention = false, mode = "lite")
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "part-orphan.snappy.parquet")))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 50)
  }

  test("checkpoint stats_parsed-only layout: stats survive the read") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = tmpDir()
    DeltaTable.write(spark,
      (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2), dir)
    val t = DeltaTable.forPath(spark, dir)
    t.createCheckpoint()
    assert(t.approxCount.contains(100L))

    // rewrite the checkpoint the way delta-spark's writeStatsAsJson=false /
    // writeStatsAsStruct=true lays it out: stats STRUCT, no raw JSON
    val cpFile = new java.io.File(dir, "_delta_log").listFiles()
      .map(_.getName).filter(_.matches("\\d{20}\\.checkpoint\\.parquet")).head
    val cpPath = s"$dir/_delta_log/$cpFile"
    val cp = spark.read.parquet(cpPath)
    // withField is null-safe (null add stays null), and a when/otherwise
    // would fail analysis: the branches differ in shape once a field is added
    val rewritten = cp.withColumn("add",
      col("add")
        .withField("stats_parsed",
          struct(get_json_object(col("add.stats"), "$.numRecords")
            .cast("long").as("numRecords")))
        .withField("stats", lit(null).cast("string")))
    val tmpOut = tmpDir()
    rewritten.coalesce(1).write.mode("overwrite").parquet(tmpOut)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmpOut))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    fs.delete(new org.apache.hadoop.fs.Path(cpPath), false)
    org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
      new org.apache.hadoop.fs.Path(cpPath), false,
      spark.sessionState.newHadoopConf())
    // delete the commits so replay MUST come from the rewritten checkpoint
    new java.io.File(dir, "_delta_log").listFiles()
      .filter(_.getName.endsWith(".json"))
      .filterNot(_.getName.startsWith("_")).foreach(_.delete())

    val t2 = DeltaTable.forPath(spark, dir)
    assert(t2.toDF.count() == 100L)
    assert(t2.approxCount.contains(100L),
      "numRecords must be recovered from stats_parsed when raw stats are absent")
  }

  test("lazy-snapshot vacuum protects DV blobs of RETAINED tombstones") {
    import spark.implicits._
    val dir = tmpDir()
    val prevThreshold = spark.conf.getOption("spark.graft.lazySnapshotThreshold")
    try {
      DeltaTable.write(spark,
        (1L to 100L).map(i => (i, s"v$i")).toDF("id", "s").repartition(2), dir,
        configuration = Map("delta.enableDeletionVectors" -> "true"))
      val t0 = DeltaTable.forPath(spark, dir)
      t0.delete(Some("id % 10 = 0"))  // v1: DV mask #1
      t0.delete(Some("id % 10 = 1"))  // v2: DV mask #2 supersedes #1 —
                                      // blob #1 now held only by a RECENT tombstone
      t0.createCheckpoint()
      val blobs = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.startsWith("deletion_vector_")).toSet
      assert(blobs.size >= 2, s"expected superseded + live DV blobs: $blobs")

      // age every FILE far past any retention while the tombstones'
      // deletionTimestamps (in the log) stay NOW-recent — protection, not
      // file age, is what must keep the superseded blobs alive
      val fsA = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sessionState.newHadoopConf())
      new java.io.File(dir).listFiles().filterNot(_.isDirectory)
        .foreach(f => fsA.setTimes(
          new org.apache.hadoop.fs.Path(f.getAbsolutePath), 1000L, 1000L))

      // force the lazy index so vacuum takes the DataFrame (anti-join) path
      spark.conf.set("spark.graft.lazySnapshotThreshold", "1")
      val t = DeltaTable.forPath(spark, dir)
      assert(t.snapshot.lazyIndex.exists(!_.isMaterialized),
        "test setup: snapshot must be lazy")
      val cand = t.vacuum(1.0, dryRun = true, enforceRetention = false)
      val candBlobs = cand.map(_.split("/").last).filter(_.startsWith("deletion_vector_"))
      assert(candBlobs.isEmpty,
        s"retained-tombstone DV blobs must be protected on the lazy path: $cand")
    } finally prevThreshold match {
      case Some(v) => spark.conf.set("spark.graft.lazySnapshotThreshold", v)
      case None => spark.conf.unset("spark.graft.lazySnapshotThreshold")
    }
  }

  test("optimize minCommitInterval: progress banked across multiple commits") {
    val dir = tmpDir()
    // 3 partitions × 6 small files — several bins, each well under target
    val df = spark.range(1800).select(
      col("id"), (col("id") % 3).cast("string").as("p"),
      concat(lit("v"), col("id").cast("string")).as("s"))
    DeltaTable.write(spark, df.repartition(6), dir, partitionBy = Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    val v0 = t.version
    val before = t.toDF.select("id", "p", "s").collect().map(_.toString).sorted

    // interval 0 → every completed-bin batch commits immediately; serial
    // bin execution (maxConcurrentTasks=1) makes the chunking deterministic
    spark.conf.set("spark.graft.optimize.maxConcurrentTasks", "1")
    val metrics =
      try t.optimizeCompact(targetSizeBytes = 512L * 1024 * 1024,
        minCommitInterval = Some(0L))
      finally spark.conf.unset("spark.graft.optimize.maxConcurrentTasks")

    val nCommits = metrics("num_commits").toInt
    assert(nCommits >= 2, s"expected multiple incremental commits, got $metrics")
    assert(t.version == v0 + nCommits)
    assert(metrics("num_files_removed").toInt >= 6)
    assert(metrics("partitions_optimized").toInt == 3)
    // every incremental commit is an OPTIMIZE with dataChange=false actions
    val hist = t.history(Some(nCommits))
    assert(hist.forall(_._3.exists(_.operation == "OPTIMIZE")))
    val log = new graft.kernel.DeltaLog(spark, new org.apache.hadoop.fs.Path(dir))
    (v0 + 1 to t.version).foreach { v =>
      val acts = log.readCommit(v)
      val changed = acts.exists {
        case a: graft.kernel.AddFile => a.dataChange
        case r: graft.kernel.RemoveFile => r.dataChange
        case _ => false
      }
      assert(!changed, s"commit $v must be dataChange=false")
    }
    // data identical, and the file count actually shrank
    val after = t.toDF.select("id", "p", "s").collect().map(_.toString).sorted
    assert(after.sameElements(before))
    assert(t.snapshot.allFiles.size == 3)
  }

  test("incremental optimize conflict-checks commits landed since PLANNING") {
    val dir = tmpDir()
    val df = spark.range(600).select(
      col("id"), (col("id") % 2).cast("string").as("p"))
    DeltaTable.write(spark, df.repartition(4), dir, partitionBy = Seq("p"))
    val t = DeltaTable.forPath(spark, dir)
    val before = t.toDF.count()

    // between bin planning and the FIRST chunk commit, an external writer
    // deletes rows living in the planned bins — a chunk transaction pinned
    // to the current (post-delete) snapshot would skip the conflict and
    // resurrect them; pinned to the planning snapshot it must abort
    @volatile var fired = false
    graft.ops.OptimizeOp.onBeforeChunkCommit = () => {
      if (!fired) {
        fired = true
        DeltaTable.forPath(spark, dir).delete(Some("id % 3 = 0"))
      }
    }
    try {
      val e = intercept[graft.kernel.CommitConflictException] {
        spark.conf.set("spark.graft.optimize.maxConcurrentTasks", "1")
        try t.optimizeCompact(targetSizeBytes = 512L * 1024 * 1024,
          minCommitInterval = Some(0L))
        finally spark.conf.unset("spark.graft.optimize.maxConcurrentTasks")
      }
      assert(fired, s"hook never fired; got ${e.getMessage}")
      // the delete survived — no resurrection
      assert(DeltaTable.forPath(spark, dir).toDF.count() == before - 200)
    } finally graft.ops.OptimizeOp.onBeforeChunkCommit = () => ()
  }

  test("ingestion ops at 2M rows: crossDedup + shuffleShards bounded and exact") {
    import spark.implicits._
    val n = 2000000L
    // corpus: 2M short docs; shard: 200k rows of which half are corpus
    // copies (same text) and half novel
    def text(idc: org.apache.spark.sql.Column) =
      concat(lit("tok"), (idc % 99991).cast("string"), lit(" word "),
        (idc % 1013).cast("string"), lit(" tail "), idc.cast("string"))
    val corpus = spark.range(n).select(col("id").as("doc_id"),
      text(col("id")).as("text"))
    val shard = spark.range(100000)
      .select((col("id") + n).as("doc_id"), text(col("id") * 17).as("text"))
      .unionByName(spark.range(100000).select(
        (col("id") + 2 * n).as("doc_id"),
        concat(lit("novel "), col("id").cast("string")).as("text")))

    val t0 = System.nanoTime()
    val admitted = graft.llm.Dedup.crossDedup(corpus, shard, "doc_id", "text")
      .count()
    val dedupSec = (System.nanoTime() - t0) / 1e9
    // copies: text(id*17) for id<100000 equals a corpus text (id*17 < 2M)
    // → all dropped; novel texts admitted (self-deduped: all unique)
    assert(admitted == 100000L, s"admitted=$admitted")
    assert(dedupSec < 120.0, s"crossDedup at 2M took ${dedupSec}s")

    val t1 = System.nanoTime()
    val sh = graft.llm.Curation.shuffleShards(corpus, "doc_id",
      nShards = 64, salt = "scale")
    val agg = sh.groupBy("shard")
      .agg(count(lit(1)).as("c"), max("pos").as("m"))
      .collect()
    val shufSec = (System.nanoTime() - t1) / 1e9
    assert(agg.length == 64)
    // positions are exactly 1..count per shard and shards are balanced
    assert(agg.forall(r => r.getLong(2) == r.getLong(1)))
    val sizes = agg.map(_.getLong(1))
    assert(sizes.max < 2 * sizes.min,
      s"shard skew: min=${sizes.min} max=${sizes.max}")
    assert(shufSec < 90.0, s"shuffleShards at 2M took ${shufSec}s")
  }
}
