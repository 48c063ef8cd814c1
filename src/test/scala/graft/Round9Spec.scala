package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** Round-9 regressions for the r8 advisor findings: SQL NULL semantics in
  * incremental aggregate maintenance, 32-bit feature-hash bucket space,
  * and SigV4 header-value space collapsing (verified by straight-line
  * reconstruction, not by reusing the signer). */
class Round9Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test-r9")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r9_").toString + "/t"

  test("IncrementalAgg: all-NULL groups maintain sum = NULL exactly like full recompute") {
    val dir = tmpDir(); val tgt = tmpDir()
    // grp 9's values are ALL NULL; every other group fully populated
    val base = spark.range(100).select(col("id"), (col("id") % 10).as("grp"),
      when(col("id") % 10 === 9, lit(null).cast("long"))
        .otherwise(col("id") * 2).as("v"))
    DeltaTable.write(spark, base, dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val up = DeltaTable.forPath(spark, dir)

    def targetRows() = DeltaTable.forPath(spark, tgt).toDF
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    def fullRows() = up.toDF.groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        count(col("v")).as("nn_v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap

    graft.ops.IncrementalAgg.refresh(up, tgt, Seq("grp"), Seq("v"))
    assert(targetRows() == fullRows(), "snapshot build diverged")
    assert(targetRows()(9L)._2.isEmpty,
      s"all-NULL group must carry sum = NULL, got ${targetRows()(9L)}")

    // a non-null value enters the all-NULL group -> sum flips to it
    up.update(Map("v" -> expr("CAST(55 AS BIGINT)")), Some("id = 9"))
    graft.ops.IncrementalAgg.refresh(up, tgt, Seq("grp"), Seq("v"))
    assert(targetRows() == fullRows(), "NULL->non-NULL transition diverged")
    assert(targetRows()(9L)._2.contains(55L))

    // and leaves again -> sum flips back to NULL, not 0
    up.update(Map("v" -> expr("CAST(NULL AS BIGINT)")), Some("id = 9"))
    graft.ops.IncrementalAgg.refresh(up, tgt, Seq("grp"), Seq("v"))
    assert(targetRows() == fullRows(), "non-NULL->NULL transition diverged")
    assert(targetRows()(9L)._2.isEmpty,
      s"group back to all-NULL must return to sum = NULL: ${targetRows()(9L)}")
  }

  test("IncrementalAgg: a pre-nn target is migrated in place (exact backfill), not wedged") {
    val dir = tmpDir(); val tgt = tmpDir()
    val base = spark.range(60).select(col("id"), (col("id") % 3).as("grp"),
      when(col("id") % 3 === 2, lit(null).cast("long"))
        .otherwise(col("id") * 5).as("v"))
    DeltaTable.write(spark, base, dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val up = DeltaTable.forPath(spark, dir)
    val appId = graft.ops.IncrementalAgg.appIdFor(up)

    // hand-build the LEGACY target shape: keys + cnt + sum_v only (sum as
    // coalesce-to-0, the old semantics), txn recording version 0 folded
    val legacySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_v",
        org.apache.spark.sql.types.LongType)))
    DeltaTable.create(spark, tgt, legacySchema, Nil)
    val legacyRows = up.toDF.groupBy("grp")
      .agg(count(lit(1)).as("cnt"),
        sum(coalesce(col("v"), lit(0L))).as("sum_v"))
    DeltaTable.forPath(spark, tgt)
      .merge(legacyRows, "target.grp <=> source.grp")
      .whenNotMatchedInsert(Map("grp" -> "source.grp", "cnt" -> "source.cnt",
        "sum_v" -> "source.sum_v"))
      .withAppTransaction(appId, 0L)
      .execute()

    // new upstream commit, then a refresh with the nn-aware code
    up.delete(Some("id < 6"))
    graft.ops.IncrementalAgg.refresh(up, tgt, Seq("grp"), Seq("v"))

    val got = DeltaTable.forPath(spark, tgt).toDF
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    val want = up.toDF.groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"),
        count(col("v")).as("nn_v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    assert(got == want, s"migrated refresh != full recompute: $got vs $want")
    assert(got(2L)._2.isEmpty,
      s"legacy 0-sum of the all-NULL group must flip to NULL: ${got(2L)}")
  }

  test("hashedFeatures buckets span the full 32-bit-hash space above 2^16") {
    import spark.implicits._
    // ~3000 distinct tokens; with a 16-bit bucket hash every bucket
    // >= 65536 would be PERMANENTLY empty (P[all below 65536 under the
    // 32-bit hash] = 16^-3000)
    val text = (1 to 3000).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val out = graft.llm.TextOps.hashedFeatures(df, "doc_id", "text",
      numBuckets = 1 << 20)
    val maxBucket = out.agg(max("bucket")).collect()(0).getLong(0)
    assert(maxBucket >= 65536L,
      s"bucket hash is still 16-bit: max bucket $maxBucket of ${1 << 20}")
    val score = graft.llm.TextOps.linearScore(df, "doc_id", "text",
      Array.tabulate(1 << 17)(i => if (i >= 65536) 1.0 else 0.0))
      .collect()(0).getDouble(2)
    assert(score > 0.0,
      "linearScore never consults weights above index 65536 — 16-bit bucket hash")
  }

  test("dedupParagraphs: global first-occurrence, intra-doc repeats, blank collapse") {
    import spark.implicits._
    val df = Seq(
      (1L, "unique one\nShared Footer!\nunique two"),
      (2L, "shared footer\nonly mine"),            // normalized == doc 1's footer
      (3L, "gone\n\n  \ngone"),                    // intra-doc repeat + blanks
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = graft.llm.Dedup.dedupParagraphs(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "unique one\nShared Footer!\nunique two")
    assert(out(2L) == "only mine",
      s"doc 2 must lose the footer doc 1 already carries: '${out(2L)}'")
    assert(out(3L) == "gone", s"intra-doc repeat + blanks must collapse: '${out(3L)}'")
    assert(out(4L) == "", "NULL text must clean to empty, not vanish")
    assert(out.size == 4)
  }

  test("llm review regressions: blocklist entry normalization, NULL routing, probes") {
    import spark.implicits._
    // un-normalized entries must hit their normalized token forms
    val df = Seq((1L, "VIAGRA!! and viagra"), (2L, "clean prose")).toDF("doc_id", "text")
    val out = graft.llm.TextOps.blocklistStats(df, "doc_id", "text", Seq("Viagra!"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 2L, s"entry 'Viagra!' must hit both token variants: $out")
    assert(out(2L) == 0L)
    // an entry that can never match a token is refused, not silently inert
    intercept[IllegalArgumentException](
      graft.llm.TextOps.blocklistStats(df, "doc_id", "text", Seq("two words")))
    intercept[IllegalArgumentException](
      graft.llm.TextOps.blocklistStats(df, "doc_id", "text", Seq("!!!")))

    // NULL-cluster rows must hash-distribute across splits, not all land
    // in the LAST split via NULL when-conditions
    val docs = Seq((Some(1L), "a"), (None: Option[Long], "b")).toDF("doc_id", "text")
    val noPairs = spark.emptyDataFrame.select(lit(0L).as("id_a"), lit(0L).as("id_b"))
      .filter(lit(false))
    val splits = (1 to 6).map { i =>
      graft.llm.Curation.leakFreeSplit(docs, "doc_id", noPairs,
        Seq("train" -> 0.5, "test" -> 0.5), salt = s"s$i")
        .filter(col("doc_id").isNull).select("split").collect()(0).getString(0)
    }
    assert(splits.toSet.size > 1,
      s"NULL-cluster rows always routed to one split across salts: $splits")

    // NULL payloads emit no phantom frames
    val frames = graft.llm.Multimodal.frameSample(
      Seq((1L, Array[Byte](1, 2, 3, 4)), (2L, null.asInstanceOf[Array[Byte]]))
        .toDF("id", "payload"), "id", "payload", nFrames = 2, frameSize = 2)
    assert(frames.filter(col("id") === 2L).count() == 0L,
      "NULL payload fabricated frames")
    assert(frames.filter(col("id") === 1L).count() == 2L)

    // persisted signatures with the wrong hash count are refused up front
    val corpus = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val sigs = graft.llm.Dedup.signatures(corpus, "doc_id", "text",
      shingleSize = 2, numHashes = 8)
    val e = intercept[IllegalArgumentException](
      graft.llm.Dedup.crossNearDupsAgainstSignatures(sigs, corpus,
        "doc_id", "text", shingleSize = 2, numHashes = 16, bands = 8))
    assert(e.getMessage.contains("8 hashes"), e.getMessage)
  }

  test("dedupParagraphs invariants on a randomized corpus") {
    import spark.implicits._
    // small vocabulary forces heavy cross-document paragraph collisions
    val rnd = new scala.util.Random(9)
    val vocab = Vector("alpha beta", "gamma", "delta eps", "zeta!", "ETA theta")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(1 + rnd.nextInt(6))(vocab(rnd.nextInt(vocab.size))).mkString("\n")))
    val in = docs.toDF("doc_id", "text")
    val out = graft.llm.Dedup.dedupParagraphs(in, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == docs.map(_._1).toSet, "every doc id must survive")
    def norm(s: String) = s.toLowerCase
      .replaceAll("[^\\p{L}\\p{N}\\s]", "").replaceAll("\\s+", " ").trim
    // each distinct normalized paragraph appears EXACTLY once corpus-wide
    val allOut = out.toSeq.flatMap { case (id, t) =>
      t.split("\n").filter(_.trim.nonEmpty).map(p => (id, norm(p))) }
    assert(allOut.map(_._2).distinct.size == allOut.size,
      "a normalized paragraph survived twice")
    // and exactly the set of distinct input paragraphs survives, each at
    // its first-occurrence document
    val firstByNorm = docs.flatMap { case (id, t) =>
      t.split("\n").zipWithIndex.map { case (p, pos) => (norm(p), id, pos) } }
      .groupBy(_._1).map { case (n, occ) => n -> occ.minBy(o => (o._2, o._3))._2 }
    assert(allOut.map { case (id, n) => n -> id }.toMap == firstByNorm,
      "a paragraph survived somewhere other than its first occurrence")
  }

  test("Profile: nulls, exact distinct, min/max; unknown column refused") {
    import spark.implicits._
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, Some("z")))
      .toDF("id", "s")
    val p = graft.ops.Profile.profile(df, Seq("id", "s"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(p("id") == ((4L, 0L, 4L, "1", "4")))
    assert(p("s") == ((4L, 1L, 2L, "a", "z")))
    intercept[IllegalArgumentException](
      graft.ops.Profile.profile(df, Seq("nope")))
  }

  test("SigV4 signs the space-collapsed canonical header form") {
    import java.net.URI
    import java.time.Instant
    val signer = new graft.kernel.SigV4Signer("AK", "SK", "us-east-1",
      clock = () => Instant.parse("2026-01-02T03:04:05Z"))
    val payload = "body".getBytes("UTF-8")
    val h = signer.sign("PUT", URI.create("http://host:9000/b/k"), payload,
      Map("x-meta" -> "a  b \t c"))
    // straight-line reconstruction with the PUBLISHED canonicalization
    // (trim + collapse runs of whitespace), as a strict verifier would
    def sha256Hex(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
        .map("%02x".format(_)).mkString
    def hmac(k: Array[Byte], d: String) = {
      val m = javax.crypto.Mac.getInstance("HmacSHA256")
      m.init(new javax.crypto.spec.SecretKeySpec(k, "HmacSHA256"))
      m.doFinal(d.getBytes("UTF-8"))
    }
    val headerLines = Seq(
      "host" -> "host:9000",
      "x-amz-content-sha256" -> h("x-amz-content-sha256"),
      "x-amz-date" -> h("x-amz-date"),
      "x-meta" -> "a b c").map { case (k, v) => s"$k:$v\n" }.mkString
    val canonical = Seq("PUT", "/b/k", "", headerLines,
      "host;x-amz-content-sha256;x-amz-date;x-meta",
      sha256Hex(payload)).mkString("\n")
    val sts = Seq("AWS4-HMAC-SHA256", h("x-amz-date"),
      "20260102/us-east-1/s3/aws4_request",
      sha256Hex(canonical.getBytes("UTF-8"))).mkString("\n")
    var k = hmac("AWS4SK".getBytes("UTF-8"), "20260102")
    k = hmac(k, "us-east-1"); k = hmac(k, "s3"); k = hmac(k, "aws4_request")
    val expected = hmac(k, sts).map("%02x".format(_)).mkString
    assert(h("authorization").endsWith(s"Signature=$expected"),
      s"signer did not sign the collapsed canonical form: ${h("authorization")}")
  }

  test("RoaringMembership agrees with the flattened decode on every container kind") {
    import graft.kernel.DeletionVectors
    val rnd = new scala.util.Random(97)
    // sparse array containers + a dense 65k range (bitset container) + a
    // second high-32 bitmap — the shapes encodeRoaringArray emits
    val positions = (
      Seq.fill(2000)(rnd.nextInt(1 << 20).toLong) ++
        (200000L until 260000L) ++ // dense → bitset container
        Seq.fill(100)((1L << 32) + rnd.nextInt(10000))
      ).distinct.sorted.toArray
    val blob = DeletionVectors.encodeRoaringArray(positions)
    val flat = DeletionVectors.decodeRoaringArray(blob)
    assert(flat.toSeq == positions.toSeq)
    val mem = DeletionVectors.decodeRoaringMembership(blob)
    positions.foreach(p => assert(mem.contains(p), s"member $p"))
    val nonMembers = Seq(0L, (1L << 21) + 1, 199999L, 260000L, (1L << 32) + 10001,
      (2L << 32) + 5) ++ Seq.fill(500)(rnd.nextLong().abs % (1L << 33))
    nonMembers.filterNot(positions.contains).foreach(p =>
      assert(!mem.contains(p), s"non-member $p"))

    // run container (delta-spark emits these; our writer doesn't): a
    // hand-built blob per the portable format — run [10, 15] at high 0
    val bb = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(DeletionVectors.MAGIC).putLong(1L).putInt(0) // magic, 1 bitmap, high=0
    bb.putInt(12347 | (0 << 16)) // SERIAL_COOKIE, nContainers-1 = 0
    bb.put(1.toByte) // run bitmap: container 0 is a run container
    bb.putShort(0.toShort).putShort(5.toShort) // key 0, cardinality-1 (unused for runs)
    bb.putShort(1.toShort) // one run
    bb.putShort(10.toShort).putShort(5.toShort) // start 10, len 5 → 10..15
    val runBlob = java.util.Arrays.copyOf(bb.array(), bb.position())
    assert(DeletionVectors.decodeRoaringArray(runBlob).toSeq == (10L to 15L))
    val runMem = DeletionVectors.decodeRoaringMembership(runBlob)
    (10L to 15L).foreach(p => assert(runMem.contains(p)))
    Seq(9L, 16L, 0L, 65536L).foreach(p => assert(!runMem.contains(p)))

    // non-conformant blob (descending array container): BOTH decoders must
    // refuse — a membership binary search over unsorted data would silently
    // answer false for deleted positions (resurrected rows)
    val bad = java.nio.ByteBuffer.allocate(64).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bad.putInt(DeletionVectors.MAGIC).putLong(1L).putInt(0)
    bad.putInt(12346) // SERIAL_COOKIE_NO_RUN
    bad.putInt(1) // one container
    bad.putShort(0.toShort).putShort(1.toShort) // key 0, cardinality 2
    bad.putInt(0) // offset header entry (value unused by the decoder)
    bad.putShort(5.toShort).putShort(3.toShort) // DESCENDING values
    val badBlob = java.util.Arrays.copyOf(bad.array(), bad.position())
    intercept[IllegalArgumentException](DeletionVectors.decodeRoaringArray(badBlob))
    intercept[IllegalArgumentException](DeletionVectors.decodeRoaringMembership(badBlob))
  }

  test("convertToDelta on a hive-partitioned layout: inference, escaping, null partition") {
    import spark.implicits._
    val dir = tmpDir()
    // special-char value (space) + a NULL partition value → Spark writes
    // p=x%20y/ and p=__HIVE_DEFAULT_PARTITION__/ dirs — both must survive
    // conversion: escaped dir names decoded, hive-default read back as NULL
    val src = Seq((1L, "a b", 10L), (2L, "a b", 20L), (3L, "plain", 30L),
      (4L, null: String, 40L)).toDF("id", "p", "v")
    src.write.partitionBy("p").parquet(dir)
    val t = DeltaTable.convertToDelta(spark, dir)
    assert(t.partitionColumns == Seq("p"), s"inferred: ${t.partitionColumns}")
    val got = t.toDF.select("id", "p", "v").as[(Long, String, Long)]
      .collect().toSet
    assert(got == Set((1L, "a b", 10L), (2L, "a b", 20L), (3L, "plain", 30L),
      (4L, null, 40L)), s"got $got")
    // partition pruning works on the converted table (escaped value)
    val pruned = t.scanWhere("p = 'a b'")
    assert(pruned.count() == 2)
    assert(pruned.inputFiles.length < t.files.size,
      "conversion must yield per-partition files the scan can prune")
    // IS NULL routes to the hive-default partition
    assert(t.scanWhere("p IS NULL").select("id").as[Long].collect().toSeq == Seq(4L))
  }

  test("lastUpdateIncremental: true on tail extension, false on the gap fallback") {
    import spark.implicits._
    val dir = tmpDir()
    val base = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    DeltaTable.write(spark, base, dir)
    val t = DeltaTable.forPath(spark, dir)
    t.snapshot // cache v0

    // plain tail append → incremental
    DeltaTable.write(spark, base.withColumn("id", col("id") + 100), dir, mode = "append")
    t.refresh()
    assert(t.deltaLog.lastUpdateIncremental, "tail extension must report incremental")

    // nothing new → trivially incremental (cached state returned)
    t.refresh()
    assert(t.deltaLog.lastUpdateIncremental)

    // gap ABOVE the cached version (a vacuumed/cleaned log whose tail is
    // only reachable via the checkpoint): t is cached at v1; remove v2's
    // commit after checkpointing v3 — newVs {3} != expected (2..3), so
    // update() must take the full-replay fallback AND say so
    DeltaTable.write(spark, base.withColumn("id", col("id") + 200), dir, mode = "append") // v2
    DeltaTable.write(spark, base.withColumn("id", col("id") + 300), dir, mode = "append") // v3
    DeltaTable.forPath(spark, dir).createCheckpoint() // fresh handle: checkpoint AT v3
    val fs = t.tablePath.getFileSystem(spark.sessionState.newHadoopConf())
    val logDir = new org.apache.hadoop.fs.Path(dir, "_delta_log")
    assert(fs.delete(new org.apache.hadoop.fs.Path(logDir, f"${2L}%020d.json"), false))
    t.deltaLog.lastUpdateIncremental = true // prove update() resets it
    t.refresh()
    assert(!t.deltaLog.lastUpdateIncremental,
      "refresh across a log gap must report the full-replay fallback")
    assert(t.version == 3L && t.toDF.count() == 40,
      "the fallback still reconstructs the full table from the checkpoint")
  }
}
