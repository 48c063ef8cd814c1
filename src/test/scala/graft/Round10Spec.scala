package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.table.DeltaTable

/** Round-10 regressions for the r9 judge/advisor findings: wide-profile
  * approx mode (no Expand), dedupParagraphs NULL-id enforcement, catalog
  * slot-debris recovery, strict RFC 3986 query canonicalization in the
  * Azure signer, and the listing-only commit-mtime path. */
class Round10Spec extends AnyFunSuite {

  private val warehouse = Files.createTempDirectory("graft-wh10").toString

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[8]")
    .appName("graft-test-r10")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.catalog.graft10", "graft.catalog.GraftCatalog")
    .config("spark.sql.catalog.graft10.warehouse", warehouse)
    .getOrCreate()

  def tmpDir(): String = Files.createTempDirectory("graft_r10_").toString + "/t"

  test("Profile approxDistinct: one linear scan (no Expand), estimates in tolerance") {
    val df = spark.range(10000).select(col("id"), (col("id") % 97).as("m"),
      concat(lit("s"), col("id") % 321).as("s"))
    val exact = graft.ops.Profile.profile(df, Seq("m", "s"))
    val approx = graft.ops.Profile.profile(df, Seq("m", "s"), approxDistinct = true)
    // the exact multi-distinct plans through Expand; the approx mode must not
    def hasExpand(d: org.apache.spark.sql.DataFrame): Boolean =
      d.queryExecution.executedPlan.toString.contains("Expand")
    assert(hasExpand(exact), "exact multi-distinct should plan via Expand (sanity)")
    assert(!hasExpand(approx), "approxDistinct must stay a single linear scan")
    val ex = exact.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val ap = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(ex == Map("m" -> 97L, "s" -> 321L))
    // HLL++ default rsd is 5%; allow 3x margin so the test never flakes
    ap.foreach { case (c, v) =>
      assert(math.abs(v - ex(c)).toDouble / ex(c) < 0.15, s"$c: approx $v vs ${ex(c)}")
    }
    // non-distinct metrics are identical between the modes
    val exRest = exact.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(4), r.getString(5))).toSet
    val apRest = approx.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getString(4), r.getString(5))).toSet
    assert(exRest == apRest)
  }

  test("dedupParagraphs: NULL document id fails loudly, not cleaned=''") {
    import spark.implicits._
    val in = Seq((java.lang.Long.valueOf(1L), "a\nb"),
      (null.asInstanceOf[java.lang.Long], "a\nc")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      graft.llm.Dedup.dedupParagraphs(in, "doc_id", "text").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("NULL doc_id")), s"got: ${messages(e)}")
  }

  test("catalog createTable: non-table dirs get dedicated errors; debris recovery works") {
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    spark.sql("CREATE NAMESPACE graft10.r10")
    // crashed-CREATE debris (= indistinguishable from an empty namespace):
    // refused with a dedicated error NAMING the recovery — never silently
    // adopted (adoption would convert an empty CREATE NAMESPACE dir into a
    // table) and never the misleading TableAlreadyExists
    Files.createDirectories(Paths.get(warehouse, "r10", "debris"))
    val e0 = intercept[Exception](spark.sql("CREATE TABLE graft10.r10.debris (id BIGINT)"))
    assert(messages(e0).exists(m =>
      m.contains("empty non-table directory") && m.contains("DROP NAMESPACE")),
      s"got: ${messages(e0)}")
    // the named recovery actually unblocks re-creation
    spark.sql("DROP NAMESPACE graft10.r10.debris")
    spark.sql("CREATE TABLE graft10.r10.debris (id BIGINT)")
    spark.sql("INSERT INTO graft10.r10.debris VALUES (5)")
    assert(spark.sql("SELECT id FROM graft10.r10.debris").head().getLong(0) == 5L)
    // a POPULATED non-table directory (here: a namespace with a child) must
    // raise the dedicated error naming the path — not TableAlreadyExists
    spark.sql("CREATE NAMESPACE graft10.r10.sub")
    Files.createDirectories(Paths.get(warehouse, "r10", "sub", "child"))
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE graft10.r10.sub (id BIGINT)")
    }
    assert(messages(e).exists(m =>
      m.contains("populated non-table directory") && m.contains("sub")),
      s"got: ${messages(e)}")
    // an empty NAMESPACE is likewise never silently converted
    spark.sql("CREATE NAMESPACE graft10.r10.keepme")
    intercept[Exception](spark.sql("CREATE TABLE graft10.r10.keepme (id BIGINT)"))
    assert(spark.sql("SHOW NAMESPACES IN graft10.r10").collect()
      .map(_.getString(0)).contains("r10.keepme"),
      "the namespace must survive the refused create")
  }

  test("Azure Shared Key canonicalizes query per RFC 3986: '+' is a literal plus") {
    import java.net.URI
    import java.time.Instant
    val signer = new graft.kernel.AzureSharedKeySigner("acct",
      java.util.Base64.getEncoder.encodeToString("key".getBytes("UTF-8")),
      clock = () => Instant.parse("2026-01-02T03:04:05Z"))
    def auth(q: String): String =
      signer.sign("GET", URI.create(s"http://acct.blob.example/c/b?$q"), 0L)("authorization")
    // raw '+' and %2B both mean a literal plus → identical canonical form
    assert(auth("marker=a+b") == auth("marker=a%2Bb"))
    // form decoding would have collapsed 'a+b' to 'a b' — must NOT match
    assert(auth("marker=a+b") != auth("marker=a%20b"))
  }

  test("normalize: Unicode whitespace is whitespace, and DuckDB (RE2) agrees") {
    import spark.implicits._
    // NBSP, LINE SEPARATOR, IDEOGRAPHIC SPACE, NEL, THIN SPACE, and VT
    // (U+000B: in Java's \s but NOT RE2's - the oracle mirror carries an
    // explicit \x{000B}, both engines pinned with the local duckdb python)
    val s = "Foo bar baz　quxquux  a-b! ÆØ\u000Bvt"
    val out = Seq(s).toDF("text")
      .select(graft.llm.TextOps.normalize(col("text"))).head().getString(0)
    // pinned against the DuckDB replay of LlmEntries.normSql (probed in
    // round 10 with the local duckdb python): every separator becomes one
    // plain space instead of being deleted (which glued words together)
    assert(out == "foo bar baz qux quux ab æø vt", s"got: '$out'")
  }

  test("stripMarkup: markup-free prose with comparison operators survives intact") {
    import spark.implicits._
    val cases = Seq(
      "price < 100 and rating > 4" -> "price < 100 and rating > 4",
      "<p>real <b>tags</b> go</p> away" -> "real tags go away",
      "a <!DOCTYPE html> b" -> "a b",
      "x < y and z > w, plus <em>emph</em>" -> "x < y and z > w, plus emph")
    cases.foreach { case (in, want) =>
      val out = Seq(in).toDF("text")
        .select(graft.llm.TextOps.stripMarkup(col("text"))).head().getString(0)
      assert(out == want, s"'$in' -> '$out' (wanted '$want')")
    }
  }

  test("NULL text: stats ops emit zero-rows, not NULL rows that vanish from both gate sides") {
    import spark.implicits._
    val df = Seq((1L, "some words here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val g = graft.llm.TextOps.gopherQuality(df, "doc_id", "text")
    assert(g.count() == 2)
    assert(g.filter("quality_pass").count() + g.filter("NOT quality_pass").count() == 2,
      "pass/fail partition must cover the corpus")
    val r = graft.llm.TextOps.repetitionStats(df, "doc_id", "text")
      .filter("doc_id = 2").head()
    assert(!r.isNullAt(r.fieldIndex("top_word_frac")))
    val t = graft.llm.TextOps.textStats(df, "doc_id", "text")
      .filter("doc_id = 2").head()
    assert(t.getLong(t.fieldIndex("n_words")) == 0L)
    // crossDedup: NULL-text shard docs are neither silently lost among
    // themselves nor silently admitted past an empty-text corpus doc
    val corpus = Seq((100L, "")).toDF("doc_id", "text")
    val shard = Seq((10L, null.asInstanceOf[String]), (11L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(graft.llm.Dedup.crossDedup(corpus, shard, "doc_id", "text").count() == 0,
      "NULL text reads as '' and dedups against an empty-text corpus doc")
    val emptyCorpus = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val kept = graft.llm.Dedup.crossDedup(emptyCorpus, shard, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L), "among NULL-text dups the min id survives")
  }

  test("ANN: NULL embeddings are dropped, not emitted as half-null rows") {
    import spark.implicits._
    val rows = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)), (3L, Array(0.0, 1.0)),
      (4L, null.asInstanceOf[Array[Double]]))
    val emb = rows.toDF("vec_id", "embedding")
    val brute = graft.llm.Similarity.cosineTopK(emb, emb, "vec_id", "embedding", k = 2)
    assert(brute.filter("cos IS NULL OR query_id = 4").count() == 0)
    val lsh = graft.llm.Similarity.lshTopK(emb, emb, "vec_id", "embedding",
      k = 2, nBits = 2, dim = 2)
    assert(lsh.filter("cos IS NULL OR query_id = 4").count() == 0)
    // 65 planes would alias onto 64-bit bucket ids — refused loudly
    intercept[IllegalArgumentException] {
      graft.llm.Similarity.bucketId(col("embedding"),
        graft.llm.Similarity.hyperplanes(65, 2))
    }
  }

  test("frameSample: empty payload emits zero frames, matching windowEnergy") {
    import spark.implicits._
    val df = Seq((1L, Array[Byte](1, 2, 3, 4)), (2L, Array.empty[Byte]),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("id", "payload")
    val f = graft.llm.Multimodal.frameSample(df, "id", "payload", nFrames = 2, frameSize = 2)
    assert(f.filter("id IN (2, 3)").count() == 0, "no phantom frames")
    assert(f.filter("id = 1").count() == 2)
  }

  test("normalize: case-duplicate source columns are refused, not silently dropped") {
    val base = tmpDir()
    DeltaTable.write(spark, spark.range(3).toDF("id"), base)
    // select (not withColumn, which REPLACES under the case-insensitive
    // analyzer) to get a frame genuinely carrying both `id` and `ID`
    val dup = spark.range(3).select(col("id"), (col("id") * 100).as("ID"))
    val e = intercept[Exception] {
      DeltaTable.forPath(spark, base) // table exists; append the dup frame
      DeltaTable.write(spark, dup, base, mode = "append")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("ambiguous source columns")), s"got: ${msgs(e)}")
  }

  test("dataSkippingStatsColumns matches schema case-insensitively (foreign-engine config)") {
    val dir = tmpDir()
    // "ID" configured for column `id` — delta-spark resolves the property
    // case-insensitively, so such tables exist in the wild
    DeltaTable.create(spark, dir,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.LongType))),
      configuration = Map("delta.dataSkippingStatsColumns" -> "ID"))
    DeltaTable.write(spark, spark.range(10).select(col("id"), (col("id") * 2).as("v")),
      dir, mode = "append")
    val t = DeltaTable.forPath(spark, dir)
    val add = t.snapshot.allFiles.head
    val stats = add.stats.getOrElse("")
    assert(stats.contains("\"id\""), s"stats must cover id: $stats")
    assert(!stats.replace("\"numRecords\"", "").contains("\"v\""),
      s"stats must be restricted to the configured column: $stats")
  }

  test("partitions() returns LOGICAL keys on a column-mapped table") {
    val dir = tmpDir()
    val df = spark.range(20).select(col("id"), (col("id") % 3).cast("string").as("grp"))
    DeltaTable.write(spark, df, dir, partitionBy = Seq("grp"),
      configuration = Map("delta.columnMapping.mode" -> "name"))
    val parts = DeltaTable.forPath(spark, dir).partitions()
    assert(parts.size == 3)
    assert(parts.forall(_.keySet == Set("grp")),
      s"keys must be logical names, got: ${parts.map(_.keySet)}")
  }

  test("__file data column: plain reads fine, DV-identity scan refuses loudly") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "__file")
    DeltaTable.write(spark, df, dir,
      configuration = Map("delta.enableDeletionVectors" -> "true"))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 3) // no DVs yet: fine
    val e = intercept[Exception] {
      DeltaTable.forPath(spark, dir).delete(Some("id = 2")) // DML needs identity
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("reserved for row identity")), s"got: ${msgs(e)}")
  }

  test("convert_to_delta commits RELATIVE AddFile paths (vacuum-safe)") {
    val dir = tmpDir()
    spark.range(50).select(col("id"), (col("id") % 2).as("p"))
      .write.partitionBy("p").parquet(dir)
    val t = DeltaTable.convertToDelta(spark, dir)
    val paths = t.snapshot.allFiles.map(_.path)
    assert(paths.nonEmpty && paths.forall(p => !p.startsWith("/") && !p.contains(":")),
      s"convert must commit relative paths, got: ${paths.take(3)}")
    // the real consequence: a vacuum on the converted table must NOT see
    // live files as deletion candidates
    val candidates = t.vacuum(retentionHours = 0.0, dryRun = true,
      enforceRetention = false)
    assert(candidates.isEmpty,
      s"vacuum dry-run flagged live files on a fresh conversion: ${candidates.take(3)}")
  }

  test("replaceWhere: refused with overwriteSchema; enforced on the CREATE path") {
    import spark.implicits._
    val dir = tmpDir()
    val df = Seq((1L, "eu"), (2L, "us")).toDF("id", "region")
    // CREATE path (table absent): predicate must be enforced, not ignored
    intercept[Exception] {
      DeltaTable.write(spark, df, dir, mode = "overwrite",
        replaceWhere = Some("region = 'eu'"))
    }
    DeltaTable.write(spark, df.filter("region = 'eu'"), dir, mode = "overwrite",
      replaceWhere = Some("region = 'eu'"))
    assert(DeltaTable.forPath(spark, dir).toDF.count() == 1)
    // replaceWhere + overwriteSchema: kept files outside the predicate
    // cannot match a replaced schema — refuse the combination
    val e = intercept[Exception] {
      DeltaTable.write(spark, df.select(col("id"), col("region").as("r2")), dir,
        mode = "overwrite", replaceWhere = Some("id = 1"), overwriteSchema = true)
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("overwriteSchema")), s"got: ${msgs(e)}")
  }

  test("loadCdf on a stale handle reads post-evolution commits with the new schema") {
    val dir = tmpDir()
    DeltaTable.write(spark, spark.range(5).toDF("id"), dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val stale = DeltaTable.forPath(spark, dir)
    stale.snapshot // pin the cached snapshot at v0
    // external writer: add a column and data the stale handle knows nothing of
    val writer = DeltaTable.forPath(spark, dir)
    writer.addColumns(org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("extra",
        org.apache.spark.sql.types.LongType))))
    DeltaTable.write(spark,
      spark.range(5, 8).select(col("id"), (col("id") * 10).as("extra")),
      dir, mode = "append")
    val cdf = stale.loadCdf(0)
    assert(cdf.columns.contains("extra"),
      s"stale-handle CDF must carry the evolved schema: ${cdf.columns.toSeq}")
    val extras = cdf.filter("_commit_version = 2 AND extra IS NOT NULL").count()
    assert(extras == 3, s"new-column values must survive, got $extras rows")
  }

  test("IncrementalAgg: TORN migration (addColumns landed, backfill crashed) self-heals") {
    val dir = tmpDir(); val tgt = tmpDir()
    val base = spark.range(30).select(col("id"), (col("id") % 3).as("grp"),
      when(col("id") % 3 === 2, lit(null).cast("long"))
        .otherwise(col("id") * 5).as("v"))
    DeltaTable.write(spark, base, dir,
      configuration = Map("delta.enableChangeDataFeed" -> "true"))
    val up = DeltaTable.forPath(spark, dir)
    val appId = graft.ops.IncrementalAgg.appIdFor(up)
    val legacySchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("grp", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("cnt", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_v", org.apache.spark.sql.types.LongType)))
    DeltaTable.create(spark, tgt, legacySchema, Nil)
    val legacyRows = up.toDF.groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum(coalesce(col("v"), lit(0L))).as("sum_v"))
    DeltaTable.forPath(spark, tgt)
      .merge(legacyRows, "target.grp <=> source.grp")
      .whenNotMatchedInsert(Map("grp" -> "source.grp", "cnt" -> "source.cnt",
        "sum_v" -> "source.sum_v"))
      .withAppTransaction(appId, 0L)
      .execute()
    // simulate the crash window: the addColumns commit landed, the
    // backfill never ran — nn_v exists and is NULL everywhere
    DeltaTable.forPath(spark, tgt).addColumns(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("nn_v",
          org.apache.spark.sql.types.LongType))))
    up.delete(Some("id < 6"))
    graft.ops.IncrementalAgg.refresh(up, tgt, Seq("grp"), Seq("v"))
    val got = DeltaTable.forPath(spark, tgt).toDF
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    val want = up.toDF.groupBy("grp")
      .agg(count(lit(1)).as("cnt"), sum("v").as("sum_v"), count(col("v")).as("nn_v"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)),
          r.getLong(3)))).toMap
    assert(got == want, s"torn migration must self-heal: $got vs $want")
  }

  test("AddFile.numRecords degrades to None on malformed stats, never throws") {
    import graft.kernel.AddFile
    assert(AddFile("f", stats = Some("")).numRecords.isEmpty)
    assert(AddFile("f", stats = Some("{truncated")).numRecords.isEmpty)
    assert(AddFile("f", stats = Some("not json at all")).numRecords.isEmpty)
    assert(AddFile("f", stats = Some("""{"numRecords": 7}""")).numRecords.contains(7L))
    assert(AddFile("f", stats = None).numRecords.isEmpty)
  }

  test("commitMtimes: one-listing mtime map covers every commit") {
    val dir = tmpDir()
    val df = spark.range(10).toDF("id")
    DeltaTable.write(spark, df, dir)
    DeltaTable.write(spark, df, dir, mode = "append")
    DeltaTable.write(spark, df, dir, mode = "append")
    val log = DeltaTable.forPath(spark, dir).deltaLog
    val m = log.commitMtimes()
    assert(m.keySet == Set(0L, 1L, 2L))
    assert(m.values.forall(_ > 0L))
  }
}
